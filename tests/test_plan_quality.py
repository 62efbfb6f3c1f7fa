"""Plan-quality regression gate over EVERY registry query.

Correctness says what a query returns; these invariants say whether the
plan would survive 100x the data.  Each new query automatically inherits
the audit, so a scale anti-pattern (the round-2 partition-less rank
window, a filter that stops pushing, an accidental cartesian join) fails
CI instead of surfacing as a bench regression three rounds later."""

import re

import pytest

from planet_dump_ng_spark import plans

plans.load_all()

#: queries whose contract documents a deliberate broadcast nested-loop
#: (small-side-broadcast crossJoin of a 1-row aggregate or query set) —
#: broadcast NLJ is fine; what the audit forbids is CartesianProduct,
#: the non-broadcast physical fallback.
_QUERIES = sorted(plans.QUERIES)


@pytest.fixture(scope="module")
def plans_info(plan_session, sf_dir):
    """(optimized logical, executed physical, schema) per query — built
    in ONE pass.  Several plan functions are eager at construction
    (iterative training loops, persisted materializations), so invoking
    each query once and capturing everything here matters: a separate
    schema fixture would re-run all those jobs a second time.  Captured
    under ``plan_session`` (production planning confs), NOT the
    latency-tuned test session, so the exchange counts keep matching
    the QUERIES.md budgets."""
    spark = plan_session
    out = {}
    for name in _QUERIES:
        # same capture hygiene as tools/gen_query_inventory.plan_budgets:
        # an empty cache at entry makes any InMemoryTableScan in the
        # plan the query's OWN (synchronously registered) persists, so
        # the exchange counts pinned in QUERIES.md are reproducible here
        spark.catalog.clearCache()
        df = plans.QUERIES[name].spark(spark, sf_dir)
        qe = df._jdf.queryExecution()
        out[name] = (
            qe.optimizedPlan().toString(),
            qe.executedPlan().toString(),
            df.schema,
        )
    spark.catalog.clearCache()
    return out


def _split_top_level(args: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _window_partition_specs(logical: str) -> list[str]:
    """Partition-expression section of every windowspecdefinition: the
    top-level args before the ordering args (which carry ASC/DESC) and
    the frame arg.  Parsed with balanced parens — the spec nests
    specifiedwindowframe(...), so a greedy-to-first-paren regex would
    truncate and mistake frame internals for partition exprs."""
    specs = []
    for m in re.finditer(r"windowspecdefinition\(", logical):
        start = m.end()
        depth, i = 1, start
        while depth and i < len(logical):
            if logical[i] == "(":
                depth += 1
            elif logical[i] == ")":
                depth -= 1
            i += 1
        args = _split_top_level(logical[start : i - 1])
        part = [
            a
            for a in args
            if " ASC" not in a
            and " DESC" not in a
            and not a.startswith("specifiedwindowframe")
        ]
        specs.append(", ".join(part))
    return specs


@pytest.mark.parametrize("name", _QUERIES)
def test_scalar_only_output(name, plans_info):
    """The driver canonicalizes results with pandas ``sort_values`` over raw
    values, which factorizes every column and raises ``unhashable type`` on
    list/dict cells — so a top-level Array/Map/Struct column is driver-red
    even when its values are correct (round-3 ``array_function_matrix``).
    Serialize nested results with ``array_join``/``to_json`` before
    registering."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in plans_info[name][2].fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} outputs non-scalar columns {bad}; the driver's pandas "
        "canonicalization cannot hash them — serialize with "
        "array_join/to_json on both the Spark and oracle side"
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_no_cartesian_product(name, plans_info):
    """A CartesianProduct node is the non-broadcast O(n*m) fallback — at
    scale it means a full shuffle-nested-loop.  Broadcast nested loop
    (small side by contract) is allowed; true cartesian is not."""
    _, physical, _ = plans_info[name]
    assert "CartesianProduct" not in physical, (
        f"{name} plans a CartesianProduct; broadcast the small side or "
        "add an equi-join key"
    )


@pytest.mark.parametrize("name", _QUERIES)
def test_no_global_window(name, plans_info):
    """Every window function must declare a partition spec: a partition-
    less window moves ALL rows to one task (the round-2 q10 anti-pattern).
    spark_partition_id() over a post-limit single partition counts — the
    point is that the spec is non-empty and non-constant-folded."""
    logical, _, _ = plans_info[name]
    for spec in _window_partition_specs(logical):
        assert spec.strip(), (
            f"{name} plans a partition-less window (single-task at scale)"
        )


def _recorded_budgets() -> dict[str, tuple[int, int]]:
    """shuf/bcast columns of QUERIES.md — the recorded per-query exchange
    budget (generated by tools/gen_query_inventory.py at sf0.001)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    out: dict[str, tuple[int, int]] = {}
    with open(path) as fh:
        for line in fh:
            m = re.match(
                r"\| `([^`]+)` \| [^|]* \| [^|]* \| (-?\d+) \| (-?\d+) \|",
                line,
            )
            if m:
                out[m.group(1)] = (int(m.group(2)), int(m.group(3)))
    return out


_BUDGETS = _recorded_budgets()


@pytest.mark.parametrize("name", _QUERIES)
def test_exchange_budget_pinned(name, plans_info, sf_dir):
    """The pre-AQE physical plan's shuffle/broadcast exchange counts must
    equal the budgets recorded in QUERIES.md: a lost broadcast (small
    side grew past the threshold, a hint dropped) or an extra shuffle
    (a new repartition, a join that stopped co-locating) now fails at
    authoring time instead of surfacing as a bench anomaly rounds
    later.  When a plan change is DELIBERATE, regenerate the budgets
    (`python tools/gen_query_inventory.py`) in the same commit.

    Two classes of plan are exempt: budgets are recorded at sf0.001
    (file-size statistics steer broadcast choices, so another SF pins
    nothing), and queries recorded -1 — the generator's double capture
    (cleared cache, built twice) disagreed, i.e. the plan is MEASURED
    nondeterministic even with cache hygiene.  Cross-query cache
    substitution is no longer an exemption: both the generator and the
    plans_info fixture clearCache() before each build, so a plan's
    InMemoryTableScan subtrees are its own synchronous persists and
    pin deterministically."""
    if sf_dir != "/root/testdata/sf0.001":
        pytest.skip("budgets are recorded at sf0.001; stats-driven "
                    "broadcast choices differ at other SFs")
    assert name in _BUDGETS, (
        f"{name} has no recorded exchange budget — regenerate QUERIES.md "
        "(python tools/gen_query_inventory.py)"
    )
    want_shuf, want_bcast = _BUDGETS[name]
    if (want_shuf, want_bcast) == (-1, -1):
        pytest.skip("recorded as unpinnable (double capture disagreed or "
                    "construction raised)")
    _, physical, _ = plans_info[name]
    got_shuf = len(
        re.findall(r"\bExchange (?:hash|range|Single|RoundRobin)", physical)
    )
    got_bcast = len(re.findall(r"BroadcastExchange", physical))
    assert (got_shuf, got_bcast) == (want_shuf, want_bcast), (
        f"{name}: plan exchanges changed — shuffle {want_shuf}->{got_shuf}, "
        f"broadcast {want_bcast}->{got_bcast}.  If deliberate, regenerate "
        "QUERIES.md (python tools/gen_query_inventory.py); if not, a "
        "broadcast was lost or a shuffle was added"
    )
