"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full registry from
``planet_dump_ng_spark.plans`` for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from planet_dump_ng_spark import plans  # noqa: E402

plans.load_all()

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _driver_green() -> dict[str, int]:
    """Latest green round per query from the prior CORRECTNESS_r*.json.

    The driver checks only the first 50 entries of ``queries()`` per round,
    so ordering is coverage policy: queries that have never produced a green
    driver row go first, letting coverage accumulate across rounds instead
    of re-checking the same prefix.  A red/errored row does NOT count as
    checked — it rotates back to the front until it passes.  For GREEN
    queries the value is the round of their most recent green row, so the
    ordering can re-verify by staleness: once everything is green, a fixed
    order would re-check the same 50 forever while the other 160 rot
    unverified.
    """
    import glob
    import json
    import re

    # LATEST verdict per query wins (rounds ascend): a query that was
    # green in an old round but regressed red since must rotate back
    # into the checked prefix, so an any-round union is wrong.
    paths = []
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            paths.append((int(m.group(1)), path))
    verdict: dict[str, bool] = {}
    last_green: dict[str, int] = {}
    for rnd, path in sorted(paths):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # Full-oracle rows need the value hash; rows-only rows (no
            # hash computed) count on the row-count match alone.
            ok = not row.get("err") and (
                row.get("hash_match") is True
                or (
                    row.get("hash_match") is None
                    and row.get("rows_match") is True
                )
            )
            verdict[name] = ok
            if ok:
                last_green[name] = rnd
    return {n: last_green[n] for n, ok in verdict.items() if ok}


def _changed_plan_queries() -> set[str]:
    """Queries whose code changed THIS round: the plan module a query's
    spark fn is defined in, or any planet_dump_ng_spark module that plan
    module directly imports, differs from the last driver round commit
    (``round N: ...``) — including uncommitted edits.  These jump the
    staleness queue: a touched plan must re-verify in the same round it
    changed, not ride a green row from four rounds ago.  Best-effort:
    any git/inspect failure returns the empty set (ordering then falls
    back to pure staleness)."""
    import inspect
    import re
    import subprocess

    try:
        base = subprocess.run(
            ["git", "log", "--grep", "^round [0-9]*:", "-n", "1",
             "--format=%H"],
            capture_output=True, text=True, cwd=_REPO_DIR, timeout=15,
        ).stdout.strip()
        if not base:
            return set()
        committed = subprocess.run(
            ["git", "diff", "--name-only", base, "HEAD"],
            capture_output=True, text=True, cwd=_REPO_DIR, timeout=15,
        ).stdout.splitlines()
        dirty = [
            line[3:]
            for line in subprocess.run(
                ["git", "status", "--porcelain"],
                capture_output=True, text=True, cwd=_REPO_DIR, timeout=15,
            ).stdout.splitlines()
        ]
    except Exception:
        return set()
    changed = {
        f for f in (*committed, *dirty)
        if f.startswith("planet_dump_ng_spark/") and f.endswith(".py")
    }
    if not changed:
        return set()
    imports_of: dict[str, set[str]] = {}

    def _deps(path: str) -> set[str]:
        # the module itself + its direct planet_dump_ng_spark imports.
        # Both forms matter: `import planet_dump_ng_spark.a.b` AND the
        # dominant `from planet_dump_ng_spark.a import b, c as d` —
        # the latter's imported NAMES are submodule files for the
        # operator imports plan modules actually use, so each name maps
        # to <pkg>/<name>.py as well (non-module names produce paths
        # that simply never appear in the changed-file set)
        if path not in imports_of:
            deps = {path}
            try:
                with open(os.path.join(_REPO_DIR, path)) as fh:
                    src = fh.read()
                for m in re.finditer(
                    r"import\s+planet_dump_ng_spark((?:\.\w+)+)", src
                ):
                    deps.add(
                        "planet_dump_ng_spark/"
                        + m.group(1).lstrip(".").replace(".", "/")
                        + ".py"
                    )
                for m in re.finditer(
                    r"from\s+planet_dump_ng_spark((?:\.\w+)*)\s+import\s+"
                    r"\(?\s*([\w\s,]+)",
                    src,
                ):
                    pkg = m.group(1).lstrip(".").replace(".", "/")
                    base = "planet_dump_ng_spark" + (f"/{pkg}" if pkg else "")
                    if pkg:
                        deps.add(base + ".py")
                    for item in m.group(2).split(","):
                        name = item.split(" as ")[0].strip()
                        if name.isidentifier():
                            deps.add(f"{base}/{name}.py")
            except OSError:
                pass
            imports_of[path] = deps
        return imports_of[path]

    out = set()
    for name, spec in plans.QUERIES.items():
        try:
            mod = os.path.relpath(inspect.getfile(spec.spark), _REPO_DIR)
        except Exception:
            continue
        if _deps(mod) & changed:
            out.add(name)
    return out


def _ordered_names() -> list[str]:
    """Registry names: never-driver-green first, then queries whose plan
    code CHANGED this round (stalest first — a touched plan re-verifies
    in the round it changed), then the rest STALEST-VERIFIED first
    (oldest latest-green round; registry order breaks ties) — so the
    driver's 50-query prefix sweeps the whole registry across rounds
    instead of re-checking one fixed slice."""
    green = _driver_green()
    names = list(plans.QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    changed = _changed_plan_queries()
    never = [n for n in names if n not in green]
    touched = sorted(
        (n for n in names if n in green and n in changed),
        key=lambda n: (green[n], pos[n]),
    )
    rest = sorted(
        (n for n in names if n in green and n not in changed),
        key=lambda n: (green[n], pos[n]),
    )
    return never + touched + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return plans.QUERIES["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2.

    Ordered so queries without a prior green driver-correctness row come
    first (the driver samples a 50-query prefix per round).
    """
    return {name: plans.QUERIES[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return {
        name: plans.QUERIES[name].oracle
        for name in _ordered_names()
        if plans.QUERIES[name].oracle is not None
    }
