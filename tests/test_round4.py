"""Round-4 gate hardening: driver-hashability guard + registry rotation."""

import pandas as pd


def test_non_scalar_cols_flags_lists_and_dicts():
    import sys, os  # noqa: E401

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from check_oracle import non_scalar_cols

    ok = pd.DataFrame({"a": [1, 2], "b": ["x", None], "c": [1.5, float("nan")]})
    assert non_scalar_cols(ok) == []

    bad = pd.DataFrame(
        {
            "a": [1, 2],
            "arr": [[1, 2], [3]],
            "mp": [{"k": 1}, None],
            "s": ["fine", "also fine"],
        }
    )
    assert non_scalar_cols(bad) == ["arr", "mp"]


def test_registry_rotation_orders_never_green_first():
    """queries()/oracle_sql() must put queries without a green driver row
    first (the driver samples a 50-entry prefix), keep the full registry,
    and keep both dicts in the same order."""
    import __spark_entry__ as entry_mod
    from planet_dump_ng_spark import plans

    plans.load_all()
    names = list(entry_mod.queries())
    assert sorted(names) == sorted(plans.QUERIES)  # permutation, nothing lost

    green = entry_mod._driver_green()
    n_never = len([n for n in names if n not in green])
    # the never-green block is a contiguous prefix
    assert all(n not in green for n in names[:n_never])
    assert all(n in green for n in names[n_never:])

    oracle_names = list(entry_mod.oracle_sql())
    with_oracle = [n for n in names if plans.QUERIES[n].oracle is not None]
    assert oracle_names == with_oracle  # same rotation, oracle-less skipped


def test_driver_green_requires_clean_row(tmp_path, monkeypatch):
    """err rows and hash-mismatch rows must NOT count as checked."""
    import json

    import __spark_entry__ as entry_mod

    rows = {
        "good_hash": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None},
        "rows_only": {"rows_match": True, "schema_match": None,
                      "hash_match": None, "err": None},
        "hash_fail": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "err": None},
        "errored": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "boom"},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rows))
    monkeypatch.setattr(entry_mod, "_REPO_DIR", str(tmp_path))
    green = entry_mod._driver_green()
    assert green == {"good_hash": 99, "rows_only": 99}


def test_rotation_orders_green_by_staleness(tmp_path, monkeypatch):
    """With everything green, the prefix must sweep by staleness: the
    query whose latest green row is OLDEST re-checks first — a fixed
    registry order would re-verify the same 50 forever and leave the
    rest of the registry permanently unre-checked."""
    import json

    import __spark_entry__ as entry_mod

    g = {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    r = {"rows_match": True, "schema_match": True, "hash_match": False,
         "err": None}
    # r1: a, b, c green;  r2: b re-verified green, c regressed red
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": g, "b": g, "c": g})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"b": g, "c": r})
    )
    monkeypatch.setattr(entry_mod, "_REPO_DIR", str(tmp_path))
    green = entry_mod._driver_green()
    assert green == {"a": 1, "b": 2}  # c regressed -> not green at all
    fake = {"b": None, "a": None, "c": None, "d": None}
    monkeypatch.setattr(entry_mod.plans, "QUERIES", fake)
    # never-green (c: regressed, d: never checked) first in registry
    # order, then green by oldest-latest-green (a@r1 before b@r2)
    assert entry_mod._ordered_names() == ["c", "d", "a", "b"]
