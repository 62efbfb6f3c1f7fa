"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
values (exact for ints/strings/timestamps; exact-by-default for floats with
a tiny-ulp fallback report).  Usage:

    python tools/check_oracle.py [--record ROUND] [sf_dir] [query ...]

``--record ROUND`` merges every full-oracle PASS into repo-root
``SELFCHECK.json`` as {query: round} — the self-run verification ledger
that keeps the registry's staleness floor honest between driver passes
(the driver re-oracles only a 50-query prefix per round; with 200+
queries the tail would otherwise age ~4 rounds between driver checks).
bench.py's registry telemetry reports the union AND the driver-only
number separately, so self-checks never masquerade as driver rounds.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def non_scalar_cols(df: pd.DataFrame) -> list[str]:
    """Columns holding list/dict/ndarray values — legal in pandas but fatal
    in the driver's canonicalization (``sort_values`` factorizes raw values
    and dies on unhashables).  The round-3 ``array_function_matrix`` failure
    class: flag it locally so it never reaches a driver round."""
    bad = []
    for c in df.columns:
        if df[c].dtype != object:
            continue
        s = df[c].dropna()
        if len(s) and s.map(lambda v: isinstance(v, (list, dict, set, tuple))
                            or hasattr(v, "__array__")).any():
            bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_class(dt) -> str:
    s = str(dt)
    if s.startswith("datetime64"):
        # Spark toPandas always yields [ns] even for us-precision values;
        # resolution is canonicalized before value compare, so not a signal.
        return "datetime"
    k = getattr(dt, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "object")


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} oracle={len(b)}"]
    # The driver hashes raw values, so representation differences (HUGEINT ->
    # object/float, TIMESTAMP_NS vs us) fail there even when values match.
    for c in sorted(a.columns):
        ca, cb = dtype_class(a[c].dtype), dtype_class(b[c].dtype)
        if ca != cb:
            errs.append(f"col {c}: dtype class differs: spark={a[c].dtype} oracle={b[c].dtype}")
    if errs:
        return errs
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                both_nan = av.isna() & bv.isna()
                eq = (av == bv) | both_nan
                if not eq.all():
                    bad = (~eq).to_numpy().nonzero()[0][:3]
                    close = all(
                        math.isclose(av.iloc[i], bv.iloc[i], rel_tol=1e-9)
                        for i in bad
                        if not (pd.isna(av.iloc[i]) or pd.isna(bv.iloc[i]))
                    )
                    errs.append(
                        f"col {c}: {int((~eq).sum())} float mismatches "
                        f"(close={close}) e.g. rows {list(bad)}: "
                        f"{[(av.iloc[i], bv.iloc[i]) for i in bad]}"
                    )
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
                if not eq.all():
                    bad = (~eq).to_numpy().nonzero()[0][:3]
                    errs.append(
                        f"col {c}: {int((~eq).sum())} mismatches e.g. rows "
                        f"{list(bad)}: {[(av.iloc[i], bv.iloc[i]) for i in bad]}"
                    )
        except Exception as e:  # noqa: BLE001
            errs.append(f"col {c}: compare error {e}")
    return errs


def main() -> int:
    argv = sys.argv[1:]
    record_round = None
    if argv and argv[0] == "--record":
        record_round = int(argv[1])
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from planet_dump_ng_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    passed: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        bad = non_scalar_cols(sdf)
        if bad:
            print(f"FAIL  {name}: not driver-hashable (list/struct values) "
                  f"in columns {bad} — serialize with array_join/to_json")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            print(f"FAIL  {name}: [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"      {e}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
            passed.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if record_round is not None and passed:
        import json

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SELFCHECK.json",
        )
        try:
            with open(path) as fh:
                ledger = json.load(fh)
        except (OSError, ValueError):
            ledger = {}
        for name in passed:
            ledger[name] = max(record_round, ledger.get(name, 0))
        with open(path, "w") as fh:
            json.dump(ledger, fh, indent=0, sort_keys=True)
        print(f"recorded {len(passed)} greens at round {record_round}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
