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


def _ordered_names() -> list[str]:
    """Registry names, never-driver-green first, then green queries
    STALEST-VERIFIED first (oldest latest-green round; registry order
    breaks ties) — so the driver's 50-query prefix sweeps the whole
    registry across rounds instead of re-checking one fixed slice."""
    green = _driver_green()
    names = list(plans.QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    never = [n for n in names if n not in green]
    checked = sorted(
        (n for n in names if n in green), key=lambda n: (green[n], pos[n])
    )
    return never + checked


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
