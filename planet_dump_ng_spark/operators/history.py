"""History -> current filtering (reference operator A1 + F5/F7).

The reference's history_filter (src/history_filter.cpp:30-257) streams
(id, version)-sorted elements, keeps the last version of each id (the
``left_over`` carry machinery handles block boundaries), then drops
invisible rows.  As a window over a shuffled-by-id DataFrame the whole
carry apparatus disappears.

Implementation choice: ``max(version) over (partition by id)`` + equality
filter instead of ``row_number() == 1``.  A windowed MAX needs no ORDER BY,
so Spark plans it as a window aggregate without a per-partition sort —
cheaper than row_number at planet scale where nodes dominate (~10^10 rows,
avg ~1.1 versions each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def latest_versions(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Keep only each id's maximum version (history -> current planet)."""
    w = W.partitionBy(id_col)
    return (
        df.withColumn("_maxv", F.max("version").over(w))
        .filter(F.col("version") == F.col("_maxv"))
        .drop("_maxv")
    )


def current_view(df: DataFrame, id_col: str = "id") -> DataFrame:
    """A1 + F5: latest version per id, deleted elements dropped
    (history_filter.cpp:49-51,115-117,196-198; README.md:82-87)."""
    return latest_versions(df, id_col).filter(F.col("visible"))


def changesets_only(*, changesets: DataFrame, **_ignored) -> DataFrame:
    """F7 (changeset_filter.cpp:26-39): the changeset output consumes only
    the changesets stream; node/way/relation streams are dropped.  In the
    DataFrame world that's simply selecting the changesets frame."""
    return changesets
