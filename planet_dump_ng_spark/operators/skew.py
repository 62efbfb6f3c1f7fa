"""Skew mitigation: salted joins and bucketed co-location.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these operators are the explicit tools for the cases AQE can't fix:
- :func:`salted_join` — a known-hot key set (power-law user ids,
  null-heavy foreign keys) sharded across ``n_salts`` sub-keys, with the
  small side replicated per salt.  Turns one straggler partition into
  ``n_salts`` even ones at the cost of replicating the dimension rows.
- :func:`write_bucketed` / bucketed reads — pre-shuffling fact tables
  into the same bucketing lets repeated joins run with ZERO exchanges
  (verified by tests/test_skew_bucketing.py inspecting the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys sharded over ``n_salts``.

    left gets a random-but-deterministic salt from its row content
    (hash-derived, stable across retries — never rand(), which breaks
    task re-execution); right is replicated once per salt via a literal
    explode.  Join key becomes (key, salt) so one hot key's rows spread
    over n_salts reducers.  Result is row-identical to the unsalted join.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l.join(
        r,
        (l[left_key] == r[right_key]) & (l["_salt"] == r["_salt"]),
        how,
    )
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table.  Two tables
    bucketed identically join with NO exchange — the shuffle is paid once
    at write time, amortized over every later join (the Spark analog of
    the reference's sort-once-join-everywhere design,
    src/extract_kv.cpp order engineering)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
