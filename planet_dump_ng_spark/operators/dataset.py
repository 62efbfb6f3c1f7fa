"""Training-dataset materialization: the sink side of the LLM data
pipeline — deterministic splits written as partitioned, shard-sized
parquet a downstream trainer can consume split-by-split.

Scale notes: the writer partitions the output directory BY SPLIT
(predicate-pushdown-friendly: a trainer reading split=train touches no
val/test files) and controls shard count per split so the 100 TB train
split fans into trainer-friendly shards while tiny eval splits don't
fragment into thousands of slivers.  Rows are range-sharded and sorted
by the id within each shard, so output is deterministic run-to-run —
the property checkpoint/resume pipelines need to dedupe re-runs."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from planet_dump_ng_spark.operators.sampling import xxhash_split


def materialize_splits(
    df: DataFrame,
    out_dir: str,
    key: str,
    fractions: dict[str, float] | None = None,
    shards_per_split: int | None = None,
    split_key: str | None = None,
    mode: str = "overwrite",
    forced_split_col: str | None = None,
) -> DataFrame:
    """Assign xxhash splits and write ``out_dir/split=<name>/`` parquet.

    Returns the per-split manifest (split, n_rows, n_ids) the caller can
    persist or assert on.  ``shards_per_split`` caps output files per
    split (default: cluster default parallelism).  ``split_key`` hashes
    a DIFFERENT column than ``key`` for the split decision (e.g. a
    near-dup cluster representative for leakage-free splits) while
    sharding/manifesting still run on ``key``; it is dropped from the
    written dataset.  ``mode="append"`` folds an increment into an
    existing dataset: the content-stable hash assigns the same split a
    from-scratch run would, so the grown dataset stays split-consistent
    (the returned manifest covers the INCREMENT only).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    n = shards_per_split or df.sparkSession.sparkContext.defaultParallelism
    assigned = xxhash_split(df, split_key or key, fractions)
    if forced_split_col:
        # rows with a non-null forced split OVERRIDE the hash assignment
        # (incremental leakage-free splitting inherits the split of an
        # existing near-dup partner); values must be keys of fractions —
        # the caller owns that contract
        assigned = assigned.withColumn(
            "split", F.coalesce(F.col(forced_split_col), F.col("split"))
        ).drop(forced_split_col)
    if split_key:
        assigned = assigned.drop(split_key)
    (
        assigned
        # range-shard on the key inside each split: deterministic file
        # contents AND clustered ids (parquet min/max stats stay selective)
        .repartitionByRange(n, "split", F.col(key))
        .sortWithinPartitions("split", key)
        .write.mode(mode)
        .partitionBy("split")
        .parquet(out_dir)
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(key).alias("n_ids"),
        )
    )


def pack_contiguous(
    df: DataFrame,
    key: str,
    ntok_col: str,
    capacity: int,
    num_buckets: int = 32,
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: global token offsets.

    GPT-style packing lays every document end-to-end in a deterministic
    pseudo-random order (xxhash64 of the key) and cuts the stream into
    fixed ``capacity``-token bins; a document's placement is its global
    token offset.  The global prefix sum is computed scale-correctly as
    a DISTRIBUTED two-level scan, never a single-partition window:

    1. rows hash into ``num_buckets`` ordered buckets; a per-bucket
       window (partitioned — every executor scans only its bucket)
       computes the within-bucket running sum;
    2. the ``num_buckets`` bucket totals — a scalar per bucket, the only
       data that ever reaches the driver — are cumulated driver-side
       into bucket base offsets (same contract as the IVF centroid
       collect: bounded by a config constant, not by data size);
    3. a BROADCAST join on bkt maps each row to its base offset (a
       literal CASE chain would grow the plan linearly with
       num_buckets — fine at 32, pathological at 10^4).

    Global order is (bucket, hash, key) — fully deterministic and
    replayable by a SQL oracle.  Emits start_off / first_bin / last_bin
    (a document may straddle a bin boundary: that's the semantics of
    contiguous packing, the trainer's loader splits it).
    """
    from pyspark.sql import Window as W

    h = F.xxhash64(F.col(key))
    t = df.select(
        key,
        F.col(ntok_col).alias("n_tok"),
        h.alias("h"),
        F.pmod(h, F.lit(num_buckets)).alias("bkt"),
    ).persist()
    w = (
        W.partitionBy("bkt")
        .orderBy("h", key)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = t.withColumn("cum_in_bkt", F.sum("n_tok").over(w))
    totals = {
        r["bkt"]: r["tot"]
        for r in t.groupBy("bkt").agg(F.sum("n_tok").alias("tot")).collect()
    }
    base: dict[int, int] = {}
    acc = 0
    for b in range(num_buckets):
        base[b] = acc
        acc += int(totals.get(b, 0))
    base_df = df.sparkSession.createDataFrame(
        [(b, base[b]) for b in range(num_buckets)], "bkt bigint, _base bigint"
    )
    start = (F.col("cum_in_bkt") - F.col("n_tok") + F.col("_base")).alias(
        "start_off"
    )
    out = cum.join(F.broadcast(base_df), "bkt").select(key, "n_tok", "bkt", start)
    first = F.expr(f"start_off div {capacity}")
    last = F.when(
        F.col("n_tok") > 0,
        F.expr(f"(start_off + n_tok - 1) div {capacity}"),
    ).otherwise(first)
    return out.withColumn("first_bin", first.cast("long")).withColumn(
        "last_bin", last.cast("long")
    )


def read_split(spark: SparkSession, out_dir: str, split: str) -> DataFrame:
    """Read one split back; the partition filter prunes at the directory
    level (no train-split IO when asking for val)."""
    return spark.read.parquet(out_dir).filter(F.col("split") == split)


def verify_splits(spark: SparkSession, out_dir: str, key: str) -> None:
    """Assert the materialized splits are disjoint on the key and that
    every row landed in exactly one split."""
    df = spark.read.parquet(out_dir)
    per_key = df.groupBy(key).agg(F.countDistinct("split").alias("ns"))
    n_multi = per_key.filter(F.col("ns") > 1).count()
    assert n_multi == 0, f"{n_multi} keys appear in more than one split"


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column data-quality profile in long format.

    For each named column: row count, null count, exact distinct count,
    and min/max rendered as strings (one schema regardless of column
    type).  Plan shape: ONE aggregate pass — Spark rewrites the multiple
    COUNT(DISTINCT) via Expand (rows x profiled columns before the
    partial aggregate), which is the standard exact-distinct trade;
    profiling 5 columns costs one 5x-expanded map-side-combinable agg,
    not 5 scans.  The wide single-row result is unpivoted to
    (column, n_rows, n_nulls, n_distinct, min_val, max_val).
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(col).alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
