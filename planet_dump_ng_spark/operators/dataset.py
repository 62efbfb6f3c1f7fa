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
) -> DataFrame:
    """Assign xxhash splits and write ``out_dir/split=<name>/`` parquet.

    Returns the per-split manifest (split, n_rows, n_ids) the caller can
    persist or assert on.  ``shards_per_split`` caps output files per
    split (default: cluster default parallelism).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    n = shards_per_split or df.sparkSession.sparkContext.defaultParallelism
    assigned = xxhash_split(df, key, fractions)
    (
        assigned
        # range-shard on the key inside each split: deterministic file
        # contents AND clustered ids (parquet min/max stats stay selective)
        .repartitionByRange(n, "split", F.col(key))
        .sortWithinPartitions("split", key)
        .write.mode("overwrite")
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
