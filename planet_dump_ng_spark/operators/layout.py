"""Data-layout operators: Z-order (Morton) clustering for multi-
dimensional scan pruning.

At 100 TB, pruning beats computing: range-partitioning by a single key
gives min/max parquet stats selective in THAT key only.  Interleaving
the bits of two keys (the Morton curve) makes file-level min/max stats
selective in BOTH dimensions at once — the standard lakehouse
data-clustering technique (Delta/Iceberg expose it as ``ZORDER BY`` /
``sort_order``).  Everything here is integer bit arithmetic on JVM-side
built-ins (shiftleft / bitwiseOR / bitwiseAND), codegen'd and
engine-exact, so the layout decision is reproducible and SQL-oracled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: magic-number bit spreads: 16-bit value -> even bit positions of 32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to the even bits of a 32-bit
    value (0b1111 -> 0b01010101) in 4 shift-or-mask steps."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(x: Column, y: Column) -> Column:
    """Morton interleave of two 16-bit grid coordinates -> 32-bit key.

    x occupies even bits, y odd bits: consecutive z-values stay close in
    BOTH x and y, so sorting by z clusters 2-D neighborhoods into the
    same files.
    """
    return spread_bits(x).bitwiseOR(F.shiftleft(spread_bits(y), 1))


def cluster_by_zorder(
    df: DataFrame, x: Column, y: Column, n_files: int
) -> DataFrame:
    """Lay ``df`` out in Morton order across ``n_files`` range buckets.

    Fixed-width z-range buckets (z div 2^32/n_files) rather than
    sampled repartitionByRange boundaries: deterministic run-to-run, so
    a re-cluster of the same data writes identical files (the idempotent
    re-layout property compaction jobs need).  Writing one file per
    bucket gives every file a tight min/max envelope in both dimensions.
    """
    width = (1 << 32) // n_files
    z = zorder_key(x, y)
    out = df.withColumn("zval", z).withColumn(
        "zbucket", F.expr(f"zval div {width}")
    )
    return out.repartition(n_files, "zbucket").sortWithinPartitions("zval")


def compact_dir(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a small-files parquet directory into ~target-size files;
    returns the output file count.

    The streaming sink and per-batch ingests leave one file per
    micro-batch — at 100 TB that is the classic small-file problem
    (scan task explosion, NameNode/listing pressure).  Compaction sizes
    the output from the OBSERVED input bytes, so it needs no stats
    service: ceil(total_bytes / target).  The rewrite is one shuffle-
    free coalesce when reducing file count; row content is preserved
    exactly (no ordering contract — pair with cluster_by_zorder when a
    sort layout is wanted).
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_dir)
    written = [
        f
        for root, _d, fs in os.walk(dst_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    return len(written)
