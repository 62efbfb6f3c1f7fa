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


def _hilbert_steps(n_bits: int, dialect: str) -> list[tuple[str, str, str]]:
    """Per-step (d_increment, x_next, y_next) SQL strings of the
    canonical Hilbert xy2d recurrence (the Wikipedia formulation: test
    the s-bit of each coordinate, accumulate s^2 * gray(rx, ry), rotate
    the frame).  One generator emits both dialects so the Spark plan and
    the DuckDB oracle are structurally the same algorithm — the only
    divergence is the XOR spelling (Spark ``^`` vs DuckDB ``xor()``,
    where ``^`` means exponentiation)."""
    xor2 = (
        (lambda a, b: f"({a} ^ {b})")
        if dialect == "spark"
        else (lambda a, b: f"xor({a}, {b})")
    )
    n = 1 << n_bits
    steps = []
    for i in range(n_bits):
        s = 1 << (n_bits - 1 - i)
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        d_inc = f"{s * s} * {xor2(f'(3 * {rx})', ry)}"
        x_next = (
            f"(CASE WHEN {ry} = 1 THEN x"
            f" WHEN {rx} = 1 THEN {n - 1} - y ELSE y END)"
        )
        y_next = (
            f"(CASE WHEN {ry} = 1 THEN y"
            f" WHEN {rx} = 1 THEN {n - 1} - x ELSE x END)"
        )
        steps.append((d_inc, x_next, y_next))
    return steps


def hilbert_layout(df: DataFrame, n_bits: int = 8) -> DataFrame:
    """Hilbert-curve clustering key over grid columns (x, y) in
    [0, 2^n_bits): appends ``hval`` (curve position) and carries the
    inputs through.

    The second space-filling layout next to Z-order: Hilbert preserves
    locality strictly better (every curve step moves one grid cell, so
    a file of consecutive hvals has a provably tight 2-D envelope,
    while Morton takes long diagonal jumps between quadrants).  The
    recurrence unrolls to ``n_bits`` chained simultaneous column
    updates — pure codegen'd integer CASE/bit arithmetic, map-only,
    bit-identical to the unrolled-CTE SQL oracle.
    """
    out = (
        df.withColumn("hx", F.col("x"))  # originals survive; x/y become
        .withColumn("hy", F.col("y"))   # the rotating working frame
        .withColumn("d", F.lit(0).cast("bigint"))
    )
    for d_inc, x_next, y_next in _hilbert_steps(n_bits, "spark"):
        out = out.withColumns(
            {
                "d": F.col("d") + F.expr(d_inc),
                "x": F.expr(x_next),
                "y": F.expr(y_next),
            }
        )
    return (
        out.withColumn("hval", F.col("d").cast("bigint"))
        .drop("d", "x", "y")
        .withColumnsRenamed({"hx": "x", "hy": "y"})
    )
