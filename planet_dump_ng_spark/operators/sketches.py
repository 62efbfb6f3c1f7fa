"""Distributed sketch operators: HyperLogLog / KMV distinct-count,
Bloom-filter join pruning, and Count-Min heavy hitters.

These are the fixed-size-state summaries a 100 TB pipeline leans on when
exact answers need a full shuffle of the raw keys: register/bucket
updates combine map-side, so the shuffle carries at most ``m`` rows per
group no matter how many input rows there are.  Everything is built on
Spark's ``xxhash64`` plus integer register math — no RNG, no
transcendental functions — so every sketch output is bit-deterministic
and the DuckDB oracle replays it exactly through the xxhash64 replica
(plans/duck_xxh64.py).  The one float op per estimate is a single
division whose operands are exact integers (converted once to double),
which both engines round identically.

Why not ``approx_count_distinct``: Spark's built-in HLL++ is the right
production choice, but its estimate depends on an opaque internal hash
and bias tables, so it cannot be hash-verified against an independent
oracle.  These sketches trade a few lines of register math for full
end-to-end verifiability with the same O(m) state contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TWO64 = float(2**64)


def _unsigned_split(h, lo_bits: int):
    """Split a signed 64-bit hash column into (high, low) of the unsigned
    value: high = h >>> lo_bits, low = h & (2^lo_bits - 1).  Pure bit ops
    on the two's-complement long — no overflow under ANSI mode."""
    mask = (1 << lo_bits) - 1
    return F.shiftrightunsigned(h, lo_bits), h.bitwiseAND(F.lit(mask))


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str, p: int = 8
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate next to the exact count.

    Register update: j = top ``p`` hash bits, rho = 1 + leading zeros of
    the remaining ``64-p`` bits (via ``length(bin(w))`` — both engines
    print minimal binary).  The raw-estimate harmonic sum is kept exact
    by summing the *integer* ``2^(62-rho)`` (rho >= 1, so each term fits
    a long; the sum is a DECIMAL(38,0)); empty registers contribute
    ``2^62`` each.  The estimate is the raw HLL formula
    ``alpha * m^2 / sum(2^-rho)`` — one double division of exact
    operands.  Linear counting needs ``ln`` (libm-dependent), so this
    variant deliberately reports the raw estimate only; use it in the
    n/m >> 1 regime.

    Scale: two map-side-combinable aggregations; shuffle volume is
    O(groups * m), independent of input rows.
    """
    est = hll_estimate_from_registers(
        hll_registers(df, [group_col], value_col, p=p), [group_col], p=p
    )
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(value_col)).alias("exact_distinct")
    )
    return est.join(exact, group_col)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 8
) -> DataFrame:
    """Per-group HLL register table ``(group..., j, rho)`` — the sketch's
    mergeable state.  Registers merge across groups (or time buckets, or
    partial files) with a plain ``MAX(rho)`` re-aggregation, which is what
    makes the sketch a fixed-size *partial aggregate*: daily registers
    roll up to weekly without touching raw rows (see
    plans/sketch_plans.hll_merge_weekly for the merge == recount proof).
    """
    wbits = 64 - p
    j, w = _unsigned_split(F.xxhash64(F.col(value_col)), wbits)
    return (
        df.select(*[F.col(g) for g in group_cols], j.alias("j"), w.alias("w"))
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(wbits + 1)).otherwise(
                F.lit(wbits + 1) - F.length(F.bin(F.col("w")))
            ),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 8,
    out_col: str = "hll_estimate",
) -> DataFrame:
    """Finalize a register table into ``(group..., hll_registers, out_col)``.

    Exact-integer harmonic sum (each term ``2^(62-rho)`` summed as
    DECIMAL(38,0), absent registers contributing ``2^62``), then the one
    double division of the raw HLL formula — bit-deterministic, so two
    register tables that are setwise equal finalize to the identical
    double.
    """
    m = 1 << p
    scale = hll_alpha(m) * m * m * float(2**62)
    sums = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 62 - rho) AS DECIMAL(38,0))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("hll_registers"),
    )
    return sums.select(
        *group_cols,
        F.col("hll_registers"),
        (
            F.lit(scale)
            / (
                F.col("s_present")
                + (F.lit(m) - F.col("hll_registers")).cast("decimal(38,0)")
                * F.lit(2**62).cast("decimal(38,0)")
            ).cast("double")
        ).alias(out_col),
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group K-Minimum-Values distinct estimate next to the exact count.

    Keeps the ``k`` smallest distinct *unsigned* hash values per group
    (signed hashes are lifted to DECIMAL(20,0) so the order matches the
    oracle's HUGEINT order); the unbiased estimator is
    ``(k-1) * 2^64 / h_(k)``.  Groups with fewer than ``k`` distinct
    hashes report the exact count (the sketch saw every value).

    Scale: distinct + a per-group rank window — both partition by the
    group key, so state per task is bounded by the group's distinct
    hashes; the window never sees more than the post-distinct rows.
    """
    u = (
        F.xxhash64(F.col(value_col)).cast("decimal(20,0)")
        + F.when(
            F.xxhash64(F.col(value_col)) < 0,
            F.expr("CAST(18446744073709551616 AS DECIMAL(20,0))"),
        ).otherwise(F.expr("CAST(0 AS DECIMAL(20,0))"))
    ).alias("u")
    from pyspark.sql import Window as W

    hashes = df.select(F.col(group_col), u).distinct()
    win = W.partitionBy(group_col).orderBy("u")
    tops = hashes.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") <= k
    )
    summ = tops.groupBy(group_col).agg(
        F.max("u").alias("kth"), F.count(F.lit(1)).alias("n_seen")
    )
    est = summ.select(
        F.col(group_col),
        F.col("kth").cast("double").alias("kth_hash"),
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(F.lit(float(k - 1) * _TWO64) / F.col("kth").cast("double"))
        .alias("kmv_estimate"),
    )
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(value_col)).alias("exact_distinct")
    )
    return est.join(exact, group_col)


def _km_positions(h, i: int, m_bits: int):
    """Kirsch-Mitzenmacher double hashing: position_i = (lo + i*hi) % m
    with lo = low 32 hash bits, hi = high 32 bits forced odd.  Operands
    stay < 3 * 2^32 — no long overflow under ANSI mode, no per-i rehash.
    """
    hi, lo = _unsigned_split(h, 32)
    hi_odd = hi.bitwiseOR(F.lit(1))
    return F.pmod(lo + F.lit(i) * hi_odd, F.lit(m_bits))


def bloom_prune_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    group_col: str,
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter runtime join pruning, reported per probe group.

    The build side's keys set ``k`` Kirsch-Mitzenmacher bit positions
    each; a probe key survives iff all ``k`` of its positions are set.
    Returns per-group counts over distinct (group, probe key) pairs:
    ``n_bloom_pass`` / ``n_true_match`` / ``n_false_pos`` — by
    construction there are never false negatives (every true match
    passes), which the test suite pins.

    The bit set is represented relationally (distinct positions,
    <= k*|build| rows, broadcast) so the oracle can replay it; on a real
    cluster the same positions would be OR-ed into Spark's native
    runtime Bloom filter — the plan shape (tiny broadcast build, probe
    scan never shuffled) is identical.
    """
    bits = (
        build.select(
            F.explode(
                F.array(
                    *[
                        _km_positions(F.xxhash64(F.col(build_key)), i, m_bits)
                        for i in range(k)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probe_keys = probe.select(F.col(group_col), F.col(probe_key).alias("pk")).distinct()
    probe_pos = probe_keys.select(
        F.col(group_col),
        "pk",
        F.posexplode(
            F.array(
                *[
                    _km_positions(F.xxhash64(F.col("pk")), i, m_bits)
                    for i in range(k)
                ]
            )
        ).alias("i", "pos"),
    )
    passed = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy(group_col, "pk")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == k)
    )
    true_keys = (
        build.select(F.col(build_key).alias("pk")).distinct().withColumn("is_true", F.lit(1))
    )
    verdict = passed.join(F.broadcast(true_keys), "pk", "left")
    return verdict.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_bloom_pass"),
        F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias("n_true_match"),
        F.sum(F.when(F.col("is_true").isNull(), 1).otherwise(0)).alias(
            "n_false_pos"
        ),
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    weight: str | None = None,
    w: int = 256,
    d: int = 3,
    topk: int = 20,
) -> DataFrame:
    """Count-Min heavy hitters: top-``topk`` keys by sketch estimate.

    The classic hot-key detector (e.g. find skewed join keys before
    salting).  Exact per-key counts are aggregated once (needed for the
    report anyway), then folded into the ``d x w`` sketch — so the
    sketch build shuffles distinct keys, not raw rows, and the sketch
    itself (<= d*w rows) is broadcast back for the min-over-rows probe.
    ``est_count >= exact_count`` always (Count-Min never undercounts).

    Output order is deterministic: est desc, then key asc; ties at the
    cut line cannot reorder across engines.
    """
    counts = df.groupBy(F.col(value_col).alias("key")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    key_pos = counts.select(
        "key",
        "exact_count",
        F.posexplode(
            F.array(
                *[_km_positions(F.xxhash64(F.col("key")), i, w) for i in range(d)]
            )
        ).alias("i", "pos"),
    )
    cms = key_pos.groupBy("i", "pos").agg(
        F.sum("exact_count").alias("bucket_total")
    )
    est = (
        key_pos.join(F.broadcast(cms), ["i", "pos"])
        .groupBy("key", "exact_count")
        .agg(F.min("bucket_total").alias("est_count"))
    )
    return (
        est.orderBy(F.col("est_count").desc(), F.col("key").asc())
        .limit(topk)
        .select("key", "est_count", "exact_count")
    )


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    n_bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable fixed-bin histogram quantile estimator.

    The scale path for percentiles over data too large (or too
    streaming) for an exact global sort: one pass builds an
    equi-width ``n_bins`` histogram (map-side combinable — partial
    histograms merge by adding counts, which is what makes this a
    sketch), then each requested quantile is answered from the
    cumulative histogram with linear interpolation inside the landing
    bin.  Error is bounded by one bin width of the value range.

    Plan: one min/max/count agg (scalar, broadcast back), one
    ``groupBy(bin)`` agg, then all remaining work happens on the
    ``n_bins``-row table — the cumulative sum is a broadcast
    self-join (bin' <= bin) instead of a partition-less window, so no
    stage ever funnels the data through one task.

    Determinism: bin ids derive from single IEEE ops ((x-lo)/width,
    floor) computed identically by both engines; counts are exact
    ints; the interpolation is a fixed op sequence over exact ints
    and two doubles — bit-identical to the SQL oracle.
    """
    x = F.col(value_col)
    stats = df.agg(
        F.min(x).alias("lo"),
        F.max(x).alias("hi"),
        F.count(x).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    # guard on the COMPUTED width, not hi == lo: a subnormal range
    # (hi - lo down to 5e-324) underflows to width == 0.0 while
    # hi != lo, and ANSI mode turns the bin division into a
    # DIVIDE_BY_ZERO job failure (hypothesis-found).  Zero width puts
    # everything in bin 0 — the error bound still holds (<= hi - lo
    # <= one representable ulp).  NULL values are excluded up front:
    # they are already absent from n (count ignores them), and
    # least(NULL, n_bins-1) would otherwise silently dump them in the
    # last bin.
    binned = (
        df.where(x.isNotNull())
        .select(x.alias("x"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.when(width == F.lit(0.0), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("x") - F.col("lo")) / width).cast("int"),
                    F.lit(n_bins - 1),
                )
            )
            .alias("bin"),
            "lo",
            "hi",
            "n",
        )
    )
    hist = binned.groupBy("bin", "lo", "hi", "n").agg(
        F.count(F.lit(1)).alias("c")
    )
    other = hist.select(F.col("bin").alias("bin2"), F.col("c").alias("c2"))
    cum = (
        hist.join(F.broadcast(other), F.col("bin2") <= F.col("bin"))
        .groupBy("bin", "lo", "hi", "n", "c")
        .agg(F.sum("c2").alias("cum"))
    )
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    t = (
        F.broadcast(qdf)
        .crossJoin(F.broadcast(stats.select(F.col("n").alias("tn"))))
        .select("q", F.ceil(F.col("q") * F.col("tn")).cast("bigint").alias("target"))
    )
    landed = (
        cum.join(F.broadcast(t), F.col("cum") >= F.col("target"))
        .groupBy("q", "target")
        .agg(F.min("bin").alias("bin"))
    )
    # both sides are <= n_bins rows; hint broadcast so the tiny lookup
    # never plans a sort-merge join
    filled = landed.join(F.broadcast(cum), ["bin"]).select(
        "q",
        "target",
        "bin",
        "lo",
        "hi",
        "c",
        "cum",
    )
    w2 = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    frac = (
        F.col("target") - (F.col("cum") - F.col("c"))
    ).cast("double") / F.col("c").cast("double")
    est = (
        F.col("lo")
        + w2 * F.col("bin").cast("double")
        + w2 * frac
    )
    return filled.select(
        "q",
        F.col("target").alias("target_rank"),
        F.col("bin").cast("int").alias("bin"),
        est.alias("est"),
    )


def cms_join_size(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    w: int = 256,
    d: int = 3,
) -> DataFrame:
    """AMS/Count-Min join-size estimation: |left JOIN right ON key| from
    two tiny sketches, WITHOUT executing the join.

    The estimator the optimizer question needs at 100 TB ("how big
    would this join be?"): each side folds its per-key counts into a
    d x w Count-Min sketch; row r's inner product sum_w A[r][w]*B[r][w]
    upper-bounds the true join size sum_k a_k*b_k (hash collisions only
    ADD cross terms), and the MIN over the d rows tightens it — so
    ``est >= exact`` always, mirroring Count-Min's one-sided error.
    Sketch builds shuffle DISTINCT KEYS (not rows), the d x w tables
    broadcast, and the exact size is computed beside it from the same
    per-key count tables (one equi-join of key-count tables, never the
    row-level join) for error visibility.  All-integer arithmetic —
    hash-exact across engines.
    """
    ca = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("cb")
    )

    def sketch(counts: DataFrame, cnt_col: str) -> DataFrame:
        return (
            counts.select(
                cnt_col,
                F.posexplode(
                    F.array(
                        *[
                            _km_positions(F.xxhash64(F.col("key")), i, w)
                            for i in range(d)
                        ]
                    )
                ).alias("i", "pos"),
            )
            .groupBy("i", "pos")
            .agg(F.sum(cnt_col).alias("total"))
        )

    sa = sketch(ca, "ca").withColumnRenamed("total", "ta")
    sb = sketch(cb, "cb").withColumnRenamed("total", "tb")
    dots = (
        sa.join(sb, ["i", "pos"])  # missing buckets contribute 0 either way
        .groupBy("i")
        .agg(F.sum(F.col("ta") * F.col("tb")).alias("dot"))
    )
    est = dots.agg(F.min("dot").cast("bigint").alias("est_join_size"))
    exact = (
        ca.join(cb, "key")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias(
            "exact_join_size"
        ))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_size",
        "exact_join_size",
        (
            (F.col("est_join_size") - F.col("exact_join_size")).cast("double")
            / F.col("exact_join_size").cast("double")
        ).alias("rel_overestimate"),
    )
