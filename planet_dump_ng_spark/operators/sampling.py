"""Reproducible sampling for training-data pipelines.

``df.sample()`` seeds Spark's RNG per partition — results change under
repartitioning and never match another engine.  These operators sample by
CONTENT HASH instead: a row is kept iff a hash of its key falls under the
fraction threshold, so the sample is stable across runs, partitionings,
engines, and incremental re-runs (new rows don't reshuffle old
membership — the property that makes train/test splits trustworthy).

Portable flavor here uses md5 hex prefixes (comparable string-wise in
any engine, used by the oracle-checked queries); a Spark-only deployment
would swap xxhash64 for speed without changing semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: md5-hex prefix length used for thresholding (8 hex chars = 32 bits)
_PREFIX = 8
_SPACE = 16**_PREFIX


def _bucket(key: Column) -> Column:
    """Uniform [0, 1) position from the md5 of the key's string form."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, _PREFIX), 16, 10).cast(
        "double"
    ) / F.lit(float(_SPACE))


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep rows whose hash bucket < fraction (reproducible sample)."""
    return df.filter(_bucket(F.col(key)) < fraction)


def train_test_split(
    df: DataFrame, key: str, test_fraction: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, reproducible (train, test) split on the key hash."""
    b = _bucket(F.col(key))
    return df.filter(b >= test_fraction), df.filter(b < test_fraction)


def weighted_mix(
    df: DataFrame,
    key: str,
    source_col: str,
    weights: dict[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-source downsampling (dataset mixing).

    Training mixes are specified as "keep fraction w_s of source s"; this
    keeps a row iff its content-hash bucket falls under its source's
    threshold, so the mix is reproducible, superset-stable per source
    (raising a weight only ADDS documents), and needs no shuffle — the
    weight lookup is a codegen'd CASE chain, the membership test a
    map-only filter.  Sources absent from ``weights`` are dropped
    (weight 0).  Adds the ``bucket`` column for auditability.
    """
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    thr: Column | None = None
    for src, w in weights.items():
        t = F.lit(int(round(w * buckets)))
        cond = F.col(source_col) == src
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    assert thr is not None, "weights must be non-empty"
    return df.withColumn("bucket", bucket).filter(bucket < thr.otherwise(F.lit(0)))


def temperature_resample(
    df: DataFrame,
    key: str,
    group_col: str,
    alpha: float = 0.5,
    buckets: int = 10_000,
) -> DataFrame:
    """Multilingual temperature resampling (the mT5/XLM-R mix rule),
    realized as deterministic downsampling-only.

    Target share of group g is proportional to ``count_g ** alpha``
    (alpha=1 keeps the natural mix, alpha=0 is uniform); the
    downsample-only realization keeps fraction
    ``f_g = count_g**(alpha-1) / max_h count_h**(alpha-1)`` — the
    smallest group keeps everything, larger groups are hash-thinned
    toward the tempered share, and no row is ever duplicated.

    Membership is the content-hash gate every sampler here uses:
    ``xxhash64(key) % buckets < floor(f_g * buckets)`` — stable across
    runs, partitionings, and appends.  For ``alpha=0.5`` the keep
    fraction is computed as ``sqrt(min_count) / sqrt(count_g)``: sqrt
    and division are correctly-rounded IEEE ops, so the thresholds are
    bit-identical in any engine (the oracle-checkable path).  Other
    alphas go through ``pow`` (deterministic within Spark, but libm
    pow is not cross-engine exact).

    Plan: one group-sized count aggregate crossed with a broadcast
    1-row max, broadcast-joined back — the membership test itself is
    map-only.  Adds (bucket, keep_threshold) for auditability.

    Rows with a NULL group form their own group (the count join is on a
    null-coalesced internal key): raw feeds with missing language tags
    must be tempered like any other class, not silently dropped by a
    null-key inner join.
    """
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null>"))
    df = df.withColumn("_tr_grp", grp)
    cnt = df.groupBy("_tr_grp").agg(F.count(F.lit(1)).alias("_c"))
    if alpha == 0.5:
        mn = cnt.agg(F.min("_c").cast("bigint").alias("_cmin"))
        frac = F.sqrt(F.col("_cmin").cast("double")) / F.sqrt(
            F.col("_c").cast("double")
        )
        thr = cnt.crossJoin(F.broadcast(mn))
    else:
        w = F.pow(F.col("_c").cast("double"), F.lit(alpha - 1.0))
        mx = (
            cnt.select(w.alias("_w"))
            .agg(F.max("_w").alias("_wmax"))
        )
        frac = w / F.col("_wmax")
        thr = cnt.crossJoin(F.broadcast(mx))
    thr = thr.select(
        "_tr_grp",
        F.floor(frac * F.lit(float(buckets)))
        .cast("bigint")
        .alias("keep_threshold"),
    )
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    return (
        df.withColumn("bucket", bucket)
        .join(F.broadcast(thr), "_tr_grp")
        .filter(F.col("bucket") < F.col("keep_threshold"))
        .drop("_tr_grp")
    )


def xxhash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment on the JVM-side xxhash64.

    The md5 path above is the portable flavor; this is the fast path — one
    codegen'd hash per row, no string conversion.  The key hashes into
    ``buckets`` equal slots and consecutive fraction ranges map to split
    labels, so membership is content-stable: re-running, repartitioning,
    or appending rows never reassigns an existing key, and enlarging a
    fraction only ever MOVES the boundary (a grown train split absorbs
    rows from val, never swaps members) — the superset-stability property
    training pipelines rely on.  Adds columns (bucket, split).
    """
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    edge = 0.0
    expr = None
    for name, frac in fractions.items():
        edge += frac
        cond = bucket < int(round(edge * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assert abs(edge - 1.0) < 1e-9, "fractions must sum to 1"
    return df.withColumn("bucket", bucket).withColumn(
        "split", expr.otherwise(list(fractions)[-1])
    )


def stratified_take(
    df: DataFrame, key: str, group_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic class balancing: at most ``n_per_group`` rows per
    group, chosen by content-hash order.

    The training-set balancer: capping over-represented classes without
    RNG.  Hash order (xxhash64(key), key) is a total order independent
    of partitioning and engine, so the selection is reproducible AND
    stable under appends: a new row displaces at most the current
    largest-hash member, never reshuffles the whole selection.  One
    partitioned rank window — shuffles each group once, no global sort.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.xxhash64(F.col(key)), key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def quality_weighted_sample(
    df: DataFrame,
    score_col: str,
    key: str,
    quotas: tuple[float, ...] = (0.25, 0.5, 0.75, 1.0),
    buckets: int = 10_000,
) -> DataFrame:
    """Quality-weighted downsampling: rank rows into score quartiles and
    keep a rising fraction of each tier (the DCLM/FineWeb-style soft gate
    — a hard percentile cutoff throws away ALL lower-tier text, but some
    of it is wanted for robustness; tempering by quality keeps the mix
    biased toward the top without zeroing the tail).

    Tier t (0 = bottom quartile) keeps ``quotas[t]`` of its rows via the
    content-hash bucket gate every sampler here uses
    (``xxhash64(key) % buckets < quota*buckets``), so membership is
    stable across runs, partitionings, and appends, and raising a quota
    only ever ADDS rows.

    Tiers come from the three global ``percentile_disc`` cuts of
    ``score_col`` — discrete percentiles of the input values, so the cut
    table (one broadcast row) is engine-exact for integer scores.  Plan:
    one map-side-combinable percentile aggregate, broadcast back,
    map-only gate — the fact table never shuffles.

    Adds (tier, bucket, keep_threshold); returns kept rows only.
    """
    if len(quotas) != 4:
        # a hard error, not an assert: under `python -O` a short list
        # would otherwise leave the TOP quartile's threshold NULL and
        # silently drop every highest-quality row
        raise ValueError(
            f"quotas needs one keep fraction per quartile (4), got "
            f"{len(quotas)}: {quotas!r}"
        )
    cuts = df.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY {score_col})"
            )
            .cast("bigint")
            .alias(f"p{int(q * 100)}")
            for q in (0.25, 0.5, 0.75)
        ]
    )
    tier = (
        F.when(F.col(score_col) >= F.col("p75"), 3)
        .when(F.col(score_col) >= F.col("p50"), 2)
        .when(F.col(score_col) >= F.col("p25"), 1)
        .otherwise(0)
    )
    thr: Column = F.lit(None).cast("bigint")
    for t, q in enumerate(quotas):
        thr = F.when(F.col("tier") == t, int(round(q * buckets))).otherwise(thr)
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("tier", tier)
        .drop("p25", "p50", "p75")
        .withColumn("bucket", bucket)
        .withColumn("keep_threshold", thr)
        .filter(F.col("bucket") < F.col("keep_threshold"))
    )


def select_token_budget(
    df: DataFrame,
    bin_col: str,
    tokens_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """Greedy token-budget selection: walk rows in (``bin_col`` DESC,
    ``order_col`` ASC) order and keep them while the cumulative
    ``tokens_col`` mass fits ``budget`` — the "best N tokens" subset a
    fixed-budget training run wants, with the boundary cut exactly
    mid-bin.

    Distributed shape (NO global sort, NO partition-less window): the
    per-bin token masses — a bounded table, one row per quality bin —
    get running totals via a broadcast self-join; each row adds its
    within-bin running sum from a window PARTITIONED by bin; a row is
    kept iff previous-bins mass + its within-bin cumulative <= budget.
    Adds ``cum_tokens`` (the row's global cumulative position).
    """
    from pyspark.sql import Window

    bins = df.groupBy(bin_col).agg(
        F.sum(tokens_col).cast("bigint").alias("_bin_tokens")
    )
    a, b = bins.alias("a"), bins.alias("b")
    prev = (
        a.join(F.broadcast(b), F.col(f"b.{bin_col}") >= F.col(f"a.{bin_col}"))
        .groupBy(F.col(f"a.{bin_col}").alias(bin_col))
        .agg(
            (
                F.sum(F.col("b._bin_tokens")).cast("bigint")
                - F.min(F.col("a._bin_tokens"))
            ).alias("_prev_cum")
        )
    )
    w = (
        Window.partitionBy(bin_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_within_cum", F.sum(tokens_col).over(w))
        .join(F.broadcast(prev), bin_col)
        .withColumn(
            "cum_tokens",
            (F.col("_prev_cum") + F.col("_within_cum")).cast("bigint"),
        )
        .filter(F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("_within_cum", "_prev_cum")
    )
