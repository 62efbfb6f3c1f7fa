"""Sketch queries — HLL / KMV distinct, Bloom join pruning, Count-Min
heavy hitters — each hash-exact against a DuckDB oracle that replays the
sketch bit-for-bit through the xxhash64 replica (plans/duck_xxh64.py).

The estimates themselves are deterministic integers plus exactly one
double division per row (exact integer operands), so the driver's
value-hash compare holds without tolerance knobs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import sketches as sk
from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline
from planet_dump_ng_spark.plans.registry import register, table

_M64 = "18446744073709551616::HUGEINT"


def _unsigned(expr: str, prefix: str) -> str:
    """Unsigned [0, 2^64) HUGEINT of Spark's signed xxhash64(bigint)."""
    h = xxh64_long_inline(expr, prefix=prefix)
    return f"((CAST({h} AS HUGEINT) % {_M64} + {_M64}) % {_M64})"


def _hll_oracle(p: int = 8) -> str:
    m = 1 << p
    wbits = 64 - p
    wmod = 1 << wbits
    scale = sk.hll_alpha(m) * m * m * float(2**62)
    return f"""
    WITH h AS (SELECT l_returnflag, {_unsigned('l_orderkey', 'hl')} AS u
               FROM lineitem),
    r AS (SELECT l_returnflag,
                 CAST(u // {wmod} AS BIGINT) AS j,
                 CAST(u % {wmod} AS BIGINT) AS w FROM h),
    regs AS (SELECT l_returnflag, j,
                    MAX(CASE WHEN w = 0 THEN {wbits + 1}
                        ELSE {wbits + 1} - length(bin(w)) END) AS rho
             FROM r GROUP BY l_returnflag, j),
    agg AS (SELECT l_returnflag,
                   SUM(CAST(1::BIGINT << (62 - rho) AS HUGEINT)) AS s_present,
                   COUNT(*) AS hll_registers
            FROM regs GROUP BY l_returnflag),
    ex AS (SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_distinct
           FROM lineitem GROUP BY l_returnflag)
    SELECT a.l_returnflag, a.hll_registers,
           {scale!r} / CAST(a.s_present
             + ({m} - a.hll_registers) * CAST(1::BIGINT << 62 AS HUGEINT)
             AS DOUBLE) AS hll_estimate,
           ex.exact_distinct
    FROM agg a JOIN ex USING (l_returnflag)
    """


@register(
    "hll_distinct_orders",
    _hll_oracle(),
    doc="HyperLogLog(p=8) distinct orders per return flag beside the exact "
    "count; integer register math keeps the estimate hash-exact.",
    tags=("sketch", "agg", "bench"),
)
def hll_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sk.hll_distinct(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_orderkey", p=8
    )


def _kmv_oracle(k: int = 64) -> str:
    num = float(k - 1) * float(2**64)
    return f"""
    WITH h AS (SELECT DISTINCT l_returnflag,
                      {_unsigned('l_partkey', 'kv')} AS u FROM lineitem),
    r AS (SELECT l_returnflag, u,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY u) AS rn
          FROM h),
    t AS (SELECT l_returnflag, MAX(u) AS kth, COUNT(*) AS n_seen
          FROM r WHERE rn <= {k} GROUP BY l_returnflag),
    ex AS (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
           FROM lineitem GROUP BY l_returnflag)
    SELECT t.l_returnflag,
           CAST(t.kth AS DOUBLE) AS kth_hash,
           CASE WHEN t.n_seen < {k} THEN CAST(t.n_seen AS DOUBLE)
                ELSE {num!r} / CAST(t.kth AS DOUBLE) END AS kmv_estimate,
           ex.exact_distinct
    FROM t JOIN ex USING (l_returnflag)
    """


@register(
    "kmv_distinct_parts",
    _kmv_oracle(),
    doc="K-Minimum-Values(k=64) distinct parts per return flag beside the "
    "exact count; kth-smallest unsigned hash drives the estimator.",
    tags=("sketch", "window"),
)
def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sk.kmv_distinct(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_partkey", k=64
    )


def _kmv_overlap_oracle(k: int = 64) -> str:
    """KMV set-algebra replica: k-min sketches of the 1994 and 1995 part
    assortments, merged union sketch, Beyer et al. intersection via the
    matched fraction rho — beside the exact values."""
    num = float(k - 1) * float(2**64)
    return f"""
    WITH a AS (SELECT DISTINCT {_unsigned('l_partkey', 'ka')} AS u
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
                 AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'),
    b AS (SELECT DISTINCT {_unsigned('l_partkey', 'kb')} AS u
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'),
    ka AS (SELECT u FROM a ORDER BY u LIMIT {k}),
    kb AS (SELECT u FROM b ORDER BY u LIMIT {k}),
    ku AS (SELECT u FROM (SELECT u FROM ka UNION SELECT u FROM kb)
           ORDER BY u LIMIT {k}),
    us AS (SELECT MAX(u) AS kth, COUNT(*) AS n_u FROM ku),
    rho AS (SELECT COUNT(*) AS r FROM ku
            WHERE u IN (SELECT u FROM ka) AND u IN (SELECT u FROM kb)),
    pa AS (SELECT DISTINCT l_partkey FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'),
    pb AS (SELECT DISTINCT l_partkey FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'),
    ex AS (SELECT (SELECT COUNT(*) FROM pa) AS na,
                  (SELECT COUNT(*) FROM pb) AS nb,
                  (SELECT COUNT(*) FROM pa JOIN pb USING (l_partkey)) AS ni)
    SELECT CASE WHEN us.n_u < {k} THEN CAST(us.n_u AS DOUBLE)
                ELSE {num!r} / CAST(us.kth AS DOUBLE) END AS union_est,
           CAST(rho.r AS DOUBLE) / CAST(us.n_u AS DOUBLE)
             * (CASE WHEN us.n_u < {k} THEN CAST(us.n_u AS DOUBLE)
                     ELSE {num!r} / CAST(us.kth AS DOUBLE) END) AS inter_est,
           CAST(rho.r AS DOUBLE) / CAST(us.n_u AS DOUBLE) AS jaccard_est,
           ex.na + ex.nb - ex.ni AS exact_union,
           ex.ni AS exact_inter
    FROM us, rho, ex
    """


@register(
    "kmv_set_overlap",
    _kmv_overlap_oracle(),
    doc="KMV sketch set algebra (Beyer et al.): estimate the union, "
    "intersection, and Jaccard of the 1994-vs-1995 part assortments "
    "from two mergeable k=64 sketches — the cross-partition overlap "
    "question a 100 TB store answers WITHOUT a distinct-join, because "
    "k-min sketches are tiny, mergeable summaries each partition "
    "maintains independently (union sketch = k smallest of the merged "
    "sketches; intersection = matched fraction rho of the union sketch "
    "times the union estimate).  Exact values computed beside for "
    "error visibility.  All sketch frames are k rows; the only full "
    "scans are the two filtered distincts.",
    tags=("sketch",),
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 64
    li = table(spark, sf_dir, "lineitem")

    def year(y: int):
        return (
            (F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        )

    def uhash(col: str):
        h = F.xxhash64(F.col(col))
        return (
            h.cast("decimal(20,0)")
            + F.when(
                h < 0, F.expr("CAST(18446744073709551616 AS DECIMAL(20,0))")
            ).otherwise(F.expr("CAST(0 AS DECIMAL(20,0))"))
        ).alias("u")

    ha = li.filter(year(1994)).select(uhash("l_partkey")).distinct()
    hb = li.filter(year(1995)).select(uhash("l_partkey")).distinct()
    ka = ha.orderBy("u").limit(k).persist()
    kb = hb.orderBy("u").limit(k).persist()
    ku = ka.union(kb).distinct().orderBy("u").limit(k).persist()
    us = ku.agg(F.max("u").alias("kth"), F.count(F.lit(1)).alias("n_u"))
    rho = (
        ku.join(ka, "u", "left_semi")
        .join(kb, "u", "left_semi")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    pa = li.filter(year(1994)).select("l_partkey").distinct()
    pb = li.filter(year(1995)).select("l_partkey").distinct()
    ex = (
        pa.agg(F.count(F.lit(1)).alias("na"))
        .crossJoin(pb.agg(F.count(F.lit(1)).alias("nb")))
        .crossJoin(pa.join(pb, "l_partkey").agg(F.count(F.lit(1)).alias("ni")))
    )
    num = float(k - 1) * float(2**64)
    union_est = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(F.lit(num) / F.col("kth").cast("double"))
    # Beyer et al.: the matched fraction rho divides by the UNION SKETCH
    # SIZE min(k, n_u) = n_u, not by k — dividing by k understates
    # jaccard/intersection whenever the union has fewer than k distinct
    # hashes (small assortments).
    jac = F.col("r").cast("double") / F.col("n_u").cast("double")
    out = (
        us.crossJoin(rho)
        .crossJoin(ex)
        .select(
            union_est.alias("union_est"),
            (jac * union_est).alias("inter_est"),
            jac.alias("jaccard_est"),
            (F.col("na") + F.col("nb") - F.col("ni")).alias("exact_union"),
            F.col("ni").alias("exact_inter"),
        )
        .persist()
    )
    out.count()  # materialize the 1-row result, then release the sketches
    for c in (ka, kb, ku):
        c.unpersist(blocking=True)
    return out


def _km_pos_sql(i: int, m_bits: int) -> str:
    """Kirsch-Mitzenmacher position i from (lo, hi) columns."""
    return f"(lo + {i} * hi) % {m_bits}"


def _bloom_oracle(m_bits: int = 65536, k: int = 3, cutoff: float = 400000.0) -> str:
    b_pos = ", ".join(_km_pos_sql(i, m_bits) for i in range(k))
    return f"""
    WITH bk AS (SELECT DISTINCT o_orderkey AS key FROM orders
                WHERE o_totalprice > {cutoff}),
    bu AS (SELECT key, {_unsigned('key', 'bb')} AS u FROM bk),
    bs AS (SELECT key, CAST(u % 4294967296 AS BIGINT) AS lo,
                  CAST(u // 4294967296 AS BIGINT) | 1 AS hi FROM bu),
    bits AS (SELECT DISTINCT pos
             FROM (SELECT unnest([{b_pos}]) AS pos FROM bs) q),
    pk AS (SELECT DISTINCT l_returnflag, l_orderkey AS pkey FROM lineitem),
    pu AS (SELECT l_returnflag, pkey, {_unsigned('pkey', 'bp')} AS u FROM pk),
    ps AS (SELECT l_returnflag, pkey, CAST(u % 4294967296 AS BIGINT) AS lo,
                  CAST(u // 4294967296 AS BIGINT) | 1 AS hi FROM pu),
    pp AS (SELECT l_returnflag, pkey, unnest([{b_pos}]) AS pos FROM ps),
    hits AS (SELECT l_returnflag, pkey, COUNT(*) AS n_hit
             FROM pp JOIN bits USING (pos) GROUP BY l_returnflag, pkey),
    passed AS (SELECT l_returnflag, pkey FROM hits WHERE n_hit = {k})
    SELECT p.l_returnflag,
           COUNT(*) AS n_bloom_pass,
           CAST(SUM(CASE WHEN b.key IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_true_match,
           CAST(SUM(CASE WHEN b.key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos
    FROM passed p LEFT JOIN bk b ON p.pkey = b.key
    GROUP BY p.l_returnflag
    """


@register(
    "bloom_join_prune",
    _bloom_oracle(),
    doc="Bloom-filter runtime join pruning (m=65536 bits, k=3): lineitem "
    "keys probed against high-value orders; reports pass/true/false-"
    "positive counts per return flag — never a false negative.",
    tags=("sketch", "join", "bench"),
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    probe = table(spark, sf_dir, "lineitem")
    build = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return sk.bloom_prune_join(
        probe, build, "l_orderkey", "o_orderkey", "l_returnflag",
        m_bits=65536, k=3,
    )


def _cms_oracle(w: int = 256, d: int = 3, topk: int = 20) -> str:
    return f"""
    WITH c AS (SELECT l_partkey AS key, COUNT(*) AS exact_count
               FROM lineitem GROUP BY l_partkey),
    u AS (SELECT key, exact_count, {_unsigned('key', 'cm')} AS uu FROM c),
    kp AS (SELECT key, exact_count,
                  CAST(uu % 4294967296 AS BIGINT) AS lo,
                  CAST(uu // 4294967296 AS BIGINT) | 1 AS hi FROM u),
    pos AS (SELECT key, exact_count, ii.i, (lo + ii.i * hi) % {w} AS pos
            FROM kp, (SELECT unnest(range(0, {d})) AS i) ii),
    cms AS (SELECT i, pos, CAST(SUM(exact_count) AS BIGINT) AS bucket_total
            FROM pos GROUP BY i, pos),
    est AS (SELECT p.key, p.exact_count, MIN(m.bucket_total) AS est_count
            FROM pos p JOIN cms m USING (i, pos) GROUP BY p.key, p.exact_count)
    SELECT key, est_count, exact_count FROM est
    ORDER BY est_count DESC, key ASC LIMIT {topk}
    """


@register(
    "cms_heavy_hitters",
    _cms_oracle(),
    doc="Count-Min(d=3, w=256) heavy hitters over lineitem part keys — the "
    "hot-key detector a salting stage consumes; est >= exact always.",
    tags=("sketch", "topk"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sk.cms_heavy_hitters(
        table(spark, sf_dir, "lineitem"), "l_partkey", w=256, d=3, topk=20
    )


def _binned_quantile_oracle(n_bins: int = 256,
                            qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    qlits = ", ".join(f"({q!r})" for q in qs)
    return f"""
    WITH stats AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
                          COUNT(l_extendedprice) AS n FROM lineitem),
    binned AS (SELECT CASE WHEN (hi - lo) / {float(n_bins)!r} = 0 THEN 0
                    ELSE LEAST(CAST(FLOOR((l_extendedprice - lo)
                                       / ((hi - lo) / {float(n_bins)!r})) AS INT),
                               {n_bins - 1}) END AS bin, lo, hi, n
               FROM lineitem, stats
               WHERE l_extendedprice IS NOT NULL),
    hist AS (SELECT bin, lo, hi, n, COUNT(*) AS c
             FROM binned GROUP BY bin, lo, hi, n),
    cum AS (SELECT h.bin, h.lo, h.hi, h.n, h.c,
                   CAST(SUM(o.c) AS BIGINT) AS cum
            FROM hist h JOIN hist o ON o.bin <= h.bin
            GROUP BY h.bin, h.lo, h.hi, h.n, h.c),
    t AS (SELECT q, CAST(CEIL(q * stats.n) AS BIGINT) AS target
          FROM (VALUES {qlits}) AS qt(q), stats),
    landed AS (SELECT t.q, t.target, MIN(cum.bin) AS bin
               FROM cum JOIN t ON cum.cum >= t.target
               GROUP BY t.q, t.target)
    SELECT l.q, l.target AS target_rank, CAST(l.bin AS INT) AS bin,
           c.lo + ((c.hi - c.lo) / {float(n_bins)!r}) * CAST(l.bin AS DOUBLE)
                + ((c.hi - c.lo) / {float(n_bins)!r})
                  * (CAST(l.target - (c.cum - c.c) AS DOUBLE)
                     / CAST(c.c AS DOUBLE)) AS est
    FROM landed l JOIN cum c ON c.bin = l.bin
    """


@register(
    "binned_quantile_estimate",
    _binned_quantile_oracle(),
    doc="Mergeable histogram quantile sketch "
    "(operators.sketches.binned_quantiles): p50/p90/p99 of "
    "l_extendedprice from a 256-bin equi-width histogram with linear "
    "interpolation in the landing bin.  Partial histograms merge by "
    "adding counts (map-side combinable — the property that makes this "
    "the percentile path at 100 TB where an exact global sort or a "
    "partition-less rank window would funnel one task), and every "
    "post-histogram step runs on the 256-row table: the cumulative sum "
    "is a broadcast self-join, not a global window.  Bin ids and the "
    "interpolation are fixed IEEE op sequences over exact integers, "
    "mirrored in the oracle — bit-identical across engines.",
    tags=("sketch", "agg", "bench"),
)
def binned_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sk.binned_quantiles(
        table(spark, sf_dir, "lineitem"), "l_extendedprice"
    )


def _cms_join_size_oracle(w: int = 256, d: int = 3) -> str:
    def side(table_sql: str, key: str, prefix: str, out: str) -> str:
        rows = " UNION ALL ".join(
            f"SELECT {i} AS i, ({_km_pos_sql(i, w)}) AS pos, c FROM {out}s"
            for i in range(d)
        )
        return f"""
    {out} AS (SELECT {key} AS key, COUNT(*) AS c FROM {table_sql}
              GROUP BY key),
    {out}u AS (SELECT key, c, {_unsigned('key', prefix)} AS u FROM {out}),
    {out}s AS (SELECT c, CAST(u % 4294967296 AS BIGINT) AS lo,
                      CAST(u // 4294967296 AS BIGINT) | 1 AS hi FROM {out}u),
    {out}k AS (SELECT i, pos, CAST(SUM(c) AS BIGINT) AS t
               FROM ({rows}) GROUP BY i, pos)"""

    return f"""
    WITH {side('orders', 'o_orderkey', 'jsa', 'ca')},
    {side('lineitem', 'l_orderkey', 'jsa', 'cb')},
    dots AS (SELECT a.i, CAST(SUM(a.t * b.t) AS BIGINT) AS dot
             FROM cak a JOIN cbk b ON a.i = b.i AND a.pos = b.pos
             GROUP BY a.i),
    est AS (SELECT CAST(MIN(dot) AS BIGINT) AS est_join_size FROM dots),
    ex AS (SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS exact_join_size
           FROM ca JOIN cb USING (key))
    SELECT est.est_join_size, ex.exact_join_size,
           CAST(est.est_join_size - ex.exact_join_size AS DOUBLE)
             / CAST(ex.exact_join_size AS DOUBLE) AS rel_overestimate
    FROM est, ex
    """


@register(
    "cms_join_size_estimate",
    _cms_join_size_oracle(),
    doc="AMS/Count-Min join-size estimation "
    "(operators.sketches.cms_join_size): |orders JOIN lineitem| "
    "predicted from two d x w sketches via the min-over-rows inner "
    "product — the optimizer's 'how big is this join' question answered "
    "WITHOUT executing the join, from mergeable per-partition sketches. "
    "est >= exact always (collisions only add cross terms); the exact "
    "size is computed beside it from the per-key COUNT tables (an "
    "equi-join of key counts, never the row-level join) so the "
    "overestimate is a visible number.  All-integer, xxhash64-replayed.",
    tags=("sketch", "join"),
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sk.cms_join_size(
        table(spark, sf_dir, "orders"),
        "o_orderkey",
        table(spark, sf_dir, "lineitem"),
        "l_orderkey",
    )


def _hll_merge_oracle(p: int = 8) -> str:
    m = 1 << p
    wbits = 64 - p
    wmod = 1 << wbits
    scale = sk.hll_alpha(m) * m * m * float(2**62)
    empty = f"CAST(1::BIGINT << 62 AS HUGEINT)"
    final = (
        "{scale!r} / CAST(a.s_present + ({m} - a.hll_registers) * {empty} "
        "AS DOUBLE)"
    ).format(scale=scale, m=m, empty=empty)
    return f"""
    WITH h AS (SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
                      CAST(ts AS DATE) AS day,
                      {_unsigned('user_id', 'hm')} AS u
               FROM events),
    r AS MATERIALIZED (SELECT week, day,
                 CAST(u // {wmod} AS BIGINT) AS j,
                 CAST(u % {wmod} AS BIGINT) AS w FROM h),
    daily AS (SELECT week, day, j,
                     MAX(CASE WHEN w = 0 THEN {wbits + 1}
                         ELSE {wbits + 1} - length(bin(w)) END) AS rho
              FROM r GROUP BY week, day, j),
    merged AS (SELECT week, j, MAX(rho) AS rho FROM daily GROUP BY week, j),
    am AS (SELECT week,
                  SUM(CAST(1::BIGINT << (62 - rho) AS HUGEINT)) AS s_present,
                  COUNT(*) AS hll_registers
           FROM merged GROUP BY week),
    direct AS (SELECT week, j,
                      MAX(CASE WHEN w = 0 THEN {wbits + 1}
                          ELSE {wbits + 1} - length(bin(w)) END) AS rho
               FROM r GROUP BY week, j),
    ad AS (SELECT week,
                  SUM(CAST(1::BIGINT << (62 - rho) AS HUGEINT)) AS s_present,
                  COUNT(*) AS hll_registers
           FROM direct GROUP BY week),
    ex AS (SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
                  COUNT(DISTINCT user_id) AS exact_distinct
           FROM events GROUP BY week)
    SELECT am.week, am.hll_registers,
           {final.replace('a.', 'am.')} AS est_merged,
           {final.replace('a.', 'ad.')} AS est_direct,
           {final.replace('a.', 'am.')} = {final.replace('a.', 'ad.')}
             AS merge_equals_direct,
           ex.exact_distinct
    FROM am JOIN ad USING (week) JOIN ex USING (week)
    """


@register(
    "hll_merge_weekly",
    _hll_merge_oracle(),
    doc="Sketch mergeability proof on the clock dimension: daily HLL(p=8) "
    "register tables (operators.sketches.hll_registers — the partial-"
    "aggregate state a 100 TB pipeline would persist per ingest day) "
    "roll up to weekly distinct-user estimates with a plain MAX(rho) "
    "re-aggregation, NEVER re-reading raw events; the same finalize run "
    "directly on the raw week (est_direct) lands on the bit-identical "
    "double, pinned per-row as merge_equals_direct.  This is the "
    "incremental_event_rollup story applied to a fixed-size sketch: "
    "O(days * m) persisted state replaces a week-scale distinct shuffle.",
    tags=("sketch", "agg", "incremental"),
)
def hll_merge_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    daily = sk.hll_registers(e, ["week", "day"], "user_id", p=8)
    merged = daily.groupBy("week", "j").agg(F.max("rho").alias("rho"))
    est_m = sk.hll_estimate_from_registers(
        merged, ["week"], p=8, out_col="est_merged"
    )
    est_d = sk.hll_estimate_from_registers(
        sk.hll_registers(e, ["week"], "user_id", p=8),
        ["week"],
        p=8,
        out_col="est_direct",
    ).select("week", "est_direct")
    exact = e.groupBy("week").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        est_m.join(est_d, "week")
        .join(exact, "week")
        .select(
            "week",
            "hll_registers",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias(
                "merge_equals_direct"
            ),
            "exact_distinct",
        )
    )
