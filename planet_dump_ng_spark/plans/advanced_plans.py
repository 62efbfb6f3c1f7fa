"""Beyond-the-reference analytics operators: multi-level aggregation
(ROLLUP/CUBE), per-group top-k, as-of join, banded range join, windowed
moving averages, embedding centroids, and document quality scoring —
each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from planet_dump_ng_spark.operators import temporal, text as tx
from planet_dump_ng_spark.plans.registry import register, table
from planet_dump_ng_spark.plans.relational import DSUM_SQL, dsum


@register(
    "rollup_revenue",
    f"""
    SELECT COALESCE(n.n_name, '<all>') AS nation,
           COALESCE(c.c_mktsegment, '<all>') AS segment,
           CAST(GROUPING(n.n_name) * 2 + GROUPING(c.c_mktsegment) AS INT)
             AS grouping_id,
           {DSUM_SQL.format(x='o.o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
    doc="Hierarchical ROLLUP totals; GROUPING() bits disambiguate NULL "
    "group keys from subtotal rows on both engines.",
    tags=("agg", "rollup", "bench"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    return (
        j.rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping_id("n_name", "c_mktsegment").cast("int").alias("grouping_id"),
            dsum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("segment"),
            "grouping_id",
            "revenue",
            "n_orders",
        )
    )


@register(
    "cube_event_matrix",
    """
    SELECT COALESCE(event_type, '<all>') AS etype,
           COALESCE(CAST(user_id % 10 AS BIGINT), -1) AS user_bucket,
           CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 10) AS INT)
             AS grouping_id,
           COUNT(*) AS n
    FROM events
    GROUP BY CUBE (event_type, user_id % 10)
    """,
    doc="Full CUBE over two dimensions with bucketed keys.",
    tags=("agg", "cube"),
)
def cube_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "user_bucket_raw", F.col("user_id") % 10
    )
    return (
        ev.cube("event_type", "user_bucket_raw")
        .agg(
            F.grouping_id("event_type", "user_bucket_raw")
            .cast("int")
            .alias("grouping_id"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("etype"),
            F.coalesce("user_bucket_raw", F.lit(-1)).alias("user_bucket"),
            "grouping_id",
            "n",
        )
    )


@register(
    "topk_lines_per_order",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber ASC)
               AS rnk
      FROM lineitem
    ) WHERE rnk <= 2
    """,
    doc="Per-group top-k via rank window with deterministic tiebreak; at "
    "scale this is one shuffle on the group key (no global sort).",
    tags=("window", "topk", "bench"),
)
def topk_lines_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rnk")
    )


@register(
    "asof_last_click",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id,
             CASE WHEN event_type = 'click' THEN ts END AS c_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id, ts, last_click_id, last_click_ts FROM (
      SELECT event_id, user_id, ts, event_type,
             last_value(c_id IGNORE NULLS) OVER w AS last_click_id,
             last_value(c_ts IGNORE NULLS) OVER w AS last_click_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts,
                   CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
                   ROWS UNBOUNDED PRECEDING)
    ) WHERE event_type = 'purchase'
    """,
    doc="As-of join (purchase -> latest click at-or-before, per user) via "
    "the union+last_value carry — one shuffle, no join explosion "
    "(operators.temporal.asof_join_union).",
    tags=("join", "asof", "bench"),
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("event_id")
    )
    return temporal.asof_join_union(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload={"event_id": "last_click_id", "ts": "last_click_ts"},
    )


@register(
    "range_join_price_band",
    """
    SELECT p.p_partkey, COUNT(l.l_orderkey) AS n_in_band
    FROM part p
    LEFT JOIN lineitem l
      ON l.l_extendedprice BETWEEN p.p_retailprice * 0.9
                               AND p.p_retailprice * 1.1
    GROUP BY p.p_partkey
    """,
    doc="Banded range join: quantize the interval into fixed bands, "
    "explode the bounded side, equi-join on band id, exact filter "
    "(operators.temporal.banded_range_join) — a theta join Catalyst "
    "would otherwise nested-loop.",
    tags=("join", "range"),
)
def range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    joined = temporal.banded_range_join(
        li,
        part,
        left_val="l_extendedprice",
        right_lo=F.col("p_retailprice") * 0.9,
        right_hi=F.col("p_retailprice") * 1.1,
        band_width=100.0,
    )
    counts = joined.groupBy("p_partkey").agg(
        F.count("l_orderkey").alias("n_in_band")
    )
    # LEFT semantics: parts with zero matches still appear
    return (
        part.select("p_partkey")
        .join(counts, "p_partkey", "left")
        .select(
            "p_partkey", F.coalesce("n_in_band", F.lit(0)).alias("n_in_band")
        )
    )


@register(
    "hourly_moving_average",
    f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             {DSUM_SQL.format(x='value')} AS hour_value
      FROM events GROUP BY hour, event_type
    )
    SELECT hour, event_type, hour_value,
           CAST(SUM(CAST(hour_value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS ma4
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="Sliding frame (4-hour moving average) over a pre-aggregated "
    "rollup; decimal-exact numerator keeps engines bit-identical.",
    tags=("window", "streaming", "bench"),
)
def hourly_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(dsum("value", "hour_value"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-3, W.currentRow)
    )
    return hourly.select(
        "hour",
        "event_type",
        "hour_value",
        (
            F.sum(F.col("hour_value").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma4"),
    )


@register(
    "embedding_centroids",
    """
    SELECT label, CAST(pos AS INT) AS pos,
           CAST(SUM(CAST(trunc(CAST(val AS DOUBLE) * 1e12) AS BIGINT)) AS DOUBLE)
             / 1e12 / COUNT(*) AS centroid
    FROM (
      SELECT label, UNNEST(embedding) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    """,
    doc="Per-label centroid (elementwise mean): posexplode + exact integer "
    "mean of 1e-12-truncated values per (label, dim) — the IVF "
    "coarse-quantizer building block.  Truncation (not rounding) because "
    "float32 expansions always end in digit 5, so ANY rounding scale has "
    "tie values where engines' HALF_UP vs HALF_EVEN disagree; truncation "
    "of the exactly-rounded double product is tie-free and "
    "engine-identical.",
    tags=("similarity", "agg", "bench"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    )
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        # double multiply is exact-rounded IEEE (identical both engines);
        # cast double->long truncates toward zero = DuckDB trunc(); the
        # long sum (< 2^53) converts back to double exactly.
        .agg(
            (
                F.sum((F.col("val").cast("double") * 1e12).cast("long"))
                .cast("double")
                / F.lit(1e12)
                / F.count(F.lit(1))
            ).alias("centroid")
        )
    )


@register(
    "doc_quality_score",
    f"""
    WITH feats AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS n_tokens,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio
      FROM documents
    )
    SELECT doc_id, lang, n_tokens, punct_ratio,
           CASE WHEN n_tokens BETWEEN 5 AND 1000
                 AND punct_ratio < 0.1 THEN 'keep'
                WHEN n_tokens < 5 THEN 'too_short'
                ELSE 'too_noisy' END AS verdict
    FROM feats
    """,
    doc="Quality-filter verdict per document (the keep/drop decision of a "
    "training-data pipeline), derived from map-only features.",
    tags=("text", "filter"),
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        "lang",
        tx.token_count("text").alias("n_tokens"),
        (
            F.size(F.regexp_extract_all("text", F.lit(tx.PUNCT_RE), 0)).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
    )
    verdict = (
        F.when(
            F.col("n_tokens").between(5, 1000) & (F.col("punct_ratio") < 0.1),
            "keep",
        )
        .when(F.col("n_tokens") < 5, "too_short")
        .otherwise("too_noisy")
    )
    return feats.select(
        "doc_id", "lang", "n_tokens", "punct_ratio", verdict.alias("verdict")
    )


@register(
    "quality_percentile_filter",
    f"""
    WITH feats AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS n_tokens
      FROM documents
    ),
    th AS (SELECT source,
                  percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens)
                    AS p25_tokens
           FROM feats GROUP BY source)
    SELECT f.doc_id, f.source, f.n_tokens, t.p25_tokens
    FROM feats f JOIN th t USING (source)
    WHERE f.n_tokens >= t.p25_tokens
    """,
    doc="Adaptive per-source quality gate: keep documents at or above "
    "their OWN source's 25th-percentile token count — the "
    "distribution-aware variant of a fixed length gate (a fixed "
    "threshold over-prunes terse sources and under-prunes verbose "
    "ones).  percentile_disc on integer counts is discrete and "
    "engine-exact (no interpolation).  Plan: map-only features, one "
    "per-source aggregate (source cardinality is tiny), broadcast the "
    "threshold table back — the fact table shuffles zero times.",
    tags=("text", "filter", "sampling"),
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id", "source", tx.token_count("text").alias("n_tokens")
    )
    th = feats.groupBy("source").agg(
        # Spark's percentile_disc returns DOUBLE even over ints; the
        # discrete value IS an input int, so the bigint cast is exact
        # (and matches DuckDB's integer return type class)
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens)")
        .cast("bigint")
        .alias("p25_tokens")
    )
    return (
        feats.join(F.broadcast(th), "source")
        .filter(F.col("n_tokens") >= F.col("p25_tokens"))
        .select("doc_id", "source", "n_tokens", "p25_tokens")
    )


@register(
    "forward_fill_values",
    """
    SELECT event_id, user_id,
      last_value(CASE WHEN event_id % 5 <> 0 THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS filled_value
    FROM events
    """,
    doc="Forward fill (operators.temporal.forward_fill): every 5th "
    "event's value is masked NULL, then carried forward per user in "
    "(ts, event_id) order — the gap-fill primitive, one partitioned "
    "window shuffle; values pass through bit-identically.",
    tags=("window", "temporal"),
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("value"),
    )
    filled = temporal.forward_fill(
        ev, ["user_id"], ["ts", "event_id"], ["value"]
    )
    return filled.select(
        "event_id", "user_id", F.col("value").alias("filled_value")
    )


@register(
    "event_funnel",
    """
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
               FROM events),
    v AS (SELECT user_id, min(ts) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2
          FROM e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT v.user_id, v.t1, c.t2, p.t3,
      1 + (c.t2 IS NOT NULL)::INT + (p.t3 IS NOT NULL)::INT AS funnel_depth
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    doc="Ordered funnel view->click->purchase "
    "(operators.temporal.funnel): earliest strictly-increasing chain "
    "per user via per-step filtered min-aggregates joined to the "
    "previous frontier — each stage shuffles only its own step's "
    "events, never the full history.",
    tags=("temporal",),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return temporal.funnel(ev, ["view", "click", "purchase"])


@register(
    "scd2_user_bands",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                      CAST(floor(value / 100) AS BIGINT) AS band
               FROM events),
    w1 AS (SELECT *,
             lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_band,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
           FROM e),
    starts AS (SELECT user_id, ts, event_id, band FROM w1
               WHERE rn = 1 OR band IS DISTINCT FROM prev_band),
    iv AS (SELECT user_id, band, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
           FROM starts)
    SELECT user_id, band, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM iv
    """,
    doc="SCD-type-2 interval builder (operators.temporal.scd2_intervals): "
    "a change-event stream becomes validity intervals with unchanged-run "
    "suppression — lag for change detection, lead for interval close, "
    "two partitioned windows and zero self-joins.",
    tags=("temporal", "scd"),
)
def scd2_user_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 100).cast("bigint").alias("band"),
    )
    iv = temporal.scd2_intervals(ev, ["user_id"], ["ts", "event_id"], ["band"])
    return iv.select("user_id", "band", "valid_from", "valid_to", "is_current")


@register(
    "merge_upsert_orders",
    """
    WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    upd AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 14 = 0 THEN o_totalprice
                  ELSE o_totalprice + 1.0 END AS o_totalprice,
             'U' AS o_orderstatus
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_totalprice, 'N'
      FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NULL THEN 'unchanged'
                WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN u.o_totalprice IS DISTINCT FROM b.o_totalprice
                     OR u.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                  THEN 'update'
                ELSE 'unchanged' END AS merge_action
    FROM base b FULL OUTER JOIN upd u USING (o_orderkey)
    """,
    doc="MERGE INTO semantics (operators.temporal.merge_upsert): "
    "full-outer join + conditional projection labels every row insert/"
    "update/unchanged — the CDC upsert primitive, one key shuffle (zero "
    "with bucketed tables); the update set is derived deterministically "
    "so the oracle replays it.",
    tags=("join", "cdc"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
    upd = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 14 == 0, F.col("o_totalprice")
            )
            .otherwise(F.col("o_totalprice") + 1.0)
            .alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                "o_totalprice",
                F.lit("N").alias("o_orderstatus"),
            )
        )
    )
    return temporal.merge_upsert(
        base, upd, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    )


def _curriculum_oracle() -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    WITH feats AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS n_tokens
      FROM documents
    ),
    cuts AS (SELECT
        percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens) AS q1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY n_tokens) AS q2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tokens) AS q3
      FROM feats),
    tiered AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= q1 THEN 1 WHEN n_tokens <= q2 THEN 2
                  WHEN n_tokens <= q3 THEN 3 ELSE 4 END AS tier,
             {h} AS shuffle_key
      FROM feats, cuts)
    SELECT doc_id, n_tokens, CAST(tier AS INT) AS tier,
           CAST(ROW_NUMBER() OVER (PARTITION BY tier
                ORDER BY shuffle_key, doc_id) AS BIGINT) AS seq
    FROM tiered
    """


@register(
    "curriculum_order",
    _curriculum_oracle(),
    doc="Curriculum training order: docs tiered by corpus-wide token-"
    "count quartile (short/easy first), deterministically shuffled "
    "WITHIN each tier by xxhash64(doc_id) — the epoch ordering a "
    "curriculum-learning trainer consumes (tier ASC, seq ASC).  "
    "Quartile cuts are one 1-row percentile_disc aggregate broadcast "
    "back (never a global ntile window); the shuffle rank partitions "
    "by tier so no single task sees the whole corpus; reproducible "
    "run-to-run because the shuffle key is content-derived, not "
    "rand().  Oracle replays the xxhash64 shuffle keys bit-for-bit.",
    tags=("sampling", "text"),
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    feats = docs.select("doc_id", tx.token_count("text").alias("n_tokens"))
    cuts = feats.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_tokens)"
            ).alias(f"q{i}")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    tier = (
        F.when(F.col("n_tokens") <= F.col("q1"), 1)
        .when(F.col("n_tokens") <= F.col("q2"), 2)
        .when(F.col("n_tokens") <= F.col("q3"), 3)
        .otherwise(4)
        .cast("int")
    )
    tiered = feats.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        tier.alias("tier"),
        F.xxhash64("doc_id").alias("shuffle_key"),
    )
    w = W.partitionBy("tier").orderBy("shuffle_key", "doc_id")
    return tiered.select(
        "doc_id",
        "n_tokens",
        "tier",
        F.row_number().over(w).cast("bigint").alias("seq"),
    )
