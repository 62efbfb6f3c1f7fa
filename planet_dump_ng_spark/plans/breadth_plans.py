"""Relational breadth: full outer joins, set operations, rank-family
windows, JSON extraction, and the scalar-function matrix — closing the
remaining SQL-surface gaps, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from planet_dump_ng_spark.plans.registry import QUERIES, register, table


@register(
    "full_outer_activity",
    """
    WITH oc AS (SELECT o_custkey AS id, COUNT(*) AS n_orders
                FROM orders GROUP BY o_custkey),
         ec AS (SELECT user_id AS id, COUNT(*) AS n_events
                FROM events GROUP BY user_id)
    SELECT COALESCE(oc.id, ec.id) AS id,
           COALESCE(oc.n_orders, 0) AS n_orders,
           COALESCE(ec.n_events, 0) AS n_events
    FROM oc FULL OUTER JOIN ec ON oc.id = ec.id
    """,
    doc="Full outer join reconciling two aggregates with partial key overlap.",
    tags=("join", "outer"),
)
def full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    oc = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ec = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        oc.join(ec, "id", "full_outer")
        .select(
            "id",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "key_set_ops",
    """
    WITH ok AS (SELECT DISTINCT o_custkey AS id FROM orders),
         ek AS (SELECT DISTINCT user_id AS id FROM events)
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT id FROM ok INTERSECT SELECT id FROM ek)
    UNION ALL
    SELECT 'orders_only' AS op, COUNT(*) AS n FROM (SELECT id FROM ok EXCEPT SELECT id FROM ek)
    UNION ALL
    SELECT 'events_only' AS op, COUNT(*) AS n FROM (SELECT id FROM ek EXCEPT SELECT id FROM ok)
    UNION ALL
    SELECT 'union_distinct' AS op, COUNT(*) AS n FROM (SELECT id FROM ok UNION SELECT id FROM ek)
    """,
    doc="Set operations (INTERSECT / EXCEPT / UNION DISTINCT) over key sets.",
    tags=("setop",),
)
def key_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ok = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("id")
    ).distinct()
    ek = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("id")
    ).distinct()

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        one("intersect", ok.intersect(ek))
        .unionByName(one("orders_only", ok.subtract(ek)))
        .unionByName(one("events_only", ek.subtract(ok)))
        .unionByName(one("union_distinct", ok.union(ek).distinct()))
    )


@register(
    "event_value_ranks",
    """
    SELECT event_id, event_type, value,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd,
           CAST(NTILE(10) OVER w AS INT) AS decile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    doc="Rank-family windows (percent_rank / cume_dist / ntile) under a "
    "total order — tie-free, so the int-ratio outputs are engine-exact.",
    tags=("window",),
)
def event_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


@register(
    "json_props_rollup",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS k_sum,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
           COUNT(*) FILTER (CAST(json_extract_string(props, '$.k') AS INT) >= 50)
             AS k_hi
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured extraction: JSON field -> typed column -> "
    "aggregate (get_json_object vs DuckDB json_extract_string).",
    tags=("json", "agg"),
)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("k_sum"),
        F.max(k).alias("k_max"),
        F.count(F.when(k >= 50, 1)).alias("k_hi"),
    )


@register(
    "scalar_function_matrix",
    """
    SELECT o_orderkey,
           upper(o_orderpriority) AS up,
           lower(o_orderstatus) AS lo,
           substr(o_orderpriority, 1, 1) AS pri_code,
           replace(o_orderpriority, '-', '_') AS pri_norm,
           length(o_orderpriority) AS pri_len,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS padded,
           concat(o_orderstatus, ':', o_orderpriority) AS tagged,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INT) AS days_since,
           CAST(round(CAST(o_totalprice AS DECIMAL(38,6)), 2) AS DOUBLE) AS price2,
           CAST(floor(o_totalprice) AS BIGINT) AS pfloor,
           CAST(ceil(o_totalprice) AS BIGINT) AS pceil,
           abs(o_totalprice - 1000.0) AS pdist,
           CASE WHEN o_totalprice > 1000 THEN 'hi' ELSE 'lo' END AS bucket
    FROM orders
    """,
    doc="Scalar-function matrix: string / date / numeric builtins that are "
    "bit-stable across engines (no libm-dependent functions).",
    tags=("scalar",),
)
def scalar_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("up"),
        F.lower("o_orderstatus").alias("lo"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.regexp_replace("o_orderpriority", "-", "_").alias("pri_norm"),
        F.length("o_orderpriority").alias("pri_len"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("padded"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority").alias("tagged"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since"),
        # round() over DOUBLE is not bit-identical across engines (Spark
        # HALF_UP vs DuckDB's double rounding); quantize to exact decimal
        # first so the tie-break arithmetic is identical on both sides.
        F.round(F.col("o_totalprice").cast("decimal(38,6)"), 2)
        .cast("double")
        .alias("price2"),
        F.floor("o_totalprice").alias("pfloor"),
        F.ceil("o_totalprice").alias("pceil"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("pdist"),
        F.when(F.col("o_totalprice") > 1000, "hi").otherwise("lo").alias("bucket"),
    )


@register(
    "global_top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
    doc="Global ORDER BY + LIMIT with total-order tiebreak: Spark plans "
    "TakeOrderedAndProject (per-partition top-k + driver merge), never a "
    "full sort.",
    tags=("sort", "topk"),
)
def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(50)
    )


@register(
    "event_attribution_salted",
    """
    SELECT e.event_id,
           CASE WHEN c.c_custkey IS NOT NULL THEN e.user_id END AS uid,
           c.c_name AS display_name
    FROM events e
    LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0) c
      ON e.user_id = c.c_custkey
    """,
    doc="The attribution join executed through operators.skew.salted_join "
    "(hot-key sharding, dimension replicated per salt) — same oracle as "
    "the broadcast form proves the strategy is result-identical.",
    tags=("join", "skew"),
)
def event_attribution_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events")
    pub = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_name")
    )
    joined = salted_join(ev, pub, "user_id", "c_custkey", n_salts=8, how="left")
    return joined.select(
        "event_id",
        F.when(F.col("c_custkey").isNotNull(), F.col("user_id")).alias("uid"),
        F.col("c_name").alias("display_name"),
    )


@register(
    "xml_render_documents",
    """
    SELECT doc_id,
           concat(' <doc id="', CAST(doc_id AS VARCHAR),
                  '" lang="', lang, '" source="', source, '"><text>',
                  regexp_replace(
                    replace(replace(replace(text, '&', '&amp;'),
                            '<', '&lt;'), '>', '&gt;'),
                    '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '?', 'g'),
                  '</text></doc>') AS xml
    FROM documents
    """,
    doc="XML fragment rendering through the REAL sink functions "
    "(sinks.xml_sink.xml_escape: entity escape + control-char scrub, "
    "F8/C10) proved against a SQL replica — the sink's scalar surface "
    "enters the oracle gate, not just the golden tests.",
    tags=("scalar", "sink"),
)
def xml_render_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.sinks.xml_sink import xml_escape

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit(' <doc id="'),
            F.col("doc_id").cast("string"),
            F.lit('" lang="'),
            F.col("lang"),
            F.lit('" source="'),
            F.col("source"),
            F.lit('"><text>'),
            xml_escape(F.col("text"), quote=False),
            F.lit("</text></doc>"),
        ).alias("xml"),
    )


@register(
    "event_gap_stats",
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           MAX(gap_us) AS max_gap_us,
           MIN(gap_us) AS min_gap_us
    FROM gaps GROUP BY user_id
    """,
    doc="Inter-event gap statistics per user (lag window at microsecond "
    "precision, exact integer aggregates).",
    tags=("window", "agg"),
)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("total_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
    )


@register(
    "deterministic_sample",
    """
    SELECT event_type, COUNT(*) AS n_sampled,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
          / 4294967296.0 < 0.1
    GROUP BY event_type
    """,
    doc="Reproducible 10% sample by content hash (operators.sampling): "
    "stable across runs, partitionings, and engines — unlike RNG-seeded "
    "df.sample().  Membership is per-key, so incremental re-runs keep "
    "old rows' assignment.",
    tags=("sampling", "agg"),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import hash_sample

    ev = table(spark, sf_dir, "events")
    return (
        hash_sample(ev, "event_id", 0.1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "exact_group_medians",
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, value AS lower_median
    FROM ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    """,
    doc="Exact lower median per group: rank under a total order and pick "
    "the ceil(n/2)-th row — no interpolation, hence engine-exact (unlike "
    "percentile_cont whose float interpolation can differ).",
    tags=("window", "agg"),
)
def exact_group_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    wn = W.partitionBy("event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint"))
        .select("event_type", F.col("value").alias("lower_median"))
    )


def _dataset_split_oracle() -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    SELECT doc_id, source, bucket,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, source, (({h}) % 10000 + 10000) % 10000 AS bucket
          FROM documents)
    """


@register(
    "dataset_split",
    _dataset_split_oracle(),
    doc="Deterministic 80/10/10 train/val/test assignment on the JVM-side "
    "xxhash64 (operators.sampling.xxhash_split): content-stable buckets, "
    "superset-stable boundaries; oracle replays Spark's hashLong in SQL.",
    tags=("sampling",),
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import xxhash_split

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return xxhash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "source", "bucket", "split")


@register(
    "window_frame_matrix",
    """
    SELECT event_id, event_type, value,
           lag(value, 1, -1.0) OVER w AS prev_v,
           lead(value, 2, -2.0) OVER w AS next2_v,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER (PARTITION BY event_type ORDER BY value, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
           nth_value(value, 3) OVER (PARTITION BY event_type ORDER BY value, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_v,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY event_type ORDER BY value, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll3_sum,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY event_type ORDER BY value, event_id
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS run_sum
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    doc="Frame-clause window matrix: lag/lead with defaults, "
    "first/last/nth_value over explicit full frames, rows-frame rolling "
    "sum and range-frame running sum (decimal-exact, engine-stable).",
    tags=("window",),
)
def window_frame_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    dec = F.col("value").cast("decimal(38,6)")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.lag("value", 1, -1.0).over(w).alias("prev_v"),
        F.lead("value", 2, -2.0).over(w).alias("next2_v"),
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(full).alias("last_v"),
        F.nth_value("value", 3).over(full).alias("third_v"),
        F.sum(dec).over(w.rowsBetween(-2, 0)).cast("double").alias("roll3_sum"),
        F.sum(dec)
        .over(w.rangeBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("run_sum"),
    )


@register(
    "string_function_matrix",
    """
    SELECT doc_id,
           length(source) AS src_len,
           upper(source) AS src_up,
           substr(source, 2, 3) AS src_mid,
           concat_ws('|', source, lang) AS joined,
           lpad(lang, 6, '_') AS lang_pad,
           replace(source, 'a', '@') AS src_repl,
           translate(source, 'aeiou', '12345') AS src_tr,
           split_part(concat_ws('-', source, lang), '-', 2) AS part2,
           reverse(lang) AS lang_rev,
           strpos(source, 'b') AS b_at,
           CAST(levenshtein(source, lang) AS INT) AS lev,
           left(source, 2) AS src_l2,
           right(source, 2) AS src_r2,
           repeat(lang, 2) AS lang2,
           ascii(source) AS src_ascii
    FROM documents
    """,
    doc="Scalar string surface: pad/translate/split_part/levenshtein/... — "
    "the Spark builtins against DuckDB's same-named functions.",
    tags=("scalar",),
)
def string_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    src, lang = F.col("source"), F.col("lang")
    return d.select(
        "doc_id",
        F.length(src).alias("src_len"),
        F.upper(src).alias("src_up"),
        F.substring(src, 2, 3).alias("src_mid"),
        F.concat_ws("|", src, lang).alias("joined"),
        F.lpad(lang, 6, "_").alias("lang_pad"),
        F.replace(src, F.lit("a"), F.lit("@")).alias("src_repl"),
        F.translate(src, "aeiou", "12345").alias("src_tr"),
        F.split_part(F.concat_ws("-", src, lang), F.lit("-"), F.lit(2)).alias(
            "part2"
        ),
        F.reverse(lang).alias("lang_rev"),
        F.instr(src, "b").alias("b_at"),
        F.levenshtein(src, lang).cast("int").alias("lev"),
        F.substring(src, 1, 2).alias("src_l2"),
        src.substr(F.length(src) - 1, F.lit(2)).alias("src_r2"),
        F.repeat(lang, 2).alias("lang2"),
        F.ascii(src).alias("src_ascii"),
    )


@register(
    "stat_moments",
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(event_id % 1000 AS DOUBLE) AS DECIMAL(38,6)))
               AS DOUBLE) AS sy,
             CAST(SUM(CAST(value * CAST(event_id % 1000 AS DOUBLE)
               AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(CAST(event_id % 1000 AS DOUBLE)
               * CAST(event_id % 1000 AS DOUBLE) AS DECIMAL(38,6)))
               AS DOUBLE) AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           sx / n AS mean_v,
           (sxx - sx * sx / n) / (n - 1) AS var_v,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS std_v,
           (sxy - sx * sy / n) / (n - 1) AS covar_vy,
           ((sxy - sx * sy / n) / (n - 1))
             / (sqrt((sxx - sx * sx / n) / (n - 1))
                * sqrt((syy - sy * sy / n) / (n - 1))) AS corr_vy
    FROM s
    """,
    doc="Statistical aggregates the scale-safe way: var/std/covar/corr "
    "derived from decimal-exact moment sums in a fixed double expression "
    "tree — order-independent where the builtin float aggregates are not.",
    tags=("agg", "scalar"),
)
def stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    x = F.col("value")
    y = (F.col("event_id") % 1000).cast("double")

    def dsumd(c, a):
        return F.sum(c.cast("decimal(38,6)")).cast("double").alias(a)

    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsumd(x, "sx"),
        dsumd(x * x, "sxx"),
        dsumd(y, "sy"),
        dsumd(x * y, "sxy"),
        dsumd(y * y, "syy"),
    )
    n, sx, sxx, sy, sxy, syy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "sxy", "syy"])
    var_v = (sxx - sx * sx / n) / (n - 1)
    var_y = (syy - sy * sy / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    return s.select(
        "event_type",
        "n",
        (sx / n).alias("mean_v"),
        var_v.alias("var_v"),
        F.sqrt(var_v).alias("std_v"),
        cov.alias("covar_vy"),
        (cov / (F.sqrt(var_v) * F.sqrt(var_y))).alias("corr_vy"),
    )


@register(
    "array_function_matrix",
    """
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
                        AS toks
               FROM documents)
    SELECT doc_id,
           len(toks) AS n_toks,
           array_to_string(list_sort(list_distinct(toks)), chr(1))
             AS uniq_sorted,
           array_to_string(toks[2:4], chr(1)) AS mid3,
           list_contains(toks, 'the') AS has_the,
           CAST(list_position(toks, 'table') AS INT) AS table_at,
           array_to_string(list_sort(list_filter(toks, x -> length(x) > 4)),
                           chr(1)) AS long_toks,
           array_to_string(list_transform(toks[1:2], x -> upper(x)), chr(1))
             AS head_up,
           list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                       (a, b) -> a + b) AS char_sum,
           len(list_filter(toks, x -> x = 'spark')) > 0 AS any_spark,
           array_to_string(flatten([toks[1:1], toks[1:1]]), chr(1))
             AS first_twice
    FROM t
    """,
    doc="Array/higher-order surface: sort/distinct/slice/contains/position/"
    "filter/transform/aggregate/exists/flatten over token arrays — Spark "
    "builtins vs DuckDB list_* (string payloads keep every comparison "
    "byte-exact; distinct is order-canonicalized by the sort).  Array-typed "
    "intermediates are serialized with array_join/array_to_string on a "
    "chr(1) separator so every OUTPUT column is a scalar the driver's "
    "pandas canonicalization can hash (round-3 driver-red fix).",
    tags=("array", "scalar"),
)
def array_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.text import bind_struct, tokens

    d = table(spark, sf_dir, "documents")
    sep = "\x01"

    def _matrix(tk):
        # all 10 array-surface outputs read the SAME let-bound token
        # array (text.bind_struct): one tokenizer evaluation per row
        # instead of one per output column
        return F.struct(
            F.size(tk).alias("n_toks"),
            F.array_join(F.array_sort(F.array_distinct(tk)), sep).alias(
                "uniq_sorted"
            ),
            F.array_join(F.slice(tk, 2, 3), sep).alias("mid3"),
            F.array_contains(tk, "the").alias("has_the"),
            F.array_position(tk, "table").cast("int").alias("table_at"),
            F.array_join(
                F.array_sort(F.filter(tk, lambda x: F.length(x) > 4)), sep
            ).alias("long_toks"),
            F.array_join(
                F.transform(F.slice(tk, 1, 2), lambda x: F.upper(x)), sep
            ).alias("head_up"),
            F.aggregate(
                tk, F.lit(0), lambda acc, x: acc + F.length(x)
            ).alias("char_sum"),
            F.exists(tk, lambda x: x == "spark").alias("any_spark"),
            F.array_join(
                F.flatten(F.array(F.slice(tk, 1, 1), F.slice(tk, 1, 1))), sep
            ).alias("first_twice"),
        )

    return bind_struct(
        d.select("doc_id", "text"), tokens("text"), _matrix,
        ["n_toks", "uniq_sorted", "mid3", "has_the", "table_at",
         "long_toks", "head_up", "char_sum", "any_spark", "first_twice"],
    ).drop("text")


@register(
    "date_function_matrix",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           o_orderdate + INTERVAL 3 MONTH AS plus3m,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
             AS INT) AS days_since_95,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           -- Spark dayofweek is 1-based from Sunday; DuckDB 0-based
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
    doc="Temporal scalar surface: trunc granularities, month-clamped "
    "interval arithmetic, day diffs, last_day, dow/quarter/doy, epoch "
    "seconds — with the documented engine skews (dayofweek base, "
    "DATE-vs-TIMESTAMP trunc, rounding epoch) normalized in the oracle.",
    tags=("temporal", "scalar"),
)
def date_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.date_trunc("week", d).alias("week_start"),
        (d + F.expr("INTERVAL 3 MONTHS")).alias("plus3m"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.quarter(d).cast("int").alias("qtr"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


def _split_manifest_oracle() -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    SELECT split, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_ids
    FROM (SELECT doc_id,
                 CASE WHEN bucket < 8000 THEN 'train'
                      WHEN bucket < 9000 THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id, (({h}) % 10000 + 10000) % 10000 AS bucket
                FROM documents))
    GROUP BY split
    """


@register(
    "dataset_split_manifest",
    _split_manifest_oracle(),
    doc="Per-split manifest of the materialized training dataset "
    "(operators.dataset.materialize_splits returns exactly this): row and "
    "distinct-key counts per xxhash-assigned split.",
    tags=("sampling", "agg"),
)
def dataset_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import xxhash_split

    docs = table(spark, sf_dir, "documents").select("doc_id")
    assigned = xxhash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_ids"),
    )


@register(
    "unpivot_order_amounts",
    """
    SELECT o_orderkey, metric, amount
    FROM (SELECT o_orderkey, o_totalprice AS total,
                 CAST(o_totalprice AS DECIMAL(38,2))::DOUBLE * 0.07 AS tax
          FROM orders)
    UNPIVOT (amount FOR metric IN (total, tax))
    """,
    doc="Wide-to-long unpivot (Spark unpivot/melt vs DuckDB UNPIVOT); the "
    "derived column routes through the engine-shared decimal quantization.",
    tags=("relational",),
)
def unpivot_order_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("total"),
        (F.col("o_totalprice").cast("decimal(38,2)").cast("double") * 0.07).alias(
            "tax"
        ),
    )
    return o.unpivot("o_orderkey", ["total", "tax"], "metric", "amount")


def _pagerank_oracle(n_rounds: int = 3, damping: float = 0.85) -> str:
    """Unrolled PageRank rounds (the operators.graph.pagerank replica).

    The base/damping literals are emitted as '<repr>'::DOUBLE because
    Spark computes ``1.0 - 0.85`` in IEEE double (0.15000000000000002) —
    a hand-written 0.15 would differ in the last ulp every round — and a
    BARE 17-digit literal would be DECIMAL-typed in DuckDB, whose
    DECIMAL->DOUBLE cast double-rounds (int128 then /10^s); the
    VARCHAR->DOUBLE parse is correctly rounded and matches F.lit.
    Contributions truncate to micro-units (see operators.graph.pagerank):
    power-of-two degrees make rank/degree land exactly on .5 decimal
    ties, where the engines' decimal-cast rounding modes disagree."""
    base = f"'{1.0 - damping!r}'::DOUBLE"
    damp = f"'{damping!r}'::DOUBLE"
    rounds = []
    for r in range(n_rounds):
        rounds.append(f"""
    c{r} AS (SELECT e.dst AS src,
                    CAST(trunc(r.rank / d.deg * 1e6) AS BIGINT) AS c
             FROM e JOIN r{r} r ON e.src = r.src JOIN deg d ON e.src = d.src),
    r{r + 1} AS (SELECT deg.src,
                        {base} + {damp}
                          * (CAST(COALESCE(SUM(c{r}.c), 0) AS DOUBLE) / 1e6)
                          AS rank
                 FROM deg LEFT JOIN c{r} ON deg.src = c{r}.src
                 GROUP BY deg.src)""")
    return f"""
    WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    e AS (SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM pairs
          UNION ALL
          SELECT l_partkey * 2 + 1, l_suppkey * 2 FROM pairs),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT src, 1.0 AS rank FROM deg),
    {','.join(rounds)}
    SELECT src AS id, rank FROM r{n_rounds}
    """


@register(
    "supplier_part_pagerank",
    _pagerank_oracle(),
    doc="PageRank over the symmetrized supplier-part shipment graph "
    "(operators.graph.pagerank): 3 fixed Lloyd-style rounds with "
    "decimal-quantized contribution sums, so ranks are bit-identical "
    "across partitionings and engines — the third fully-oracled "
    "iterative algorithm next to connected components and IVF k-means.",
    tags=("graph", "iterative", "bench"),
)
def supplier_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.graph import pagerank

    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    fwd = pairs.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, n_rounds=3, damping=0.85)


@register(
    "regexp_function_matrix",
    r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_extract(text, '[0-9]+') AS first_num,
           CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS INT)
             AS vowel_pairs,
           regexp_matches(text, '^[a-z]') AS starts_lower,
           substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devowel40
    FROM documents
    """,
    doc="Regexp surface: group extraction, counts, anchors, global "
    "replace — restricted to character-class/quantifier patterns where "
    "Java regex (Spark) and RE2 (DuckDB) agree by construction.",
    tags=("scalar", "text"),
)
def regexp_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_extract(t, r"[0-9]+", 0).alias("first_num"),
        F.size(F.expr(r"regexp_extract_all(text, '[aeiou]{2}', 0)"))
        .cast("int")
        .alias("vowel_pairs"),
        t.rlike(r"^[a-z]").alias("starts_lower"),
        F.substring(F.regexp_replace(t, r"[aeiou]", "_"), 1, 40).alias(
            "devowel40"
        ),
    )


@register(
    "map_function_matrix",
    """
    SELECT doc_id,
           array_to_string(list_transform(list_sort(map_entries(m)),
                          e -> e['key'] || ':' || e['value']), chr(1))
             AS entries,
           CAST(cardinality(m) AS INT) AS n_keys,
           m['src'][1] AS src_val,
           array_to_string(list_sort(map_keys(m)), chr(1)) AS keys_sorted
    FROM (SELECT doc_id, map(['src', 'lang'], [source, lang]) AS m
          FROM documents)
    """,
    doc="Map-typed column surface: construction, entries (canonicalized to "
    "sorted k:v strings — engine map representations differ), lookup, "
    "cardinality, sorted keys.  Entry/key lists are chr(1)-joined so the "
    "output is scalar-only (driver-hashable).",
    tags=("scalar",),
)
def map_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("src"), F.col("source"), F.lit("lang"), F.col("lang")
    )
    sep = "\x01"
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries(m)),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"]),
            ),
            sep,
        ).alias("entries"),
        F.size(m).cast("int").alias("n_keys"),
        m["src"].alias("src_val"),
        F.array_join(F.array_sort(F.map_keys(m)), sep).alias("keys_sorted"),
    )


#: per-source keep fractions for the mixing query (cycle of 4 weights
#: over the corpus's 20 sources — exercises full-keep, halving, and
#: near-drop tiers)
_MIX_WEIGHTS = {f"src{i}": [1.0, 0.5, 0.25, 0.1][i % 4] for i in range(20)}


def _mix_oracle() -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(w * 10000))}" for s, w in _MIX_WEIGHTS.items()
    )
    return f"""
    WITH b AS (SELECT doc_id, source,
                 (({h}) % 10000 + 10000) % 10000 AS bucket
               FROM documents)
    SELECT doc_id, source, bucket FROM b
    WHERE bucket < CASE source {cases} ELSE 0 END
    """


@register(
    "dataset_mix_weighted",
    _mix_oracle(),
    doc="Deterministic per-source downsampling "
    "(operators.sampling.weighted_mix): keep fraction w_s of each "
    "source by content-hash bucket — the dataset-mixing step of a "
    "training pipeline.  Map-only filter (codegen'd CASE for the "
    "threshold), superset-stable per source; oracle replays Spark's "
    "xxhash64 hashLong in SQL.",
    tags=("sampling", "curation"),
)
def dataset_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import weighted_mix

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return weighted_mix(docs, "doc_id", "source", _MIX_WEIGHTS)


def _pack_oracle(capacity: int = 2048, num_buckets: int = 32) -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    WITH t AS (SELECT doc_id,
                 len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tok,
                 {h} AS h
               FROM documents),
    o AS (SELECT doc_id, n_tok,
            ((h % {num_buckets}) + {num_buckets}) % {num_buckets} AS bkt, h
          FROM t),
    c AS (SELECT doc_id, n_tok, bkt,
            SUM(n_tok) OVER (ORDER BY bkt, h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM o)
    SELECT doc_id, n_tok, bkt,
      CAST(cum - n_tok AS BIGINT) AS start_off,
      CAST((cum - n_tok) // {capacity} AS BIGINT) AS first_bin,
      CAST(CASE WHEN n_tok > 0 THEN (cum - 1) // {capacity}
                ELSE (cum - n_tok) // {capacity} END AS BIGINT) AS last_bin
    FROM c
    """


@register(
    "training_order_pack",
    _pack_oracle(),
    doc="Concatenate-then-chunk sequence packing "
    "(operators.dataset.pack_contiguous): documents laid end-to-end in "
    "deterministic xxhash64 order and cut into 2048-token bins.  The "
    "global prefix sum is a DISTRIBUTED two-level scan — per-bucket "
    "partitioned windows plus a driver-side cumulation of the 32 bucket "
    "totals (the only data reaching the driver) — never a "
    "single-partition global window; the oracle computes the same "
    "offsets with one SQL running-sum window.",
    tags=("curation",),
)
def training_order_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.dataset import pack_contiguous
    from planet_dump_ng_spark.operators.text import bpe_ish_token_count

    docs = table(spark, sf_dir, "documents")
    return pack_contiguous(
        docs.select("doc_id", bpe_ish_token_count("text").alias("n_bpe")),
        "doc_id",
        "n_bpe",
        capacity=2048,
        num_buckets=32,
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (beyond the rollup/cube queries): "
    "detail, one partial, and grand-total sets with the grouping-id "
    "bitmask — one pass, Spark's Expand keeps the aggregation "
    "map-side-combinable; decimal-exact revenue.",
    tags=("agg",),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [
                [F.col("o_orderpriority"), F.col("o_orderstatus")],
                [F.col("o_orderpriority")],
                [],
            ],
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "gid", "n_orders", "revenue"
        )
    )


@register(
    "value_histogram",
    """
    SELECT event_type,
           CAST(least(19, floor(value / 25.0)) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS bin_sum
    FROM events
    GROUP BY event_type, bin
    """,
    doc="Fixed-width histogram (25-unit bins, clamped top bin) per event "
    "type: the binning rollup feature stores build constantly; integer "
    "bin arithmetic is engine-exact, sums decimal-quantized.",
    tags=("agg",),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    b = F.least(F.lit(19), F.floor(F.col("value") / 25.0)).cast("long")
    return (
        ev.groupBy("event_type", b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("bin_sum"),
        )
    )


def _zorder_oracle() -> str:
    spread = []
    for v in ("ux", "vy"):
        e = f"({v} & 65535)"
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                            (2, 0x33333333), (1, 0x55555555)):
            e = f"(({e} | ({e} << {shift})) & {mask})"
        spread.append(e)
    z = f"({spread[0]} | ({spread[1]} << 1))"
    return f"""
    WITH g AS (SELECT event_id,
                 user_id % 65536 AS ux,
                 CAST(floor(value * 100) AS BIGINT) % 65536 AS vy
               FROM events)
    SELECT event_id, ux, vy, {z} AS zval,
           {z} // 67108864 AS zbucket
    FROM g
    """


@register(
    "zorder_layout",
    _zorder_oracle(),
    doc="Z-order (Morton) clustering key (operators.layout.zorder_key): "
    "16-bit grid coords bit-interleaved via magic-number spreads so one "
    "sort key clusters BOTH dimensions — the lakehouse data-layout "
    "technique that makes file min/max stats prune 2-D predicates at "
    "100 TB.  Pure codegen'd bit arithmetic, bit-identical in SQL.",
    tags=("layout",),
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.layout import zorder_key

    ev = table(spark, sf_dir, "events")
    ux = (F.col("user_id") % 65536).alias("ux")
    vy = (F.floor(F.col("value") * 100).cast("bigint") % 65536).alias("vy")
    g = ev.select("event_id", ux, vy)
    z = zorder_key(F.col("ux"), F.col("vy"))
    return g.withColumn("zval", z).withColumn(
        "zbucket", F.expr("zval div 67108864")
    )


def _stratified_oracle(n: int = 40) -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    WITH r AS (SELECT doc_id, lang, source,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY {h}, doc_id) AS rn
               FROM documents)
    SELECT doc_id, lang, source FROM r WHERE rn <= {n}
    """


@register(
    "stratified_take",
    _stratified_oracle(),
    doc="Deterministic class balancing "
    "(operators.sampling.stratified_take): at most 40 docs per language "
    "in content-hash order — one partitioned rank window, reproducible "
    "across engines/partitionings, append-stable; oracle replays "
    "Spark's xxhash64 hashLong.",
    tags=("sampling", "curation"),
)
def stratified_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import stratified_take as take

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return take(docs, "doc_id", "lang", 40)


@register(
    "profile_orders",
    """
    WITH s AS (SELECT COUNT(*) AS n FROM orders)
    SELECT 'o_custkey' AS "column", s.n AS n_rows,
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_nulls,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_distinct,
           (SELECT CAST(MIN(o_custkey) AS VARCHAR) FROM orders) AS min_val,
           (SELECT CAST(MAX(o_custkey) AS VARCHAR) FROM orders) AS max_val
    FROM s
    UNION ALL
    SELECT 'o_orderstatus', s.n,
           (SELECT COUNT(*) FROM orders WHERE o_orderstatus IS NULL),
           (SELECT COUNT(DISTINCT o_orderstatus) FROM orders),
           (SELECT MIN(o_orderstatus) FROM orders),
           (SELECT MAX(o_orderstatus) FROM orders)
    FROM s
    UNION ALL
    SELECT 'o_orderpriority', s.n,
           (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL),
           (SELECT COUNT(DISTINCT o_orderpriority) FROM orders),
           (SELECT MIN(o_orderpriority) FROM orders),
           (SELECT MAX(o_orderpriority) FROM orders)
    FROM s
    """,
    doc="Column profiler (operators.dataset.profile_columns): row/null/"
    "exact-distinct counts and min/max per column in ONE aggregate pass "
    "(Expand-rewritten multi-distinct), unpivoted to long format — the "
    "data-quality sweep run before any 100 TB ingest is trusted.",
    tags=("profile",),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.dataset import profile_columns

    o = table(spark, sf_dir, "orders")
    return profile_columns(o, ["o_custkey", "o_orderstatus", "o_orderpriority"])


@register(
    "bitwise_function_matrix",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, o_custkey) AS key_xor,
           o_orderkey << 3 AS shl3,
           o_orderkey >> 2 AS shr2,
           CAST(bit_count(o_orderkey) AS INT) AS popcount,
           ~o_orderkey AS flipped
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    doc="Bitwise scalar surface: and/or/xor, shifts, popcount, not — "
    "all JVM-codegen expressions, map-only.",
    tags=("scalar",),
)
def bitwise_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 4096").alias("with_flag"),
        F.expr("o_orderkey ^ o_custkey").alias("key_xor"),
        F.expr("shiftleft(o_orderkey, 3)").alias("shl3"),
        F.expr("shiftright(o_orderkey, 2)").alias("shr2"),
        F.expr("cast(bit_count(o_orderkey) as int)").alias("popcount"),
        F.expr("~o_orderkey").alias("flipped"),
    )


def _hilbert_oracle(n_bits: int = 8) -> str:
    from planet_dump_ng_spark.operators.layout import _hilbert_steps

    ctes = []
    for i, (d_inc, x_next, y_next) in enumerate(
        _hilbert_steps(n_bits, "duckdb")
    ):
        ctes.append(
            f"h{i + 1} AS (SELECT event_id, hx, hy,"
            f" d + {d_inc} AS d, {x_next} AS x, {y_next} AS y FROM h{i})"
        )
    mod = 1 << n_bits
    return f"""
    WITH g AS (SELECT event_id,
                 user_id % {mod} AS hx,
                 CAST(floor(value * 100) AS BIGINT) % {mod} AS hy
               FROM events),
    h0 AS (SELECT event_id, hx, hy, CAST(0 AS BIGINT) AS d,
                  hx AS x, hy AS y FROM g),
    {','.join(ctes)}
    SELECT event_id, hx AS x, hy AS y, CAST(d AS BIGINT) AS hval,
           d // 1024 AS hbucket
    FROM h{n_bits}
    """


@register(
    "hilbert_layout",
    _hilbert_oracle(),
    doc="Hilbert-curve clustering key (operators.layout.hilbert_layout) "
    "over the same 2-D grid as zorder_layout: the canonical xy2d "
    "recurrence unrolled to 8 simultaneous column-update steps — the "
    "stronger space-filling layout (every curve step moves exactly one "
    "grid cell, so consecutive-hval files have provably tight 2-D "
    "min/max envelopes; Morton jumps diagonally between quadrants).  "
    "Pure integer CASE/bit arithmetic, map-only, engine-exact; the "
    "oracle unrolls the identical steps as CTEs from the same "
    "generator, differing only in XOR spelling.",
    tags=("layout",),
)
def hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.layout import hilbert_layout as hl

    ev = table(spark, sf_dir, "events")
    g = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("x"),
        (F.floor(F.col("value") * 100).cast("bigint") % 256).alias("y"),
    )
    return hl(g, n_bits=8).select(
        "event_id",
        "x",
        "y",
        "hval",
        F.expr("hval div 1024").alias("hbucket"),
    )


@register(
    "pack_boundary_stats",
    f"""
    WITH p AS ({{pack}})
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MAX(last_bin) + 1 AS BIGINT) AS n_bins,
           CAST(SUM(CASE WHEN first_bin <> last_bin THEN 1 ELSE 0 END)
             AS BIGINT) AS n_boundary_crossing,
           CAST(SUM(CASE WHEN first_bin <> last_bin THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*) AS crossing_fraction,
           CAST(SUM(CASE WHEN first_bin <> last_bin THEN n_tok ELSE 0 END)
             AS BIGINT) AS crossing_tokens
    FROM p
    """.replace("{pack}", _pack_oracle()),
    doc="Sequence-packing quality report over training_order_pack's "
    "layout: concatenate-then-chunk packs with ZERO padding by "
    "construction, so the metric that matters is the boundary-crossing "
    "mass — documents split across 2048-token bin edges (attention-"
    "contamination sites a trainer either masks or accepts) — plus "
    "bins/tokens totals.  One aggregate over the distributed pack "
    "manifest; the knob it tunes is capacity vs median doc length "
    "(crossing_fraction falls as capacity grows).",
    tags=("curation", "agg"),
)
def pack_boundary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = QUERIES["training_order_pack"].spark(spark, sf_dir)
    crossing = (F.col("first_bin") != F.col("last_bin")).cast("bigint")
    return p.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        (F.max("last_bin") + 1).cast("bigint").alias("n_bins"),
        F.sum(crossing).cast("bigint").alias("n_boundary_crossing"),
        (F.sum(crossing).cast("double") / F.count(F.lit(1))).alias(
            "crossing_fraction"
        ),
        F.sum(F.when(crossing == 1, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("crossing_tokens"),
    )
