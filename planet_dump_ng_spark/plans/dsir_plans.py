"""DSIR (importance-resampling data selection) queries over ``documents``.

Fully hash-oracled: the hashed n-gram bucketing replays through the
DuckDB xxhash64 replica (plans/duck_xxh64.py) and the Q20 Mitchell
log-ratio through pure integer SQL (``_ilog2_q20_sql`` — the DuckDB
twin of operators.dsir.ilog2_q20), so per-doc weights compare
bit-exact.  Target distribution for the registry queries: ``lang =
'en'`` documents — "select raw docs that look like the English target"
is the paper's own framing (Xie et al., 2023, hashed n-gram features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import dsir as ds
from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_pmod_inline
from planet_dump_ng_spark.plans.registry import register, table

_B = 4096  #: hashed feature buckets (paper uses 10k; power of two)
_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"


def _ilog2_q20_sql(n: str, d: str) -> str:
    """DuckDB replica of operators.dsir.ilog2_q20 (Q20 Mitchell log2).

    Same integer/bit ops: rq = (n * 2^20) // d clamped at 1,
    e = bitlen(rq) - 1, (e - 20) * 2^20 + ((rq - 2^e) * 2^20) // 2^e.
    Requires 1 <= n <= d < 2^33, like the Spark side.
    """
    rq = f"greatest((CAST({n} AS BIGINT) * 1048576) // CAST({d} AS BIGINT), 1)"
    # one list_transform "let" binding evaluates rq once (the
    # duck_xxh64 trick), then e and 2^e derive from it positionally
    return (
        f"list_transform([{rq}], rq -> "
        "list_transform([length(bin(rq)) - 1], e -> "
        "(CAST(e AS BIGINT) - 20) * 1048576"
        " + ((rq - (1::BIGINT << e)) * 1048576) // (1::BIGINT << e)"
        ")[1])[1]"
    )


#: per-doc weight rollup appended after _dsir_ctes() — ONE definition
#: so the topk and by-source oracles can never desynchronize from the
#: shared Spark operator (dsir_importance_weights) they both mirror
_W_CTE = """
    , w AS (SELECT f.doc_id,
                   COUNT(*) AS n_feats,
                   CAST(SUM(sc.delta_q20) AS BIGINT) AS logw_q20
            FROM f JOIN sc USING (bucket)
            GROUP BY f.doc_id)
"""


def _dsir_ctes() -> str:
    """Shared CTE chain: features -> bucket models -> Q20 scores."""
    bucket = xxh64_pmod_inline("gram", _B, prefix="dg")
    s_t = _ilog2_q20_sql("tc + 1", f"tot.tt + {_B}")
    s_r = _ilog2_q20_sql("rc + 1", f"tot.rt + {_B}")
    return f"""
    WITH t AS (SELECT doc_id, (lang = 'en') AS is_t, {_TOKS} AS toks
               FROM documents),
    g AS (SELECT doc_id, is_t,
                 unnest(toks || list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1])) AS gram
          FROM t),
    f AS (SELECT doc_id, is_t, {bucket} AS bucket FROM g),
    pb AS (SELECT bucket,
                  COUNT(*) AS rc,
                  CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tc
           FROM f GROUP BY bucket),
    tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS rt,
                   CAST(SUM(tc) AS BIGINT) AS tt FROM pb),
    sc AS (SELECT bucket, tc, rc, ({s_t}) - ({s_r}) AS delta_q20
           FROM pb, tot)
    """


@register(
    "dsir_bucket_scores",
    _dsir_ctes()
    + """
    SELECT bucket, tc AS target_count, CAST(rc AS BIGINT) AS raw_count,
           delta_q20
    FROM sc
    """,
    doc="The trained DSIR model: per hashed-ngram-bucket Q20 log2 "
    "p_target/p_raw (add-one smoothed), target = lang='en' docs.  One "
    "tokenize pass, ONE map-side-combinable aggregate carries both "
    "language models (target rows are a subset of raw), totals are a "
    "1-row broadcast — the post-scan shuffle is n_buckets-sized.  The "
    "log-ratio is integer Q20 Mitchell (operators.dsir.ilog2_q20): no "
    "libm, so the dimension is bit-exact across engines and a clean "
    "persisted artifact for train-once/apply-anywhere scoring.",
    tags=("text", "sample", "agg"),
)
def dsir_bucket_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return ds.dsir_bucket_scores(d, F.col("lang") == "en", n_buckets=_B)


@register(
    "dsir_importance_weights",
    _dsir_ctes()
    + _W_CTE
    + """
    SELECT doc_id, n_feats, logw_q20,
           CAST(logw_q20 AS DOUBLE) / 1048576 AS logw_bits
    FROM w
    """,
    doc="DSIR per-document log importance weights: each doc's hashed "
    "unigram+bigram instances sum the broadcast bucket scores — "
    "log2 w(doc) = sum_g delta(bucket(g)) in Q20 bits.  The sum is an "
    "exact BIGINT (order-independent where a float log sum is "
    "association noise), so the driver hash-compares the whole "
    "technique.  Plan: map-only explode, broadcast join of the "
    "<=4096-row score dim, one per-doc aggregate — nothing shuffles "
    "more than doc_count + n_buckets rows after the scan.",
    tags=("text", "sample", "agg", "bench"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return ds.dsir_importance_weights(d, F.col("lang") == "en", n_buckets=_B)


@register(
    "dsir_topk_select",
    _dsir_ctes()
    + _W_CTE
    + """
    SELECT doc_id, n_feats, logw_q20,
           CAST(logw_q20 AS DOUBLE) / n_feats / 1048576 AS mean_logw_bits
    FROM w
    ORDER BY mean_logw_bits DESC, doc_id
    LIMIT 100
    """,
    doc="Deterministic DSIR selection: top-100 docs by MEAN per-feature "
    "weight (total weight is length-biased).  orderBy+limit lowers to "
    "TakeOrderedAndProject — per-partition heap + driver merge of k "
    "rows, never a global sort; (mean, doc_id) totally orders, so the "
    "selected set is stable.  The paper's Gumbel resampling would bolt "
    "on as hash-seeded noise; the engine's samplers stay RNG-free.",
    tags=("text", "sample", "topk"),
)
def dsir_topk_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return ds.dsir_topk_select(d, F.col("lang") == "en", k=100, n_buckets=_B)


@register(
    "dsir_mean_weight_by_source",
    _dsir_ctes()
    + _W_CTE
    + """
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(w.n_feats) AS BIGINT) AS total_feats,
           CAST(SUM(w.logw_q20) AS BIGINT) AS total_logw_q20,
           CAST(SUM(w.logw_q20) AS DOUBLE)
             / CAST(SUM(w.n_feats) AS BIGINT) / 1048576
             AS pooled_mean_bits
    FROM w JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    doc="DSIR as corpus governance: pooled mean importance weight PER "
    "SOURCE — total Q20 mass over total features, the per-feed "
    "domain-match number a curation owner reads next to "
    "corpus_health_by_source when setting llm_pipeline.curate's "
    "mix_weights (a feed whose pooled mean sits below zero is "
    "anti-target on average and gets downweighted before any per-doc "
    "gate runs).  Exact-integer numerator and denominator, so the "
    "one float division is engine-deterministic; the per-source "
    "rollup shuffles one row per source on top of the per-doc "
    "aggregate.",
    tags=("text", "sample", "agg"),
)
def dsir_mean_weight_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = ds.dsir_importance_weights(d, F.col("lang") == "en", n_buckets=_B)
    return (
        w.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_feats").cast("bigint").alias("total_feats"),
            F.sum("logw_q20").cast("bigint").alias("total_logw_q20"),
            (
                F.sum("logw_q20").cast("double")
                / F.sum("n_feats").cast("bigint")
                / F.lit(1048576.0)
            ).alias("pooled_mean_bits"),
        )
    )


_SRC_CTE = """
    , src AS (SELECT d.source,
                     COUNT(*) AS n_docs,
                     CAST(SUM(w.logw_q20) AS BIGINT) AS q,
                     CAST(SUM(w.n_feats) AS BIGINT) AS f
              FROM w JOIN documents d USING (doc_id)
              GROUP BY d.source)
"""


@register(
    "dsir_mix_suggestion",
    _dsir_ctes()
    + _W_CTE
    + _SRC_CTE
    + """
    , pooled AS (SELECT source, n_docs,
                        CAST(q AS DOUBLE) / f / 1048576 AS pooled_mean_bits
                 FROM src),
    ext AS (SELECT MIN(pooled_mean_bits) AS lo,
                   MAX(pooled_mean_bits) AS hi FROM pooled)
    SELECT source, n_docs, pooled_mean_bits,
           CASE WHEN hi = lo THEN 1.0
                ELSE (pooled_mean_bits - lo) / (hi - lo) END AS mix_weight
    FROM pooled, ext
    """,
    doc="DSIR governance closed into an action: min-max-scaled per-source "
    "mix weights from the pooled mean importance bits — the direct input "
    "to llm_pipeline.curate(mix_weights=...) (the most anti-target feed "
    "scales to 0, the most on-target to 1; a flat corpus degenerates to "
    "1.0 everywhere).  Exactness: the pooled mean is one IEEE division "
    "of exact BIGINTs and the scaling is min/max (order-independent) "
    "plus two more single IEEE ops, so the floats are engine-identical "
    "with no summation-order hazard.  Plan: the per-doc weight table "
    "rolls up to one row per source; extremes are a 1-row broadcast "
    "nested loop — nothing shuffles more than doc_count + n_sources "
    "rows after the feature scan.",
    tags=("text", "sample", "agg"),
)
def dsir_mix_suggestion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = ds.dsir_importance_weights(d, F.col("lang") == "en", n_buckets=_B)
    src = (
        w.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("logw_q20").cast("bigint").alias("q"),
            F.sum("n_feats").cast("bigint").alias("f"),
        )
    )
    pooled = src.select(
        "source",
        "n_docs",
        (F.col("q").cast("double") / F.col("f") / F.lit(1048576.0)).alias(
            "pooled_mean_bits"
        ),
    )
    ext = pooled.agg(
        F.min("pooled_mean_bits").alias("lo"),
        F.max("pooled_mean_bits").alias("hi"),
    )
    return pooled.crossJoin(F.broadcast(ext)).select(
        "source",
        "n_docs",
        "pooled_mean_bits",
        F.when(F.col("hi") == F.col("lo"), F.lit(1.0))
        .otherwise(
            (F.col("pooled_mean_bits") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
        )
        .alias("mix_weight"),
    )
