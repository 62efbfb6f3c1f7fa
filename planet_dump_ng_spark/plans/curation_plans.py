"""Round-5 curation extras: C4-style duplicated-span removal,
quality-weighted (tempered) sampling, and the FAISS-style exact re-rank
stage on top of the persisted-index IVFPQ path.

Registered LAST in ``plans.load_all`` (after extras_plans) so the
driver's 50-query rotation window over never-checked queries is not
displaced (README "Driver correctness-gate contract").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import text as tx
from planet_dump_ng_spark.plans.registry import register, table
from planet_dump_ng_spark.plans.text_plans import _TOKS


def _span_dedup_oracle(span_tokens: int = 10) -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_inline

    st = span_tokens
    h = xxh64_inline("span_text")
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ix AS (SELECT doc_id, toks,
                  unnest(range(1, CAST(ceil(len(toks) / {st}.0) AS BIGINT) + 1))
                    AS i
           FROM t),
    sp AS (SELECT doc_id, CAST(i - 1 AS INT) AS span_idx,
                  array_to_string(toks[(i-1)*{st}+1 : i*{st}], ' ')
                    AS span_text,
                  len(toks[(i-1)*{st}+1 : i*{st}]) AS n_span_tokens
           FROM ix),
    hs AS (SELECT *, {h} AS h FROM sp),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY h
                      ORDER BY doc_id, span_idx) AS rn
          FROM hs)
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed_spans,
           CAST(SUM(CASE WHEN rn = 1 THEN n_span_tokens ELSE 0 END) AS BIGINT)
             AS n_kept_tokens,
           md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN span_text END,
                                   ' ' ORDER BY span_idx), ''))
             AS retained_md5
    FROM r
    GROUP BY doc_id
    """


@register(
    "span_dedup_c4",
    _span_dedup_oracle(),
    doc="C4-style duplicated-span removal, reported per document: every "
    "non-overlapping 10-token span that occurred EARLIER anywhere in "
    "the corpus (lower (doc_id, span_idx)) is deleted, the survivor "
    "text is reassembled in span order and proven by md5 — the "
    "sub-document dedup pass C4 runs before near-dedup (exact-dedup "
    "misses boilerplate embedded in otherwise-unique pages; near-dedup "
    "drops whole documents; span dedup excises just the repeated "
    "mass while conserving the rest, token counts included).  Plan "
    "(operators.dedup.span_dedup): explode spans once, elect the "
    "first occurrence per 8-byte span hash as one map-side-combinable "
    "MIN(struct), join the winner back, one per-doc aggregate — no "
    "pair space anywhere, cost linear in corpus token mass; the "
    "oracle replays the same xxhash64 so fold collisions agree.",
    tags=("dedup", "text"),
)
def span_dedup_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.dedup import span_dedup

    return span_dedup(table(spark, sf_dir, "documents"), span_tokens=10)


def _quality_weighted_oracle(buckets: int = 10_000) -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    WITH feats AS (SELECT doc_id, source, len({_TOKS}) AS n_tokens
                   FROM documents),
    cuts AS (SELECT
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens)
                    AS BIGINT) AS p25,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)
                    AS BIGINT) AS p50,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tokens)
                    AS BIGINT) AS p75
             FROM feats),
    t AS (SELECT f.doc_id, f.source, f.n_tokens,
                 CASE WHEN f.n_tokens >= c.p75 THEN 3
                      WHEN f.n_tokens >= c.p50 THEN 2
                      WHEN f.n_tokens >= c.p25 THEN 1
                      ELSE 0 END AS tier
          FROM feats f, cuts c),
    b AS (SELECT *, (({h}) % {buckets} + {buckets}) % {buckets} AS bucket
          FROM t)
    SELECT doc_id, source, n_tokens, tier, bucket,
           CAST(CASE tier WHEN 3 THEN {buckets}
                          WHEN 2 THEN {int(buckets * 3 / 4)}
                          WHEN 1 THEN {buckets // 2}
                          ELSE {buckets // 4} END AS BIGINT)
             AS keep_threshold
    FROM b
    WHERE bucket < keep_threshold
    """


@register(
    "quality_weighted_sample",
    _quality_weighted_oracle(),
    doc="Quality-weighted (tempered) corpus sampling: documents rank into "
    "global token-count quartiles and each tier keeps a rising "
    "fraction — 25/50/75/100% bottom-to-top — via the content-stable "
    "xxhash64 bucket gate (operators.sampling.quality_weighted_sample)."
    "  The soft complement of quality_percentile_filter's hard cutoff: "
    "the mix tilts toward high-quality text without zeroing the tail "
    "(the DCLM/FineWeb practice), membership survives re-runs and "
    "appends, and raising a quota only ever ADDS documents.  Plan: one "
    "map-side-combinable 3-cut percentile_disc aggregate broadcast "
    "back, then a map-only gate — the fact table never shuffles; the "
    "oracle replays the hashLong gate via the DuckDB xxhash64 replica.",
    tags=("text", "sampling"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import quality_weighted_sample

    feats = table(spark, sf_dir, "documents").select(
        "doc_id", "source", tx.token_count("text").cast("bigint").alias("n_tokens")
    )
    return quality_weighted_sample(feats, "n_tokens", "doc_id").select(
        "doc_id", "source", "n_tokens", "tier", "bucket", "keep_threshold"
    )


_RERANK_CAND_K = 25  # ADC shortlist width feeding the exact re-rank


def _ivfpq_rerank_oracle(k: int = 5) -> str:
    from planet_dump_ng_spark.plans.similarity_plans import _DOT, _ivfpq_oracle

    cos = (
        f"{_DOT.format(a='eq.embedding', b='en.embedding')}"
        f" / (sqrt({_DOT.format(a='eq.embedding', b='eq.embedding')})"
        f" * sqrt({_DOT.format(a='en.embedding', b='en.embedding')}))"
    )
    return f"""
    WITH scored AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS cosine
      FROM ({_ivfpq_oracle(k=_RERANK_CAND_K)}) c
      JOIN embeddings eq ON eq.vec_id = c.query_id
      JOIN embeddings en ON en.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


def _ivfpq_rerank(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import ivfpq_adc_topk
    from planet_dump_ng_spark.operators.similarity import rerank_exact

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    cand = ivfpq_adc_topk(
        emb, queries, dim=64, k=_RERANK_CAND_K, n_cells=8, coarse_rounds=2,
        n_sub=4, pq_cells=8, pq_rounds=2, n_probe=2,
    )
    return rerank_exact(cand, emb, queries, k=k)


@register(
    "ann_ivfpq_rerank_topk",
    _ivfpq_rerank_oracle(),
    doc="IVFPQ + exact re-rank top-5 (FAISS IndexRefine): the composed "
    "index produces a k'=25 asymmetric-distance shortlist from stored "
    "codes (n_sub bytes per corpus vector), then ONLY those |Q| x 25 "
    "candidates fetch their float vectors and re-score with the exact "
    "fold cosine (operators.similarity.rerank_exact) — quantization "
    "ranking errors are repaired at shortlist cost, never corpus cost; "
    "the production serve shape for a recall target a raw ADC ranking "
    "misses.  Oracle: the ten-Lloyd-chain IVFPQ replica widened to "
    "k'=25 wrapped in an exact-cosine re-rank.",
    tags=("similarity", "iterative"),
)
def ann_ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivfpq_rerank(spark, sf_dir, k=5)


def _rerank_recall_oracle() -> str:
    from planet_dump_ng_spark.plans.similarity_plans import _recall_oracle

    return _recall_oracle(_ivfpq_rerank_oracle())


@register(
    "ann_ivfpq_rerank_recall",
    _rerank_recall_oracle(),
    doc="ANN quality evaluation for the re-ranked IVFPQ path: recall@5 of "
    "the k'=25-shortlist + exact-re-rank pipeline against exact "
    "brute-force top-5 — read beside ann_ivfpq_recall, the lift is "
    "exactly what the refine stage buys (re-ranking cannot lose: any "
    "true neighbor the shortlist caught is restored to its exact "
    "position), the k'-vs-recall tuning signal for the serve path.",
    tags=("similarity", "eval", "iterative"),
)
def ann_ivfpq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.plans.similarity_plans import (
        _RECALL_K,
        _recall_vs_exact,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _recall_vs_exact(
        emb, queries, _ivfpq_rerank(spark, sf_dir, k=_RECALL_K)
    )


def _margin_sql() -> str:
    """The linear quality-classifier margin as one DuckDB expression —
    identical fold order to operators.text.linear_quality_score (bias,
    then + w_i * f_i left to right), shared with the
    quality_classifier_score oracle."""
    from planet_dump_ng_spark.plans.text_plans import _hits_sql

    feats = {
        "stop_ratio": f"{_hits_sql(tx.LANG_STOPWORDS['en'])}::DOUBLE"
        f" / greatest(len({_TOKS}), 1)",
        "punct_ratio": "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE"
        " / greatest(length(text), 1)",
        "digit_ratio": "len(regexp_extract_all(text, '[0-9]'))::DOUBLE"
        " / greatest(length(text), 1)",
        "len_feat": f"least(len({_TOKS}), 300)::DOUBLE / 300.0",
    }
    return str(tx.QUALITY_MODEL_BIAS) + "".join(
        f" + {w!r} * ({feats[name]})" for name, w in tx.QUALITY_MODEL_WEIGHTS
    )


def _token_budget_oracle() -> str:
    return f"""
    WITH q AS (SELECT doc_id, len({_TOKS}) AS n_tokens,
                      CAST(floor(({_margin_sql()}) * 100) AS INT) AS qbin
               FROM documents),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget FROM q),
    bins AS (SELECT qbin, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
             FROM q GROUP BY qbin),
    prev AS (SELECT a.qbin,
                    CAST(SUM(b.bin_tokens) AS BIGINT) - MIN(a.bin_tokens)
                      AS prev_cum
             FROM bins a JOIN bins b ON b.qbin >= a.qbin
             GROUP BY a.qbin),
    win AS (SELECT doc_id, qbin, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY qbin ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS within_cum
            FROM q)
    SELECT w.doc_id, w.qbin, w.n_tokens,
           CAST(p.prev_cum + w.within_cum AS BIGINT) AS cum_tokens
    FROM win w JOIN prev p USING (qbin), tot
    WHERE p.prev_cum + w.within_cum <= tot.budget
    """


@register(
    "token_budget_select",
    _token_budget_oracle(),
    doc="Token-budget data selection: keep the highest-quality documents "
    "until HALF the corpus token mass is spent — the 'best N tokens' "
    "question every fixed-budget training run asks.  Greedy order is "
    "(quality bin DESC, doc_id ASC) with bins = floor(100 x the "
    "linear-classifier margin); the budget boundary cuts mid-bin "
    "exactly.  Distributed shape: NO global sort and NO partition-less "
    "window — per-bin token masses (a bounded few-hundred-row table) "
    "get running totals via a broadcast self-join, each doc adds its "
    "within-bin running sum from a window PARTITIONED by bin, and a "
    "doc is kept iff prev-bins + within-bin cumulative <= budget.  "
    "Margin, x100 multiply and floor are engine-exact IEEE ops, so "
    "bins — and the kept set — hash-match.",
    tags=("text", "sampling"),
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import select_token_budget

    scored = tx.linear_quality_score(table(spark, sf_dir, "documents"))
    q = scored.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        F.floor(F.col("quality_margin") * 100).cast("int").alias("qbin"),
    )
    budget = q.agg(F.sum("n_tokens").cast("bigint")).first()[0] // 2
    return select_token_budget(q, "qbin", "n_tokens", "doc_id", budget).select(
        "doc_id", "qbin", "n_tokens", "cum_tokens"
    )


def _unsigned_str(expr: str, prefix: str) -> str:
    """Unsigned [0, 2^64) HUGEINT of Spark's signed xxhash64(varchar)."""
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_inline

    m64 = "18446744073709551616::HUGEINT"
    h = xxh64_inline(expr, prefix=prefix)
    return f"((CAST({h} AS HUGEINT) % {m64} + {m64}) % {m64})"


def _bloom_screen_oracle(m_bits: int = 1 << 20, k: int = 3) -> str:
    from planet_dump_ng_spark.plans.text_plans import _SHINGLES

    pos = ", ".join(f"(lo + {i} * hi) % {m_bits}" for i in range(k))
    return f"""
    WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
    bk AS (SELECT DISTINCT s AS key FROM sh WHERE doc_id % 20 = 0),
    bu AS (SELECT key, {_unsigned_str('key', 'cb')} AS u FROM bk),
    bs AS (SELECT key, CAST(u % 4294967296 AS BIGINT) AS lo,
                  CAST(u // 4294967296 AS BIGINT) | 1 AS hi FROM bu),
    bits AS (SELECT DISTINCT pos
             FROM (SELECT unnest([{pos}]) AS pos FROM bs) q),
    pk AS (SELECT DISTINCT doc_id, s AS pkey FROM sh WHERE doc_id % 20 <> 0),
    pu AS (SELECT doc_id, pkey, {_unsigned_str('pkey', 'cp')} AS u FROM pk),
    ps AS (SELECT doc_id, pkey, CAST(u % 4294967296 AS BIGINT) AS lo,
                  CAST(u // 4294967296 AS BIGINT) | 1 AS hi FROM pu),
    pp AS (SELECT doc_id, pkey, unnest([{pos}]) AS pos FROM ps),
    hits AS (SELECT doc_id, pkey, COUNT(*) AS n_hit
             FROM pp JOIN bits USING (pos) GROUP BY doc_id, pkey),
    passed AS (SELECT doc_id, pkey FROM hits WHERE n_hit = {k})
    SELECT p.doc_id,
           COUNT(*) AS n_bloom_pass,
           CAST(SUM(CASE WHEN b.key IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_true_match,
           CAST(SUM(CASE WHEN b.key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos
    FROM passed p LEFT JOIN bk b ON p.pkey = b.key
    GROUP BY p.doc_id
    """


@register(
    "contamination_bloom_screen",
    _bloom_screen_oracle(),
    doc="Benchmark-contamination SCREEN via a Bloom filter (m=2^20 bits, "
    "k=3 Kirsch-Mitzenmacher probes): the eval set's distinct shingles "
    "set bit positions once, and every training doc counts how many of "
    "its shingles pass all 3 probes — by construction zero false "
    "negatives, so docs with no passes are PROVABLY clean and skip the "
    "exact containment join entirely (contamination_check then runs "
    "on the flagged sliver only).  The 100 TB shape the exact scan "
    "lacks: the filter is O(m) broadcast state independent of corpus "
    "size, the probe is map-side (corpus never shuffles on shingles), "
    "and n_false_pos measures the screen's precision against the true "
    "key set.  Plan reuses operators.sketches.bloom_prune_join with "
    "doc_id as the probe group; the oracle replays the string-xxhash64 "
    "split and double-hash positions bit-for-bit.",
    tags=("text", "dedup", "sketch"),
)
def contamination_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators import sketches as sk
    from planet_dump_ng_spark.operators.dedup import shingles

    docs = table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id", F.explode(shingles("text", 3)).alias("s")
    )
    build = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.explode(shingles("text", 3)).alias("s")
    )
    return sk.bloom_prune_join(
        probe, build, "s", "s", "doc_id", m_bits=1 << 20, k=3
    )
