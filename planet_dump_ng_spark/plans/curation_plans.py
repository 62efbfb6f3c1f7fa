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
