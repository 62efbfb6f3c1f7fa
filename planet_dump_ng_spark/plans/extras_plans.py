"""Corpus-analytics extras: bigram LM surprisal (in-corpus and held-out
train/test), Zipf fit, language-ID evaluation, mix rebalancing,
event-audience overlap, per-batch shingle novelty, near-dup incidence by
length band, BM25 self-retrieval recall, corpus snapshot reconciliation,
tokenizer fertility, and exact 3-sigma value outliers.

Registered LAST in ``plans.load_all`` so the driver's 50-query rotation
window over never-checked queries is not displaced (README "Driver
correctness-gate contract").

Determinism discipline (registry docstring): log-scale quantities use
bit-length arithmetic (``length(bin(x))`` — integer-exact, no libm) and
every float is produced by ONE identically-written division/multiply
chain over exact integers, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import text as tx
from planet_dump_ng_spark.plans.registry import register, table
from planet_dump_ng_spark.plans.text_plans import _TOKS, _langid_oracle


def _bitlen(c):
    """floor(log2(x)) + 1 for positive ints — the HLL-rho primitive."""
    return F.length(F.bin(c)).cast("long")


@register(
    "doc_bigram_surprisal",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(toks[1:len(toks)-1]) AS p,
                  unnest(toks[2:len(toks)]) AS w
           FROM t),
    cnt AS (SELECT p, w, COUNT(*) AS c FROM bg GROUP BY p, w),
    pc AS (SELECT p, CAST(SUM(c) AS BIGINT) AS cp FROM cnt GROUP BY p)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(length(bin(pc.cp)) - length(bin(cnt.c)))
             AS BIGINT) AS total_bigram_bits,
           CAST(SUM(length(bin(pc.cp)) - length(bin(cnt.c)))
             AS DOUBLE) / COUNT(*) AS mean_bigram_bits
    FROM bg JOIN cnt USING (p, w) JOIN pc USING (p)
    GROUP BY bg.doc_id
    """,
    doc="Bigram-LM surprisal in integer bit-length arithmetic: each "
    "bigram instance contributes floor-log2(count(prev)) - "
    "floor-log2(count(prev,next)) bits — a conditional-probability "
    "upgrade of doc_unigram_surprisal that penalizes docs whose word "
    "TRANSITIONS are rare (boilerplate scores low even when its "
    "vocabulary is common).  Docs with <2 tokens have no bigrams and "
    "drop out.  Plan: tokenize+zip once (persisted), bigram-vocab-sized "
    "count agg, join-back, one per-doc aggregate — same inverted-index "
    "shape as the unigram scorer, cost tracks corpus token mass.",
    tags=("text", "agg"),
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    def _pair_body(toks):
        # let-bound token array (text.bind): 5 references, one tokenizer
        # evaluation per row (identical output)
        gl = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
        return F.zip_with(
            F.slice(toks, 1, gl),
            F.slice(toks, 2, gl),
            lambda p, w: F.struct(p.alias("p"), w.alias("w")),
        )

    pair = tx.bind(tx.tokens("text"), _pair_body)
    bg = (
        d.select("doc_id", F.explode(pair).alias("b"))
        .select("doc_id", F.col("b.p").alias("p"), F.col("b.w").alias("w"))
        .persist()
    )
    cnt = bg.groupBy("p", "w").agg(F.count(F.lit(1)).alias("c"))
    pc = cnt.groupBy("p").agg(F.sum("c").cast("bigint").alias("cp"))
    bits = _bitlen(F.col("cp")) - _bitlen(F.col("c"))
    out = (
        bg.join(cnt, ["p", "w"])
        .join(pc, "p")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(bits).cast("bigint").alias("total_bigram_bits"),
            (F.sum(bits).cast("double") / F.count(F.lit(1))).alias(
                "mean_bigram_bits"
            ),
        )
        .persist()
    )
    out.count()
    bg.unpersist(blocking=True)
    return out


@register(
    "zipf_slope_by_lang",
    f"""
    WITH t AS (SELECT lang, unnest({_TOKS}) AS w FROM documents),
    cnt AS (SELECT lang, w, COUNT(*) AS c FROM t GROUP BY lang, w),
    r AS (SELECT lang, c,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY c DESC, w) AS rnk
          FROM cnt),
    b AS (SELECT lang,
                 CAST(length(bin(rnk)) AS BIGINT) AS x,
                 CAST(length(bin(c)) AS BIGINT) AS y,
                 c
          FROM r),
    s AS (SELECT lang, COUNT(*) AS n_vocab,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM b GROUP BY lang)
    SELECT lang, n_vocab, n_tokens,
           CAST(n_vocab * sxy - sx * sy AS DOUBLE)
             / CAST(n_vocab * sxx - sx * sx AS DOUBLE) AS zipf_bit_slope
    FROM s
    WHERE n_vocab >= 2
    """,
    doc="Zipf's-law fit per language: least-squares slope of "
    "floor-log2(frequency) on floor-log2(rank) over the word-frequency "
    "table (natural text ~ -1; a slope far from -1 flags synthetic or "
    "template-heavy sources).  Every regression sum is exact BIGINT "
    "(bit-length logs, integer products); the single final division is "
    "the only float op, so the result is bit-identical across engines "
    "where a libm-log regression could never be.  Plan: one tokenize "
    "scan, vocab-sized count agg, per-lang rank window (partitioned — "
    "vocabulary-bounded, not corpus-bounded), 5-sum fold.",
    tags=("text", "agg"),
)
def zipf_slope_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(tx.tokens("text")).alias("w"))
    cnt = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("w"))
    r = cnt.withColumn("rnk", F.row_number().over(w))
    b = r.select(
        "lang",
        _bitlen(F.col("rnk")).alias("x"),
        _bitlen(F.col("c")).alias("y"),
        "c",
    )
    s = b.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        (F.col("n_vocab") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / (F.col("n_vocab") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    ).alias("zipf_bit_slope")
    # a 1-word vocabulary has zero rank variance (0/0 slope — and engines
    # disagree on float 0/0: Spark NaN vs DuckDB error/NULL); no fit exists
    return s.filter(F.col("n_vocab") >= 2).select(
        "lang", "n_vocab", "n_tokens", slope
    )


@register(
    "lang_id_confusion",
    f"""
    WITH pred AS ({_langid_oracle()})
    SELECT lang_label, lang_pred,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang_label)
                    AS DOUBLE) AS label_share
    FROM pred
    GROUP BY lang_label, lang_pred
    """,
    doc="Confusion matrix of the stopword language-ID heuristic against "
    "the labeled lang column — the eval that closes doc_language_id's "
    "tuning loop (diagonal mass = accuracy; off-diagonal cells name the "
    "confusable pairs).  Counts are exact; label_share is one division "
    "of two exact BIGINTs.  Plan: map-only scoring, a #langs^2-bounded "
    "aggregate, then a window over the TINY aggregated frame "
    "(partitioned by label).",
    tags=("text", "eval"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_label"), "text"
    )
    pred = tx.language_id(d)
    cell = pred.groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang_label")
    return cell.withColumn(
        "label_share",
        F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast("double"),
    )


@register(
    "lang_rebalance_weights",
    """
    WITH cnt AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT CAST(MAX(n_docs) AS BIGINT) AS mx,
                   CAST(SUM(n_docs) AS BIGINT) AS total
            FROM cnt)
    SELECT lang, n_docs,
           CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS corpus_share,
           CAST(mx AS DOUBLE) / CAST(n_docs AS DOUBLE) AS upsample_weight
    FROM cnt, tot
    """,
    doc="Per-language sampling weights that rebalance the corpus to a "
    "uniform language mix (upsample_weight = majority-class count / "
    "class count — feed straight into dataset_mix_weighted).  Exact "
    "counts, two single divisions.  Plan: one lang-sized aggregate "
    "crossed with a broadcast 1-row total.",
    tags=("text", "sampling"),
)
def lang_rebalance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = cnt.agg(
        F.max("n_docs").cast("bigint").alias("mx"),
        F.sum("n_docs").cast("bigint").alias("total"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("total").cast("double")).alias(
            "corpus_share"
        ),
        (F.col("mx").cast("double") / F.col("n_docs").cast("double")).alias(
            "upsample_weight"
        ),
    )


@register(
    "doc_chunking_overlap",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(30 * i AS INT) AS chunk_start,
           array_to_string(toks[30 * i + 1 : 30 * i + 50], ' ') AS chunk_text,
           CAST(least(50, len(toks) - 30 * i) AS INT) AS n_tokens
    FROM t, unnest(range(0, CAST(ceil(len(toks) / 30.0) AS BIGINT))) AS u(i)
    """,
    doc="Sliding-window token chunking (50-token windows, stride 30 = "
    "20-token overlap): the RAG-standard chunker — overlap keeps "
    "sentences that straddle a boundary retrievable from at least one "
    "chunk, which the non-overlapping doc_chunking loses.  Window i "
    "starts at token 30*i; every chunk with a start inside the doc is "
    "emitted, so tails shorten rather than drop.  Map-only explode, no "
    "shuffle; ~n/30 chunks per n-token doc.",
    tags=("text",),
)
def doc_chunking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tx.tokens("text").alias("toks"))
    n = F.size("toks")
    return (
        t.filter(n > 0)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.ceil(n / F.lit(30.0)).cast("int") - 1)
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int"),
            (F.col("chunk_idx") * 30).cast("int").alias("chunk_start"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_idx") * 30 + 1, 50), " "
            ).alias("chunk_text"),
            F.least(F.lit(50), F.size("toks") - F.col("chunk_idx") * 30)
            .cast("int")
            .alias("n_tokens"),
        )
    )


def _gate_agreement_oracle() -> str:
    from planet_dump_ng_spark.plans.text_plans import _hits_sql

    margin = str(tx.QUALITY_MODEL_BIAS) + "".join(
        f" + {w!r} * {name}" for name, w in tx.QUALITY_MODEL_WEIGHTS
    )
    return f"""
    WITH feats AS (
      SELECT doc_id,
             len({_TOKS}) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio,
             {_hits_sql(tx.LANG_STOPWORDS['en'])}::DOUBLE
               / greatest(len({_TOKS}), 1) AS stop_ratio,
             len(regexp_extract_all(text, '[0-9]'))::DOUBLE
               / greatest(length(text), 1) AS digit_ratio,
             least(len({_TOKS}), 300)::DOUBLE / 300.0 AS len_feat
      FROM documents
    ),
    g AS (SELECT (n_tokens BETWEEN 5 AND 1000 AND punct_ratio < 0.1)
                   AS rule_keep,
                 (({margin}) > 0.0) AS clf_keep
          FROM feats),
    c AS (SELECT rule_keep, clf_keep, COUNT(*) AS n_docs
          FROM g GROUP BY rule_keep, clf_keep),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c)
    SELECT rule_keep, clf_keep, n_docs,
           CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM c, t
    """


@register(
    "quality_gate_agreement",
    _gate_agreement_oracle(),
    doc="2x2 agreement matrix between the rule quality gate "
    "(doc_quality_score's keep: 5<=tokens<=1000 and punct<0.1) and the "
    "learned linear classifier gate (quality_classifier_score's "
    "margin>0) — the eval that closes the classifier's tuning loop the "
    "way lang_id_confusion closes language-ID's: the diagonal is "
    "consensus, rule_keep&!clf_keep is what deploying the model would "
    "newly drop, !rule_keep&clf_keep what it would rescue.  One "
    "map-only feature scan, a 4-row aggregate, exact counts, one "
    "division against a broadcast total.",
    tags=("text", "eval", "filter"),
)
def quality_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", tx.token_count("text")
    )
    scored = tx.linear_quality_score(d)
    g = scored.select(
        (
            F.col("n_tokens").between(5, 1000)
            & (F.col("punct_ratio") < 0.1)
        ).alias("rule_keep"),
        F.col("keep").alias("clf_keep"),
    )
    c = g.groupBy("rule_keep", "clf_keep").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    t = c.agg(F.sum("n_docs").cast("bigint").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "rule_keep",
        "clf_keep",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("total").cast("double")).alias(
            "share"
        ),
    )


@register(
    "token_drift_tv_by_source",
    f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS w FROM documents),
    sw AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w),
    wt AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM sw GROUP BY w),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM sw GROUP BY source),
    tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM wt),
    p AS (SELECT sw.source,
                 COUNT(*) AS n_types_src,
                 CAST(SUM(CAST(trunc(abs(CAST(sw.c AS DOUBLE) / st.ns
                                         - CAST(wt.cw - sw.c AS DOUBLE)
                                           / (tot.n - st.ns)) * 1e12)
                               AS BIGINT)) AS BIGINT) AS present_q,
                 CAST(SUM(wt.cw - sw.c) AS BIGINT) AS present_rest
          FROM sw JOIN wt USING (w) JOIN st USING (source), tot
          GROUP BY sw.source)
    SELECT p.source,
           st.ns AS n_tokens_src,
           tot.n - st.ns AS n_tokens_rest,
           p.n_types_src,
           p.present_q
             + CAST(trunc(CAST((tot.n - st.ns) - p.present_rest AS DOUBLE)
                          / (tot.n - st.ns) * 1e12) AS BIGINT) AS tv_q,
           CAST(p.present_q
                + CAST(trunc(CAST((tot.n - st.ns) - p.present_rest AS DOUBLE)
                             / (tot.n - st.ns) * 1e12) AS BIGINT)
             AS DOUBLE) / 1e12 / 2 AS tv_distance
    FROM p JOIN st USING (source), tot
    WHERE st.ns < tot.n
    """,
    doc="Text-distribution drift: total-variation distance between each "
    "source's token distribution and the REST of the corpus — the "
    "which-feed-changed alarm for text (value_drift_tv's discipline "
    "applied to the vocabulary: |share gaps| truncated to 1e-12 and "
    "summed as exact integers, order-independent and hash-exact).  "
    "Words a source never uses are folded ANALYTICALLY: their total "
    "rest-share mass is (rest_tokens - rest-mass-of-present-words) / "
    "rest_tokens — one closed-form term per source instead of a "
    "vocab x sources grid, so the join input is only the PRESENT "
    "(source, word) pairs (sum of per-source vocabularies, not "
    "V x S).  Plan: one tokenize scan, three vocab/source-sized "
    "aggregates, one word-keyed join over present pairs, per-source "
    "fold.",
    tags=("drift", "text", "agg"),
)
def token_drift_tv_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tx.tokens("text")).alias("w"))
    sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c")).persist()
    wt = sw.groupBy("w").agg(F.sum("c").cast("bigint").alias("cw"))
    st = sw.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    tot = wt.agg(F.sum("cw").cast("bigint").alias("n"))
    diff_q = (
        F.abs(
            F.col("c").cast("double") / F.col("ns")
            - (F.col("cw") - F.col("c")).cast("double")
            / (F.col("n") - F.col("ns"))
        )
        * 1e12
    ).cast("long")
    p = (
        sw.join(wt, "w")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_types_src"),
            F.sum(diff_q).cast("bigint").alias("present_q"),
            F.sum(F.col("cw") - F.col("c")).cast("bigint").alias("present_rest"),
        )
    )
    absent_q = (
        (
            ((F.col("n") - F.col("ns")) - F.col("present_rest")).cast("double")
            / (F.col("n") - F.col("ns"))
            * 1e12
        ).cast("long")
    )
    out = (
        p.join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        # a source that IS the whole corpus has no rest distribution to
        # drift from (and engines disagree on float division by zero)
        .filter(F.col("ns") < F.col("n"))
        .select(
            "source",
            F.col("ns").alias("n_tokens_src"),
            (F.col("n") - F.col("ns")).alias("n_tokens_rest"),
            "n_types_src",
            (F.col("present_q") + absent_q).alias("tv_q"),
            (
                (F.col("present_q") + absent_q).cast("double") / 1e12 / 2
            ).alias("tv_distance"),
        )
        .persist()
    )
    out.count()
    sw.unpersist(blocking=True)
    return out


def _lang_temperature_oracle() -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    mn AS (SELECT CAST(MIN(c) AS BIGINT) AS cmin FROM cnt),
    thr AS (SELECT lang,
                   CAST(FLOOR(sqrt(CAST(cmin AS DOUBLE))
                              / sqrt(CAST(c AS DOUBLE)) * 10000.0)
                        AS BIGINT) AS keep_threshold
            FROM cnt, mn),
    b AS (SELECT doc_id, lang, source,
                 (({h}) % 10000 + 10000) % 10000 AS bucket
          FROM documents)
    SELECT b.doc_id, b.lang, b.source, b.bucket, thr.keep_threshold
    FROM b JOIN thr USING (lang)
    WHERE b.bucket < thr.keep_threshold
    """


@register(
    "lang_temperature_resample",
    _lang_temperature_oracle(),
    doc="mT5-style temperature resampling (alpha=0.5) of the corpus "
    "language mix, downsampling-only: each language keeps fraction "
    "sqrt(min_count)/sqrt(count) via the content-stable xxhash64 "
    "bucket gate (operators.sampling.temperature_resample) — the "
    "smallest language keeps everything, larger ones thin toward the "
    "tempered share, rows are never duplicated, and membership is "
    "append/repartition-stable.  sqrt and division are correctly-"
    "rounded IEEE ops, so the per-language thresholds — and hence the "
    "kept set — are bit-identical across engines; the oracle replays "
    "the hash via the DuckDB xxhash64 replica.  Plan: lang-sized count "
    "agg crossed with a broadcast 1-row min, broadcast join-back, "
    "map-only gate.",
    tags=("text", "sampling"),
)
def lang_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.sampling import temperature_resample

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return temperature_resample(d, "doc_id", "lang", alpha=0.5).select(
        "doc_id", "lang", "source", "bucket", "keep_threshold"
    )


@register(
    "event_type_user_jaccard",
    """
    WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
    ct AS (SELECT event_type, COUNT(*) AS n_users FROM s GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_common
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b,
           ca.n_users AS n_a, cb.n_users AS n_b, n_common,
           CAST(n_common AS DOUBLE)
             / CAST(ca.n_users + cb.n_users - n_common AS DOUBLE)
             AS user_jaccard
    FROM inter
    JOIN ct ca ON ca.event_type = type_a
    JOIN ct cb ON cb.event_type = type_b
    """,
    doc="Audience overlap between event types: exact Jaccard of the "
    "user sets for every type pair — the ground truth kmv_set_overlap "
    "estimates by sketch.  Plan: one distinct (type,user) projection, "
    "a user-keyed self-equi-join (never all-pairs: candidate mass = "
    "users' type-combination mass, types are a small set), exact "
    "integer counts, one final division.  Broadcast of the tiny "
    "per-type count table.",
    tags=("events", "agg"),
)
def event_type_user_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    s = e.select("event_type", "user_id").distinct().persist()
    ct = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = s.select(F.col("event_type").alias("type_a"), "user_id")
    b = s.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = F.broadcast(ct.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")))
    cb = F.broadcast(ct.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")))
    out = (
        inter.join(ca, "type_a")
        .join(cb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("user_jaccard"),
        )
        .persist()
    )
    out.count()
    s.unpersist(blocking=True)
    return out


def _novelty_oracle(batch_size: int = 100) -> str:
    from planet_dump_ng_spark.operators.dedup import _MERSENNE_31
    from planet_dump_ng_spark.plans.dedup_plans import _SHINGLES
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_pmod_inline

    hash_expr = xxh64_pmod_inline("s", _MERSENNE_31)
    return f"""
    WITH sh0 AS (
      SELECT CAST(floor(doc_id / {batch_size}) AS BIGINT) AS batch,
             unnest({_SHINGLES}) AS s
      FROM documents),
    hh AS MATERIALIZED (
      SELECT DISTINCT batch, {hash_expr} AS h FROM sh0),
    tot AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_shingles
            FROM hh GROUP BY batch),
    nov AS (SELECT fb AS batch, CAST(COUNT(*) AS BIGINT) AS n_novel
            FROM (SELECT h, MIN(batch) AS fb FROM hh GROUP BY h)
            GROUP BY fb),
    nd AS (SELECT CAST(floor(doc_id / {batch_size}) AS BIGINT) AS batch,
                  CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY batch)
    SELECT nd.batch, nd.n_docs,
           COALESCE(tot.n_shingles, 0) AS n_shingles,
           COALESCE(nov.n_novel, 0) AS n_novel,
           CASE WHEN COALESCE(tot.n_shingles, 0) > 0
                THEN CAST(COALESCE(nov.n_novel, 0) AS DOUBLE)
                       / tot.n_shingles
           END AS novelty_ratio
    FROM nd
    LEFT JOIN tot USING (batch)
    LEFT JOIN nov USING (batch)
    """


@register(
    "ngram_novelty_by_batch",
    _novelty_oracle(),
    doc="Shingle novelty per ingest batch (doc_id order as arrival "
    "proxy, 100 docs per batch): of each batch's distinct 3-token "
    "shingle hashes, the share never seen in ANY earlier batch — the "
    "crawl-snapshot diminishing-returns curve (RefinedWeb/C4 style): "
    "a feed whose novelty decays to near zero is re-crawling what the "
    "corpus already holds, so marginal batches fund no new tokens.  "
    "Plan: explode hashed shingles once (31-bit folded xxhash64, "
    "8-byte shuffle keys), distinct per (batch, hash), then TWO "
    "map-side-combinable aggregates — per-batch totals straight off "
    "the distinct table and a global MIN(batch) per hash whose "
    "group-by-first-batch recount yields the novel counts; NO "
    "join-back through the corpus-sized table, the three per-batch "
    "frames that meet in the final join are each O(batches) rows.  "
    "The oracle replays the identical hash fold, so even cross-batch "
    "fold collisions agree.  Tokenless docs count in n_docs but carry "
    "no shingles (operators.dedup.shingles contract).",
    tags=("dedup", "text", "agg"),
)
def ngram_novelty_by_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators import dedup as dd

    batch_size = 100
    docs = table(spark, sf_dir, "documents")
    batch = F.floor(F.col("doc_id") / F.lit(batch_size)).cast("bigint")
    hh = (
        docs.select(
            batch.alias("batch"),
            F.explode(dd.shingle_hashes("text", 3)).alias("h"),
        )
        .distinct()
        .persist()
    )
    tot = hh.groupBy("batch").agg(F.count(F.lit(1)).alias("n_shingles"))
    nov = (
        hh.groupBy("h")
        .agg(F.min("batch").alias("batch"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    nd = docs.groupBy(batch.alias("batch")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).cast("bigint")
    n_nov = F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint")
    out = (
        nd.join(tot, "batch", "left")
        .join(nov, "batch", "left")
        .select(
            "batch",
            "n_docs",
            n_sh.alias("n_shingles"),
            n_nov.alias("n_novel"),
            F.when(
                n_sh > 0, n_nov.cast("double") / n_sh
            ).alias("novelty_ratio"),
        )
        .persist()
    )
    out.count()
    hh.unpersist(blocking=True)
    return out


def _dup_by_length_oracle(band_chars: int = 100, threshold: float = 0.1) -> str:
    from planet_dump_ng_spark.plans.dedup_plans import _SHINGLES

    jac = (
        "len(list_intersect(a.sh, b.sh))::DOUBLE"
        " / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"
    )
    return f"""
    WITH sh AS (SELECT doc_id, source, {_SHINGLES} AS sh FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b
        ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE {jac} >= {threshold}),
    dup AS (
      SELECT DISTINCT doc_id FROM (
        SELECT id_a AS doc_id FROM pairs
        UNION ALL SELECT id_b AS doc_id FROM pairs))
    SELECT CAST(floor(d.n_chars / {band_chars}) AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_near_dup,
           CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*) AS near_dup_rate
    FROM documents d LEFT JOIN dup USING (doc_id)
    GROUP BY band
    """


@register(
    "near_dup_rate_by_length",
    _dup_by_length_oracle(),
    doc="Near-duplicate incidence by document length band (100-char "
    "bands): the share of each band's documents appearing in at least "
    "one verified near-dup pair (exact 3-shingle Jaccard >= 0.1, "
    "source-blocked — the dedup_ngram_jaccard pair table reused as a "
    "building block).  The curation diagnostic that tells you WHERE "
    "duplication mass lives — short boilerplate vs long mirrored "
    "articles — and hence which length regime near-dedup thresholds "
    "should be tuned against.  Plan: the pair table's inverted-index "
    "join (cost ∝ shared-shingle mass within source blocks), a "
    "distinct union of pair endpoints (near-dup-doc-sized), one "
    "left-semi-style broadcast join back to documents, one per-band "
    "aggregate.",
    tags=("dedup", "text", "agg"),
)
def near_dup_rate_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators import dedup as dd

    band_chars = 100
    docs = table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, k=3, threshold=0.1, block_col="source"
    )
    dup = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    n_dup = F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("bigint")
    out = (
        docs.join(dup, "doc_id", "left")
        .groupBy(
            F.floor(F.col("n_chars") / F.lit(band_chars))
            .cast("bigint")
            .alias("band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_dup.alias("n_near_dup"),
            (n_dup.cast("double") / F.count(F.lit(1))).alias(
                "near_dup_rate"
            ),
        )
    )
    return out


def _self_retrieval_oracle(
    min_q_mod: int = 29, target_queries: int = 64, max_q_terms: int = 32,
    k: int = 5, k1: float = 1.2, b: float = 0.75,
) -> str:
    from planet_dump_ng_spark.plans.text_plans import _mitchell_idf_sql

    idf = _mitchell_idf_sql("s.n_docs", "q.df")
    q_mod = (
        f"(SELECT GREATEST({min_q_mod}, COUNT(*) // {target_queries})"
        " FROM documents)"
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    tf AS MATERIALIZED (
      SELECT doc_id, w, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS w FROM t)
      GROUP BY doc_id, w),
    dfw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    qterms AS (
      SELECT q_doc, w, qtf, df FROM (
        SELECT tf.doc_id AS q_doc, tf.w, tf.tf AS qtf, dfw.df,
               ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, tf.w ASC) AS rn
        FROM tf JOIN dfw USING (w)
        WHERE tf.doc_id % {q_mod} = 0)
      WHERE rn <= {max_q_terms}),  -- q_mod: self-scaling sample modulus
    scored AS (
      SELECT q.q_doc, tf.doc_id,
             SUM(CAST(trunc(
               (CAST(q.qtf AS DOUBLE)
                * ({idf}
                   * ((CAST(tf.tf AS DOUBLE) * ({k1!r} + 1.0))
                      / (CAST(tf.tf AS DOUBLE) + {k1!r}
                         * (1.0 - {b!r}
                            + {b!r} * (CAST(dl.dl AS DOUBLE)
                                       / s.avgdl))))))
               * 1e9) AS BIGINT)) AS score_q
      FROM qterms q
      JOIN tf ON tf.w = q.w
      JOIN dl ON dl.doc_id = tf.doc_id, stats s
      GROUP BY q.q_doc, tf.doc_id),
    ranked AS (
      SELECT q_doc, doc_id,
             ROW_NUMBER() OVER (PARTITION BY q_doc
                                ORDER BY score_q DESC, doc_id ASC) AS rnk
      FROM scored),
    hit AS (SELECT q_doc, rnk FROM ranked WHERE doc_id = q_doc)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_1,
           CAST(SUM(CASE WHEN rnk <= {k} THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_k,
           CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS recall_at_1,
           CAST(SUM(CASE WHEN rnk <= {k} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS recall_at_k,
           CAST(SUM(CAST(trunc(1e12 / rnk) AS BIGINT)) AS BIGINT) AS mrr_q
    FROM hit
    """


@register(
    "bm25_self_retrieval_recall",
    _self_retrieval_oracle(),
    doc="Retrieval-quality eval for BM25 — the tuning-loop closure the "
    "ann_*_recall queries give the vector indexes, with NO labeled "
    "queries needed: every 29th document becomes its own more-like-"
    "this query (its top-32 terms by tf — Lucene MLT's bounded query "
    "width — each weighted by its query-side tf), and the metric is "
    "whether BM25 returns the source document at rank 1 / within "
    "top-5, plus an integer-quantized MRR.  A recall drop after a "
    "tokenizer or k1/b change means retrieval stopped finding the one "
    "document that IS the query.  This eval is what exposed the "
    "bit-length IDF's dead zone (bitlen(N)-bitlen(df) = 0 for every "
    "df > N/2 — all scores zero on a small-vocabulary corpus) and "
    "motivated the Mitchell-interpolated log2 IDF now in the shared "
    "kernel.  The query sample is CAPPED at ~64 docs by a "
    "self-scaling modulus (max(29, n//64), one scalar count, the "
    "derive-don't-knob discipline): eval precision doesn't grow with "
    "the corpus, so a fixed fraction would scale cost as queries x "
    "df — super-linear — where the cap keeps it at the df growth "
    "alone.  Plan: ONE (doc, word) tf table feeds everything (df, "
    "query-term election, scoring); scoring fan-out is Σ df(term) "
    "over ≤32 terms per query; both windows are partitioned "
    "(per-query-doc).  Engine-exact: Mitchell IDF (integer/bit ops + "
    "power-of-two division), 1e-9-truncated integer term sums, ties "
    "broken by doc_id.",
    tags=("text", "search", "eval"),
)
def bm25_self_retrieval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    min_q_mod, target_queries, max_q_terms, k = 29, 64, 32, 5
    k1, b = 1.2, 0.75
    docs = table(spark, sf_dir, "documents")
    # self-scaling sample modulus: ~target_queries query docs at ANY
    # corpus size (one scalar count — the same derive-don't-knob move
    # as semantic dedup's n_cells).  A fixed FRACTION would make eval
    # cost quadratic-ish under growth: queries x df both scale with n.
    q_mod = max(min_q_mod, docs.count() // target_queries)
    toks = docs.select("doc_id", tx.tokens("text").alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    # the one corpus-token-sized pass: everything below reads this table
    tf = (
        toks.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    dfw = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    rn = F.row_number().over(
        Window.partitionBy("q_doc").orderBy(
            F.col("qtf").desc(), F.col("w").asc()
        )
    )
    qterms = (
        tf.filter(F.col("doc_id") % q_mod == 0)
        .join(dfw, "w")
        .select(
            F.col("doc_id").alias("q_doc"),
            "w",
            F.col("tf").alias("qtf"),
            "df",
        )
        .withColumn("rn", rn)
        .filter(F.col("rn") <= max_q_terms)
        .drop("rn")
    )
    sat = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    term_score = F.col("qtf").cast("double") * (
        tx.log2_ratio_mitchell(F.col("n_docs"), F.col("df")) * sat
    )
    scored = (
        qterms.join(tf, "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("q_doc", "doc_id")
        .agg(
            F.sum((term_score * 1e9).cast("long")).cast("bigint")
            .alias("score_q")
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("q_doc").orderBy(
            F.col("score_q").desc(), F.col("doc_id").asc()
        )
    )
    hit = (
        scored.select("q_doc", "doc_id", rnk.alias("rnk"))
        .filter(F.col("doc_id") == F.col("q_doc"))
        .persist()
    )
    out = hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum((F.col("rnk") == 1).cast("int")).cast("bigint")
        .alias("hits_at_1"),
        F.sum((F.col("rnk") <= k).cast("int")).cast("bigint")
        .alias("hits_at_k"),
        (
            F.sum((F.col("rnk") == 1).cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("recall_at_1"),
        (
            F.sum((F.col("rnk") <= k).cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("recall_at_k"),
        F.sum((F.lit(1e12) / F.col("rnk")).cast("long")).cast("bigint")
        .alias("mrr_q"),
    ).persist()
    out.count()
    tf.unpersist(blocking=True)
    hit.unpersist(blocking=True)
    return out


def _snapshot_diff_oracle() -> str:
    return """
    WITH old AS (
      SELECT doc_id, source, md5(text) AS h, n_chars
      FROM documents WHERE doc_id % 10 <> 9),
    new AS (
      SELECT doc_id, source,
             md5(CASE WHEN doc_id % 7 = 3 THEN upper(text) ELSE text END)
               AS h,
             n_chars
      FROM documents WHERE doc_id % 10 <> 0),
    j AS (
      SELECT COALESCE(old.source, new.source) AS source,
             CASE WHEN old.h IS NULL THEN 'added'
                  WHEN new.h IS NULL THEN 'removed'
                  WHEN old.h <> new.h THEN 'changed'
                  ELSE 'unchanged' END AS cls,
             COALESCE(new.n_chars, 0) - COALESCE(old.n_chars, 0)
               AS char_delta
      FROM old FULL OUTER JOIN new USING (doc_id))
    SELECT source,
           CAST(SUM(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(SUM(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(SUM(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unchanged,
           CAST(SUM(char_delta) AS BIGINT) AS char_delta
    FROM j GROUP BY source
    """


@register(
    "corpus_snapshot_diff",
    _snapshot_diff_oracle(),
    doc="Snapshot reconciliation between two corpus versions — the "
    "crawl-v1-vs-crawl-v2 governance audit (what entered, what left, "
    "what was edited in place, and the net character mass, per "
    "source feed).  Snapshots derive deterministically from the one "
    "documents table (old = doc_id%10!=9, new = doc_id%10!=0 with "
    "every 7th-mod-3 doc 'edited' to uppercase), the same "
    "fixture-from-the-table discipline dedup_incremental_lsh and "
    "hll_merge_weekly use.  Plan: content compared by md5 (the "
    "store-the-hash-column production pattern — the full-outer join "
    "carries 16-byte digests, never text bodies), ONE full-outer "
    "join co-partitioned on doc_id, one per-source aggregate; every "
    "class count and the char delta are exact integers.",
    tags=("curation", "join", "agg"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 9).select(
        "doc_id",
        F.col("source").alias("src_a"),
        F.md5("text").alias("h_a"),
        F.col("n_chars").alias("nc_a"),
    )
    new = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .withColumn(
            "text2",
            F.when(
                F.col("doc_id") % 7 == 3, F.upper(F.col("text"))
            ).otherwise(F.col("text")),
        )
        .select(
            "doc_id",
            F.col("source").alias("src_b"),
            F.md5("text2").alias("h_b"),
            F.col("n_chars").alias("nc_b"),
        )
    )
    j = old.join(new, "doc_id", "full_outer")
    cls = (
        F.when(F.col("h_a").isNull(), F.lit("added"))
        .when(F.col("h_b").isNull(), F.lit("removed"))
        .when(F.col("h_a") != F.col("h_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    delta = F.coalesce(F.col("nc_b"), F.lit(0)) - F.coalesce(
        F.col("nc_a"), F.lit(0)
    )
    return (
        j.select(
            F.coalesce(F.col("src_a"), F.col("src_b")).alias("source"),
            cls.alias("cls"),
            delta.alias("char_delta"),
        )
        .groupBy("source")
        .agg(
            F.sum((F.col("cls") == "added").cast("int")).cast("bigint")
            .alias("n_added"),
            F.sum((F.col("cls") == "removed").cast("int")).cast("bigint")
            .alias("n_removed"),
            F.sum((F.col("cls") == "changed").cast("int")).cast("bigint")
            .alias("n_changed"),
            F.sum((F.col("cls") == "unchanged").cast("int")).cast("bigint")
            .alias("n_unchanged"),
            F.sum("char_delta").cast("bigint").alias("char_delta"),
        )
    )


@register(
    "tokenizer_fertility_by_lang",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
             AS bpe_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           CASE WHEN CAST(SUM(len({_TOKS})) AS BIGINT) > 0
                THEN CAST(SUM(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS DOUBLE)
                     / CAST(SUM(len({_TOKS})) AS BIGINT)
           END AS fertility,
           CASE WHEN CAST(SUM(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) > 0
                THEN CAST(SUM(length(text)) AS DOUBLE)
                     / CAST(SUM(len(regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
           END AS chars_per_bpe_token
    FROM documents
    GROUP BY lang
    """,
    doc="Tokenizer fertility per language: subword-per-word ratio "
    "(BPE-ish regex tokens / whitespace words) and chars-per-subword, "
    "aggregated per lang — the multilingual token-budget planning "
    "table (mT5/BLOOM-style): a language whose fertility is 2x "
    "another's costs 2x the compute per word, which is exactly what "
    "temperature resampling and mix weights must price in; a fertility "
    "shift after a tokenizer change is the regression alarm.  Plan: "
    "map-only feature scan (two regex extractions fused in one "
    "projection), one #langs-row aggregate of exact integer sums; the "
    "two ratios are single divisions of exact BIGINTs, zero-guarded "
    "per group.",
    tags=("text", "agg", "eval"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    ws = F.sum(F.size(tx.tokens("text"))).cast("bigint")
    bpe = F.sum(tx.bpe_ish_token_count("text")).cast("bigint")
    chars = F.sum(F.length("text")).cast("bigint")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        chars.alias("n_chars"),
        F.when(ws > 0, bpe.cast("double") / ws).alias("fertility"),
        F.when(bpe > 0, chars.cast("double") / bpe).alias(
            "chars_per_bpe_token"
        ),
    )


def _heldout_surprisal_oracle(holdout_mod: int = 10) -> str:
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(toks[1:len(toks)-1]) AS p,
                  unnest(toks[2:len(toks)]) AS w
           FROM t),
    trainbg AS (SELECT p, w FROM bg WHERE doc_id % {holdout_mod} <> 0),
    cnt AS (SELECT p, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM trainbg GROUP BY p, w),
    pc AS (SELECT p, CAST(SUM(c) AS BIGINT) AS cp FROM cnt GROUP BY p),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM trainbg),
    h AS (
      SELECT bg.doc_id,
             CASE WHEN cnt.c IS NOT NULL
                    THEN length(bin(pc.cp)) - length(bin(cnt.c))
                  WHEN pc.cp IS NOT NULL
                    THEN length(bin(pc.cp)) + 1
                  ELSE length(bin(tot.nb)) + 1 END AS bits,
             CASE WHEN cnt.c IS NULL THEN 1 ELSE 0 END AS is_oov
      FROM bg
      LEFT JOIN cnt ON cnt.p = bg.p AND cnt.w = bg.w
      LEFT JOIN pc ON pc.p = bg.p, tot
      WHERE bg.doc_id % {holdout_mod} = 0)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(is_oov) AS BIGINT) AS n_oov_bigrams,
           CAST(SUM(bits) AS BIGINT) AS total_bits,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_bits
    FROM h GROUP BY doc_id
    """


@register(
    "heldout_bigram_surprisal",
    _heldout_surprisal_oracle(),
    doc="Held-out bigram-LM surprisal — doc_bigram_surprisal done "
    "honestly: the bigram model trains on the 90% of docs with "
    "doc_id%10!=0 and scores ONLY the held-out 10%, so a document "
    "never lowers its own surprisal (the train-on-test flattery the "
    "in-corpus variant accepts for cheapness).  Backoff is integer-"
    "exact and bounded: a seen bigram costs floor-log2(count(prev)) - "
    "floor-log2(count(prev,next)) bits; a novel continuation of a "
    "seen context costs floor-log2(count(prev)))+1 (less than the "
    "uniform-over-train floor); a novel context costs "
    "floor-log2(total train bigrams)+1 — the worst case, analogous "
    "to add-one mass.  n_oov_bigrams is the OOV-rate companion "
    "metric.  Plan: one tokenize+zip pass feeds both sides (train "
    "counts AND held-out instances), bigram-vocab-sized count "
    "aggregate, two left joins (bigram, then context), one per-doc "
    "aggregate; every quantity before the final mean division is an "
    "exact integer.",
    tags=("text", "agg", "eval"),
)
def heldout_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    holdout_mod = 10
    d = table(spark, sf_dir, "documents")
    def _pair_body(toks):
        # let-bound token array (text.bind): 5 references, one tokenizer
        # evaluation per row (identical output)
        gl = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
        return F.zip_with(
            F.slice(toks, 1, gl),
            F.slice(toks, 2, gl),
            lambda p, w: F.struct(p.alias("p"), w.alias("w")),
        )

    pair = tx.bind(tx.tokens("text"), _pair_body)
    bg = (
        d.select("doc_id", F.explode(pair).alias("b"))
        .select("doc_id", F.col("b.p").alias("p"), F.col("b.w").alias("w"))
        .persist()
    )
    train = bg.filter(F.col("doc_id") % holdout_mod != 0)
    cnt = train.groupBy("p", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    pc = cnt.groupBy("p").agg(F.sum("c").cast("bigint").alias("cp"))
    tot = train.agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    bits = (
        F.when(
            F.col("c").isNotNull(),
            F.length(F.bin(F.col("cp"))) - F.length(F.bin(F.col("c"))),
        )
        .when(
            F.col("cp").isNotNull(), F.length(F.bin(F.col("cp"))) + F.lit(1)
        )
        .otherwise(F.length(F.bin(F.col("nb"))) + F.lit(1))
    )
    out = (
        bg.filter(F.col("doc_id") % holdout_mod == 0)
        .join(cnt, ["p", "w"], "left")
        .join(pc, "p", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            bits.alias("bits"),
            F.col("c").isNull().cast("int").alias("is_oov"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("is_oov").cast("bigint").alias("n_oov_bigrams"),
            F.sum("bits").cast("bigint").alias("total_bits"),
            (F.sum("bits").cast("double") / F.count(F.lit(1))).alias(
                "mean_bits"
            ),
        )
        .persist()
    )
    out.count()
    bg.unpersist(blocking=True)
    return out


def _value_outlier_oracle() -> str:
    return """
    WITH c AS (
      SELECT event_type,
             CAST(trunc(value * 100 + 0.5) AS HUGEINT) AS cents
      FROM events),
    g AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
                 SUM(cents) AS s, SUM(cents * cents) AS q
          FROM c GROUP BY event_type)
    SELECT g.event_type,
           CAST(g.n AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN (g.n * c.cents - g.s)
                              * (g.n * c.cents - g.s)
                           > 9 * (g.n * g.q - g.s * g.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN (g.n * c.cents - g.s)
                              * (g.n * c.cents - g.s)
                           > 9 * (g.n * g.q - g.s * g.s)
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(g.n AS BIGINT) AS outlier_share
    FROM c JOIN g USING (event_type)
    GROUP BY g.event_type, g.n
    """


@register(
    "value_outliers_by_type",
    _value_outlier_oracle(),
    doc="Exact 3-sigma outlier screening per event type — the "
    "data-quality gate that flags an instrumentation feed whose value "
    "distribution grew a tail (unit mixups, fat-finger amounts) "
    "before it poisons downstream aggregates; the point-level "
    "companion to value_drift_tv's distribution-level alarm.  The "
    "trick: the z-score test needs NO sqrt, NO division, NO float "
    "moments — with quantized integer cents c and exact group sums "
    "S=Sigma c, Q=Sigma c^2, |c-mu|>3sigma is the all-integer "
    "inequality (n*c-S)^2 > 9*(nQ-S^2), evaluated in 128-bit-wide "
    "exact arithmetic (Spark decimal(38,0), DuckDB HUGEINT), so the "
    "engines agree on every boundary case where a float sigma could "
    "flip a comparison (~2% of events qualify on the gate data — "
    "the branch is exercised, not vacuous).  Plan: one groupBy for "
    "the three moments (map-side combinable), broadcast join back "
    "(one row per type), one classify-and-count pass.",
    tags=("relational", "agg", "eval"),
)
def value_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    c = events.select(
        "event_type",
        (F.col("value") * 100 + 0.5).cast("long").cast(dec).alias("cents"),
    )
    g = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("cents").cast(dec).alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast(dec)).cast(dec)
        .alias("q"),
    )
    d = F.col("n") * F.col("cents") - F.col("s")
    is_out = (d * d) > F.lit(9).cast(dec) * (
        F.col("n") * F.col("q") - F.col("s") * F.col("s")
    )
    return (
        c.join(F.broadcast(g), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.sum(is_out.cast("int")).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            "n_outliers",
            (
                F.col("n_outliers").cast("double")
                / F.col("n").cast("bigint")
            ).alias("outlier_share"),
        )
    )
