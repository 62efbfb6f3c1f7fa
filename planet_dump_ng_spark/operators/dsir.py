"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Selects raw-corpus documents that look like a TARGET distribution by
scoring each document under two bag-of-hashed-n-gram unigram models:

    log w(doc) = sum_g  [ log p_target(bucket(g)) - log p_raw(bucket(g)) ]

over the document's unigram + bigram instances ``g``, each hashed into
one of ``n_buckets`` feature buckets (the paper's hashed n-gram
features).  Documents whose feature mass concentrates where the target
corpus concentrates get high weights; boilerplate/off-domain docs get
low ones.  Selection is deterministic top-k by mean per-feature weight
(the paper resamples with Gumbel noise; a hash-seeded Gumbel would bolt
on here, but the engine's samplers are deliberately RNG-free).

Spark-first shape (and why it scales):

- ONE tokenize+explode pass produces (doc_id, bucket) feature
  instances; bucket = ``pmod(xxhash64(gram), n_buckets)`` — the same
  JVM-side hash the LSH banding uses, with the same DuckDB inline
  replica (plans/duck_xxh64.py), so the whole technique is
  hash-oracle-able.
- The two n-gram language models collapse into ONE map-side-combinable
  aggregate keyed by ``bucket`` (<= n_buckets rows carry both the raw
  count and the target count) — the shuffle after the corpus scan is
  bucket-sized, not corpus-sized.
- Bucket scores are a <= n_buckets-row dimension, BROADCAST back onto
  the feature stream; per-doc weights are one more map-side-combinable
  aggregate.  Nothing in the plan shuffles more than (doc count +
  n_buckets) rows after the scan.
- No libm: per-bucket log-ratios use a Q20 fixed-point Mitchell log2
  (integer/bit arithmetic only, see :func:`ilog2_q20`), so the per-doc
  weight is an exact BIGINT SUM — order-independent and bit-identical
  across Spark, DuckDB and Python, where a float ``ln()`` sum would be
  association-order noise.

Operating bounds (documented, asserted in tests): ``ilog2_q20`` needs
``1 <= n <= d`` and ``d < 2**33`` (so ``n * 2**20`` stays exact in the
bigint/double paths).  Totals here are n-gram INSTANCE counts: 2**33 ~
8.6e9 gram instances per model.  Beyond that, raise the Q20 scale or
shard the totals; the smoothed probabilities themselves never underflow
the fixed point because ``rq`` is clamped at 1 (a score floor of
-20 bits per feature).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import text as tx

FORMAT = "dsir-model-v1"
#: the feature recipe the scores were trained under — a model applied
#: with a different featurizer scores garbage, so serving validates it
FEATURIZER = "tokens-v1+bigram/xxh64"

#: Q20 fixed point: scores are integer multiples of 2^-20 bits.
Q20 = 1 << 20

#: ilog2_q20's exact-integer window: every denominator (gram-instance
#: total + n_buckets) must stay below this for the _idiv double division
#: to be exact.  Enforced at artifact-write time (write_dsir_model) AND
#: inline at score evaluation (_scores_from_features).
EXACT_LOG_WINDOW = 1 << 33


def _idiv(n: Column, d: Column) -> Column:
    """Exact integer division for non-negative bigints with ``n < 2**53``.

    ``(n - pmod(n, d)) / d``: the numerator is an exact multiple of
    ``d`` and representable in a double, so the one float division is
    exact — no ``div`` parser syntax, no floor-after-rounding hazard.
    """
    return ((n - F.pmod(n, d)) / d).cast("long")


def ilog2_q20(n: Column, d: Column) -> Column:
    """Integer Mitchell log2(n/d) in Q20 fixed point (bits * 2^20).

    The integer twin of operators.text.log2_ratio_mitchell: with
    ``rq = (n * 2^20) div d`` (clamped at 1) and ``e = bitlen(rq) - 1``,

        ilog2_q20(n, d) = (e - 20) * 2^20 + ((rq - 2^e) * 2^20) div 2^e

    Pure bigint/bit arithmetic — Spark, DuckDB (plans/dsir_plans
    ``_ilog2_q20_sql``) and Python agree bit-for-bit, and SUMs of it are
    order-independent where float log sums are not.  Max error vs true
    log2 is Mitchell's ~0.086 bits plus a log2(1 + 1/rq) truncation
    term (material only near the 2^-20 clamp floor, where rq is
    small); monotone in n/d; 0 when n == d.

    Requires ``1 <= n <= d < 2**33`` (ratio <= 1: every intermediate
    stays under 2**41, inside the exact-double window of
    :func:`_idiv`).  Ratios below 2^-20 clamp to -20 bits.
    """
    n = n.cast("bigint")
    d = d.cast("bigint")
    rq = F.greatest(_idiv(n * F.lit(Q20), d), F.lit(1).cast("bigint"))
    e = (F.length(F.bin(rq)) - F.lit(1)).cast("int")
    p2 = F.call_function("shiftleft", F.lit(1).cast("bigint"), e)
    frac = _idiv((rq - p2) * F.lit(Q20), p2)
    return (e.cast("bigint") - F.lit(20)) * F.lit(Q20) + frac


def grams_from_tokens(toks: Column) -> Column:
    """Unigrams ++ adjacent bigrams of a BOUND token-array column.

    The bigram list is guarded empty below 2 tokens — Spark's
    ``sequence(1, 0)`` would COUNT DOWN, not yield empty (DuckDB's
    ``range`` handles it; the oracle needs no guard).

    ``toks`` must be a projected column (attribute), not the
    tokenization expression itself: ``toks`` is referenced INSIDE the
    transform lambda, and Spark re-evaluates a captured expression per
    lambda call — handing it ``tokens(text)`` re-splits the whole text
    for every bigram, O(len^2) per document (measured 15x on the
    bench corpus).  :func:`hashed_gram_features` projects first.
    """
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def gram_array(text_col: Column | str) -> Column:
    """One-expression unigram+bigram builder — unit-test convenience.

    Fine on a handful of rows; for corpus-scale extraction use
    :func:`hashed_gram_features`, which projects the token array once
    (see :func:`grams_from_tokens` for the O(len^2) lambda-capture
    hazard this avoids).
    """
    return grams_from_tokens(tx.tokens(text_col))


def hashed_gram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket) hashed n-gram feature instances, one row per gram.

    ``carry`` names extra columns to thread through (e.g. the target
    flag).  The explode is a map-only ~2x row expansion (unigrams +
    bigrams); everything downstream aggregates it immediately.  The
    token array is PROJECTED before the bigram lambda touches it —
    see :func:`grams_from_tokens` for why that ordering matters.
    """
    t = df.select(id_col, *carry, tx.tokens(text_col).alias("__toks"))
    feats = t.select(
        id_col,
        *carry,
        F.explode(grams_from_tokens(F.col("__toks"))).alias("gram"),
    )
    return feats.select(
        id_col,
        *carry,
        F.pmod(F.xxhash64(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
    )


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, ``__buckets`` array<bigint>) — each document's hashed-gram
    feature instances kept as ONE array row instead of exploded
    instances.  Map-only: the per-doc scoring fold
    (:func:`_weights_from_buckets`) reads the array in place, so no
    per-instance row ever exists, let alone shuffles.  The model
    aggregate still wants instances; it explodes THIS table (after its
    one materialization), which is a map-side expansion feeding a
    partial aggregate — never an exchange of instance rows."""
    t = df.select(id_col, *carry, tx.tokens(text_col).alias("__toks"))
    return t.select(
        id_col,
        *carry,
        F.transform(
            grams_from_tokens(F.col("__toks")),
            lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)),
        ).alias("__buckets"),
    )


def _weights_from_buckets(
    bk: DataFrame, scores: DataFrame, id_col: str, n_buckets: int
) -> DataFrame:
    """Per-document weights from a (id, __buckets) table and a bucket-
    score dimension — the dimension rides as ONE broadcast DENSE-ARRAY
    row (position b+1 holds bucket b's delta, null = bucket absent)
    and each doc folds its bucket array against it in a single
    Project: no explode, no per-instance join, no regroup-by-doc
    exchange, and every lookup is an O(1) array index (a
    map_from_entries dimension measured 3x SLOWER than the exploded
    join it replaced: Catalyst's GetMapValue is a linear scan, 4096
    comparisons per gram instance).  Buckets absent from the dimension
    are dropped per instance and docs with no surviving instance emit
    no row — exactly the inner-join semantics of the exploded form;
    the Q20 sums are exact BIGINTs, so the fold order cannot change
    the value."""
    sm = scores.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("delta_q20")))
        ).alias("__sm")
    ).select(
        # densify ONCE on the 1-row dimension (nb linear lookups of an
        # nb-entry map, trivial), so the per-instance path never scans
        F.transform(
            F.sequence(F.lit(0), F.lit(n_buckets - 1)),
            lambda i: F.element_at(F.col("__sm"), i.cast("bigint")),
        ).alias("__sd")
    )
    matched = F.filter(
        F.transform(
            F.col("__buckets"),
            lambda b: F.element_at(
                F.col("__sd"), (b + F.lit(1)).cast("int")
            ),
        ),
        lambda v: v.isNotNull(),
    )

    def body(m: Column) -> Column:
        s = F.aggregate(
            m, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        )
        return F.struct(
            F.size(m).cast("bigint").alias("n_feats"),
            s.alias("logw_q20"),
            (s.cast("double") / F.lit(float(Q20))).alias("logw_bits"),
        )

    return (
        tx.bind_struct(
            bk.join(F.broadcast(sm)),
            matched,
            body,
            ["n_feats", "logw_q20", "logw_bits"],
        )
        .filter(F.col("n_feats") > 0)
        .select(id_col, "n_feats", "logw_q20", "logw_bits")
    )


def dsir_bucket_scores(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-bucket Q20 log-ratio scores — the trained DSIR "model".

    One aggregate computes BOTH hashed-ngram language models (the
    target rows are a subset of the raw corpus, so ``raw_count`` counts
    every instance and ``target_count`` the flagged ones), then each
    bucket scores

        delta_q20 = ilog2_q20(tc + 1, tt + B) - ilog2_q20(rc + 1, rt + B)

    — the add-one-smoothed log p_target/p_raw in Q20 bits.  Returns
    (bucket, target_count, raw_count, delta_q20), <= n_buckets rows: a
    broadcastable dimension and a natural persisted artifact.
    """
    feats = hashed_gram_features(
        df.withColumn("__is_t", target.cast("long")),
        text_col=text_col,
        n_buckets=n_buckets,
        carry=("__is_t",),
    )
    return _scores_from_features(feats, n_buckets)


def _scores_from_features(feats: DataFrame, n_buckets: int) -> DataFrame:
    """Bucket-score dimension from a (.., __is_t, bucket) feature table.

    The delta is guarded by :func:`ilog2_q20`'s exact-integer window
    (``d < 2**33``): past ~8.6e9 gram instances the float division in
    ``_idiv`` silently rounds and Spark/DuckDB/Python deltas diverge.
    ``write_dsir_model`` enforces this at artifact-write time; the
    inline paths (``dsir_bucket_scores``, ``dsir_importance_weights``
    with ``scores=None``, the registry queries) run through here, so
    the same bound fails LOUDLY at evaluation instead of losing
    exactness — a per-row ``raise_error`` branch that never fires
    inside the window (tt <= rt, so the raw total is the binding one).
    """
    per_bucket = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_count"),
        F.sum("__is_t").cast("bigint").alias("target_count"),
    )
    tots = per_bucket.agg(
        F.sum("raw_count").cast("bigint").alias("rt"),
        F.sum("target_count").cast("bigint").alias("tt"),
    )
    b = F.lit(n_buckets).cast("bigint")
    delta = ilog2_q20(F.col("target_count") + 1, F.col("tt") + b) - ilog2_q20(
        F.col("raw_count") + 1, F.col("rt") + b
    )
    guarded = F.when(
        F.col("rt") + b >= F.lit(EXACT_LOG_WINDOW).cast("bigint"),
        F.raise_error(
            F.concat(
                F.lit("DSIR totals overflow the exact-integer log window: "),
                F.col("rt").cast("string"),
                F.lit(
                    f" raw feature instances + {n_buckets} buckets >= 2^33;"
                    " train per-shard models or reduce the corpus slice"
                ),
            )
        ).cast("bigint"),
    ).otherwise(delta)
    return per_bucket.crossJoin(F.broadcast(tots)).select(
        "bucket",
        "target_count",
        "raw_count",
        guarded.alias("delta_q20"),
    )


def dsir_importance_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scores: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weights.

    (doc_id, n_feats, logw_q20, logw_bits): ``logw_q20`` is the exact
    BIGINT sum of the doc's per-feature Q20 scores (hash-stable across
    engines); ``logw_bits`` the same in float bits (exact: a division
    by 2^20).  Docs with no tokens emit no features and are absent —
    they carry no evidence either way.

    Pass ``scores`` to apply a PRE-TRAINED bucket-score dimension (the
    train-once/apply-anywhere shape: score a new crawl batch under a
    frozen target model without rescanning the reference corpus).

    When training inline (``scores=None``), the tokenize pass is
    materialized ONCE as per-doc bucket ARRAYS (lazy localCheckpoint —
    no stranded CacheManager entry); the bucket-model aggregate
    explodes that checkpoint (map-side expansion into a partial
    aggregate) and the per-doc weights fold the same arrays against
    the broadcast score map: at corpus scale the tokenize scan runs
    once and NO per-instance row ever crosses an exchange (the
    pre-round-10 shape shuffled every instance through a join and a
    regroup-by-doc).
    """
    if scores is None:
        bk = hashed_gram_buckets(
            df.withColumn("__is_t", target.cast("long")),
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
            carry=("__is_t",),
        ).localCheckpoint(eager=False)
        scores = _scores_from_features(
            bk.select("__is_t", F.explode("__buckets").alias("bucket")),
            n_buckets,
        )
        bk = bk.drop("__is_t")
    else:
        bk = hashed_gram_buckets(
            df, text_col=text_col, id_col=id_col, n_buckets=n_buckets
        )
    return _weights_from_buckets(
        bk, scores.select("bucket", "delta_q20"), id_col, n_buckets
    )


def dsir_topk_select(
    df: DataFrame,
    target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic DSIR selection: top-k docs by MEAN per-feature
    weight (total weight is length-biased — a long off-domain doc with
    many mildly-positive buckets would outscore a short on-domain one).

    orderBy+limit lowers to TakeOrderedAndProject (a per-partition
    heap + driver merge of k rows, never a global sort); (mean, doc_id)
    is a total order, so the selected SET is deterministic.
    """
    w = dsir_importance_weights(
        df, target, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    mean_bits = (
        F.col("logw_q20").cast("double") / F.col("n_feats") / F.lit(float(Q20))
    ).alias("mean_logw_bits")
    return (
        w.select(id_col, "n_feats", "logw_q20", mean_bits)
        .orderBy(F.col("mean_logw_bits").desc(), id_col)
        .limit(k)
    )


def write_dsir_model(
    df: DataFrame,
    target: Column,
    model_dir: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    target_desc: str = "",
    _feats: DataFrame | None = None,
) -> dict:
    """Train the DSIR bucket-score model once and persist it:
    ``scores`` (bucket, target_count, raw_count, delta_q20 — exact
    integers, so the artifact round-trips bit-perfectly) and
    ``meta.json`` LAST as the commit marker (read_dsir_model requires
    it, so a half-written artifact reads as no artifact; any
    PRE-EXISTING header is deleted first so a retrain that crashes
    mid-write can never leave the old header validating new
    half-written scores — the tokenizer/dedup artifact protocol).

    The model is <= n_buckets rows regardless of corpus size: training
    cost is the one feature scan, the artifact itself is dimension-
    sized and broadcastable forever after.  ``target_desc`` records
    WHAT the target predicate was (provenance for the header; the
    predicate itself is a plan-side Column and not serializable).

    ``_feats``: internal — a pre-built, pre-materialized feature table
    (id, __is_t, bucket), so a caller that also needs to SCORE the
    training corpus (:func:`dsir_train_and_score`) pays the feature
    scan once, not twice.
    """
    d = model_dir.rstrip("/")
    os.makedirs(d, exist_ok=True)
    meta_path = f"{d}/meta.json"
    if os.path.exists(meta_path):
        os.remove(meta_path)
    if _feats is None:
        # training needs no document identity — only the (is_t, bucket)
        # instances — so the feature scan carries a constant id and the
        # input corpus may use ANY id column name
        _feats = hashed_gram_features(
            df.withColumn("__is_t", target.cast("long")).withColumn(
                "__train_id", F.lit(0)
            ),
            text_col=text_col,
            id_col="__train_id",
            n_buckets=n_buckets,
            carry=("__is_t",),
        )
    scores = _scores_from_features(_feats, n_buckets)
    scores.coalesce(1).write.mode("overwrite").parquet(f"{d}/scores")
    persisted = df.sparkSession.read.parquet(f"{d}/scores")
    tot = persisted.agg(
        F.sum("raw_count").cast("bigint").alias("rt"),
        F.sum("target_count").cast("bigint").alias("tt"),
        F.count(F.lit(1)).alias("nb"),
    ).first()
    if not tot["tt"]:
        # no header is ever written, so the half-built scores table
        # reads as "not a model" — the usual crash-window shape
        raise ValueError(
            "DSIR target predicate matched no feature instances "
            f"(raw instances: {tot['rt'] or 0}) — a model with an "
            "empty target distribution would score every document "
            "identically; fix the predicate (recorded desc: "
            f"{target_desc!r})"
        )
    if (tot["rt"] or 0) + n_buckets >= EXACT_LOG_WINDOW:
        # ilog2_q20's exact-integer window (docstring: 1 <= n <= d <
        # 2^33).  Past it the float division inside _idiv rounds and
        # the written deltas would silently diverge from the DuckDB /
        # pure-Python twins — refuse BEFORE the header commits, same
        # crash-window shape as above.  At that corpus mass, shard the
        # model (per-source/per-shard totals) or raise the Q scale.
        raise ValueError(
            f"DSIR totals overflow the exact-integer log window: "
            f"{tot['rt']} raw feature instances + {n_buckets} buckets "
            ">= 2^33; train per-shard models or reduce the corpus slice"
        )
    meta = {
        "format": FORMAT,
        "featurizer": FEATURIZER,
        "n_buckets": n_buckets,
        "n_occupied_buckets": tot["nb"],
        "n_feats_raw": tot["rt"] or 0,
        "n_feats_target": tot["tt"] or 0,
        "target_desc": target_desc,
    }
    with open(meta_path, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    return meta


def dsir_train_and_score(
    df: DataFrame,
    target: Column,
    model_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    target_desc: str = "",
) -> tuple[dict, DataFrame]:
    """Train + persist the model AND score the training corpus in ONE
    feature scan (the curate() gate's shape): the feature table is
    materialized once (lazy localCheckpoint — no stranded cache entry)
    and feeds the bucket-model aggregate, the artifact write, and the
    per-doc weight join.  Weights are computed against the PERSISTED
    scores table, so what gates the corpus is exactly what later
    increments will score under (and the values are exact integers, so
    read-back changes nothing).  Returns (meta, weights)."""
    bk = hashed_gram_buckets(
        df.withColumn("__is_t", target.cast("long")),
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        carry=("__is_t",),
    ).localCheckpoint(eager=False)
    meta = write_dsir_model(
        df,
        target,
        model_dir,
        text_col=text_col,
        n_buckets=n_buckets,
        target_desc=target_desc,
        _feats=bk.select(
            id_col, "__is_t", F.explode("__buckets").alias("bucket")
        ),
    )
    scores = df.sparkSession.read.parquet(f"{model_dir.rstrip('/')}/scores")
    w = _weights_from_buckets(
        bk.drop("__is_t"), scores.select("bucket", "delta_q20"), id_col,
        n_buckets,
    )
    return meta, w


def read_dsir_model(
    spark: SparkSession, model_dir: str
) -> tuple[DataFrame, dict]:
    """Load (scores, meta) from a persisted DSIR model; loud error for
    a non-model directory or a foreign format/featurizer — a scorer
    pointed at the wrong artifact must refuse, not weight garbage."""
    d = model_dir.rstrip("/")
    meta_path = f"{d}/meta.json"
    if not os.path.exists(meta_path):
        raise ValueError(f"{model_dir} has no meta.json — not a DSIR model")
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    if meta.get("format") != FORMAT:
        raise ValueError(
            f"{model_dir} is format {meta.get('format')!r}, expected {FORMAT}"
        )
    if meta.get("featurizer") != FEATURIZER:
        raise ValueError(
            f"{model_dir} was trained under featurizer "
            f"{meta.get('featurizer')!r}; this build extracts {FEATURIZER!r}"
            " — scores from a different feature recipe are meaningless"
        )
    return spark.read.parquet(f"{d}/scores"), meta


def dsir_score_with_model(
    docs: DataFrame,
    model_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a (new) corpus under a FROZEN persisted model — the
    train-once/apply-anywhere serving path: one feature scan over the
    batch, broadcast join of the dimension-sized score table, one
    per-doc aggregate.  Pinned bit-equal to inline training over the
    same corpus in tests/test_dsir.py."""
    scores, meta = read_dsir_model(docs.sparkSession, model_dir)
    return dsir_importance_weights(
        docs,
        F.lit(False),
        text_col=text_col,
        id_col=id_col,
        n_buckets=meta["n_buckets"],
        scores=scores,
    )
