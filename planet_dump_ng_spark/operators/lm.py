"""Frozen bigram-LM artifact: the CCNet-style perplexity signal as a
persisted train-once / score-anywhere model, powering the
``curate(max_surprisal_bits=)`` quality gate.

CCNet (Wenzek et al. 2020, public) filters crawl text by the perplexity
of a language model trained on a trusted corpus — text whose word
TRANSITIONS the model finds surprising is boilerplate, spam, or noise
even when its vocabulary looks ordinary.  This module is that signal
under the repo's oracle-exactness discipline (no libm anywhere):

- the model is the exact integer bigram count tables ``cnt (p, w, c)``
  and ``ctx (p, cp)`` plus the 1-row total, persisted meta-LAST with
  the same crash-window protocol as the DSIR/tokenizer/prefix-index
  artifacts (``operators/dsir.py:330``) — a half-written model reads
  as no model;
- scoring is bit-length arithmetic (``length(bin(x))`` =
  floor(log2 x)+1): a seen bigram costs ``bitlen(cp) - bitlen(c)``
  bits, a novel continuation of a seen context ``bitlen(cp) + 1``, a
  novel context ``bitlen(nb) + 1`` — the bounded integer backoff the
  ``heldout_bigram_surprisal`` registry query pins against DuckDB.

Scale shape: training is ONE tokenize+zip scan plus a
bigram-vocab-sized aggregate (map-side combinable; the vocabulary is
sublinear in corpus mass).  Scoring shuffles only ``(p, w)`` string
pairs — never documents — through two equi-joins against the count
tables; the 1-row total rides a broadcast.  Nothing here collects to
the driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from planet_dump_ng_spark.operators import text as tx

FORMAT = "bigram-lm-v1"
#: provenance of the instance extraction — a model trained under a
#: different tokenization must refuse to score, not weight garbage
FEATURIZER = "tokens-v1/bigram"


def _bitlen(c):
    """floor(log2(x)) + 1 for positive ints — integer-exact, no libm."""
    return F.length(F.bin(c)).cast("long")


def bigram_instances(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, p, w)`` — one row per adjacent token pair per document,
    the single tokenize+zip scan both training and scoring run on.
    Docs with <2 tokens emit nothing (no transition evidence)."""
    def body(toks):
        # let-bound token array (text.bind): the zip/slice pair builder
        # references it 5 times; binding runs the regex tokenizer once
        # per row (identical output)
        gl = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
        return F.zip_with(
            F.slice(toks, 1, gl),
            F.slice(toks, 2, gl),
            lambda p, w: F.struct(p.alias("p"), w.alias("w")),
        )

    pair = tx.bind(tx.tokens(text_col), body)
    return df.select(
        F.col(id_col).alias("id"), F.explode(pair).alias("b")
    ).select("id", F.col("b.p").alias("p"), F.col("b.w").alias("w"))


def write_bigram_lm(
    docs: DataFrame,
    model_dir: str,
    text_col: str = "text",
    _bg: DataFrame | None = None,
    _keep: list | None = None,
) -> dict:
    """Train the bigram LM once and persist it: ``cnt`` (p, w, c) and
    ``ctx`` (p, cp) — exact BIGINT counts, so the artifact round-trips
    bit-perfectly — with ``meta.json`` written LAST as the commit
    marker (any pre-existing header deleted first: a retrain that
    crashes mid-write must never leave the old header validating new
    half-written tables).  The total bigram count ``nb`` lives in the
    header, not a table — it is one integer.

    ``_bg``: internal — a pre-materialized instance table so
    :func:`bigram_lm_train_and_score` pays the tokenize scan once.
    ``_keep``: internal — when a list, the checkpointed (cnt, ctx)
    DataFrames are appended to it so the caller can keep scoring from
    the exact rows the write jobs emitted (integer-exact, so identical
    to a read-back) without re-listing/re-scanning the fresh artifact.
    """
    d = model_dir.rstrip("/")
    os.makedirs(d, exist_ok=True)
    meta_path = f"{d}/meta.json"
    if os.path.exists(meta_path):
        os.remove(meta_path)
    bg = (
        _bg
        if _bg is not None
        else bigram_instances(docs, text_col=text_col)
    )
    from pyspark.sql import Observation

    # The count table is lazily localCheckpointed: the cnt write is the
    # one action that materializes it (and the _bg checkpoint under it),
    # and the ctx aggregate + the caller's score joins then read those
    # vocabulary-sized blocks directly — the pre-round-10 shape
    # re-opened the just-written parquet (schema-inference + listing
    # jobs, and a serial disk round-trip between the two writes).
    cnt = (
        bg.groupBy("p", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    # counts ride an Observation on the write job — zero extra scans
    # (the artifact-meta discipline of write_prefix_index)
    obs = Observation()
    cnt.observe(
        obs,
        F.count(F.lit(1)).alias("n_bigram_types"),
        F.sum("c").cast("bigint").alias("nb"),
    ).write.mode("overwrite").parquet(f"{d}/cnt")
    ctx = (
        cnt.groupBy("p")
        .agg(F.sum("c").cast("bigint").alias("cp"))
        .localCheckpoint(eager=False)
    )
    obs_ctx = Observation()
    ctx.observe(obs_ctx, F.count(F.lit(1)).alias("n_contexts")).write.mode(
        "overwrite"
    ).parquet(f"{d}/ctx")
    if _keep is not None:
        _keep.extend((cnt, ctx))
    nb = obs.get["nb"]
    if not nb:
        # no header is ever written, so the empty tables read as "not a
        # model" — training on a corpus with zero transitions would
        # make every later score the max-backoff constant
        raise ValueError(
            "bigram LM training corpus produced no bigram instances "
            "(every doc has <2 tokens) — a model with no transitions "
            "would score every document identically"
        )
    meta = {
        "format": FORMAT,
        "featurizer": FEATURIZER,
        "text_col": text_col,
        "n_bigrams": int(nb),
        "n_bigram_types": int(obs.get["n_bigram_types"]),
        "n_contexts": int(obs_ctx.get["n_contexts"]),
    }
    with open(meta_path, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    return meta


def read_bigram_lm(
    spark: SparkSession, model_dir: str
) -> tuple[DataFrame, DataFrame, dict]:
    """(cnt, ctx, meta); loud error for a non-model directory or a
    foreign format/featurizer."""
    d = model_dir.rstrip("/")
    meta_path = f"{d}/meta.json"
    if not os.path.exists(meta_path):
        raise ValueError(f"{model_dir} has no meta.json — not a bigram LM")
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    if meta.get("format") != FORMAT:
        raise ValueError(
            f"{model_dir} is format {meta.get('format')!r}, expected "
            f"{FORMAT!r}"
        )
    if meta.get("featurizer") != FEATURIZER:
        raise ValueError(
            f"{model_dir} was trained under featurizer "
            f"{meta.get('featurizer')!r}; this build extracts "
            f"{FEATURIZER!r} — scores from a different tokenization are "
            "meaningless"
        )
    # explicit schemas: the artifact layout is fixed by FORMAT, so the
    # footer-inference job per read-back is pure launch latency
    return (
        spark.read.schema("p string, w string, c bigint").parquet(
            f"{d}/cnt"
        ),
        spark.read.schema("p string, cp bigint").parquet(f"{d}/ctx"),
        meta,
    )


def _score(bg: DataFrame, cnt: DataFrame, ctx: DataFrame, nb: int) -> DataFrame:
    """Per-doc surprisal of instance table ``bg`` under frozen counts:
    ``(doc_id, n_bigrams, n_oov_bigrams, total_bits, mean_bits)``."""
    bits = (
        F.when(
            F.col("c").isNotNull(), _bitlen(F.col("cp")) - _bitlen(F.col("c"))
        )
        .when(F.col("cp").isNotNull(), _bitlen(F.col("cp")) + F.lit(1))
        .otherwise(F.lit(int(nb).bit_length() + 1))
    )
    return (
        bg.join(cnt, ["p", "w"], "left")
        .join(ctx, "p", "left")
        .select(
            F.col("id").alias("doc_id"),
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
    )


def score_with_bigram_lm(
    docs: DataFrame,
    model_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a (new) corpus under a FROZEN persisted model — the
    serving path every ``curate_increment`` batch takes.  One tokenize
    scan over the batch, two equi-joins against the persisted count
    tables, one per-doc aggregate.  Docs with <2 tokens emit no row
    (no transition evidence).  Backoff is pinned bit-equal to the
    ``heldout_bigram_surprisal`` registry oracle in
    tests/test_round10_curation.py."""
    cnt, ctx, meta = read_bigram_lm(docs.sparkSession, model_dir)
    bg = bigram_instances(docs, text_col=text_col, id_col=id_col)
    return _score(bg, cnt, ctx, meta["n_bigrams"])


def bigram_lm_train_and_score(
    docs: DataFrame,
    model_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[dict, DataFrame]:
    """Train + persist the model AND score the training corpus in ONE
    tokenize scan (the curate() gate's shape, mirroring
    ``dsir_train_and_score``): the instance table is materialized once
    (lazy localCheckpoint — no stranded cache entry) and feeds the
    count aggregate, the artifact write, and the per-doc score joins.
    Scores come from the checkpointed count tables the write jobs
    themselves emitted — bit-identical to a read-back (exact BIGINT
    counts), so what gates the corpus is exactly what later increments
    will score under, without re-listing the fresh artifact.  Returns
    (meta, scores)."""
    bg = bigram_instances(docs, text_col=text_col, id_col=id_col)
    bg = bg.localCheckpoint(eager=False)
    kept: list = []
    meta = write_bigram_lm(
        docs, model_dir, text_col=text_col, _bg=bg, _keep=kept
    )
    cnt, ctx = kept
    return meta, _score(bg, cnt, ctx, meta["n_bigrams"])
