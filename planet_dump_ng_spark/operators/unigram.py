"""Persisted unigram-LM tokenizer artifact (Kudo 2018, "Subword
Regularization" — the SentencePiece-unigram model, public): the other
production tokenizer family beside BPE, under this repo's
oracle-exactness discipline.

The adaptation that makes every stage bit-replayable in SQL (no libm,
no float log-probs):

- **seed vocabulary**: every substring of length 1..``max_piece_len``
  of every distinct word, counted with word frequency weights; ALL
  single characters are kept (coverage guarantee — Viterbi can never
  fail) plus the top ``n_pieces`` multi-char substrings by
  ``(count DESC, piece ASC)`` — a total order, so the cut is
  deterministic on any engine.
- **piece cost**: integer bit-length surprisal,
  ``bitlen(total) - bitlen(count)`` bits — the same no-libm log the
  surprisal/DSIR operators use, so Viterbi compares exact integers.
- **segmentation**: Viterbi over each DISTINCT word minimizing
  ``(total_bits, n_pieces, split_point)`` lexicographically — the
  third key (smallest backpointer j = longest last piece) makes every
  tie deterministic, which is what lets DuckDB replay the DP as an
  unrolled CTE chain with a ROW_NUMBER argmin.
- **one hard-EM round** (Viterbi-EM): usage counts from the
  segmentations (weighted by word frequency) re-score the vocabulary;
  the re-scored table is the persisted model.

Scale shape: everything vocabulary-bound.  The seed count is one
explode over DISTINCT words (sublinear in corpus mass); the model is
<= ``n_pieces + |alphabet|`` rows — collected driver-side exactly like
the BPE merge-rule list (a bounded small side, the repo's documented
exception) and applied per distinct word in an Arrow-batched pandas
UDF; documents join back on the word, so per-document encode cost is
one map-side join regardless of vocabulary size.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from planet_dump_ng_spark.operators.text import tokens

_FORMAT = "unigram-tokenizer-v1"
_PRETOKENIZER = "whitespace-v1"
#: DP positions the SQL oracle unrolls to; words longer than this are
#: excluded from training on BOTH engines (recorded in meta so encode
#: applies the same exclusion — at real scale raise it, the unroll
#: depth is an oracle concern, not an operator one)
MAX_WORD_LEN = 12


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(w, f)`` distinct words with corpus frequencies, capped at
    MAX_WORD_LEN chars (see module docstring)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") <= MAX_WORD_LEN)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )


def seed_vocab(
    words: DataFrame, n_pieces: int = 64, max_piece_len: int = 4
) -> DataFrame:
    """``(piece, cnt, bits)`` — the deterministic seed vocabulary:
    all single chars + the top ``n_pieces`` multi-char substrings by
    (count DESC, piece ASC); bits = bitlen(total) - bitlen(cnt) over
    the KEPT pieces' count mass."""
    subs = words.select(
        "f",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(w)), i -> "
                f"transform(sequence(1, least({max_piece_len}, "
                "length(w) - i + 1)), l -> substring(w, i, l))))"
            )
        ).alias("piece"),
    )
    cnt = subs.groupBy("piece").agg(F.sum("f").cast("bigint").alias("cnt"))
    chars = cnt.filter(F.length("piece") == 1)
    multi = (
        cnt.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(n_pieces)
    )
    vocab0 = chars.unionByName(multi)
    tot = vocab0.agg(F.sum("cnt").cast("bigint").alias("t"))
    bits = (
        F.length(F.bin(F.col("t"))) - F.length(F.bin(F.col("cnt")))
    ).cast("bigint")
    return vocab0.crossJoin(F.broadcast(tot)).select(
        "piece", "cnt", bits.alias("bits")
    )


_UNK_BITS = 1 << 40  # deterministic penalty for a character the
# vocabulary has never seen (encode-time only; training vocabularies
# contain every training char) — any in-vocab path undercuts it


def _viterbi(word: str, vocab: dict[str, int], max_piece_len: int) -> list[str]:
    """Min-(bits, n_pieces, split) segmentation — the ONE Python twin
    of the oracle's unrolled DP (ROW_NUMBER ORDER BY bits, np, j).
    Always feasible: every training char is in the vocabulary, and an
    unknown char (frozen-model encode of unseen text) falls back to a
    1-char piece at the deterministic ``_UNK_BITS`` penalty."""
    n = len(word)
    INF = (1 << 62, 1 << 30, 0)
    dp: list[tuple[int, int, int]] = [(0, 0, -1)] + [INF] * n
    for i in range(1, n + 1):
        best = INF
        for j in range(max(0, i - max_piece_len), i):
            b = vocab.get(word[j:i])
            if b is None or dp[j][0] >= 1 << 62:
                continue
            key = (dp[j][0] + b, dp[j][1] + 1, j)
            if key < best:
                best = key
        if best is INF and dp[i - 1][0] < 1 << 62:
            best = (dp[i - 1][0] + _UNK_BITS, dp[i - 1][1] + 1, i - 1)
        dp[i] = best
    out: list[str] = []
    i = n
    while i > 0:
        j = dp[i][2]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def segment_words(
    words: DataFrame, vocab: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """``(w, f, pieces)`` — Viterbi segmentation of every distinct word
    under the (bounded, collected) vocabulary.  Arrow-batched; cost is
    per DISTINCT word, never per document."""
    rules = {r["piece"]: int(r["bits"]) for r in vocab.collect()}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(ws: pd.Series) -> pd.Series:
        return ws.map(lambda w: _viterbi(w, rules, max_piece_len))

    return words.withColumn("pieces", seg(F.col("w")))


def em_round(
    words: DataFrame, vocab: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """One hard-EM (Viterbi-EM) round: usage counts from the current
    segmentation re-score the vocabulary.  Returns
    ``(piece, seed_count, used_count, seed_bits, em_bits)``.

    Pruning and coverage: multi-char pieces the segmentation never
    used are PRUNED (the Kudo step); single chars are kept even at
    zero usage — they are the coverage guarantee — with the worst-case
    cost ``bitlen(total_used) + 1`` (the bigram-LM novel-context
    convention), so an unused char can never undercut a used piece."""
    seg = segment_words(words, vocab, max_piece_len)
    usage = (
        seg.select("f", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("f").cast("bigint").alias("used_count"))
    )
    tot2 = usage.agg(F.sum("used_count").cast("bigint").alias("t2"))
    em_bits = F.when(
        F.col("used_count") > 0,
        F.length(F.bin(F.col("t2"))) - F.length(F.bin(F.col("used_count"))),
    ).otherwise(F.length(F.bin(F.col("t2"))) + F.lit(1)).cast("bigint")
    return (
        vocab.withColumnRenamed("cnt", "seed_count")
        .withColumnRenamed("bits", "seed_bits")
        .join(usage, "piece", "left")
        .na.fill({"used_count": 0})
        .filter((F.col("used_count") > 0) | (F.length("piece") == 1))
        .crossJoin(F.broadcast(tot2))
        .select(
            "piece", "seed_count", "used_count", "seed_bits",
            em_bits.alias("em_bits"),
        )
    )


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    n_pieces: int = 64,
    max_piece_len: int = 4,
) -> DataFrame:
    """Seed + one EM round over a corpus — the training entry point and
    the registry query's plan."""
    words = word_freqs(df, text_col)
    return em_round(
        words, seed_vocab(words, n_pieces, max_piece_len), max_piece_len
    )


def write_unigram_tokenizer(
    df: DataFrame,
    model_dir: str,
    text_col: str = "text",
    n_pieces: int = 64,
    max_piece_len: int = 4,
) -> dict:
    """Train and persist: ``vocab`` parquet (piece, seed_count,
    used_count, seed_bits, em_bits) + ``meta.json`` LAST as the commit
    marker with any pre-existing header deleted first (the
    dsir/tokenizer/prefix-index crash-window protocol)."""
    d = model_dir.rstrip("/")
    os.makedirs(d, exist_ok=True)
    meta_path = f"{d}/meta.json"
    if os.path.exists(meta_path):
        os.remove(meta_path)
    from pyspark.sql import Observation

    v = unigram_vocab(df, text_col, n_pieces, max_piece_len)
    obs = Observation()
    v.observe(
        obs,
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("used_count").cast("bigint").alias("used_total"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/vocab")
    meta = {
        "format": _FORMAT,
        "pretokenizer": _PRETOKENIZER,
        "text_col": text_col,
        "n_pieces": n_pieces,
        "max_piece_len": max_piece_len,
        "max_word_len": MAX_WORD_LEN,
        "n_vocab": int(obs.get["n_vocab"]),
        "used_total": int(obs.get["used_total"]),
    }
    with open(meta_path, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    return meta


def read_unigram_tokenizer(
    spark: SparkSession, model_dir: str
) -> tuple[DataFrame, dict]:
    """(vocab, meta); refuses a missing/foreign header loudly."""
    d = model_dir.rstrip("/")
    meta_path = f"{d}/meta.json"
    if not os.path.exists(meta_path):
        raise ValueError(
            f"{model_dir} has no meta.json — not a unigram tokenizer"
        )
    with open(meta_path, encoding="utf-8") as fh:
        meta = json.load(fh)
    if meta.get("format") != _FORMAT:
        raise ValueError(
            f"{model_dir} is format {meta.get('format')!r}, expected "
            f"{_FORMAT!r}"
        )
    if meta.get("pretokenizer") != _PRETOKENIZER:
        raise ValueError(
            f"{model_dir} was trained under pre-tokenizer "
            f"{meta.get('pretokenizer')!r}; this build splits "
            f"{_PRETOKENIZER!r} — rebuild the artifact"
        )
    return spark.read.parquet(f"{d}/vocab"), meta


def unigram_encode_stats(
    df: DataFrame,
    model_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Serve the FROZEN artifact: per-document
    ``(doc_id, n_words, n_pieces, pieces_per_word)`` under the
    persisted EM-rescored costs.  One Viterbi per DISTINCT word, then
    a map-side join back to documents — the tokenize_with_vocab /
    bpe_apply_stats serving shape.  Pinned equal to inline training in
    tests (artifact round-trip changes nothing: the table is exact
    integers)."""
    spark = df.sparkSession
    vocab, meta = read_unigram_tokenizer(spark, model_dir)
    doc_words = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter(F.length("w") <= meta["max_word_len"])
    words = doc_words.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    seg = segment_words(
        words,
        vocab.select("piece", F.col("em_bits").alias("bits")),
        meta["max_piece_len"],
    ).select("w", F.size("pieces").alias("np"))
    return (
        doc_words.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("np").cast("bigint").alias("n_pieces"),
            (F.sum("np").cast("double") / F.count(F.lit(1))).alias(
                "pieces_per_word"
            ),
        )
    )
