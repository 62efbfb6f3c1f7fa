"""Persisted BPE tokenizer artifact: train once, encode anywhere.

``bpe_learn_merges`` (operators/text.py) is the training loop; this
module gives its output the same build/serve lifecycle as the BM25 and
IVFPQ artifacts — a parquet directory holding the learned merge table
and the final symbol vocabulary, plus a ``meta.json`` header with the
training parameters validated at read time.  The 100 TB shape is
train-once / apply-everywhere: tokenizer training runs on one corpus
sample (the merge loop is vocabulary-bound), the artifact ships to
every downstream job, and encoding a new corpus never re-derives rules.

Encoding discipline: the merge fold runs once per DISTINCT word — the
vocabulary-sized model table — and documents join back on the word
(the tokenize_with_vocab shape), so per-document cost is one map-side
join regardless of rule count.  The per-word fold itself is an
Arrow-batched pandas UDF replaying exactly the training rewrite
(text.py ``_BPE_MERGE_EXPR``, one left-to-right non-overlapping fold
per rule in round order): rule lists in real tokenizers run to 10^4+,
where chaining plan-literal SQL folds would grow the plan linearly and
die in analysis, while the Python fold is O(rules x word_length) on a
table that grows sub-linearly with the corpus.  Served-equals-direct
(bpe_apply_stats vs text.bpe_encode_stats) is pinned bit-exact in
tests/test_tokenizer_artifact.py.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators.text import bpe_learn_merges, tokens

_FORMAT = "bpe-tokenizer-v1"
#: recorded in meta.json so an artifact trained against a DIFFERENT
#: pre-tokenizer (the word splitter feeding the merge loop) is refused
#: at read instead of silently mis-encoding every document.
_PRETOKENIZER = "whitespace-v1"


def _fold_word(word: str, rules: list[tuple[str, str]]) -> int:
    """Symbol count after replaying every merge rule in round order —
    the exact Python twin of text.py's ``_BPE_MERGE_EXPR`` aggregate
    (left-to-right, non-overlapping, a freshly merged symbol can seed
    the next step's left side within the same round)."""
    syms = list(word)
    for a, b in rules:
        acc: list[str] = []
        for x in syms:
            if acc and acc[-1] == a and x == b:
                acc[-1] = acc[-1] + x
            else:
                acc.append(x)
        syms = acc
    return len(syms)


def bpe_symbol_count(rules: list[tuple[str, str]]) -> Column:
    """Column factory: ``f(word) -> n_symbols`` under the frozen rule
    list.  ``rules`` is driver-side but bounded — one (left, right)
    pair per learned merge, the artifact's whole reason to exist."""

    @F.pandas_udf("bigint")
    def _n_sym(ws: pd.Series) -> pd.Series:
        return ws.map(lambda w: _fold_word(w, rules))

    return _n_sym


def write_bpe_tokenizer(
    docs: DataFrame,
    tokenizer_dir: str,
    text_col: str = "text",
    n_merges: int = 8,
) -> dict:
    """Train ``n_merges`` BPE rules on ``docs`` and persist the artifact:
    ``merges`` (round, pair_left, pair_right, n), ``vocab`` (the final
    symbol table with corpus-weighted counts — the thing an embedding
    layer is sized from), and ``meta.json`` LAST as the commit marker
    (read_bpe_tokenizer requires it, so a half-written artifact reads
    as no artifact, never as a silently-shorter rule list).  Returns
    the header dict."""
    d = tokenizer_dir.rstrip("/")
    merges = bpe_learn_merges(docs, text_col=text_col, n_merges=n_merges)
    merges.orderBy("round").coalesce(1).write.mode("overwrite").parquet(
        f"{d}/merges"
    )
    rules = [
        (r.pair_left, r.pair_right)
        for r in merges.orderBy("round").collect()
    ]
    merges.unpersist()
    # final symbol vocabulary: re-fold the distinct-word table under the
    # frozen rules (vocabulary-sized, one pass)
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    syms = words.select(
        F.explode(_bpe_symbols_col(rules)(F.col("w"))).alias("symbol"), "cnt"
    )
    (
        syms.groupBy("symbol")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{d}/vocab")
    )
    meta = {
        "format": _FORMAT,
        "pretokenizer": _PRETOKENIZER,
        "n_merges": n_merges,
        "n_rules": len(rules),
    }
    with open(f"{d}/meta.json", "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    return meta


def _bpe_symbols_col(rules: list[tuple[str, str]]):
    """Column factory returning the full symbol array per word (the
    vocab build and any downstream wanting actual subwords)."""

    def _syms(word: str) -> list[str]:
        syms = list(word)
        for a, b in rules:
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = acc[-1] + x
                else:
                    acc.append(x)
            syms = acc
        return syms

    @F.pandas_udf("array<string>")
    def _col(ws: pd.Series) -> pd.Series:
        return ws.map(_syms)

    return _col


def read_bpe_tokenizer(
    spark: SparkSession, tokenizer_dir: str
) -> tuple[DataFrame, dict]:
    """(merges table, meta header) — loud error for a directory that is
    not a tokenizer artifact or was written by an incompatible build
    (format or pre-tokenizer mismatch would silently mis-encode)."""
    d = tokenizer_dir.rstrip("/")
    path = f"{d}/meta.json"
    if not os.path.exists(path):
        raise ValueError(
            f"{tokenizer_dir} has no meta.json — not a tokenizer artifact"
        )
    with open(path, encoding="utf-8") as fh:
        meta = json.load(fh)
    if meta.get("format") != _FORMAT or (
        meta.get("pretokenizer") != _PRETOKENIZER
    ):
        raise ValueError(
            f"{tokenizer_dir} was written as "
            f"{meta.get('format')}/{meta.get('pretokenizer')}, this build "
            f"reads {_FORMAT}/{_PRETOKENIZER} — encoding with it would "
            "silently diverge from the trained tokenizer"
        )
    return spark.read.parquet(f"{d}/merges"), meta


def bpe_apply_stats_stateless(
    docs: DataFrame, rules: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Per-doc encode statistics as a STATELESS row map — no distinct,
    no join, no aggregation — so the same plan runs over a streaming
    DataFrame in append mode (streaming.jobs.bpe_encode_stream) or any
    batch frame.  Tokenization and character counts stay JVM-side;
    only the per-word symbol fold crosses to Python, Arrow-batched with
    a per-batch word memo (a batch's repeated words fold once).  Same
    output schema and values as :func:`bpe_apply_stats`; that form's
    distinct-word model table amortizes better when the corpus's
    word-instance/distinct-word ratio is high, this one when rows must
    be processed independently (streams)."""
    toks = tokens(text_col)

    @F.pandas_udf("bigint")
    def _sum_syms(tok_arrays: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def per_doc(ws) -> int:
            total = 0
            for w in ws:
                n = memo.get(w)
                if n is None:
                    n = _fold_word(w, rules)
                    memo[w] = n
                total += n
            return total

        return tok_arrays.map(per_doc)

    return (
        docs.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.aggregate(
                toks,
                F.lit(0).cast("bigint"),
                lambda acc, w: acc + F.length(w),
            ).alias("n_chars"),
            _sum_syms(toks).alias("n_symbols"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "compression",
            F.col("n_symbols").cast("double")
            / F.col("n_chars").cast("double"),
        )
    )


def bpe_apply_stats(
    docs: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Encode ``docs`` under a FROZEN merge table and report per-doc
    symbol statistics — (doc_id, n_tokens, n_chars, n_symbols,
    compression), the exact schema of text.bpe_encode_stats so
    served-equals-direct is a set compare.  The fold runs on the
    distinct-word table; documents pay one join."""
    rules = [
        (r.pair_left, r.pair_right)
        for r in merges.orderBy("round").collect()
    ]
    dtok = docs.select("doc_id", F.explode(tokens(text_col)).alias("w"))
    wn = (
        dtok.select("w")
        .distinct()
        .select(
            "w",
            bpe_symbol_count(rules)(F.col("w")).alias("n_sym"),
            F.length("w").cast("bigint").alias("n_chr"),
        )
    )
    return (
        dtok.join(wn, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_chr").cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_symbols"),
            (
                F.sum("n_sym").cast("double") / F.sum("n_chr").cast("double")
            ).alias("compression"),
        )
    )
