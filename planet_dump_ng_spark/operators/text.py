"""Text-analysis operators for corpus pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd): tokenization is a regex split, language ID is
stopword-hit counting over the token array, quality scoring is pure column
arithmetic.  Nothing here shuffles — these are map-only operators that scale
linearly with input splits, which is exactly what a 100 TB document scan
needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: whitespace tokenizer pattern (kept identical in DuckDB oracles)
TOKEN_SPLIT = r"\s+"

#: BPE-ish word/number/punct pattern for finer-grained token estimates
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic.  Deterministic and oracle-expressible; a production system
#: would swap in a real model via mapInPandas without changing the plan.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men"),
}

PUNCT_RE = r"[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (split of '' yields [''])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TOKEN_SPLIT), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate subword token count: words + numbers + punct marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH), 0))


def stopword_hits(col: Column | str, words: tuple[str, ...]) -> Column:
    toks = tokens(col)
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, F.lower(t))))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    ``quality_score`` is a deterministic rational of integer counts so
    Spark and any SQL oracle agree bit-for-bit.
    """
    c = F.col(text_col)
    n_tok = token_count(c)
    n_char = F.length(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0))
    n_stop = stopword_hits(c, LANG_STOPWORDS["en"])
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_calc": n_char,
            "punct_ratio": n_punct.cast("double") / F.greatest(n_char, F.lit(1)),
            "stopword_ratio": n_stop.cast("double") / F.greatest(n_tok, F.lit(1)),
            "mean_token_len": (n_char - (n_tok - 1)).cast("double")
            / F.greatest(n_tok, F.lit(1)),
        }
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-count language heuristic with deterministic tie-break.

    argmax over per-language hit counts; ties resolve to the
    lexicographically smallest language code (stable under any row order,
    hence oracle-comparable).
    """
    c = F.col(text_col)
    scored = F.array(
        *[
            F.struct(
                (-stopword_hits(c, words)).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_min(scored)
    return df.withColumn(out_col, best["lang"]).withColumn(
        f"{out_col}_hits", -best["neg_hits"]
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text.

    The rolling-hash (Rabin-Karp style) variant for shingle-level
    fingerprints lives in dedup.shingle_hashes; this is the whole-document
    canonical fingerprint used for exact dedup across formatting variants.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))
