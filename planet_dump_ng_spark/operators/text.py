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


def bind(value: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE per row
    and build ``body(v)`` on the bound result.

    Catalyst has no common-subexpression elimination across higher-order-
    function lambdas (HOFs are not codegen'd, and CollapseProject inlines
    aliases), so an expression like ``tokens(text)`` referenced N times in
    one Project is re-evaluated N times per row — for the regex-split
    tokenizer that N-fold cost dominates every shingle/bigram map stage.
    Wrapping the value in a 1-element array and referencing it through a
    ``transform`` lambda variable makes every use inside ``body`` a cheap
    variable read of the SAME evaluated value (measured ~1.7x on the
    shingle+hash scan at sf0.1).  Output is bit-identical: the same
    expression tree evaluates over the same input, just once.
    """
    return F.get(F.transform(F.array(value), body), 0)


def bind_struct(df: DataFrame, value: Column, body, fields: list[str]) -> DataFrame:
    """Multi-column let-binding: evaluate ``value`` once per row, expand
    ``body(v)`` (a struct Column whose fields are named ``fields``) into
    real columns via ``inline`` — a Generate is the one operator boundary
    CollapseProject cannot inline expressions through, so the struct (and
    the bound value) are computed exactly once per row no matter how many
    output columns read them.  Pre-existing columns with the same names
    are replaced (``withColumns`` semantics; column order may differ)."""
    return df.drop(*fields).select("*", F.inline(F.transform(F.array(value), body)))


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
    wl = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])

    def _feats(toks: Column) -> Column:
        # every reference to ``toks`` is a bound-variable read: the regex
        # tokenizer runs ONCE per row instead of once per referencing
        # output column (bind_struct; ~5 evaluations collapsed to 1)
        n_tok = F.size(toks)
        n_char = F.length(c)
        n_punct = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0))
        n_stop = F.size(F.filter(toks, lambda t: F.array_contains(wl, F.lower(t))))
        return F.struct(
            n_tok.alias("n_tokens"),
            n_char.alias("n_chars_calc"),
            (n_punct.cast("double") / F.greatest(n_char, F.lit(1))).alias(
                "punct_ratio"
            ),
            (n_stop.cast("double") / F.greatest(n_tok, F.lit(1))).alias(
                "stopword_ratio"
            ),
            (
                (n_char - (n_tok - 1)).cast("double")
                / F.greatest(n_tok, F.lit(1))
            ).alias("mean_token_len"),
        )

    return bind_struct(
        df,
        tokens(c),
        _feats,
        ["n_tokens", "n_chars_calc", "punct_ratio", "stopword_ratio",
         "mean_token_len"],
    )


#: fasttext-style linear quality model: (feature, weight) with a bias.
#: Weights are plan literals — the trained artifact a production pipeline
#: would broadcast; swapping them is a config change, not a plan change.
#: Feature order is FIXED (the score folds left-to-right so Spark and the
#: SQL oracle land on the bit-identical IEEE double).
QUALITY_MODEL_BIAS = -0.5
QUALITY_MODEL_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("stop_ratio", 3.2),
    ("punct_ratio", -8.0),
    ("digit_ratio", -6.0),
    ("len_feat", 2.0),
)


def linear_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Weighted-linear quality classifier (the learned-model stage of an
    LLM data pipeline, cf. GPT-3/LLaMA logistic quality filters) over
    map-only integer features: stopword ratio, punctuation density,
    digit density, and a capped length feature.

    The decision value is the raw margin (no sigmoid — monotone in it,
    and ``exp`` is libm-dependent so the margin is what stays
    bit-deterministic across engines); ``keep`` is ``margin > 0``.
    Ratios are single double divisions of exact integer counts and the
    dot product folds in the fixed ``QUALITY_MODEL_WEIGHTS`` order, so
    the score is hash-exact against the SQL oracle.  Map-only: scales
    linearly with input splits, no shuffle.
    """
    # NOT let-bound, by measurement: the duplicated subtrees here are one
    # tokens() + two regexp_extract_all over the raw string, and the
    # bind/inline Generate barrier costs more than the duplicate
    # evaluations it removes (A/B at sf0.1, best-of-6 interleaved:
    # unbound 0.35-0.43 s vs bound 0.70-0.80 s).  bind pays off when the
    # duplicated subtree is re-evaluated per HOF lambda reference inside
    # ONE projection (shingles, rule_quality_features); here
    # CollapseProject leaves a flat codegen'd Project that wins.
    c = F.col(text_col)
    n_tok = token_count(c)
    n_char = F.length(c)
    feats = {
        "stop_ratio": stopword_hits(c, LANG_STOPWORDS["en"]).cast("double")
        / F.greatest(n_tok, F.lit(1)),
        "punct_ratio": F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0)).cast(
            "double"
        )
        / F.greatest(n_char, F.lit(1)),
        "digit_ratio": F.size(F.regexp_extract_all(c, F.lit("[0-9]"), 0)).cast(
            "double"
        )
        / F.greatest(n_char, F.lit(1)),
        "len_feat": F.least(n_tok, F.lit(300)).cast("double") / F.lit(300.0),
    }
    score = F.lit(QUALITY_MODEL_BIAS)
    for name, w in QUALITY_MODEL_WEIGHTS:
        score = score + F.lit(w) * feats[name]
    out = df.withColumns(feats)
    return out.withColumns(
        {"quality_margin": score, "keep": score > F.lit(0.0)}
    )


def log2_ratio_mitchell(n, d):
    """Engine-exact log2(n/d) approximation (Mitchell's piecewise-linear
    log, 1962): with ``r = trunc(2^20 * n / d)`` and ``e = bitlen(r) - 1``,

        log2(n/d) ≈ (e + (r - 2^e) / 2^e) - 20

    — integer/bit arithmetic plus ONE division by an exact power of
    two, no libm, so Spark, DuckDB (plans/text_plans._mitchell_idf_sql)
    and plain Python produce the identical double bit-for-bit.  Max
    error vs true log2 is ~0.086 (the mantissa linearization); monotone
    in n/d, and 0 exactly when n == d.

    This replaced the coarser ``bitlen(N) - bitlen(df)`` IDF: that one
    floors to ZERO whenever df shares N's power-of-two bracket (e.g.
    every term with df > N/2), which zeroes ALL scores on a
    small-vocabulary corpus.  Mitchell keeps the no-libm discipline but
    resolves within the bracket.
    """
    n = n.cast("bigint")
    rq = ((n * F.lit(1048576)).cast("double") / d.cast("double")).cast(
        "long"
    )
    e = (F.length(F.bin(rq)) - F.lit(1)).cast("int")
    p2 = F.call_function("shiftleft", F.lit(1).cast("bigint"), e)
    return (
        e.cast("double") + (rq - p2).cast("double") / p2.cast("double")
    ) - F.lit(20.0)


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword retrieval scores for ``terms`` over a document frame
    -> (id, n_matched_terms, score_q, bm25_score).

    Classic tf-saturation term (doc-length normalized) weighted by a
    Mitchell-interpolated log2 IDF (:func:`log2_ratio_mitchell` of
    N/df — no libm log, engine-exact); per-term scores are
    1e-9-truncated and summed as integers so the doc score is
    order-independent.  The tf table only
    materializes rows for the query terms (the isin filter pushes into
    the explode scan), df/avgdl are broadcast-tiny aggregates — cost is
    proportional to docs CONTAINING a term, not the corpus.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl")).persist()
    tok = toks.select("doc_id", F.explode("toks").alias("w")).filter(
        F.col("w").isin(list(terms))
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    out = score_bm25_tables(tf, dl, k1=k1, b=b).persist()
    out.count()
    dl.unpersist()
    return out


def score_bm25_tables(
    tf: DataFrame, dl: DataFrame, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """BM25 scoring over PRE-BUILT inverted-index tables: ``tf``
    (doc_id, w, tf) already filtered to the query terms, ``dl``
    (doc_id, dl) over the FULL corpus.  The shared scoring kernel of
    :func:`bm25_scores` (on-the-fly tokenize) and the persisted-index
    query path (operators.text_index) — one formula, so the served
    result is bit-identical to the direct one by construction.

    n_docs / avgdl are derived from ``dl`` (broadcast-tiny aggregate);
    per-term df from the term-filtered ``tf`` itself (filtering cannot
    change df: df(w) counts docs containing w).  Per-term scores are
    1e-9-truncated and summed as integers — order-independent.
    """
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfq = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    idf = log2_ratio_mitchell(F.col("n_docs"), F.col("df"))
    sat = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    term_score = idf * sat
    return (
        tf.join(F.broadcast(dfq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (term_score * 1e9).cast("long").alias("tsq"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched_terms"),
            F.sum("tsq").cast("bigint").alias("score_q"),
            (F.sum("tsq").cast("double") / F.lit(1e9)).alias("bm25_score"),
        )
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


#: PII scrub patterns, applied in order (emails first so their digit runs
#: can't half-match the later numeric patterns).  Restricted to the
#: regex subset where Java (Spark) and RE2 (DuckDB) agree by
#: construction: character classes, bounded quantifiers, non-capturing
#: groups, ASCII word boundaries — no lookaround, no backreferences.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(?:\.\d{1,3}){3}\b", "<IP>"),
    ("longnum", r"\d{9,}", "<NUM>"),
    ("phone", r"\+?\d[\d -]{7,}\d", "<PHONE>"),
)


def pii_hits(col: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (before scrubbing).

    Counts overlap-free occurrences of each raw pattern independently on
    the ORIGINAL text — a reporting signal (how much PII a source
    carries), deliberately not derived from the sequential scrub below.
    """
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def scrub_pii(col: Column | str) -> Column:
    """Mask emails / IPv4s / long digit runs / phone-ish runs.

    Map-only codegen'd expression chain — the shape of every
    privacy-scrub pass a corpus pipeline runs before training.  The
    pattern list is ordered: each replacement sees the previous one's
    output, so the masks themselves can never be re-matched (mask tokens
    contain no digits or '@').
    """
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, mask in PII_PATTERNS:
        c = F.regexp_replace(c, pat, mask)
    return c


def _longest_equal_run(arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in sorted arr.

    Sorting groups equal tokens, so the longest run IS the top token's
    frequency — computed as one linear higher-order fold (no explode, no
    shuffle), which keeps the repetition features map-only.
    """
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc: Column, t: Column) -> Column:
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), init, step, lambda acc: acc["best"])


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition ratios, entirely map-only (zero shuffle).

    - ``dup_word_ratio``: fraction of tokens that are repeats of an
      earlier token (1 - distinct/total);
    - ``top_word_ratio``: frequency share of the most common token;
    - ``dup_bigram_ratio``: same as dup_word_ratio over adjacent pairs;
    - ``repetition_keep``: the filter verdict at the classic thresholds
      (docs under 10 tokens pass trivially — ratio gates are
      meaningless at that length and would reject all short text).

    Distinct counts use ``array_distinct`` and the top frequency is a
    sorted-array fold (:func:`_longest_equal_run`) — per-document array
    expressions instead of explode+groupBy, so a 100 TB scan stays one
    map stage with no aggregation exchange at all.  Ratios are single
    IEEE divisions of integer counts (engine-exact).
    """
    def _ratios(toks: Column) -> Column:
        # toks is a bound variable (bind_struct): the tokenizer runs once
        # per row; bigrams are bound the same way one level down so the
        # zip_with runs once instead of three times
        n = F.size(toks)
        bigrams = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        d = F.greatest(n, F.lit(1)).cast("double")

        def _with_bigrams(bg: Column) -> Column:
            nb = F.size(bg)
            db = F.greatest(nb, F.lit(1)).cast("double")
            return F.struct(
                n.alias("n"),
                ((n - F.size(F.array_distinct(toks))).cast("double") / d).alias(
                    "dw"
                ),
                (_longest_equal_run(toks).cast("double") / d).alias("tw"),
                ((nb - F.size(F.array_distinct(bg))).cast("double") / db).alias(
                    "db"
                ),
            )

        return bind(bigrams, _with_bigrams)

    def _feats(s: Column) -> Column:
        # second binding level: the four ratios are computed once and the
        # keep verdict reads them as struct-field refs instead of
        # re-evaluating each ratio's whole expression tree
        return F.struct(
            s["n"].alias("n_words"),
            s["dw"].alias("dup_word_ratio"),
            s["tw"].alias("top_word_ratio"),
            s["db"].alias("dup_bigram_ratio"),
            (
                (s["n"] < 10)
                | ((s["dw"] <= 0.5) & (s["tw"] <= 0.2) & (s["db"] <= 0.3))
            ).alias("repetition_keep"),
        )

    return bind_struct(
        df,
        bind(tokens(text_col), _ratios),
        _feats,
        ["n_words", "dup_word_ratio", "top_word_ratio", "dup_bigram_ratio",
         "repetition_keep"],
    )


def rule_quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fused :func:`quality_features` + :func:`repetition_features` — the
    exact column set (names, order, values) of
    ``repetition_features(quality_features(df))`` from ONE let-bound
    tokenizer evaluation per row.

    The composed form stacks two ``bind_struct`` Generates, each binding
    ``tokens(text)`` separately, so the regex tokenizer runs twice per
    row; the curation rule gate (batch + increment + streaming twin) is
    exactly this composition over the full surviving corpus, which at
    100 TB is a second tokenize pass per curation for no new
    information.  Every field below is the same expression tree the two
    operators build — same integer counts, same single IEEE divisions —
    so outputs are bit-identical to the composition."""
    c = F.col(text_col)
    wl = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])

    def _all(toks: Column) -> Column:
        n_tok = F.size(toks)
        n_char = F.length(c)
        n_punct = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0))
        n_stop = F.size(
            F.filter(toks, lambda t: F.array_contains(wl, F.lower(t)))
        )
        d = F.greatest(n_tok, F.lit(1)).cast("double")
        bigrams = F.when(
            n_tok >= 2,
            F.zip_with(
                F.slice(toks, 1, n_tok - 1),
                F.slice(toks, 2, n_tok - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))

        def _with_bigrams(bg: Column) -> Column:
            nb = F.size(bg)
            db = F.greatest(nb, F.lit(1)).cast("double")
            return F.struct(
                n_tok.alias("n_tokens"),
                n_char.alias("n_chars_calc"),
                (n_punct.cast("double") / F.greatest(n_char, F.lit(1))).alias(
                    "punct_ratio"
                ),
                (n_stop.cast("double") / F.greatest(n_tok, F.lit(1))).alias(
                    "stopword_ratio"
                ),
                (
                    (n_char - (n_tok - 1)).cast("double")
                    / F.greatest(n_tok, F.lit(1))
                ).alias("mean_token_len"),
                n_tok.alias("n_words"),
                (
                    (n_tok - F.size(F.array_distinct(toks))).cast("double") / d
                ).alias("dup_word_ratio"),
                (_longest_equal_run(toks).cast("double") / d).alias(
                    "top_word_ratio"
                ),
                ((nb - F.size(F.array_distinct(bg))).cast("double") / db).alias(
                    "dup_bigram_ratio"
                ),
            )

        def _final(s: Column) -> Column:
            # second binding level, same as repetition_features: the
            # ratios are computed once and the keep verdict reads them
            # as struct-field refs
            return F.struct(
                s["n_tokens"].alias("n_tokens"),
                s["n_chars_calc"].alias("n_chars_calc"),
                s["punct_ratio"].alias("punct_ratio"),
                s["stopword_ratio"].alias("stopword_ratio"),
                s["mean_token_len"].alias("mean_token_len"),
                s["n_words"].alias("n_words"),
                s["dup_word_ratio"].alias("dup_word_ratio"),
                s["top_word_ratio"].alias("top_word_ratio"),
                s["dup_bigram_ratio"].alias("dup_bigram_ratio"),
                (
                    (s["n_words"] < 10)
                    | (
                        (s["dup_word_ratio"] <= 0.5)
                        & (s["top_word_ratio"] <= 0.2)
                        & (s["dup_bigram_ratio"] <= 0.3)
                    )
                ).alias("repetition_keep"),
            )

        return bind(bind(bigrams, _with_bigrams), _final)

    return bind_struct(
        df,
        tokens(c),
        _all,
        [
            "n_tokens", "n_chars_calc", "punct_ratio", "stopword_ratio",
            "mean_token_len", "n_words", "dup_word_ratio", "top_word_ratio",
            "dup_bigram_ratio", "repetition_keep",
        ],
    )


#: query parameters stripped by canonical_url — the tracking params
#: production crawl pipelines normalize away before URL-level dedup
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid)="


def canonical_url(col: Column | str) -> Column:
    """Canonicalized URL for crawl-dedup: the cheapest dedup gate a
    production pipeline runs — re-crawls of the same page differ only
    in tracking params / fragment / host case / default port long
    before content hashing can catch them (template drift defeats the
    content hash; the URL never drifts).

    Rules (all JVM-side regexp/array ops — no UDF, map-only):
    scheme+host lowercased (path case PRESERVED — it is significant),
    fragment stripped, ``utm_*``/``fbclid``/``gclid`` query params
    dropped (other params kept in order), default ports ``:443`` \
    (https) / ``:80`` (http) stripped, trailing slashes trimmed, and a
    query left empty by param filtering loses its ``?``.  No lookahead
    anywhere, so the DuckDB oracle twin replays rule-for-rule under
    RE2."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, "#.*$", "")  # fragment
    # lowercase scheme://host[:port] only: extract the anchored head,
    # remove it, and re-prepend lowered (no-scheme strings pass through
    # untouched — head extracts '')
    head_re = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    head = F.regexp_extract(u, head_re, 0)
    u = F.concat(F.lower(head), F.regexp_replace(u, head_re, ""))
    u = F.regexp_replace(u, "^(https://[^/:?#]*):443([/?].*)?$", "$1$2")
    u = F.regexp_replace(u, "^(http://[^/:?#]*):80([/?].*)?$", "$1$2")
    base = F.regexp_replace(F.substring_index(u, "?", 1), "/+$", "")
    qstr = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(qstr, "&"), lambda p: ~p.rlike(TRACKING_PARAM_RE)
    )
    return F.concat(
        base,
        F.when(
            (qstr != F.lit("")) & (F.size(params) > 0),
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text.

    The rolling-hash (Rabin-Karp style) variant for shingle-level
    fingerprints lives in dedup.shingle_hashes; this is the whole-document
    canonical fingerprint used for exact dedup across formatting variants.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def _bpe_merge_fold(a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of the elected pair (a, b)
    over the symbol array ``s`` — the literal-rule form of the fold
    (the rule is a known Python string, so it compiles into the
    expression instead of arriving via a broadcast crossJoin)."""
    return F.aggregate(
        F.col("s"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


_RULE_SCHEMA = "round int, pair_left string, pair_right string, n bigint"


def _bpe_rounds(
    docs: DataFrame, text_col: str, n_merges: int
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """(final word-symbol table, learned-rule DataFrame, persisted
    tables to unpersist) — the shared BPE training loop.

    Each round is ONE job: a TakeOrdered(1) collect of the elected pair
    (a bounded 1-row driver collect, like the curation manifests).  The
    rewrite folds the literal rule into the next round's plan lazily; a
    lazy localCheckpoint per round truncates lineage when the next
    election (or the caller's materialization) runs, so no round ever
    pays a separate checkpoint job and the plan never embeds the whole
    chain.  Round tables are vocabulary-sized.  (The pre-round-10 form
    spent two extra jobs per round — a broadcast-exchange build of the
    1-row rule and an eager checkpoint — on the same arithmetic.)
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cur = words.select(
        "w",
        "cnt",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("s"),
    ).persist()
    caches = [cur]
    rows: list[tuple] = []
    for r in range(n_merges):
        top = (
            cur.filter(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct(s[i - 1] AS a, s[i] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            # merge-exhausted corpus: no adjacent pairs left, so every
            # later round is the identity too — a corpus may honestly
            # yield < n_merges rules (the old sentinel-row semantics)
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        rows.append((r + 1, a, b, int(n)))
        nxt = cur.select(
            "w", "cnt", _bpe_merge_fold(a, b).alias("s")
        ).localCheckpoint(eager=False)
        caches.append(nxt)
        cur = nxt
    rules = spark.createDataFrame(rows, _RULE_SCHEMA)
    return cur, rules, caches


def bpe_learn_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 3
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the corpus.

    The real tokenizer-training loop (Sennrich et al.), not just one
    round of pair statistics: each round counts adjacent symbol pairs
    weighted by word frequency, elects the most frequent pair (ties:
    lexicographically smallest), and rewrites every word's symbol
    sequence with a left-to-right non-overlapping merge fold.  Returns
    one row per learned rule: (round, pair_left, pair_right, n).

    Scale shape: the loop runs entirely on the DISTINCT-word table
    (vocabulary-sized — grows sub-linearly with the corpus, so at
    100 TB this is a few million rows after one corpus-wide word
    count), each round is one map-side-combinable pair count plus a
    TakeOrdered(1) whose 1-row result is collected and folded into the
    next round's rewrite as a literal (a bounded collect, like the
    curation manifests), so nothing but the word count ever scans the
    corpus and each round costs exactly one job.
    """
    _, rules, caches = _bpe_rounds(docs, text_col, n_merges)
    for c in caches:
        c.unpersist()
    return rules


def bpe_encode_stats(
    docs: DataFrame, text_col: str = "text", n_merges: int = 3
) -> DataFrame:
    """Fit-and-transform: learn ``n_merges`` BPE rules, then encode every
    document and report per-doc symbol statistics — (doc_id, n_tokens,
    n_chars, n_symbols, compression).

    The transform never re-folds per token INSTANCE: the merge rewrite
    happens once per distinct word (the vocabulary-sized model table),
    and documents join back on the word — the same broadcast-model
    shape as tokenize_with_vocab, so the per-document cost at 100 TB is
    one map-side join plus an aggregate.
    """
    cur, _, caches = _bpe_rounds(docs, text_col, n_merges)
    wn = cur.select(
        "w",
        F.size("s").cast("bigint").alias("n_sym"),
        F.length("w").cast("bigint").alias("n_chr"),
    )
    dtok = docs.select("doc_id", F.explode(tokens(text_col)).alias("w"))
    out = (
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
        # localCheckpoint, not persist — same no-stranded-cache rationale
        # as bpe_learn_merges above (materialize before the round caches
        # drop, release on GC)
        .localCheckpoint(eager=True)
    )
    for c in caches:
        c.unpersist()
    return out
