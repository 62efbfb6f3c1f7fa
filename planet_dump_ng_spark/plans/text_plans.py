"""Text-analysis queries over the ``documents`` table (oracle-checked)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import text as tx
from planet_dump_ng_spark.plans.registry import register, table

_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"

# distinct 3-token shingles (same fallback semantics as operators.dedup.shingles)
_SHINGLES = (
    "list_distinct(list_transform("
    f"range(1, greatest(len({_TOKS}) - 2, 1) + 1), "
    f"i -> array_to_string(({_TOKS})[i:i+2], ' ')))"
)


def _hits_sql(words: tuple[str, ...]) -> str:
    wl = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOKS}, t -> list_contains([{wl}], lower(t))))"


@register(
    "doc_token_stats",
    f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           length(text) AS n_chars_calc,
           len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
             / greatest(length(text), 1) AS punct_ratio,
           {_hits_sql(tx.LANG_STOPWORDS['en'])}::DOUBLE
             / greatest(len({_TOKS}), 1) AS stopword_ratio,
           (length(text) - (len({_TOKS}) - 1))::DOUBLE
             / greatest(len({_TOKS}), 1) AS mean_token_len,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS n_bpe_tokens
    FROM documents
    """,
    doc="Quality features: token/char counts, punct + stopword ratios (map-only).",
    tags=("text", "bench"),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tx.quality_features(table(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        "n_tokens",
        "n_chars_calc",
        "punct_ratio",
        "stopword_ratio",
        "mean_token_len",
        tx.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


def _langid_oracle() -> str:
    langs = sorted(tx.LANG_STOPWORDS)
    hit_cols = ",\n           ".join(
        f"{_hits_sql(tx.LANG_STOPWORDS[lang])} AS hits_{lang}" for lang in langs
    )
    m = f"greatest({', '.join('hits_' + lang for lang in langs)})"
    case = " ".join(
        f"WHEN hits_{lang} = {m} THEN '{lang}'" for lang in langs
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, lang AS lang_label,
           {hit_cols}
      FROM documents
    )
    SELECT doc_id, lang_label,
           CASE {case} END AS lang_pred,
           {m} AS lang_pred_hits
    FROM scored
    """


@register(
    "doc_language_id",
    _langid_oracle(),
    doc="Stopword-count language heuristic, deterministic lexicographic tie-break.",
    tags=("text",),
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_label"), "text"
    )
    return tx.language_id(df).select(
        "doc_id", "lang_label", "lang_pred", "lang_pred_hits"
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    doc="Canonical document fingerprint (casefold + whitespace collapse + md5).",
    tags=("text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", tx.fingerprint("text").alias("fp")
    )


@register(
    "contamination_check",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    bench AS (SELECT doc_id AS bench_id, sh AS bsh FROM sh WHERE doc_id % 20 = 0)
    SELECT s.doc_id AS train_id, b.bench_id,
           len(list_intersect(s.sh, b.bsh))::DOUBLE / len(b.bsh) AS containment
    FROM sh s, bench b
    WHERE s.doc_id <> b.bench_id
      AND len(list_intersect(s.sh, b.bsh))::DOUBLE / len(b.bsh) >= 0.1
    """,
    doc="Eval-leakage scan (operators.dedup.containment_pairs): train docs "
    "containing >= 10% of a benchmark doc's distinct 3-token shingles, via "
    "a broadcast inverted-index join — no corpus shuffle.",
    tags=("text", "dedup"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.dedup import containment_pairs

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return containment_pairs(docs, bench, k=3, threshold=0.1)


@register(
    "doc_term_weights",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS weight
    FROM tf JOIN df USING (term), n
    WHERE df.df * 10 <= 9 * n.n_docs
    """,
    doc="TF with linear inverse-document-frequency (tf * N/df): the "
    "engine-exact variant of TF-IDF — ln() is libm-dependent in the last "
    "ulp, a ratio of counts is not; ubiquitous terms (df > 0.9N) drop. "
    "Two count shuffles + a term join, all map-side combinable.",
    tags=("text", "agg"),
)
def doc_term_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tx.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        # integer fence: Spark casts double->bigint by truncation but
        # DuckDB rounds, so 0.9*N with fractional N would diverge by 1
        # on boundary df values; df*10 <= 9*N is exact on both engines
        .filter(F.col("df") * 10 <= F.col("n_docs") * 9)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))).alias(
                "weight"
            ),
        )
    )


@register(
    "build_vocab",
    f"""
    WITH counts AS (
      SELECT term, COUNT(*) AS n
      FROM (SELECT unnest({_TOKS}) AS term FROM documents)
      GROUP BY term
    ),
    top AS (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 1000)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) - 1 AS INT)
             AS token_id,
           term, n
    FROM top
    """,
    doc="Tokenizer-vocabulary construction: corpus term counts, top-V by "
    "(count desc, term) total order, contiguous ids. The count aggregate "
    "is map-side combinable; the top-V runs as TakeOrderedAndProject and "
    "ids are assigned on the <=V survivors (same single-partition rank "
    "pattern as q10 — never a global window over the full vocabulary).",
    tags=("text", "topk"),
)
def build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tx.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = [F.col("n").desc(), F.col("term").asc()]
    top = counts.orderBy(*order).limit(1000)
    w = W.partitionBy(F.spark_partition_id()).orderBy(*order)
    return top.select(
        (F.row_number().over(w) - 1).cast("int").alias("token_id"), "term", "n"
    )


@register(
    "doc_chunking",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           array_to_string(toks[50 * i + 1 : 50 * (i + 1)], ' ') AS chunk_text,
           CAST(least(50, len(toks) - 50 * i) AS INT) AS n_tokens
    FROM t, unnest(range(0, CAST(ceil(len(toks) / 50.0) AS BIGINT))) AS u(i)
    """,
    doc="Fixed-size token chunking (50-token windows, last chunk ragged): "
    "the context-window splitter every training/RAG pipeline runs. "
    "Map-only explode — no shuffle; chunk count derives from the token "
    "count so empty docs yield no chunks.",
    tags=("text",),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tx.tokens("text")
    t = docs.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    return (
        # tokenless docs yield no chunks (the oracle's range(0, 0) = []);
        # without the guard sequence(0, -1) would COUNT DOWN to [0, -1]
        t.filter(n > 0)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.ceil(n / F.lit(50.0)).cast("int") - 1)
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_idx") * 50 + 1, 50), " "
            ).alias("chunk_text"),
            F.least(F.lit(50), F.size("toks") - F.col("chunk_idx") * 50)
            .cast("int")
            .alias("n_tokens"),
        )
    )


_PII_MK_SPARK = (
    " contact u",
    "@ex",
    ".org from 10.",
    ".0.",
    " card ",
    " tel +1 555 ",
)

#: deterministic PII suffix appended to each document so the scrub
#: operator is exercised on text that actually CONTAINS pii (the
#: synthetic corpus has none); the oracle replays the construction
_PII_MK_SQL = (
    "text || ' contact u' || doc_id || '@ex' || (doc_id%7) || "
    "'.org from 10.' || (doc_id%256) || '.0.' || ((doc_id*7)%256) || "
    "' card ' || (doc_id+4000000000000000) || "
    "' tel +1 555 ' || lpad((doc_id%10000)::VARCHAR, 4, '0')"
)


def _pii_oracle() -> str:
    scrub = "wp"
    for _, pat, mask in tx.PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{mask}', 'g')"
    hits = ",\n  ".join(
        f"len(regexp_extract_all(wp, '{pat}')) AS n_{name}"
        for name, pat, _ in tx.PII_PATTERNS
    )
    return f"""
    WITH w AS (SELECT doc_id, {_PII_MK_SQL} AS wp FROM documents)
    SELECT doc_id, {scrub} AS scrubbed,
      {hits}
    FROM w
    """


@register(
    "pii_scrub",
    _pii_oracle(),
    doc="PII scrubbing (operators.text.scrub_pii): mask emails, IPv4s, "
    "long digit runs, phone-ish runs via an ordered codegen'd "
    "regexp_replace chain, plus per-category hit counts — map-only, the "
    "privacy pass a corpus runs before training.  Patterns restricted "
    "to the Java-regex/RE2 common subset so the oracle replays exactly.",
    tags=("text", "curation"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    wp = F.concat(
        F.col("text"),
        F.lit(_PII_MK_SPARK[0]),
        d.cast("string"),
        F.lit(_PII_MK_SPARK[1]),
        (d % 7).cast("string"),
        F.lit(_PII_MK_SPARK[2]),
        (d % 256).cast("string"),
        F.lit(_PII_MK_SPARK[3]),
        ((d * 7) % 256).cast("string"),
        F.lit(_PII_MK_SPARK[4]),
        (d + 4000000000000000).cast("string"),
        F.lit(_PII_MK_SPARK[5]),
        F.lpad((d % 10000).cast("string"), 4, "0"),
    )
    hits = tx.pii_hits(F.col("wp"))
    return docs.withColumn("wp", wp).select(
        "doc_id",
        tx.scrub_pii("wp").alias("scrubbed"),
        *[v.alias(k) for k, v in hits.items()],
    )


@register(
    "doc_repetition_stats",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    b AS (SELECT doc_id, t,
            CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
              ELSE [] END AS bg
          FROM t)
    SELECT doc_id,
      len(t) AS n_words,
      (len(t) - len(list_distinct(t)))::DOUBLE / greatest(len(t),1)
        AS dup_word_ratio,
      len(list_filter(t, x -> x = list_aggregate(t,'mode')))::DOUBLE
        / greatest(len(t),1) AS top_word_ratio,
      (len(bg) - len(list_distinct(bg)))::DOUBLE / greatest(len(bg),1)
        AS dup_bigram_ratio,
      (len(t) < 10 OR
       ((len(t) - len(list_distinct(t)))::DOUBLE / greatest(len(t),1) <= 0.5
        AND len(list_filter(t, x -> x = list_aggregate(t,'mode')))::DOUBLE
              / greatest(len(t),1) <= 0.2
        AND (len(bg) - len(list_distinct(bg)))::DOUBLE
              / greatest(len(bg),1) <= 0.3)) AS repetition_keep
    FROM b
    """,
    doc="Gopher-style repetition quality gates "
    "(operators.text.repetition_features): duplicate-word, top-word and "
    "duplicate-bigram fractions — per-document array expressions with a "
    "sorted-array fold for the mode count, so a 100 TB scan is one map "
    "stage with NO aggregation shuffle; the oracle recomputes the mode "
    "count via DuckDB's list_aggregate.",
    tags=("text", "curation"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return tx.repetition_features(docs).select(
        "doc_id",
        "n_words",
        "dup_word_ratio",
        "top_word_ratio",
        "dup_bigram_ratio",
        "repetition_keep",
    )


def _shuffle_oracle() -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("doc_id")
    return f"""
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM (SELECT doc_id, (({h}) % 8 + 8) % 8 AS shard, ({h}) AS h
          FROM documents)
    """


@register(
    "deterministic_shuffle",
    _shuffle_oracle(),
    doc="Training-order shuffle: xxhash64(doc_id) assigns each document "
    "a shard and a position inside it — a deterministic, seedless "
    "global permutation that any worker can recompute (no shuffle "
    "service of record needed). Per-shard ordering is a window inside "
    "the shard partition; shard count scales with the cluster so no "
    "window ever sees more than one shard of data.",
    tags=("sampling", "text"),
)
def deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    h = F.xxhash64("doc_id")
    w = W.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", F.pmod(h, F.lit(8)).alias("shard"), h.alias("h"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


_VOCAB_CTES = f"""
    counts AS (
      SELECT term, COUNT(*) AS n
      FROM (SELECT unnest({_TOKS}) AS term FROM documents)
      GROUP BY term
    ),
    vocab AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) - 1 AS INT)
               AS token_id,
             term
      FROM (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 1000)
    )
"""


@register(
    "tokenize_with_vocab",
    f"""
    WITH {_VOCAB_CTES},
    tok AS (
      SELECT doc_id,
             unnest({_TOKS}) AS term,
             unnest(range(1, len({_TOKS}) + 1)) AS i
      FROM documents
    ),
    ids AS (
      SELECT t.doc_id, t.i, coalesce(v.token_id, -1) AS tid
      FROM tok t LEFT JOIN vocab v USING (term)
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY i) AS token_ids
    FROM ids GROUP BY doc_id
    """,
    doc="Tokenizer transform step (the fit half is build_vocab): map each "
    "document to its token-id sequence against the <=V-row vocabulary "
    "folded into ONE broadcast map row (map_from_entries over the vocab "
    "aggregate), OOV -> -1.  The per-document transform is a map lookup "
    "per token inside a single Project — no explode, no per-instance "
    "join, no regroup-by-doc shuffle: the only exchanges left are the "
    "vocabulary fit's own aggregates, so a 100 TB tokenization run "
    "never shuffles token instances at all (the pre-round-10 shape "
    "exploded every token and re-grouped by doc_id).",
    tags=("text", "bench"),
)
def tokenize_with_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    vocab = build_vocab(spark, sf_dir).select("term", "token_id")
    # the whole vocabulary as ONE broadcast hash-chained dense array:
    # slot pmod(xxhash64(term), NB) holds that bucket's (term, id)
    # chain, so a lookup is one O(1) array index + a ~1-entry chain
    # probe (a map_from_entries dimension would linear-scan all V
    # entries per token: Catalyst's GetMapValue has no hash structure)
    _NB = 4096
    chains = (
        vocab.groupBy(
            F.pmod(F.xxhash64("term"), F.lit(_NB)).alias("__b")
        )
        .agg(F.collect_list(F.struct("term", "token_id")).alias("__es"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__es"))
            ).alias("__cm")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(_NB - 1)),
                lambda i: F.element_at(F.col("__cm"), i.cast("bigint")),
            ).alias("__vd")
        )
    )

    def _lookup(w: Column) -> Column:
        ch = F.element_at(
            F.col("__vd"),
            (F.pmod(F.xxhash64(w), F.lit(_NB)) + F.lit(1)).cast("int"),
        )
        hit = F.get(F.filter(ch, lambda e: e["term"] == w), 0)
        return F.coalesce(hit["token_id"], F.lit(-1))

    vm = chains
    tids = F.transform(tx.tokens("text"), _lookup)

    def body(t: Column) -> Column:
        # all three outputs read the SAME evaluated id array (bind_struct)
        return F.struct(
            F.size(t).cast("bigint").alias("n_tokens"),
            F.size(F.filter(t, lambda x: x == -1))
            .cast("bigint")
            .alias("n_oov"),
            F.array_join(
                F.transform(t, lambda x: x.cast("string")), " "
            ).alias("token_ids"),
        )

    return (
        tx.bind_struct(
            docs.join(F.broadcast(vm)),
            tids,
            body,
            ["n_tokens", "n_oov", "token_ids"],
        )
        .filter(F.col("n_tokens") > 0)  # explode semantics: 0-token docs
        .select("doc_id", "n_tokens", "n_oov", "token_ids")
    )


@register(
    "bpe_pair_counts",
    f"""
    WITH tk AS (SELECT {_TOKS} AS t FROM documents),
    pairs AS (
      SELECT unnest(t[1:len(t) - 1]) AS pair_left,
             unnest(t[2:len(t)]) AS pair_right
      FROM tk WHERE len(t) >= 2
    )
    SELECT pair_left, pair_right, COUNT(*) AS n
    FROM pairs GROUP BY pair_left, pair_right
    ORDER BY n DESC, pair_left, pair_right LIMIT 100
    """,
    doc="One BPE merge round: count every adjacent token pair across the "
    "corpus and take the top-100 by (count, pair) total order.  The "
    "count is a map-side-combinable groupBy; the top-k is "
    "TakeOrderedAndProject (per-partition heap + driver merge), never "
    "a global sort of the pair space.",
    tags=("text", "topk"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = (
        docs.select(tx.tokens("text").alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> struct(tk[i-1] AS pair_left, tk[i] AS pair_right))"
                )
            ).alias("p")
        )
        .select("p.pair_left", "p.pair_right")
    )
    counts = pairs.groupBy("pair_left", "pair_right").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.orderBy(
        F.col("n").desc(), F.col("pair_left"), F.col("pair_right")
    ).limit(100)


@register(
    "tfidf_cosine_pairs",
    f"""
    WITH tok AS (SELECT doc_id, source, unnest({_TOKS}) AS term
                 FROM documents),
    tf AS (SELECT doc_id, any_value(source) AS source, term, COUNT(*) AS tf
           FROM tok GROUP BY doc_id, term),
    dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.source, tf.term,
             CAST(trunc(tf.tf * (CAST(n.n_docs AS DOUBLE) / dfq.df))
                  AS BIGINT) AS wq
      FROM tf JOIN dfq USING (term), n
      WHERE dfq.df * 10 <= 9 * n.n_docs
    ),
    norms AS (SELECT doc_id, CAST(SUM(wq * wq) AS BIGINT) AS n2
              FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(SUM(a.wq * b.wq) AS BIGINT) AS dot
      FROM w a JOIN w b
        ON a.term = b.term AND a.source = b.source
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, dot,
           dot / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = id_a
    JOIN norms nb ON nb.doc_id = id_b
    WHERE dot / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2) >= 0.80
    """,
    doc="Sparse TF-IDF cosine near-dup pairs via the inverted index: "
    "integer-quantized weights (trunc(tf * N/df), always >= 1) make "
    "dot products and norms exact integer sums, so the final "
    "cosine = dot / sqrt(n2a * n2b) is a chain of correctly-rounded "
    "IEEE ops — bit-identical across engines with no float-sum "
    "order dependence.  Pairs materialize only through shared "
    "(term, source) posting lists — the same source blocking as "
    "dedup_ngram_jaccard bounds the pair space, ubiquitous "
    "df > 0.9N terms drop, and the 0.80 threshold keeps output at "
    "near-dup density, not quadratic.  Hot-term skew is AQE "
    "skew-join territory; at 100 TB this is the exact verification "
    "stage downstream of MinHash-LSH candidate generation.  The "
    "weight table computes once and persists before the self-join.",
    tags=("dedup", "text"),
)
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tx.tokens("text")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.any_value("source").alias("source")
    )
    dfq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        # integer fence: Spark casts double->bigint by truncation but
        # DuckDB rounds, so 0.9*N with fractional N would diverge by 1
        # on boundary df values; df*10 <= 9*N is exact on both engines
        .filter(F.col("df") * 10 <= F.col("n_docs") * 9)
        .select(
            "doc_id",
            "source",
            "term",
            F.floor(
                F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))
            )
            .cast("bigint")
            .alias("wq"),
        )
        .persist()
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("wq") * F.col("wq")).alias("n2"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.sum(F.col("a.wq") * F.col("b.wq")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("n2").alias("n2b"))
    cos = F.col("dot") / F.sqrt(
        F.col("n2a").cast("double") * F.col("n2b")
    )
    out = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", "dot", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.80)
        .persist()
    )
    # materialize the (near-dup-density) pair output, then release the
    # term-weight cache instead of holding it for the session
    out.count()
    w.unpersist(blocking=True)
    return out


@register(
    "doc_rarity_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM cnt)
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(cnt.c) AS DOUBLE) / COUNT(*) AS avg_corpus_count,
           CAST(SUM(CASE WHEN cnt.c * 64 < tot.n_total THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS rare_fraction
    FROM tok JOIN cnt USING (w), tot
    GROUP BY tok.doc_id
    """,
    doc="Corpus-frequency document scoring (the CCNet-style LM-free "
    "quality signal): every token instance is joined to its corpus-"
    "wide count, and each doc reports its mean corpus count and the "
    "fraction of its tokens rarer than 1/64 relative frequency — docs "
    "dominated by hapax/garbage tokens score high rare_fraction, "
    "boilerplate scores high avg count.  Plan: one tokenize+explode "
    "(persisted — it feeds the vocabulary count and the join-back), "
    "one vocab-sized agg, an inverted-index equi-join on the token, "
    "one per-doc agg; the vocabulary table is broadcast-sized at any "
    "corpus scale (it grows sub-linearly), so the join-back is a "
    "broadcast join at 100 TB.  All ratios divide exact bigints — "
    "bit-identical across engines.  Tokenless docs drop (no token "
    "instances), matching the shingle-contract convention.",
    tags=("text", "agg"),
)
def doc_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tx.tokens("text")).alias("w")
    ).persist()
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("bigint").alias("n_total"))
    out = (
        tok.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias(
                "avg_corpus_count"
            ),
            (
                F.sum(
                    (F.col("c") * 64 < F.col("n_total")).cast("bigint")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("rare_fraction"),
        )
        .persist()
    )
    out.count()
    tok.unpersist(blocking=True)
    return out


@register(
    "bigram_pmi_collocations",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    ix AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM t),
    bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM ix),
    uni AS (SELECT w, COUNT(*) AS c
            FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS u FROM uni),
    big AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bg GROUP BY w1, w2),
    m AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS m FROM big)
    SELECT w1, w2, n_ab,
           CAST(n_ab * tot.u * tot.u AS DOUBLE)
             / CAST(m.m * a.c * b.c AS DOUBLE) AS lift
    FROM big
    JOIN uni a ON a.w = big.w1
    JOIN uni b ON b.w = big.w2, tot, m
    WHERE n_ab >= 5
    ORDER BY lift DESC, w1, w2
    LIMIT 100
    """,
    doc="Collocation mining: top-100 adjacent-token bigrams by PMI lift "
    "p(ab)/(p(a)p(b)) with support >= 5 — the phrase-discovery pass a "
    "tokenizer-training or stopphrase-filter pipeline runs over a "
    "corpus.  Bigrams derive positionally inside the array (no self-"
    "join: slice+zip is a map-only 1x expansion), unigram and bigram "
    "counts are two map-side-combinable aggs, and the two count "
    "lookups broadcast (vocabulary-sized).  Lift is computed as a "
    "ratio of exact bigint products (safe under 2^63 through sf0.1 "
    "x100; switch to log-space sums beyond) and the top-k is "
    "orderBy+limit = TakeOrderedAndProject with a total tiebreak "
    "(lift, w1, w2), not a global window.",
    tags=("text", "agg", "bench"),
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select(tx.tokens("text").alias("toks")).filter(F.size("toks") >= 2)
    t = t.persist()
    bg = t.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    uni = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("u"))
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    m = big.agg(F.sum("n_ab").cast("bigint").alias("m"))
    a = uni.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    b = uni.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    out = (
        big.filter(F.col("n_ab") >= 5)
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m))
        .select(
            "w1",
            "w2",
            "n_ab",
            (
                (F.col("n_ab") * F.col("u") * F.col("u")).cast("double")
                / (F.col("m") * F.col("ca") * F.col("cb")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(100)
        .persist()
    )
    out.count()
    t.unpersist(blocking=True)
    return out


def _bpe_cte_chain(n_merges: int = 3) -> tuple[str, str]:
    """(CTE body, final symbol-table name) for the unrolled BPE training
    rounds: pair count -> top-1 rule -> merge fold per round, the 1-row
    rule CTE referenced from the rewrite lambda (same no-driver-
    roundtrip shape as the Spark loop).  Shared by the learn and the
    encode oracles."""
    fold = (
        "list_reduce(list_prepend(CAST([] AS VARCHAR[]), "
        "list_transform(s, x -> [x])), "
        "(acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = r{r}.a "
        "AND x[1] = r{r}.b "
        "THEN acc[1:len(acc)-1] || [acc[len(acc)] || x[1]] "
        "ELSE acc || x END)"
    )
    ctes = []
    for r in range(n_merges):
        ctes.append(f"""
    p{r} AS (SELECT s[i] AS a, s[i + 1] AS b, cnt
             FROM (SELECT s, cnt, unnest(range(1, len(s))) AS i FROM s{r})),
    c{r} AS (SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS n
             FROM p{r} GROUP BY a, b
             UNION ALL SELECT '', '', CAST(-1 AS BIGINT)),
    r{r} AS (SELECT a, b, n FROM c{r} ORDER BY n DESC, a, b LIMIT 1),
    s{r + 1} AS (SELECT w, cnt, {fold.format(r=r)} AS s FROM s{r}, r{r})""")
    body = f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS w FROM documents),
    words AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
    s0 AS (SELECT w, cnt,
                  list_transform(range(1, length(w) + 1),
                                 i -> substring(w, CAST(i AS INT), 1)) AS s
           FROM words),
    {','.join(ctes)}"""
    return body, f"s{n_merges}"


def _bpe_learn_oracle(n_merges: int = 3) -> str:
    body, _ = _bpe_cte_chain(n_merges)
    finals = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS INT) AS round, a AS pair_left, "
        f"b AS pair_right, n FROM r{r} WHERE n >= 0"
        for r in range(n_merges)
    )
    return f"""
    {body}
    {finals}
    """


def _bpe_encode_oracle(n_merges: int = 3) -> str:
    body, final = _bpe_cte_chain(n_merges)
    return f"""
    {body},
    wn AS (SELECT w, CAST(len(s) AS BIGINT) AS n_sym,
                  CAST(length(w) AS BIGINT) AS n_chr FROM {final}),
    dtok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(n_chr) AS BIGINT) AS n_chars,
           CAST(SUM(n_sym) AS BIGINT) AS n_symbols,
           CAST(SUM(n_sym) AS DOUBLE) / CAST(SUM(n_chr) AS DOUBLE)
             AS compression
    FROM dtok JOIN wn USING (w)
    GROUP BY doc_id
    """


@register(
    "bpe_learn_merges",
    _bpe_learn_oracle(),
    doc="BPE tokenizer training (operators.text.bpe_learn_merges): three "
    "full merge-learning rounds — frequency-weighted adjacent-pair "
    "count over the distinct-word table, deterministic top-1 rule "
    "election (n DESC, then lexicographic), and a left-to-right "
    "non-overlapping merge fold rewriting every word — returning the "
    "learned rules.  The sixth fully-oracled iterative algorithm: the "
    "oracle unrolls the rounds as CTEs with the 1-row rule CTE "
    "referenced inside the rewrite lambda, exactly like the Spark "
    "loop's 1-row broadcast (no driver round-trip on either side).  "
    "Corpus is scanned once for the word count; everything else is "
    "vocabulary-sized.",
    tags=("text", "iterative", "bench"),
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.text import bpe_learn_merges as learn

    return learn(table(spark, sf_dir, "documents"), n_merges=3)


@register(
    "bpe_encode_stats",
    _bpe_encode_oracle(),
    doc="BPE fit-and-transform (operators.text.bpe_encode_stats): learn "
    "three merge rules, rewrite the distinct-word table once, and join "
    "documents back to report per-doc token/char/symbol counts and the "
    "compression ratio the tokenizer achieves — the encode-side "
    "companion of bpe_learn_merges.  The model table is vocabulary-"
    "sized, so the per-document transform is a broadcast join (never a "
    "per-token fold); ratios divide exact bigints.",
    tags=("text", "iterative"),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.text import bpe_encode_stats as enc

    return enc(table(spark, sf_dir, "documents"), n_merges=3)


def _bpe_vocab_oracle(n_merges: int = 3) -> str:
    body, final = _bpe_cte_chain(n_merges)
    return f"""
    {body}
    SELECT symbol, CAST(SUM(cnt) AS BIGINT) AS n
    FROM (SELECT unnest(s) AS symbol, cnt FROM {final})
    GROUP BY symbol
    """


@register(
    "bpe_vocab",
    _bpe_vocab_oracle(),
    doc="The trained tokenizer's final symbol vocabulary with corpus-"
    "weighted counts (operators.tokenizer.bpe_vocab) — the exact table "
    "the persisted tokenizer artifact ships and an embedding layer is "
    "sized from: |vocab| <= alphabet + n_merges entries, each count the "
    "symbol mass it absorbs.  Oracle replays the unrolled training "
    "rounds (the bpe_learn_merges CTE chain) and explodes the final "
    "word-symbol table.",
    tags=("text", "iterative"),
)
def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.tokenizer import bpe_vocab as vocab

    return vocab(table(spark, sf_dir, "documents"), n_merges=3)


@register(
    "corpus_health_report",
    f"""
    WITH f AS (
      SELECT doc_id, lang, text,
             len({_TOKS}) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_unique_texts,
           CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT)
             AS n_exact_dup_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
           CAST(SUM(CASE WHEN n_tokens BETWEEN 5 AND 1000
                          AND punct_ratio < 0.1 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS keep_fraction
    FROM f
    """,
    doc="One-row corpus health dashboard: doc count, exact-duplicate "
    "mass, language cardinality, mean token length, and the fraction "
    "passing the doc_quality_score keep gate — the summary a curation "
    "run prints before and after to prove what changed.  Single "
    "aggregate (multi-distinct via Spark's expand), map-side "
    "combinable counts, exact integer ratios.",
    tags=("text", "agg"),
)
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_tok = tx.token_count("text")
    punct = (
        F.size(F.regexp_extract_all("text", F.lit(tx.PUNCT_RE), 0)).cast(
            "double"
        )
        / F.greatest(F.length("text"), F.lit(1))
    )
    keep = n_tok.between(5, 1000) & (punct < 0.1)
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text"))
        .cast("bigint")
        .alias("n_exact_dup_docs"),
        F.countDistinct("lang").alias("n_langs"),
        (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
        (
            F.sum(keep.cast("int")).cast("double") / F.count(F.lit(1))
        ).alias("keep_fraction"),
    )


def _quality_classifier_oracle() -> str:
    feats_sql = {
        "stop_ratio": f"{_hits_sql(tx.LANG_STOPWORDS['en'])}::DOUBLE"
        f" / greatest(len({_TOKS}), 1)",
        "punct_ratio": "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE"
        " / greatest(length(text), 1)",
        "digit_ratio": "len(regexp_extract_all(text, '[0-9]'))::DOUBLE"
        " / greatest(length(text), 1)",
        "len_feat": f"least(len({_TOKS}), 300)::DOUBLE / 300.0",
    }
    # identical fold order to operators.text.linear_quality_score:
    # bias, then + w_i * f_i left to right — bit-identical IEEE result
    margin = str(tx.QUALITY_MODEL_BIAS) + "".join(
        f" + {w!r} * {name}" for name, w in tx.QUALITY_MODEL_WEIGHTS
    )
    cols = ",\n             ".join(
        f"{sql} AS {name}" for name, sql in feats_sql.items()
    )
    return f"""
    WITH feats AS (
      SELECT doc_id,
             {cols}
      FROM documents
    )
    SELECT doc_id, stop_ratio, punct_ratio, digit_ratio, len_feat,
           {margin} AS quality_margin,
           ({margin}) > 0.0 AS keep
    FROM feats
    """


@register(
    "quality_classifier_score",
    _quality_classifier_oracle(),
    doc="Learned-model quality gate (operators.text.linear_quality_score): "
    "a fasttext/logistic-style linear classifier with plan-literal "
    "weights over map-only features — stopword ratio, punct + digit "
    "density, capped length — reporting the raw margin and the keep "
    "decision.  Complements the rule-gate doc_quality_score: this is "
    "the 'trained artifact applied at scan time' shape (weights "
    "broadcast, zero shuffle); the margin stays hash-exact because the "
    "dot product folds in a fixed order over exact-integer ratios and "
    "no transcendental (sigmoid deliberately omitted — monotone).",
    tags=("text", "filter", "bench"),
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = tx.linear_quality_score(table(spark, sf_dir, "documents"))
    return scored.select(
        "doc_id",
        "stop_ratio",
        "punct_ratio",
        "digit_ratio",
        "len_feat",
        "quality_margin",
        "keep",
    )


@register(
    "doc_unigram_surprisal",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM cnt)
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(length(bin(tot.n_total)) - length(bin(cnt.c)))
             AS BIGINT) AS total_surprisal_bits,
           CAST(SUM(length(bin(tot.n_total)) - length(bin(cnt.c)))
             AS DOUBLE) / COUNT(*) AS mean_surprisal_bits
    FROM tok JOIN cnt USING (w), tot
    GROUP BY tok.doc_id
    """,
    doc="Integer-exact unigram surprisal scoring — the LM-free "
    "perplexity proxy on a log scale: each token instance contributes "
    "floor-log2(N_total) - floor-log2(count(w)) bits (bit-length "
    "arithmetic, the same length(bin(x)) primitive the HLL rho uses — "
    "NO libm log, so the score is bit-exact across engines where a "
    "float ln() could never be).  Docs of common boilerplate score "
    "low mean bits, hapax/garbage-heavy docs score high — the log "
    "scale separates the distribution tails that doc_rarity_score's "
    "linear mean compresses.  Same inverted-index plan as "
    "doc_rarity_score: tokenize once (persisted), vocab-sized count "
    "agg, broadcast-scale join-back, one per-doc aggregate.",
    tags=("text", "agg"),
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tx.tokens("text")).alias("w")
    ).persist()
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("bigint").alias("n_total"))
    bits = F.length(F.bin(F.col("n_total"))) - F.length(F.bin(F.col("c")))
    out = (
        tok.join(cnt, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(bits).cast("bigint").alias("total_surprisal_bits"),
            (F.sum(bits).cast("double") / F.count(F.lit(1))).alias(
                "mean_surprisal_bits"
            ),
        )
        .persist()
    )
    out.count()
    tok.unpersist(blocking=True)
    return out


@register(
    "corpus_health_by_source",
    f"""
    WITH f AS (
      SELECT doc_id, source, lang, text,
             len({_TOKS}) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE
               / greatest(length(text), 1) AS punct_ratio
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_unique_texts,
           CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT)
             AS n_exact_dup_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
           CAST(SUM(CASE WHEN n_tokens BETWEEN 5 AND 1000
                          AND punct_ratio < 0.1 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS keep_fraction
    FROM f GROUP BY source
    """,
    doc="Per-source corpus governance: the corpus_health_report grouped "
    "by origin — dup mass, language spread, token volume, and rule-"
    "gate keep fraction PER SOURCE, which is the table a curation "
    "owner actually acts on (drop a dirty feed, reweight a clean one; "
    "the mix_weights input of llm_pipeline.curate comes from exactly "
    "this view).  Same one-aggregate shape, keyed by source, so the "
    "shuffle carries one row per source.",
    tags=("text", "agg"),
)
def corpus_health_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_tok = tx.token_count("text")
    punct = (
        F.size(F.regexp_extract_all("text", F.lit(tx.PUNCT_RE), 0)).cast(
            "double"
        )
        / F.greatest(F.length("text"), F.lit(1))
    )
    keep = n_tok.between(5, 1000) & (punct < 0.1)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text"))
        .cast("bigint")
        .alias("n_exact_dup_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
        (
            F.sum(keep.cast("int")).cast("double") / F.count(F.lit(1))
        ).alias("keep_fraction"),
    )


_BM25_TERMS = ("vector", "hash", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


def _mitchell_idf_sql(n_expr: str, df_expr: str) -> str:
    """DuckDB replica of operators.text.log2_ratio_mitchell — the
    engine-exact piecewise-linear log2(N/df): integer/bit arithmetic
    plus one power-of-two division, identical double bit-for-bit."""
    rq = (
        f"CAST(trunc(CAST(CAST({n_expr} AS BIGINT) * 1048576 AS DOUBLE)"
        f" / CAST({df_expr} AS DOUBLE)) AS BIGINT)"
    )
    e = f"(length(bin({rq})) - 1)"
    p2 = f"(CAST(1 AS BIGINT) << {e})"
    return (
        f"((CAST({e} AS DOUBLE)"
        f" + CAST({rq} - {p2} AS DOUBLE) / CAST({p2} AS DOUBLE)) - 20.0)"
    )


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    idf = _mitchell_idf_sql("s.n_docs", "df.df")
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
           WHERE w IN ({terms}) GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY w),
    scored AS (
      SELECT tf.doc_id, tf.w,
             {idf}
               * ((CAST(tf.tf AS DOUBLE) * ({_BM25_K1!r} + 1.0))
                  / (CAST(tf.tf AS DOUBLE) + {_BM25_K1!r}
                     * (1.0 - {_BM25_B!r}
                        + {_BM25_B!r} * (CAST(dl.dl AS DOUBLE) / s.avgdl))))
               AS term_score
      FROM tf JOIN df USING (w) JOIN dl ON dl.doc_id = tf.doc_id, stats s)
    SELECT doc_id,
           COUNT(*) AS n_matched_terms,
           CAST(SUM(CAST(trunc(term_score * 1e9) AS BIGINT)) AS BIGINT)
             AS score_q,
           CAST(SUM(CAST(trunc(term_score * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 AS bm25_score
    FROM scored GROUP BY doc_id
    """


@register(
    "bm25_keyword_search",
    _bm25_oracle(),
    doc="BM25 keyword retrieval over the corpus (query terms as plan "
    "literals — the curation-time 'find documents about X' primitive): "
    "classic tf-saturation term (k1=1.2, b=0.75, doc-length "
    "normalized) weighted by a Mitchell-interpolated log2(N/df) IDF "
    "(bit-length exponent + exact power-of-two mantissa division — "
    "NO libm log, resolves WITHIN a power-of-two bracket where the "
    "plain bit-length difference floors to zero), so the "
    "score is engine-exact; per-term scores are 1e-9-truncated and "
    "summed as integers, so the doc score is order-independent.  "
    "Plan: the tf table only materializes rows for the 3 query terms "
    "(filter pushed into the explode scan), df/avgdl are tiny "
    "broadcast aggregates — per-query cost is proportional to docs "
    "CONTAINING a term, not the corpus.",
    tags=("text", "agg", "search"),
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.bm25_scores(
        table(spark, sf_dir, "documents"),
        list(_BM25_TERMS),
        k1=_BM25_K1,
        b=_BM25_B,
    )


def _hybrid_rrf_oracle(qid: int = 0, k_cand: int = 20, k_out: int = 10,
                       c_rrf: int = 60) -> str:
    from planet_dump_ng_spark.plans.similarity_plans import _DOT

    cos = (
        f"{_DOT.format(a='e.embedding', b='vq.qv')}"
        f" / (sqrt({_DOT.format(a='e.embedding', b='e.embedding')})"
        f" * sqrt({_DOT.format(a='vq.qv', b='vq.qv')}))"
    )
    return f"""
    WITH bm AS ({_bm25_oracle()}),
    btop AS (SELECT doc_id, CAST(rnk AS INT) AS rank_bm25 FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id ASC)
          AS rnk FROM bm) WHERE rnk <= {k_cand}),
    vq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {qid}),
    vsc AS (SELECT e.vec_id AS doc_id, {cos} AS c
            FROM embeddings e CROSS JOIN vq WHERE e.vec_id <> {qid}),
    vtop AS (SELECT doc_id, CAST(rnk AS INT) AS rank_vec FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY c DESC, doc_id ASC) AS rnk
        FROM vsc)
        WHERE rnk <= {k_cand}),
    f AS (SELECT COALESCE(btop.doc_id, vtop.doc_id) AS doc_id,
                 vtop.rank_vec, btop.rank_bm25,
                 COALESCE(1.0 / ({c_rrf} + vtop.rank_vec), 0.0)
                   + COALESCE(1.0 / ({c_rrf} + btop.rank_bm25), 0.0) AS rrf
          FROM btop FULL OUTER JOIN vtop ON vtop.doc_id = btop.doc_id)
    SELECT doc_id, rank_vec, rank_bm25, rrf,
           CAST(hybrid_rank AS INT) AS hybrid_rank
    FROM (SELECT f.*, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC)
            AS hybrid_rank FROM f)
    WHERE hybrid_rank <= {k_out}
    """


@register(
    "hybrid_rrf_search",
    _hybrid_rrf_oracle(),
    doc="Hybrid retrieval: reciprocal-rank fusion (rrf = sum 1/(60+rank), "
    "the standard-constant Cormack et al. formulation) of the BM25 "
    "keyword ranking and the exact embedding-cosine ranking for one "
    "query (vec_id 0 + the literal term set) — the two-tower corpus "
    "search pattern: lexical catches what the embedding misses and vice "
    "versa, and rank-space fusion needs no score calibration between "
    "incomparable scales.  Ranks are exact ints (BM25 ties break on the "
    "quantized integer score), the fused value is a fixed-order sum of "
    "two exact-operand divisions, so the final ranking hash-matches.  "
    "Both candidate lists are top-20 (TakeOrdered-sized), the fusion a "
    "20-row full outer join — cost lives in the two parent rankings.",
    tags=("text", "similarity", "search"),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from planet_dump_ng_spark.operators import similarity as sim

    qid, k_cand, k_out, c_rrf = 0, 20, 10, 60
    emb = table(spark, sf_dir, "embeddings")
    vtop = (
        sim.cosine_topk(emb, emb.filter(F.col("vec_id") == qid), k=k_cand)
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").cast("int").alias("rank_vec"),
        )
    )
    bm = bm25_keyword_search(spark, sf_dir)
    # top-k FIRST (TakeOrderedAndProject), then rank the <=20 survivors
    # under a spark_partition_id() spec — the q10 pattern; a global
    # row_number over the corpus-sized BM25 table would be a single-task
    # window at scale
    border = [F.col("score_q").desc(), F.col("doc_id").asc()]
    bw = W.partitionBy(F.spark_partition_id()).orderBy(*border)
    btop = (
        bm.orderBy(*border)
        .limit(k_cand)
        .withColumn("rnk", F.row_number().over(bw))
        .select("doc_id", F.col("rnk").cast("int").alias("rank_bm25"))
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(c_rrf) + F.col("rank_vec")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(c_rrf) + F.col("rank_bm25")), F.lit(0.0)
    )
    f = btop.join(vtop, "doc_id", "full_outer").select(
        "doc_id", "rank_vec", "rank_bm25", rrf.alias("rrf")
    )
    # the fused set is <= 2*k_cand rows by construction: collapse to one
    # partition so the spark_partition_id() rank is global
    hw = W.partitionBy(F.spark_partition_id()).orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        f.coalesce(1)
        .withColumn("hybrid_rank", F.row_number().over(hw).cast("int"))
        .filter(F.col("hybrid_rank") <= k_out)
    )
