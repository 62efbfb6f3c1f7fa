"""Round-10 additions: the CCNet-style LM-surprisal quality gate,
winnowing substring-duplication fingerprints (Schleimer et al. 2003),
perceptual image near-dup (dHash + banded Hamming join), and
canonical-URL dedup — each hash-oracled.

Imported LAST in ``plans.load_all`` (the extras_plans rule): these
entries are never driver-green, so they queue behind the established
never-checked set in the driver's 50-query rotation window.

Determinism discipline (registry docstring): surprisal uses bit-length
arithmetic (integer-exact, no libm); the dHash stub replays DuckDB's
sha256; URL canonicalization is a lookahead-free regexp chain RE2 can
replay; every float is one division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from planet_dump_ng_spark.operators import dedup as dd
from planet_dump_ng_spark.operators import multimodal as mm
from planet_dump_ng_spark.operators import text as tx
from planet_dump_ng_spark.plans.registry import register, table
from planet_dump_ng_spark.plans.text_plans import _TOKS


# -- LM-surprisal quality gate -------------------------------------------------

_SURPRISAL_CEILING = 4.6  # bits/bigram; splits the fixture ~45/55


def _surprisal_gate_oracle(ceiling: float = _SURPRISAL_CEILING) -> str:
    # the model trains on the SAME corpus it scores (curate()'s fresh-run
    # shape), so every scored bigram is in-vocabulary: the backoff
    # branches are structurally unreachable and n_oov_bigrams is 0 —
    # the held-out branches are oracled by heldout_bigram_surprisal and
    # pinned against the frozen-model scorer in tests.
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(toks[1:len(toks)-1]) AS p,
                  unnest(toks[2:len(toks)]) AS w
           FROM t),
    cnt AS (SELECT p, w, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY p, w),
    pc AS (SELECT p, CAST(SUM(c) AS BIGINT) AS cp FROM cnt GROUP BY p),
    sc AS (SELECT bg.doc_id,
                  COUNT(*) AS n_bigrams,
                  CAST(0 AS BIGINT) AS n_oov_bigrams,
                  CAST(SUM(length(bin(pc.cp)) - length(bin(cnt.c)))
                    AS BIGINT) AS total_bits,
                  CAST(SUM(length(bin(pc.cp)) - length(bin(cnt.c)))
                    AS DOUBLE) / COUNT(*) AS mean_bits
           FROM bg JOIN cnt USING (p, w) JOIN pc USING (p)
           GROUP BY bg.doc_id)
    SELECT * FROM sc WHERE mean_bits <= {ceiling}
    """


@register(
    "surprisal_quality_gate",
    _surprisal_gate_oracle(),
    doc="The CCNet-style LM-surprisal quality gate (Wenzek et al. 2020, "
    "public) as curate(max_surprisal_bits=) runs it: a bigram LM trains "
    "on the corpus (operators.lm.bigram_lm_train_and_score — persisted "
    "frozen artifact, count tables + meta-last commit marker), every "
    "doc is scored under the PERSISTED tables, and docs keep iff mean "
    "per-bigram surprisal <= 4.6 bits.  Surprisal is integer bit-length "
    "arithmetic (a seen bigram costs floor-log2(count(prev)) - "
    "floor-log2(count(prev,next)) bits — no libm), so the gate boundary "
    "is bit-exact across engines.  Plan: ONE tokenize+zip scan feeds "
    "training, the artifact write and the score joins (materialized "
    "instance table); counts ride Observations on the writes; scoring "
    "shuffles (p, w) pairs, never documents.",
    tags=("text", "curation", "bench"),
)
def surprisal_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators import lm
    from planet_dump_ng_spark.plans.dedup_plans import _fresh_index_dir

    docs = table(spark, sf_dir, "documents")
    # unique per-run model dir with stale-sibling pruning — repeated
    # sweeps must not grow /tmp without bound
    d = _fresh_index_dir("pdng-bigram-lm-")
    _, sc = lm.bigram_lm_train_and_score(docs, d)
    return sc.filter(F.col("mean_bits") <= F.lit(_SURPRISAL_CEILING))


# -- winnowing substring duplication -------------------------------------------


def _winnow_oracle(k: int = 20, w: int = 31) -> str:
    from planet_dump_ng_spark.operators.dedup import _MERSENNE_31
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_pmod_inline

    hash_expr = xxh64_pmod_inline("s", _MERSENNE_31)
    return f"""
    WITH g AS (SELECT doc_id,
                      list_transform(range(1, length(text) - {k - 2}),
                                     q -> substr(text, q, {k})) AS grams
               FROM documents WHERE length(text) >= {k + w - 1}),
    hh AS MATERIALIZED (
        SELECT doc_id, list_transform(grams, s -> {hash_expr}) AS hs
        FROM g),
    fp AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                      range(1, len(hs) - {w - 2}),
                      j -> list_min(hs[j:j + {w - 1}])))) AS h
           FROM hh),
    c AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM fp GROUP BY h)
    SELECT doc_id,
           COUNT(*) AS n_fingerprints,
           CAST(SUM(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_fingerprints,
           CAST(SUM(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_fingerprint_fraction
    FROM fp JOIN c USING (h)
    GROUP BY doc_id
    """


@register(
    "substring_duplication_winnow",
    _winnow_oracle(),
    doc="Winnowing substring-duplication fingerprints (Schleimer, "
    "Wilkerson, Aiken 2003, public — operators.dedup."
    "winnow_fingerprints): every char position's 20-gram is hashed "
    "(31-bit folded xxhash64) and each 31-hash sliding window "
    "contributes its minimum, so ANY duplicated substring >= 50 chars "
    "is GUARANTEED to share a fingerprint — strictly better detection "
    "per index byte than exact_substring_duplication's stride-10 "
    "sampling (~6.3% of positions indexed vs 10%, no one-window miss "
    "bound; the strided query stays as the measured control).  Plan: "
    "map-only fingerprint selection (hash array projected FIRST, "
    "window-min transform reads the projection — the lambda-capture "
    "discipline), corpus COUNT(DISTINCT doc) per fingerprint, join "
    "back, one per-doc aggregate.  Oracle replays the xxh64 fold and "
    "the window-min selection list-for-list.",
    tags=("dedup", "text", "bench"),
)
def substring_duplication_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.substring_duplication(
        table(spark, sf_dir, "documents"), mode="winnow", k=20, w=31
    )


# -- perceptual image near-dup (dHash) -----------------------------------------


#: expected REAL-decode fingerprints for the 8 synth_png variants,
#: precomputed pure-Python at import (no Spark needed — synth_png and
#: png_dhash are stdlib-only); the oracle carries them as literals, so
#: a regression anywhere in the distributed decode path (chunk walk,
#: inflate, unfilter, luma, box-mean, gradient bits) hash-mismatches.
_SYNTH_DHASH = tuple(
    mm.png_dhash(mm.synth_png(v)) for v in range(8)
)


def _phash_oracle(max_hamming: int = 3) -> str:
    from planet_dump_ng_spark.plans.multimodal_plans import _hex_byte

    u_terms = " + ".join(
        f"{_hex_byte(i)}::HUGEINT * {256 ** (7 - i)}::HUGEINT"
        for i in range(8)
    )
    real_case = " ".join(
        f"WHEN {v} THEN CAST({_SYNTH_DHASH[v]} AS BIGINT)" for v in range(8)
    )
    bands = ", ".join(
        f"CAST((u // {65536 ** i}::HUGEINT) % 65536 AS BIGINT)"
        for i in range(4)
    )
    return f"""
    WITH img AS (SELECT doc_id, upper(sha256(text)) AS h FROM documents
                 WHERE doc_id % 3 IN (0, 1)),
    d AS (SELECT doc_id, ({u_terms}) AS su FROM img),
    s AS (SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN CASE doc_id % 8 {real_case} END
                      ELSE CAST(su - CASE
                               WHEN su >= 9223372036854775808::HUGEINT
                               THEN 18446744073709551616::HUGEINT
                               ELSE 0::HUGEINT END AS BIGINT)
                 END AS dhash
          FROM d),
    uu AS (SELECT doc_id, dhash,
                  CAST(dhash AS HUGEINT)
                    + CASE WHEN dhash < 0
                           THEN 18446744073709551616::HUGEINT
                           ELSE 0::HUGEINT END AS u
           FROM s),
    b AS (SELECT doc_id, dhash,
                 unnest([0, 1, 2, 3]) AS band,
                 unnest([{bands}]) AS bv
          FROM uu)
    SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
           CAST(bit_count(xor(a.dhash, b2.dhash)) AS INT) AS hamming
    FROM b a JOIN b b2
      ON a.band = b2.band AND a.bv = b2.bv AND a.doc_id < b2.doc_id
    WHERE bit_count(xor(a.dhash, b2.dhash)) <= {max_hamming}
    """


@register(
    "multimodal_phash_dedup",
    _phash_oracle(),
    doc="Perceptual image near-dup: 64-bit dHash per image payload "
    "(operators.multimodal.image_dhash — REAL pure-stdlib PNG pixel "
    "decode via zlib inflate + scanline unfilter + 9x8 integer "
    "box-mean luma + gradient bits), then the banded Hamming join "
    "(dhash_pairs): four 16-bit bands, equi-join, exact popcount "
    "verify — pigeonhole guarantees EXACT recall at Hamming <= 3 (a "
    "pair differing in <= 3 bits agrees on >= 1 of 4 bands).  Exact "
    "content-hash dedup (multimodal_payload_dedup) misses any "
    "re-encode; the perceptual hash survives them.  The REAL decoder "
    "runs inside the distributed query: doc_id %% 5 == 0 image rows "
    "carry deterministic synth_png payloads (JVM binary literals, 8 "
    "gradient variants) whose expected fingerprints the oracle holds "
    "as precomputed pure-Python literals — variants collide at "
    "Hamming 0..3 by construction, so the pair output is non-vacuous "
    "and pins decode+banding end-to-end; the remaining rows take the "
    "sha256 stub the oracle replays byte-for-byte.  Scale: map-only "
    "fingerprinting (payloads never leave the executor), 8-byte keys "
    "+ 2-byte bands through the shuffle.",
    tags=("multimodal", "dedup"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    wp = mm.attach_binary_payload(docs)
    # substitute the real-PNG fixture payloads JVM-side (binary
    # literals — no Python round-trip for the substitution itself)
    real = F.col("doc_id") % 5 == 0
    variant = (F.col("doc_id") % 8).cast("int")
    png = F.when(
        real,
        F.elt(variant + 1, *[F.lit(mm.synth_png(v)) for v in range(8)]),
    ).otherwise(F.col("payload"))
    wp = wp.withColumn("payload", png)
    pairs = mm.dhash_pairs(mm.image_dhash(wp), max_hamming=3)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# -- canonical-URL dedup ---------------------------------------------------------

#: synthesized URL exercising every canonicalization rule: uppercase
#: scheme+host (and a path segment whose case must be PRESERVED),
#: https default port, sometimes a trailing slash, tracking params
#: around a kept ``id`` param, sometimes a fragment.
_URL_SQL = (
    "'HTTPS://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) || "
    "'.COM:443/Path' || CAST(doc_id % 7 AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || "
    "'?utm_source=feed&id=' || CAST(doc_id % 11 AS VARCHAR) || "
    "'&gclid=abc' || "
    "CASE WHEN doc_id % 2 = 0 THEN '#frag' || CAST(doc_id AS VARCHAR) "
    "ELSE '' END"
)


def _canonical_url_sql(u: str) -> str:
    """DuckDB replay of operators.text.canonical_url, rule for rule
    (RE2 regexps, no lookahead — the reason the operator avoids them)."""
    head_re = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    low = (
        f"lower(regexp_extract({nofrag}, '{head_re}', 0)) || "
        f"regexp_replace({nofrag}, '{head_re}', '')"
    )
    p1 = (
        f"regexp_replace({low}, "
        r"'^(https://[^/:?#]*):443([/?].*)?$', '\1\2')"
    )
    p2 = (
        f"regexp_replace({p1}, "
        r"'^(http://[^/:?#]*):80([/?].*)?$', '\1\2')"
    )
    base = f"regexp_replace(split_part({p2}, '?', 1), '/+$', '')"
    q = f"regexp_extract({p2}, '\\?(.*)$', 1)"
    params = (
        f"list_filter(string_split({q}, '&'), "
        "x -> NOT regexp_matches(x, "
        "'^(utm_[A-Za-z0-9_]*|fbclid|gclid)='))"
    )
    return (
        f"{base} || CASE WHEN {q} <> '' AND len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )


@register(
    "dedup_canonical_url",
    f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
    c AS (SELECT doc_id, {_canonical_url_sql("url")} AS curl FROM u)
    SELECT curl, MIN(doc_id) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM c GROUP BY curl
    """,
    doc="Canonical-URL exact dedup (operators.text.canonical_url): the "
    "cheapest gate a production crawl pipeline runs FIRST — re-crawls "
    "of the same page differ in tracking params / fragment / host "
    "case / default port long before content hashing can catch them "
    "(after template drift the content hash misses; the URL never "
    "drifts).  Rules: scheme+host lowercased (path case preserved), "
    "fragment stripped, utm_*/fbclid/gclid params dropped with "
    "surviving params kept in order, :443/:80 default ports stripped, "
    "trailing slash trimmed, an emptied query loses its '?'.  All "
    "JVM-side regexp/higher-order array ops — map-only, then ONE "
    "group-by on the canonical string.  The fixture URL is "
    "synthesized from doc_id identically on both engines and "
    "exercises every rule; the oracle replays the chain rule for "
    "rule under RE2.",
    tags=("dedup", "text"),
)
def dedup_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("HTTPS://WWW.Example"), (did % 5).cast("string"),
        F.lit(".COM:443/Path"), (did % 7).cast("string"),
        F.when(did % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="), (did % 11).cast("string"),
        F.lit("&gclid=abc"),
        F.when(
            did % 2 == 0, F.concat(F.lit("#frag"), did.cast("string"))
        ).otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", tx.canonical_url(url).alias("curl"))
        .groupBy("curl")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# -- unigram-LM tokenizer ------------------------------------------------------


def _unigram_vocab_oracle(
    n_pieces: int = 64, L: int = 4, cap: int = 12
) -> str:
    """Full SQL replay of operators.unigram.unigram_vocab: seed counts,
    deterministic top-N cut, the Viterbi DP unrolled as ``cap`` chained
    CTEs with a ROW_NUMBER argmin per position (tie order = the
    operator's (bits, n_pieces, split) key), backtrack as ``cap`` more
    chained CTEs walking the backpointer table, then the hard-EM
    re-score."""
    ctes = [
        f"""w0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f
       FROM (SELECT unnest({_TOKS}) AS w FROM documents)
       WHERE length(w) <= {cap} GROUP BY w)""",
        f"""sub AS (SELECT f, unnest(flatten(list_transform(
             range(1, length(w) + 1),
             i -> list_transform(range(1, least({L}, length(w) - i + 1) + 1),
                                 l -> substr(w, i, l))))) AS piece
        FROM w0)""",
        """cnt AS (SELECT piece, CAST(SUM(f) AS BIGINT) AS cnt
        FROM sub GROUP BY piece)""",
        f"""multi AS (SELECT piece, cnt FROM cnt WHERE length(piece) > 1
          ORDER BY cnt DESC, piece LIMIT {n_pieces})""",
        """vocab0 AS (SELECT piece, cnt FROM cnt WHERE length(piece) = 1
           UNION ALL SELECT piece, cnt FROM multi)""",
        "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM vocab0)",
        """vocab AS MATERIALIZED (SELECT piece, cnt,
           CAST(length(bin(t)) - length(bin(cnt)) AS BIGINT) AS bits
         FROM vocab0, tot)""",
        """d0 AS (SELECT w, f, 0 AS pos, CAST(0 AS BIGINT) AS bits,
              0 AS np, 0 AS bj FROM w0)""",
    ]
    for k in range(1, cap + 1):
        prevs = " UNION ALL ".join(
            f"SELECT * FROM d{j}" for j in range(max(0, k - L), k)
        )
        ctes.append(
            f"""d{k} AS (SELECT w, f, {k} AS pos, bits, np, bj FROM (
      SELECT c.*, ROW_NUMBER() OVER (PARTITION BY c.w
               ORDER BY c.bits, c.np, c.bj) AS rn FROM (
        SELECT d.w, d.f, d.bits + v.bits AS bits, d.np + 1 AS np,
               d.pos AS bj
        FROM ({prevs}) d
        JOIN vocab v ON v.piece = substr(d.w, d.pos + 1, {k} - d.pos)
        WHERE length(d.w) >= {k}) c) WHERE rn = 1)"""
        )
    bp_union = " UNION ALL ".join(
        f"SELECT w, pos, bj FROM d{k}" for k in range(1, cap + 1)
    )
    ctes.append(f"bp AS MATERIALIZED ({bp_union})")
    ctes.append("s0 AS (SELECT w, f, length(w) AS pos FROM w0)")
    for m in range(1, cap + 1):
        ctes.append(
            f"""s{m} AS (SELECT s.w, s.f, bp.bj AS pos,
             substr(s.w, bp.bj + 1, s.pos - bp.bj) AS piece
         FROM s{m - 1} s JOIN bp ON bp.w = s.w AND bp.pos = s.pos
         WHERE s.pos > 0)"""
        )
    seg_union = " UNION ALL ".join(
        f"SELECT f, piece FROM s{m}" for m in range(1, cap + 1)
    )
    ctes.append(f"pieces AS ({seg_union})")
    ctes.append(
        """usage AS (SELECT piece, CAST(SUM(f) AS BIGINT) AS used_count
        FROM pieces GROUP BY piece)"""
    )
    ctes.append(
        "tot2 AS (SELECT CAST(SUM(used_count) AS BIGINT) AS t2 FROM usage)"
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT v.piece,
           v.cnt AS seed_count,
           CAST(COALESCE(u.used_count, 0) AS BIGINT) AS used_count,
           v.bits AS seed_bits,
           CAST(CASE WHEN COALESCE(u.used_count, 0) > 0
                     THEN length(bin(t2)) - length(bin(u.used_count))
                     ELSE length(bin(t2)) + 1 END AS BIGINT) AS em_bits
    FROM vocab v LEFT JOIN usage u USING (piece), tot2
    WHERE COALESCE(u.used_count, 0) > 0 OR length(v.piece) = 1
    """
    )


@register(
    "unigram_lm_vocab",
    _unigram_vocab_oracle(),
    doc="SentencePiece-unigram tokenizer training (Kudo 2018, public — "
    "operators/unigram.py), one hard-EM round, under the no-libm "
    "discipline: substring seed counts over DISTINCT words, a "
    "deterministic (count DESC, piece ASC) top-N cut, integer "
    "bit-length piece costs, Viterbi segmentation minimizing "
    "(total_bits, n_pieces, split) — the third key makes every tie "
    "deterministic — and a usage-count re-score with unused multi-char "
    "pieces pruned and unused single chars kept at the worst-case cost "
    "(they are the coverage guarantee).  The oracle unrolls the DP as "
    "12 chained argmin CTEs plus 12 backtrack CTEs over the "
    "backpointer table — the Lloyd/BPE oracle-unrolling pattern.  "
    "Scale: everything vocabulary-bound; the Viterbi runs once per "
    "DISTINCT word (Arrow-batched), documents never re-segment.",
    tags=("text", "tokenizer"),
)
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators import unigram as ug

    return ug.unigram_vocab(table(spark, sf_dir, "documents"))
