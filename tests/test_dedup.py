"""Dedup operator semantics on hand-built fixtures with known duplicates."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import dedup as dd

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one token changed
FAR = "completely different content about spark query engines and shuffles"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "a"),
        (2, BASE, "a"),  # exact dup of 1
        (3, "  THE  quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill and the birds sing in the "
            "garden outside ", "a"),  # dup modulo case/whitespace
        (4, NEAR, "a"),  # near dup of 1
        (5, FAR, "a"),
        (6, "tiny", "b"),  # shorter than k tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_groups(docs):
    got = {r.keep_id: r.dup_count for r in dd.exact_dedup(docs).collect()}
    assert got[1] == 3  # 1, 2, 3 share a canonical fingerprint
    assert got[4] == 1 and got[5] == 1 and got[6] == 1


def test_dedup_keep_first(docs):
    kept = sorted(r.doc_id for r in dd.dedup_keep_first(docs).collect())
    assert kept == [1, 4, 5, 6]


def test_shingles_short_doc_fallback(docs):
    row = docs.filter("doc_id = 6").select(dd.shingles("text", 3).alias("sh")).head()
    assert row.sh == ["tiny"]


def _py_shingles(text: str, k: int) -> list[str]:
    toks = [t for t in text.split() if t]
    if not toks:
        return []  # tokenless docs carry no shingles (near-dup is undefined)
    if len(toks) < k:
        return [" ".join(toks)]
    seen, out = set(), []
    for i in range(len(toks) - k + 1):
        s = " ".join(toks[i : i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@pytest.mark.parametrize("k", [2, 3, 5])
def test_shingles_match_python_reference(spark, k):
    """Regression for the zip_with construction: full k-gram content (not
    just counts) must match a straightforward reference, across doc
    lengths that straddle the window size."""
    texts = [
        "",
        "one",
        "one two",
        "one two three",
        "one two three four five six seven",
        "a a a a a",  # heavy dedup
        " spaced   out\ttokens \n newline ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: list(r.sh)
        for r in df.select("id", dd.shingles("text", k).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        assert sorted(got[i]) == sorted(_py_shingles(t, k)), (k, t)


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dd.ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert by_pair[(1, 2)] == 1.0
    assert 0.5 <= by_pair[(1, 4)] < 1.0  # one-token change
    assert (1, 5) not in by_pair


def test_prefix_filter_equals_exhaustive(docs):
    """Prefix filtering is a physical optimization: the verified output
    must be IDENTICAL to the exhaustive inverted-index plan — same
    pairs, same exact jaccard values — at several thresholds."""
    for t in (0.2, 0.5, 0.8):
        want = {
            (r.id_a, r.id_b): r.jaccard
            for r in dd.ngram_jaccard_pairs(docs, k=3, threshold=t).collect()
        }
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dd.ngram_jaccard_pairs(
                docs, k=3, threshold=t, prefix_filter=True
            ).collect()
        }
        assert got == want, f"threshold {t}"


def test_prefix_filter_equals_exhaustive_blocked(spark):
    """Same identity under block_col, on a corpus wide enough that
    prefixes genuinely truncate (20+ shingles per doc, t=0.7 keeps
    ~30% of each doc's index mass)."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")
    rows = []
    for i in range(12):
        words = base.split()
        words[i % len(words)] = f"mut{i}"
        rows.append((i, " ".join(words), "blk" + str(i % 2)))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    for kwargs in ({}, {"block_col": "source"}):
        want = {
            (r.id_a, r.id_b): r.jaccard
            for r in dd.ngram_jaccard_pairs(
                df, k=3, threshold=0.7, **kwargs
            ).collect()
        }
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dd.ngram_jaccard_pairs(
                df, k=3, threshold=0.7, prefix_filter=True, **kwargs
            ).collect()
        }
        assert want and got == want


def test_ngram_jaccard_join_matches_self_join_cross_pairs(docs):
    """The asymmetric exact join returns exactly the cross (new, corpus)
    pairs of the exhaustive self-join — no LSH recall trade."""
    new = docs.filter(F.col("doc_id") % 2 == 0)
    corpus = docs.filter(F.col("doc_id") % 2 == 1)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_join(
            new, corpus, k=3, threshold=0.4
        ).collect()
    }
    full = dd.ngram_jaccard_pairs(docs, k=3, threshold=0.4).collect()
    want = {}
    for r in full:
        # self-join emits id_a < id_b; the ingest join is (new, corpus)
        if r.id_a % 2 == 0 and r.id_b % 2 == 1:
            want[(r.id_a, r.id_b)] = r.jaccard
        elif r.id_b % 2 == 0 and r.id_a % 2 == 1:
            want[(r.id_b, r.id_a)] = r.jaccard
    assert got == want and want  # non-empty: the fixture has cross dups


def test_ngram_jaccard_join_excludes_reingested_doc(spark):
    """A doc present on both sides (re-ingest overlap) must not emit
    itself at jaccard 1.0."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = dd.ngram_jaccard_join(df, df, k=3, threshold=0.5).collect()
    assert out == []


def test_prefix_index_artifact_serves_identical(docs, tmp_path):
    """The persisted corpus prefix index serves the ingest join
    bit-identically to the derive-per-call path, a higher-t probe is
    valid (over-indexing only), and the guards refuse k mismatches,
    lower-t probes, and headerless dirs."""
    new = docs.filter(F.col("doc_id") % 2 == 0)
    corpus = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "pidx")
    meta = dd.write_prefix_index(corpus, idx, k=3, threshold=0.4)
    assert meta["format"] == dd.PREFIX_INDEX_FORMAT and meta["n_docs"] == 3
    direct = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_join(
            new, corpus, k=3, threshold=0.4
        ).collect()
    }
    served = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_join(
            new, k=3, threshold=0.4, corpus_index=idx
        ).collect()
    }
    assert served == direct and direct
    # higher threshold than recorded: safe (over-indexed candidates)
    d9 = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_join(
            new, corpus, k=3, threshold=0.9
        ).collect()
    }
    s9 = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_join(
            new, k=3, threshold=0.9, corpus_index=idx
        ).collect()
    }
    assert s9 == d9
    with pytest.raises(ValueError, match="k="):
        dd.ngram_jaccard_join(new, k=4, threshold=0.5, corpus_index=idx)
    with pytest.raises(ValueError, match="lose pairs"):
        dd.ngram_jaccard_join(new, k=3, threshold=0.2, corpus_index=idx)
    with pytest.raises(ValueError, match="no meta.json"):
        dd.read_prefix_index(docs.sparkSession, str(tmp_path / "nope"))


def test_prefix_index_crash_window(docs, tmp_path):
    """A rebuild that crashes mid-write leaves no stale header: the old
    meta is deleted BEFORE tables are rewritten, so the half-built
    artifact reads as 'not a prefix index'."""
    import os

    corpus = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "pidx2")
    dd.write_prefix_index(corpus, idx, k=3, threshold=0.5)
    # forge the crash: header removal is the first step of any rebuild
    os.remove(f"{idx}/meta.json")
    with pytest.raises(ValueError, match="no meta.json"):
        dd.read_prefix_index(docs.sparkSession, idx)


def test_minhash_signature_similarity(docs):
    """MinHash agreement rate approximates Jaccard."""
    sigs = {
        r.doc_id: r.sig
        for r in docs.select(
            "doc_id", dd.minhash_signature("text", num_hashes=128).alias("sig")
        ).collect()
    }
    same = [int(a == b) for a, b in zip(sigs[1], sigs[2])]
    assert sum(same) == 128  # identical docs -> identical signatures
    near = sum(int(a == b) for a, b in zip(sigs[1], sigs[4])) / 128
    far = sum(int(a == b) for a, b in zip(sigs[1], sigs[5])) / 128
    assert near > 0.5  # true jaccard ~0.87
    assert far < 0.2


def test_minhash_lsh_candidates(docs):
    cands = {
        (r.id_a, r.id_b) for r in dd.minhash_lsh_candidates(docs, bands=16).collect()
    }
    assert (1, 2) in cands and (1, 3) in cands
    assert (1, 4) in cands  # near dup caught by at least one band
    assert (1, 5) not in cands


def test_minhash_lsh_join_matches_self_join_cross_pairs(docs):
    """The asymmetric new-vs-corpus LSH join must produce exactly the
    self-join candidates that cross the split (normalized for pair
    order), since signatures and banding are per-document."""
    new = docs.filter(F.col("doc_id").isin(1, 4))
    corpus = docs.filter(~F.col("doc_id").isin(1, 4))
    asym = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_join(new, corpus, bands=16).collect()
    }
    full = {
        (r.id_a, r.id_b) for r in dd.minhash_lsh_candidates(docs, bands=16).collect()
    }
    expected = {
        (a, b) if a in (1, 4) else (b, a)
        for a, b in full
        if (a in (1, 4)) != (b in (1, 4))  # exactly one side is "new"
    }
    assert asym == expected
    assert all(a in (1, 4) and b not in (1, 4) for a, b in asym)


def test_simhash_near_dup(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dd.simhash_pairs(docs, max_hamming=16, block_bits=4).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical text -> identical simhash
    assert pairs.get((1, 4), 99) <= 16  # near dup within hamming budget


def test_simhash_deterministic(spark, docs):
    a = docs.select(dd.simhash64("text").alias("h")).collect()
    b = docs.select(dd.simhash64("text").alias("h")).collect()
    assert [r.h for r in a] == [r.h for r in b]


# -- round 6: mega-bucket containment (star mode / caps) -----------------------


def test_star_candidates_same_components_as_pairs(spark):
    """Star emission must preserve the connected components of the
    all-pairs candidate graph exactly: every in-bucket pair is linked
    through the bucket minimum."""
    texts = [BASE, BASE, NEAR, FAR, BASE + " extra trailing tokens here",
             FAR + " with a small twist appended", "tiny",
             "yet another wholly unrelated document about parquet files"]
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )

    def components(edges, n):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            parent[ra] = rb
        return {i: find(i) for i in range(n)}

    pairs = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(df, bands=16, mode="pairs").collect()
    }
    star = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(df, bands=16, mode="star").collect()
    }
    assert star <= pairs  # star edges are a subset of all-pairs edges
    assert components(star, len(texts)) == components(pairs, len(texts))


def test_star_mode_mega_bucket_is_linear(spark):
    """A B-doc boilerplate cluster (every doc identical -> one bucket per
    band holds all B) must emit exactly B-1 star edges, not B^2/2."""
    b = 5000
    boiler = spark.range(b).select(
        F.col("id").alias("doc_id"), F.lit(BASE).alias("text")
    )
    distinct_tail = spark.createDataFrame(
        [(b, FAR), (b + 1, "some other unrelated page about window functions")],
        "doc_id long, text string",
    )
    docs = boiler.unionByName(distinct_tail)
    star = dd.minhash_lsh_candidates(docs, bands=16, mode="star")
    rows = star.collect()
    # all-pairs would be b*(b-1)/2 = ~12.5M pairs; star is exactly b-1
    assert len(rows) == b - 1
    assert {r.id_a for r in rows} == {0}  # bucket min anchors every edge
    assert {r.id_b for r in rows} == set(range(1, b))


def test_pairs_mode_max_bucket_cap(spark):
    """max_bucket drops oversized buckets before the self-join; the two
    remaining near-dup docs (their own small bucket) still pair."""
    b = 50
    boiler = [(i, BASE) for i in range(b)]
    docs = spark.createDataFrame(
        boiler + [(b, FAR), (b + 1, FAR + " x")], "doc_id long, text string"
    )
    capped = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(
            docs, bands=16, max_bucket=10
        ).collect()
    }
    assert (b, b + 1) in capped          # small bucket survives the cap
    assert not any(a < b and bb < b for a, bb in capped)  # mega bucket dropped


def test_lsh_join_max_bucket_representatives(spark):
    """The capped asymmetric join probes only the cap smallest corpus ids
    per bucket — a batch doc near-identical to a boilerplate cluster is
    still caught, via the representatives."""
    corpus = spark.createDataFrame(
        [(i, BASE) for i in range(1, 40)] + [(99, FAR)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame([(0, BASE)], "doc_id long, text string")
    cands = dd.minhash_lsh_join(batch, corpus, bands=16, max_bucket=3).collect()
    got = {(r.id_a, r.id_b) for r in cands}
    # every candidate anchors on the batch doc and hits only the 3
    # smallest corpus ids of the boilerplate bucket
    assert got == {(0, 1), (0, 2), (0, 3)}


def test_lsh_bucket_stats_histogram(spark):
    docs = spark.createDataFrame(
        [(i, BASE) for i in range(7)] + [(7, FAR), (8, FAR), (9, "tiny")],
        "doc_id long, text string",
    )
    b = dd.lsh_buckets(docs, bands=16)
    hist = {r.bucket_size: r.n_buckets for r in dd.lsh_bucket_stats(b).collect()}
    # 16 bands x one 7-doc boilerplate bucket, 16 bands x one 2-doc FAR bucket
    assert hist == {7: 16, 2: 16}


def test_star_mode_rejects_unknown_mode(spark):
    docs = spark.createDataFrame([(0, BASE)], "doc_id long, text string")
    with pytest.raises(ValueError, match="mode"):
        dd.minhash_lsh_candidates(docs, mode="mesh")


def _prefix_candidates_py(
    sets: dict[int, frozenset], t: float
) -> set[tuple[int, int]]:
    """Pure-Python twin of the prefix-filter candidate stage: the same
    plen = floor((1-t)*n) + 2 bound and min >= t*max - 1 length filter
    as operators.dedup (any consistent total order satisfies the
    SSJoin theorem; md5 stands in for xxhash64 here — the Spark
    equality tests pin the production ordering)."""
    import hashlib
    import math

    def h(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")

    prefixes = {
        i: set(sorted(vals, key=h)[: math.floor((1.0 - t) * len(vals)) + 2])
        for i, vals in sets.items()
    }
    out = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            na, nb = len(sets[a]), len(sets[b])
            if min(na, nb) < t * max(na, nb) - 1.0:
                continue
            if prefixes[a] & prefixes[b]:
                out.add((a, b))
    return out


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_prefix_filter_candidate_recall_is_exact(data):
    """THE prefix-filter safety property: every pair at Jaccard >= t is
    a candidate (shares a prefix element AND survives the length
    filter) under the exact plen/slack formulas the operator uses —
    including adversarial thresholds near float boundaries (t*n exactly
    integral) and tiny/skewed set sizes, where an off-by-one prefix
    silently loses pairs."""
    from hypothesis import assume

    n_docs = data.draw(st.integers(2, 8), label="n_docs")
    vocab = [f"w{i}" for i in range(12)]  # small: forces overlap
    sets = {}
    for i in range(n_docs):
        vals = data.draw(
            st.frozensets(st.sampled_from(vocab), min_size=1, max_size=12),
            label=f"set{i}",
        )
        sets[i] = vals
    t = data.draw(
        st.one_of(
            st.floats(0.05, 0.95, allow_nan=False),
            # exact rationals hit the floor((1-t)n) boundaries
            st.sampled_from([0.1, 0.2, 0.25, 1 / 3, 0.5, 2 / 3, 0.75, 0.8]),
        ),
        label="threshold",
    )
    assume(t > 0)
    cands = _prefix_candidates_py(sets, t)
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                assert (a, b) in cands, (
                    f"qualifying pair lost: J={inter}/{union} >= {t}, "
                    f"sizes {len(sets[a])}/{len(sets[b])}"
                )
