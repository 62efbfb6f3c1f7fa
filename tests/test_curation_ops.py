"""Unit tests for the curation operators added in round 3: PII
scrubbing, repetition quality gates, weighted dataset mixing, and
contiguous sequence packing."""

from pyspark.sql import functions as F


def test_scrub_pii_masks_each_category(spark):
    from planet_dump_ng_spark.operators.text import pii_hits, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org now"),
            (2, "host 192.168.0.1 down"),
            (3, "acct 1234567890123456 closed"),
            (4, "call +1 555 0182 9 today"),
            (5, "clean text only"),
        ],
        "id long, t string",
    )
    out = {
        r.id: r
        for r in df.select(
            "id",
            scrub_pii("t").alias("s"),
            *[v.alias(k) for k, v in pii_hits("t").items()],
        ).collect()
    }
    assert out[1].s == "mail <EMAIL> now" and out[1].n_email == 1
    assert out[2].s == "host <IP> down" and out[2].n_ipv4 == 1
    assert out[3].s == "acct <NUM> closed" and out[3].n_longnum == 1
    assert out[4].s == "call <PHONE> today" and out[4].n_phone == 1
    assert out[5].s == "clean text only"
    assert (
        out[5].n_email == out[5].n_ipv4 == out[5].n_longnum == out[5].n_phone == 0
    )


def test_scrub_pii_order_email_digits_not_double_masked(spark):
    """The email mask runs first, so its digits never leak into the
    numeric patterns; masks themselves are never re-matched."""
    from planet_dump_ng_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "u123456789012@ex.org and 987654321 and 10.0.0.255")],
        "id long, t string",
    )
    s = df.select(scrub_pii("t").alias("s")).head().s
    assert s == "<EMAIL> and <NUM> and <IP>"


def test_repetition_features_hand_computed(spark):
    from planet_dump_ng_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a a a a a a a a a b"),  # 10 words: 9x'a' + 'b'
            (2, "x y z"),  # all distinct, short: passes trivially
            (3, ""),  # tokenless
            (4, "solo"),  # single token: no bigrams
            (5, " ".join(f"w{i}" for i in range(12))),  # long, all distinct
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_features(df).collect()}
    assert out[1].n_words == 10
    assert out[1].dup_word_ratio == 8 / 10  # 10 words, 2 distinct
    assert out[1].top_word_ratio == 9 / 10
    assert out[1].dup_bigram_ratio == 7 / 9  # 9 bigrams: 8x'a a' + 'a b'
    assert not out[1].repetition_keep
    assert out[2].dup_word_ratio == 0.0 and out[2].top_word_ratio == 1 / 3
    assert out[2].repetition_keep  # under the 10-token floor
    assert out[3].n_words == 0 and out[3].top_word_ratio == 0.0
    assert out[4].dup_bigram_ratio == 0.0 and out[4].repetition_keep
    assert out[5].repetition_keep  # long and distinct: passes the gates


def test_weighted_mix_superset_and_determinism(spark):
    """Raising a source's weight only ADDS documents (never swaps), and
    membership is stable across repartitionings."""
    from planet_dump_ng_spark.operators.sampling import weighted_mix

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
    )
    lo = {r.k for r in weighted_mix(df, "k", "src", {"s0": 0.3, "s1": 0.6}).collect()}
    hi = {
        r.k
        for r in weighted_mix(
            df.repartition(7), "k", "src", {"s0": 0.7, "s1": 0.6}
        ).collect()
    }
    assert lo <= hi  # superset-stable under a raised weight
    assert len(hi) > len(lo)
    # unknown source s2 always dropped
    assert not {r.k for r in weighted_mix(df, "k", "src", {"s0": 1.0}).collect()} & {
        k for (k,) in df.filter("src <> 's0'").select("k").collect()
    }


def test_pack_contiguous_stream_is_gapless(spark):
    """Offsets laid end-to-end cover [0, total) exactly once, bins are
    consistent with offsets, and zero-token docs stay point-sized."""
    from planet_dump_ng_spark.operators.dataset import pack_contiguous

    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("n")
    )
    rows = sorted(
        pack_contiguous(df, "k", "n", capacity=10, num_buckets=4).collect(),
        # zero-token docs share their successor's offset; order them first
        key=lambda r: (r.start_off, r.n_tok),
    )
    total = sum(r.n_tok for r in rows)
    # gapless: consecutive start offsets differ by exactly the doc length
    off = 0
    for r in rows:
        assert r.start_off >= off  # zero-length docs share an offset
        if r.n_tok > 0:
            assert r.start_off == off
            off = r.start_off + r.n_tok
        assert r.first_bin == r.start_off // 10
        end = r.start_off + max(r.n_tok - 1, 0)
        assert r.last_bin == end // 10
    assert off == total


def test_pack_contiguous_deterministic_across_partitionings(spark):
    from planet_dump_ng_spark.operators.dataset import pack_contiguous

    df = spark.range(300).select(F.col("id").alias("k"), F.lit(5).alias("n"))
    a = sorted(pack_contiguous(df, "k", "n", 16, num_buckets=4).collect())
    b = sorted(
        pack_contiguous(df.repartition(11), "k", "n", 16, num_buckets=4).collect()
    )
    assert a == b


def test_forward_fill_carries_last_non_null(spark):
    from planet_dump_ng_spark.operators.temporal import forward_fill

    df = spark.createDataFrame(
        [
            (1, 1, None),
            (1, 2, 10.0),
            (1, 3, None),
            (1, 4, None),
            (1, 5, 20.0),
            (2, 1, None),  # other key: stays null (no prior value)
        ],
        "k long, seq long, v double",
    )
    out = {
        (r.k, r.seq): r.v
        for r in forward_fill(df, ["k"], ["seq"], ["v"]).collect()
    }
    assert out[(1, 1)] is None
    assert out[(1, 3)] == 10.0 and out[(1, 4)] == 10.0
    assert out[(1, 5)] == 20.0
    assert out[(2, 1)] is None


def test_funnel_strict_ordering(spark):
    from planet_dump_ng_spark.operators.temporal import funnel

    rows = [
        # u1 completes all three in order
        (1, "view", 1.0), (1, "click", 2.0), (1, "purchase", 3.0),
        # u2 clicks BEFORE viewing: click doesn't count, depth 1
        (2, "click", 1.0), (2, "view", 2.0),
        # u3 view+click, purchase at the SAME ts as click (not strictly
        # after): depth 2
        (3, "view", 1.0), (3, "click", 2.0), (3, "purchase", 2.0),
        # u4 never views: excluded entirely
        (4, "click", 1.0), (4, "purchase", 2.0),
    ]
    df = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows], "user_id long, event_type string, ts double"
    )
    out = {r.user_id: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].funnel_depth == 3 and out[1].t3 == 3.0
    assert out[2].funnel_depth == 1 and out[2].t2 is None
    assert out[3].funnel_depth == 2 and out[3].t3 is None


def test_zorder_buckets_are_2d_local(spark):
    """Morton bucketing bounds BOTH dimensions per bucket: every z-range
    bucket's (x, y) envelope is dramatically tighter than the full grid,
    which is exactly why file min/max stats prune 2-D predicates.  A
    single-key sort gives a tight envelope in one dimension only."""
    from planet_dump_ng_spark.operators.layout import cluster_by_zorder

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128 * 512).alias("x"),  # 16-bit grid, 128 steps
        (F.pmod(F.col("id") * 2654435761, 65536)).alias("y"),
    )
    out = cluster_by_zorder(df, F.col("x"), F.col("y"), n_files=64)
    env = (
        out.groupBy("zbucket")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r.n for r in env) == n
    # 64 buckets tile the 2^32 z-space as an 8x8 grid of 2^13-wide tiles
    for r in env:
        assert r.dx < 65536 // 8, r
        assert r.dy < 65536 // 8, r


def test_zorder_key_interleaves_bits(spark):
    from planet_dump_ng_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0b1111, 0b0000), (0b0000, 0b1111), (0b101, 0b011)], "x long, y long"
    )
    got = [r.z for r in df.select(zorder_key(F.col("x"), F.col("y")).alias("z")).collect()]
    assert got[0] == 0b01010101
    assert got[1] == 0b10101010
    # x=101, y=011 -> z bits (y1 x1 y0 x0): 0b011011? compute: pairs
    # (x0=1,y0=1)->11, (x1=0,y1=1)->10, (x2=1,y2=0)->01 => 0b01_10_11
    assert got[2] == 0b011011


def test_stratified_take_caps_and_append_stability(spark):
    from planet_dump_ng_spark.operators.sampling import stratified_take

    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )
    took = stratified_take(df, "k", "g", 20)
    per = {r.g: r.n for r in took.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 20 for n in per.values())
    # under-capacity group: all rows kept
    small = df.filter("k < 10")  # groups of ~3-4
    assert stratified_take(small, "k", "g", 20).count() == 10
    # appending rows displaces at most (never grows selections past cap,
    # and existing picks survive unless displaced by a smaller hash)
    a = {(r.g, r.k) for r in took.collect()}
    bigger = spark.range(600).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )
    b = {(r.g, r.k) for r in stratified_take(bigger, "k", "g", 20).collect()}
    assert len(b) == 60
    # the selection changes only by displacement: members of b that were
    # available to a (k < 500) must have been chosen by a too
    assert {(g, k) for (g, k) in b if k < 500} <= a


def test_repetition_fold_matches_counter_reference(spark):
    """Property: the sorted-array fold's top-frequency equals
    collections.Counter on randomized token lists (incl. empties,
    repeats, and unicode)."""
    import random
    from collections import Counter

    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "Ω", "x1", "🠀"]
    docs = []
    for i in range(200):
        n = rng.randrange(0, 30)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    from planet_dump_ng_spark.operators.text import repetition_features

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        top = Counter(toks).most_common(1)[0][1] if toks else 0
        assert got[i].n_words == n
        assert got[i].top_word_ratio == top / max(n, 1)
        assert got[i].dup_word_ratio == (n - len(set(toks))) / max(n, 1)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        nb = len(bigrams)
        assert got[i].dup_bigram_ratio == (nb - len(set(bigrams))) / max(nb, 1)


def test_pack_contiguous_random_sizes_property(spark):
    """Property: for random token sizes the packed stream is a
    permutation of the docs with exact cumulative offsets."""
    import random

    rng = random.Random(7)
    sizes = [(i, rng.randrange(0, 40)) for i in range(257)]
    from planet_dump_ng_spark.operators.dataset import pack_contiguous

    df = spark.createDataFrame(sizes, "k long, n long")
    rows = pack_contiguous(df, "k", "n", capacity=17, num_buckets=8).collect()
    assert {r.k for r in rows} == {k for k, _ in sizes}
    assert sum(r.n_tok for r in rows) == sum(n for _, n in sizes)
    seen = sorted(rows, key=lambda r: (r.start_off, r.n_tok))
    off = 0
    for r in seen:
        if r.n_tok > 0:
            assert r.start_off == off
            off += r.n_tok


def test_scd2_intervals_run_suppression(spark):
    from planet_dump_ng_spark.operators.temporal import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "a"),  # unchanged run collapses
            (1, 3, "b"),               # change opens interval at 3
            (1, 4, "b"), (1, 5, "a"),  # back to 'a' opens a NEW interval
            (2, 1, None), (2, 2, None), (2, 3, "x"),  # null-safe compare
        ],
        "k long, seq long, v string",
    )
    iv = scd2_intervals(df, ["k"], ["seq"], ["v"])
    got = sorted(
        (r.k, r.valid_from, r.valid_to, r.v, r.is_current)
        for r in iv.collect()
    )
    assert got == [
        (1, 1, 3, "a", False),
        (1, 3, 5, "b", False),
        (1, 5, None, "a", True),
        (2, 1, 3, None, False),
        (2, 3, None, "x", True),
    ]


def test_merge_upsert_actions(spark):
    from planet_dump_ng_spark.operators.temporal import merge_upsert

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    upd = spark.createDataFrame(
        [(2, 21.0), (3, None), (9, 90.0), (4, None)], "k long, v double"
    )
    got = {r.k: (r.v, r.merge_action) for r in merge_upsert(base, upd, "k", ["v"]).collect()}
    assert got[1] == (10.0, "unchanged")  # base only
    assert got[2] == (21.0, "update")
    assert got[3] == (None, "unchanged")  # update matches (null-safe)
    assert got[9] == (90.0, "insert")
    assert got[4] == (None, "insert")  # new key with NULL payload
