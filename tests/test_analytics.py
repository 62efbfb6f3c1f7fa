"""Hand-computed pins for the event-analytics and tokenization operators.

The oracle gate proves Spark == DuckDB; these tests prove both equal the
*intended* semantics on crafted edge cases the synthetic data may not
exercise: midnight-crossing intervals, same-timestamp dedup ties, OOV
round-trips.
"""

import datetime as dt

from planet_dump_ng_spark import plans

plans.load_all()


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _q(name):
    return plans.QUERIES[name].spark


def test_peak_concurrency_splits_midnight(spark, tmp_path):
    # A=[23:58,00:03) B=[23:59,00:04) cross midnight; C=[00:01,00:06) does
    # not.  Day 1 peak: A+B = 2.  Day 2 carries A and B as boundary pieces,
    # then C joins: peak 3.
    t = lambda h, m: dt.datetime(2024, 3, 1, h, m) if h < 24 else dt.datetime(
        2024, 3, 2, h - 24, m
    )
    _write_events(
        spark,
        str(tmp_path),
        [(1, t(23, 58), 1, "a"), (2, t(23, 59), 1, "a"), (3, t(24, 1), 1, "a")],
    )
    got = {
        r["day"].date(): r["peak_concurrency"]
        for r in _q("peak_concurrency_daily")(spark, str(tmp_path)).collect()
    }
    assert got == {dt.date(2024, 3, 1): 2, dt.date(2024, 3, 2): 3}


def test_peak_concurrency_counts_half_open(spark, tmp_path):
    # B starts exactly when A ends: [0:00,0:05) and [0:05,0:10) never
    # overlap — the end delta orders before the start delta at 0:05.
    base = dt.datetime(2024, 3, 1, 0, 0)
    _write_events(
        spark,
        str(tmp_path),
        [(1, base, 1, "a"), (2, base + dt.timedelta(minutes=5), 1, "a")],
    )
    rows = _q("peak_concurrency_daily")(spark, str(tmp_path)).collect()
    assert [(r["day"].date(), r["peak_concurrency"]) for r in rows] == [
        (dt.date(2024, 3, 1), 1)
    ]


def test_dedup_events_window_tiebreak_and_boundaries(spark, tmp_path):
    base = dt.datetime(2024, 3, 1, 0, 1)
    _write_events(
        spark,
        str(tmp_path),
        [
            (2, base, 7, "click"),  # same ts as id 1 -> id wins the tie
            (1, base, 7, "click"),
            (3, dt.datetime(2024, 3, 1, 0, 9), 7, "click"),  # same window
            (4, dt.datetime(2024, 3, 1, 0, 11), 7, "click"),  # next window
            (5, base, 7, "view"),  # other type: own group
        ],
    )
    rows = {
        (r["window_start_s"], r["event_type"]): (r["first_event_id"], r["n_events"])
        for r in _q("dedup_events_window")(spark, str(tmp_path)).collect()
    }
    w0 = int(dt.datetime(2024, 3, 1, 0, 0, tzinfo=dt.timezone.utc).timestamp())
    w1 = w0 + 600
    assert rows == {
        (w0, "click"): (1, 3),
        (w1, "click"): (4, 1),
        (w0, "view"): (5, 1),
    }


def test_tokenize_round_trips_through_vocab(spark, sf_dir):
    from planet_dump_ng_spark.operators import text as tx
    from pyspark.sql import functions as F

    out = _q("tokenize_with_vocab")(spark, sf_dir)
    vocab = {
        r["token_id"]: r["term"]
        for r in _q("build_vocab")(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["toks"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", tx.tokens("text").alias("toks"))
        .limit(20)
        .collect()
    }
    checked = 0
    for row in out.filter(F.col("doc_id").isin(list(docs))).collect():
        ids = [int(x) for x in row["token_ids"].split()]
        toks = docs[row["doc_id"]]
        assert row["n_tokens"] == len(toks) == len(ids)
        assert row["n_oov"] == sum(1 for i in ids if i == -1)
        for i, tok in zip(ids, toks):
            if i != -1:
                assert vocab[i] == tok  # in-vocab ids decode to the token
            else:
                assert tok not in vocab.values()
        checked += 1
    assert checked == len(docs)


def test_retention_offset_zero_covers_every_user(spark, sf_dir):
    from pyspark.sql import functions as F

    out = _q("retention_cohorts")(spark, sf_dir)
    # every user is active in their own first week, so the offset-0 rows
    # partition the full user set
    offset0 = (
        out.filter(F.col("week_offset") == 0)
        .agg(F.sum("n_active").alias("s"))
        .collect()[0]["s"]
    )
    n_users = (
        plans.registry.table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert offset0 == n_users


from hypothesis import given, settings, strategies as st


@given(
    st.lists(
        st.integers(min_value=0, max_value=3 * 3600),  # 3h span, in seconds
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=30, deadline=None)
def test_peak_concurrency_matches_bruteforce(spark, tmp_path_factory, offsets):
    """The hour-partitioned sweep equals the O(n^2) definition: for every
    interval-start instant, count intervals covering it; days report the
    max.  Random offsets land on hour boundaries often enough to exercise
    the split pieces."""
    base = dt.datetime(2024, 3, 1, 22, 0)  # crosses midnight within the span
    starts = [base + dt.timedelta(seconds=o) for o in offsets]
    tmp = tmp_path_factory.mktemp("sweep")
    _write_events(
        spark, str(tmp), [(i, s, 1, "a") for i, s in enumerate(starts)]
    )
    got = {
        r["day"].date(): r["peak_concurrency"]
        for r in _q("peak_concurrency_daily")(spark, str(tmp)).collect()
    }
    # brute force: concurrency can only peak at an interval start (or at a
    # boundary piece start, where the set of open intervals is a subset of
    # the one at the original start instant), evaluated per day
    span = dt.timedelta(seconds=300)
    expect = {}
    for s in starts:
        for day in {s.date(), (s + span).date()}:
            lo = dt.datetime.combine(day, dt.time())
            # concurrency at max(s, day-start): intervals open at that instant
            at = max(s, lo)
            if at < s + span:
                c_at = sum(1 for t in starts if t <= at < t + span)
                expect[day] = max(expect.get(day, 0), c_at)
    assert got == expect
