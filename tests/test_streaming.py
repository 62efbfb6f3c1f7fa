"""Stream-batch equivalence: the Structured Streaming jobs converge to the
same results as their oracle-checked batch counterparts on the same data."""

import os

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.plans.registry import table
from planet_dump_ng_spark.plans.streaming_plans import (
    hourly_event_rollup,
    user_sessionization,
)
from planet_dump_ng_spark.streaming import jobs


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events as a multi-file parquet dir (file-source streams need a
    directory; several files -> several micro-batches)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_hourly_rollup_stream_matches_batch(spark, sf_dir, events_dir):
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    jobs.run_to_memory(
        jobs.hourly_rollup_stream(stream), "rollup_mem", output_mode="complete"
    )
    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("rollup_mem").collect()
    }
    expected = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in hourly_event_rollup(spark, sf_dir).collect()
    }
    assert got == expected


def test_sessionize_stream_matches_batch(spark, sf_dir, events_dir):
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=64)
    jobs.run_to_memory(
        jobs.sessionize_stream(stream), "sess_mem", output_mode="append"
    )
    got = (
        spark.table("sess_mem")
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    got_rows = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in got.collect()
    }
    expected = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in user_sessionization(spark, sf_dir).collect()
    }
    assert got_rows == expected


def test_sessionize_state_carries_across_restarts(spark, sf_dir, tmp_path):
    """Time-split the stream into two file drops and run the sessionizer
    twice against the SAME checkpoint: per-user state (last event time,
    session ordinal) must persist through the restart, so the union of
    both runs' outputs equals the batch sessionization."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev = table(spark, sf_dir, "events")
    cut = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]

    def drain():
        # file sink (not memory): only fault-tolerant sinks support
        # restarting from a checkpoint
        stream = jobs.read_events_stream(spark, src, max_files_per_trigger=64)
        q = (
            jobs.sessionize_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ev.filter(F.col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    drain()
    ev.filter(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    drain()

    got = {}
    for r in spark.read.parquet(out).collect():
        got.setdefault((r.user_id, r.session_id), []).append(r.ts)
    got_agg = {
        k: (len(v), min(v), max(v)) for k, v in got.items()
    }
    expected = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in user_sessionization(spark, sf_dir).collect()
    }
    assert got_agg == expected


def test_sessionization_property(spark):
    """Hypothesis-style randomized check (fixed seeds for determinism):
    the batch sessionizer window plan equals a naive per-user Python
    sessionizer on arbitrary event streams."""
    import random

    from pyspark.sql import Window as W

    rnd = random.Random(1234)
    rows = []
    eid = 0
    for user in range(6):
        t_us = rnd.randrange(0, 10**6)
        for _ in range(rnd.randrange(1, 40)):
            # 0 = same-us timestamp collision: the (ts, event_id) tie-break
            # contract shared by the batch window and the streaming
            # sessionizer must hold through duplicate timestamps
            t_us += rnd.choice([0, 0, 1, 10**6, 1799_999_999, 1800_000_000, 1800_000_001, 5 * 10**9])
            rows.append((eid, user, t_us))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long").select(
        "event_id", "user_id", F.timestamp_micros("us").alias("ts")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = df.withColumn(
        "new_session",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) <= 1800 * 10**6,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    got = {(r.event_id): r.session_id for r in sess.collect()}

    # naive reference
    by_user: dict = {}
    for eid_, user, t_us in rows:
        by_user.setdefault(user, []).append((t_us, eid_))
    expected = {}
    for user, evs in by_user.items():
        evs.sort()
        last, sid = None, 0
        for t_us, eid_ in evs:
            if last is None or t_us - last > 1800 * 10**6:
                sid += 1
            expected[eid_] = sid
            last = t_us
    assert got == expected


def test_sessionize_stream_ties_match_batch(spark, tmp_path):
    """Stream-batch equivalence THROUGH same-microsecond collisions, with a
    duplicate timestamp straddling a micro-batch boundary.

    The batch plan orders by (ts, event_id); the streaming sessionizer
    sorts each micro-batch the same way and carries (last_us, session_id)
    state across batches.  A tie at the boundary must not open a new
    session (gap 0 <= GAP), and ties inside a batch must assign ids in
    event_id order — pinned per event, not just per session aggregate."""
    from pyspark.sql import Window as W

    base = 1_700_000_000_000_000  # us
    gap = jobs.GAP_US
    rows = []  # (event_id, user_id, us)
    for user in range(3):
        t = base + user  # stagger users off each other
        evs = [
            t, t, t,                      # triple collision opens session 1
            t + gap, t + gap,             # exactly-gap pair: same session
            t + gap + gap + 1,            # gap exceeded: session 2
            t + 3 * gap + 2,              # session 3, last event of batch 1
            t + 3 * gap + 2,              # SAME us, lands in batch 2: still session 3
            t + 3 * gap + 3,
            t + 5 * gap,                  # session 4
        ]
        rows += [(None, user, us) for us in evs]
    # event ids in timeline order (ties get consecutive ids)
    rows = [(i, u, us) for i, (_, u, us) in enumerate(rows)]
    split = 8  # per-user index where batch 2 begins (the tie twin)

    def write(part, path):
        df = spark.createDataFrame(
            part, "event_id long, user_id long, us long"
        ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
        df.coalesce(1).write.mode("append").parquet(path)

    src = str(tmp_path / "src")
    write([r for r in rows if r[0] % 10 < split], src)
    write([r for r in rows if r[0] % 10 >= split], src)

    stream = jobs.read_events_stream(spark, src, max_files_per_trigger=1)
    jobs.run_to_memory(jobs.sessionize_stream(stream), "sess_ties", "append")
    got = {
        r.event_id: r.session_id for r in spark.table("sess_ties").collect()
    }

    df = spark.createDataFrame(rows, "event_id long, user_id long, us long")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    batch = df.withColumn(
        "new_session",
        F.when(F.col("us") - F.lag("us").over(w) <= gap, F.lit(0)).otherwise(1),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    expected = {r.event_id: r.session_id for r in batch.collect()}
    assert got == expected
    assert sorted(set(expected.values())) == [1, 2, 3, 4]


def test_dedup_stream_matches_batch_survivors(spark, sf_dir, tmp_path):
    """Streaming exact dedup (dropDuplicates state) equals the batch
    survivor set when arrival order follows doc_id — the ingest-backfill
    contract: first arrival per canonical fingerprint survives, every
    later copy (also across micro-batches) is suppressed."""
    from planet_dump_ng_spark.operators.dedup import dedup_keep_first

    docs = table(spark, sf_dir, "documents")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    src = str(tmp_path / "docs")
    cols = ["doc_id", "source", "lang", "text", "n_chars"]
    # two time-ordered file drops: dups whose survivor landed in drop 1
    # must still be suppressed when their copy arrives in drop 2
    docs.select(cols).filter(F.col("doc_id") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    docs.select(cols).filter(F.col("doc_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = jobs.read_documents_stream(spark, src, max_files_per_trigger=1)
    jobs.run_to_memory(jobs.dedup_stream(stream), "dedup_mem", "append")
    got = {r.doc_id for r in spark.table("dedup_mem").collect()}
    expected = {r.doc_id for r in dedup_keep_first(docs).collect()}
    assert got == expected


def test_hourly_rollup_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics pinned: a row arriving in a later run, after the
    committed watermark passed its window, is DROPPED — the closed hour-0
    window emits exactly its on-time aggregate and the late value=100 row
    never reaches it.  (Two availableNow runs against one checkpoint: the
    second starts from the committed watermark, the shape production
    incremental jobs use; within a single run Spark's late filter lags one
    micro-batch by design.)"""
    import datetime as dt

    from pyspark.sql import Row

    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(eid, minutes, value=1.0):
        return Row(
            event_id=eid,
            ts=base + dt.timedelta(minutes=minutes),
            user_id=1,
            event_type="click",
            value=value,
            props="{}",
        )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        stream = jobs.read_events_stream(spark, src, max_files_per_trigger=64)
        q = (
            jobs.hourly_rollup_stream(stream, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: two on-time rows in hour 0 + one in hour 3 -> committed
    # watermark 01:30, past hour-0's end
    spark.createDataFrame(
        [ev(1, 10), ev(2, 20, value=2.0), ev(3, 210)], jobs.EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    # run 2: a LATE hour-0 row, beyond the watermark -> dropped
    spark.createDataFrame([ev(4, 30, value=100.0)], jobs.EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    drain()

    rows = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {(base, "click"): (2, 3.0)}


def test_curate_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """The per-document curation transforms (PII scrub, quality +
    repetition gates) are stateless maps: streaming them micro-batch by
    micro-batch yields row-for-row the batch result."""
    d = str(tmp_path_factory.mktemp("docs_stream"))
    docs = table(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(" ping admin@site.io"))
    )
    docs.repartition(4).write.mode("overwrite").parquet(d)

    stream = jobs.read_documents_stream(spark, d, max_files_per_trigger=1)
    jobs.run_to_memory(jobs.curate_stream(stream), "curate_mem", output_mode="append")
    got = {r.doc_id: r for r in spark.table("curate_mem").collect()}

    expected = {r.doc_id: r for r in jobs.curate_stream(docs).collect()}
    assert set(got) == set(expected)
    for k, e in expected.items():
        g = got[k]
        assert (g.text, g.n_tokens, g.stopword_ratio, g.repetition_keep,
                g.quality_keep) == (
            e.text, e.n_tokens, e.stopword_ratio, e.repetition_keep, e.quality_keep)
        assert "admin@site.io" not in g.text and "<EMAIL>" in g.text


@pytest.fixture(scope="module")
def ordered_events_dir(spark, sf_dir, tmp_path_factory):
    """Events staged as time-ordered files with increasing mtimes, so the
    file-source's arrival order follows event time — the shape a real bus
    delivers, and the precondition for watermark state eviction to drop
    nothing from an inner interval join."""
    import glob
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("events_ordered"))
    stage = str(tmp_path_factory.mktemp("events_ordered_stage"))
    ev = table(spark, sf_dir, "events")
    bounds = ev.select(
        F.expr("percentile_approx(unix_micros(ts), array(0.25, 0.5, 0.75), 10000)")
    ).first()[0]
    lo = None
    for i, hi in enumerate(list(bounds) + [None]):
        part = ev
        if lo is not None:
            part = part.filter(F.unix_micros("ts") >= lo)
        if hi is not None:
            part = part.filter(F.unix_micros("ts") < hi)
        sub = f"{stage}/{i}"
        part.coalesce(1).write.mode("overwrite").parquet(sub)
        (src,) = glob.glob(f"{sub}/part-*.parquet")
        dst = f"{d}/{i:02d}.parquet"
        shutil.copyfile(src, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        lo = hi
    return d


def test_view_purchase_join_stream_matches_batch(spark, sf_dir, ordered_events_dir):
    from planet_dump_ng_spark.plans.streaming_plans import view_purchase_join

    stream = jobs.read_events_stream(
        spark, ordered_events_dir, max_files_per_trigger=1
    )
    jobs.run_to_memory(
        jobs.view_purchase_join_stream(stream), "ss_join_mem", output_mode="append"
    )
    got = {
        (r.user_id, r.view_id, r.purchase_id, r.lag_us)
        for r in spark.table("ss_join_mem").collect()
    }
    expected = {
        (r.user_id, r.view_id, r.purchase_id, r.lag_us)
        for r in view_purchase_join(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_enrich_stream_matches_batch(spark, sf_dir, events_dir):
    from planet_dump_ng_spark.plans.relational import event_attribution

    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    dim = table(spark, sf_dir, "customer")
    jobs.run_to_memory(
        jobs.enrich_stream(stream, dim), "enrich_mem", output_mode="append"
    )
    got = {
        (r.event_id, r.uid, r.display_name)
        for r in spark.table("enrich_mem").collect()
    }
    expected = {
        (r.event_id, r.uid, r.display_name)
        for r in event_attribution(spark, sf_dir).collect()
    }
    assert got == expected


def test_dedup_events_stream_drops_redelivered(spark, ordered_events_dir, tmp_path):
    import glob
    import os
    import shutil

    # redeliver every file: duplicates arrive adjacent to the original,
    # i.e. well inside the watermark horizon
    d = str(tmp_path / "redelivered")
    os.makedirs(d)
    for i, f in enumerate(sorted(glob.glob(f"{ordered_events_dir}/*.parquet"))):
        for rep in (0, 1):
            dst = f"{d}/{i:02d}-{rep}.parquet"
            shutil.copyfile(f, dst)
            os.utime(dst, (1_700_000_000 + 2 * i + rep,) * 2)

    stream = jobs.read_events_stream(spark, d, max_files_per_trigger=1)
    jobs.run_to_memory(
        jobs.dedup_events_stream(stream), "dedup_wm_mem", output_mode="append"
    )
    got = spark.table("dedup_wm_mem")
    n_distinct = (
        spark.read.schema(jobs.EVENTS_SCHEMA).parquet(d).select("event_id").distinct()
    ).count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_exactly_once_sink_survives_replay_and_restart(
    spark, ordered_events_dir, tmp_path
):
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    stream = jobs.read_events_stream(spark, ordered_events_dir, max_files_per_trigger=1)
    jobs.write_stream_exactly_once(stream, target, ckpt)

    src = spark.read.schema(jobs.EVENTS_SCHEMA).parquet(ordered_events_dir)
    out = spark.read.option("basePath", target).parquet(target)
    assert out.count() == src.count()
    n_batches = out.select("batch_id").distinct().count()
    assert n_batches >= 2  # maxFilesPerTrigger=1 over several files

    # simulate a replayed micro-batch: re-invoke the sink with the same
    # batch_id and the same rows -> output must not grow
    sink = jobs.idempotent_parquet_sink(target)
    replay = spark.read.parquet(f"{target}/batch_id=0").limit(1000000)
    sink(replay, 0)
    assert spark.read.option("basePath", target).parquet(target).count() == src.count()

    # restart against the same checkpoint with no new data: a no-op
    stream2 = jobs.read_events_stream(spark, ordered_events_dir)
    jobs.write_stream_exactly_once(stream2, target, ckpt)
    assert spark.read.option("basePath", target).parquet(target).count() == src.count()


def test_session_window_native_matches_custom(spark, sf_dir, ordered_events_dir):
    from planet_dump_ng_spark.plans.streaming_plans import user_sessionization

    stream = jobs.read_events_stream(spark, ordered_events_dir, max_files_per_trigger=2)
    jobs.run_to_memory(
        jobs.sessionize_stream_native(stream), "sess_native_mem", output_mode="complete"
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sess_native_mem").collect()
    }
    # the custom sessionizer closes a session only at a STRICTLY greater
    # than gap difference; session_window closes at >= gap. Equal-gap
    # boundaries don't occur in this data, so the session sets agree.
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in user_sessionization(spark, sf_dir).collect()
    }
    assert got == expected


def test_sliding_distinct_stream_matches_batch(spark, sf_dir, events_dir):
    """Chained stateful ops (dedup -> windowed agg): every window the
    stream finalizes carries exactly the batch sliding-distinct count,
    and all windows the watermark closed were emitted."""
    from planet_dump_ng_spark.plans.analytics_plans import sliding_distinct_users

    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    jobs.run_to_memory(
        jobs.sliding_distinct_stream(stream), "slide_mem", output_mode="append"
    )
    got = {
        r.window_end: r.n_users for r in spark.table("slide_mem").collect()
    }
    assert got, "stream emitted nothing"
    # batch labels windows by their last contained hour; stream by the
    # exclusive end -> batch window_end_hour == stream window_end - 1h
    import datetime as dt

    expected = {
        r.window_end_hour + dt.timedelta(hours=1): r.n_users
        for r in sliding_distinct_users(spark, sf_dir).collect()
    }
    for we, n in got.items():
        assert expected.get(we) == n, (we, n, expected.get(we))
    # append mode withholds windows still open at the final watermark
    # (max event time); everything the watermark passed must be present
    closed = {we for we in expected if we <= max(got)}
    assert closed <= set(got)


def test_histogram_stream_matches_batch(spark, sf_dir, events_dir):
    """The streaming histogram (the mergeable stage of the binned-
    quantile sketch) converges to exactly the batch histogram under the
    same fixed bounds, regardless of micro-batch slicing."""
    from planet_dump_ng_spark.plans.registry import table

    lo, hi = 0.0, 500.0
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    jobs.run_to_memory(
        jobs.histogram_stream(stream, lo, hi), "hist_mem",
        output_mode="complete",
    )
    got = {r.bin: r.c for r in spark.table("hist_mem").collect()}

    ev = table(spark, sf_dir, "events")
    width = (hi - lo) / 256.0
    bin_col = F.when(F.col("value") >= hi, F.lit(255)).otherwise(
        F.least(
            F.greatest(F.floor((F.col("value") - lo) / width).cast("int"), F.lit(0)),
            F.lit(255),
        )
    )
    expected = {
        r.bin: r.c
        for r in ev.groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == expected
    assert sum(got.values()) == ev.count()  # every event in some bin


def test_hll_registers_stream_matches_batch(spark, sf_dir, events_dir):
    """The streamed HLL registers (and the finalized estimate double)
    are bit-identical to the batch sketch over the same events."""
    from planet_dump_ng_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )
    from planet_dump_ng_spark.plans.registry import table

    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    jobs.run_to_memory(
        jobs.hll_registers_stream(stream, p=8), "hll_mem",
        output_mode="complete",
    )
    got = {r.j: r.rho for r in spark.table("hll_mem").collect()}

    ev = table(spark, sf_dir, "events").select(
        F.lit(1).alias("g"), "user_id"
    )
    batch = hll_registers(ev, ["g"], "user_id", p=8)
    expected = {r.j: r.rho for r in batch.collect()}
    assert got == expected

    est_s = hll_estimate_from_registers(
        spark.table("hll_mem").select(F.lit(1).alias("g"), "j", "rho"),
        ["g"], p=8,
    ).collect()[0]
    est_b = hll_estimate_from_registers(batch, ["g"], p=8).collect()[0]
    assert est_s.hll_estimate == est_b.hll_estimate  # bit-identical
    # sanity: estimate in the right regime for 150 distinct users
    assert 100.0 < est_b.hll_estimate < 250.0


def test_lsh_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streamed candidate set (distinct over per-band emissions)
    equals the batch incremental-LSH candidate join for the same
    new-batch/corpus split."""
    from planet_dump_ng_spark.operators.dedup import minhash_lsh_join
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    buckets = jobs.corpus_lsh_buckets(corpus).persist()
    buckets.count()

    cols = ["doc_id", "source", "lang", "text", "n_chars"]
    docs_dir = str(tmp_path / "docs_stream")
    docs.select(cols).repartition(4).write.mode("overwrite").parquet(docs_dir)
    stream = jobs.read_documents_stream(spark, docs_dir, max_files_per_trigger=2)
    new_stream = stream.filter(F.col("doc_id") % 10 == 0)
    jobs.run_to_memory(
        jobs.lsh_dedup_stream(new_stream, buckets), "lshdedup_mem",
        output_mode="append",
    )
    got = {
        (r.id_a, r.id_b)
        for r in spark.table("lshdedup_mem").select("id_a", "id_b").collect()
    }
    expected = {
        (r.id_a, r.id_b) for r in minhash_lsh_join(new, corpus).collect()
    }
    assert got == expected
    assert expected, "fixture should contain at least one near-dup pair"
    buckets.unpersist()


def test_semantic_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streamed semantic near-dup matches (cell-blocked exact-fold
    cosine vs the standing corpus under the FROZEN derived quantizer)
    equal an independent batch formulation that uses the Catalyst fold
    cosine — cross-checking the Arrow kernel against the expression
    path on top of the stream/batch equivalence."""
    from planet_dump_ng_spark.operators.ivf import assign_semantic_cells
    from planet_dump_ng_spark.operators.similarity import cosine
    from planet_dump_ng_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    cells, quant = jobs.corpus_semantic_cells(corpus, dim=64)
    cells = cells.persist()
    cells.count()

    emb_dir = str(tmp_path / "emb_stream")
    emb.repartition(4).write.mode("overwrite").parquet(emb_dir)
    stream = jobs.read_embeddings_stream(spark, emb_dir, max_files_per_trigger=2)
    new_stream = stream.filter(F.col("vec_id") % 10 == 0)
    jobs.run_to_memory(
        jobs.semantic_dedup_stream(new_stream, quant, cells, threshold=0.2),
        "semdedup_mem",
        output_mode="append",
    )
    got = {
        (r.vec_id, r.matched_id)
        for r in spark.table("semdedup_mem").collect()
    }

    # independent batch side: same frozen quantizer, Catalyst cosine
    na = assign_semantic_cells(
        new.select("vec_id", F.col("embedding").alias("v")), quant
    )
    nb = cells.select(
        F.col("vec_id").alias("matched_id"),
        F.col("v").alias("nv"),
        "cell",
        F.col("norm").alias("nnorm"),
    )
    expected = {
        (r.vec_id, r.matched_id)
        for r in na.filter(F.col("norm") > 0)
        .join(nb, "cell")
        .filter(F.col("nnorm") > 0)
        .filter(F.col("vec_id") != F.col("matched_id"))
        .filter(cosine(F.col("v"), F.col("nv")) >= 0.2)
        .collect()
    }
    assert got == expected
    assert expected, "fixture should contain at least one semantic match"
    cells.unpersist()


def test_token_counts_stream_matches_batch_and_drift(spark, sf_dir, tmp_path):
    """The streamed word-count table equals the batch word count under
    any micro-batch slicing, and the TV drift computed from the streamed
    counts vs a static corpus snapshot: (a) is 0 against the stream's own
    distribution scaled, only when distributions match; (b) matches a
    hand-computed two-sided fold on a toy pair."""
    from planet_dump_ng_spark.operators.text import tokens
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    cols = ["doc_id", "source", "lang", "text", "n_chars"]
    docs_dir = str(tmp_path / "docs_tok_stream")
    docs.select(cols).repartition(4).write.mode("overwrite").parquet(docs_dir)
    stream = jobs.read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    jobs.run_to_memory(
        jobs.token_counts_stream(stream), "tokcnt_mem", output_mode="complete"
    )
    got = {r.w: r.c for r in spark.table("tokcnt_mem").collect()}
    expected = {
        r.w: r.c
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == expected

    # identical distributions -> TV 0 (shared mass covers both sides)
    streamed = spark.table("tokcnt_mem")
    self_drift = jobs.token_drift_vs_corpus(streamed, streamed).collect()[0]
    assert self_drift.tv_distance == 0.0
    assert self_drift.na == self_drift.nb == sum(expected.values())

    # hand pair: stream {x:2, y:1} vs corpus {x:1, z:1}
    # shared: x -> |2/3 - 1/2| = 1/6; only-stream mass y: 1/3; only-corpus
    # mass z: 1/2 -> TV = (1/6 + 1/3 + 1/2)/2 = 1/2
    sa = spark.createDataFrame([("x", 2), ("y", 1)], "w string, c long")
    sb = spark.createDataFrame([("x", 1), ("z", 1)], "w string, c long")
    r = jobs.token_drift_vs_corpus(sa, sb).collect()[0]
    assert r.n_shared_types == 1
    assert abs(r.tv_distance - 0.5) < 1e-9


def test_cms_registers_stream_matches_batch(spark, sf_dir, events_dir):
    """The streamed Count-Min register grid is bit-identical to the
    batch sketch's, and heavy-hitter estimates probed from the streamed
    grid equal cms_heavy_hitters' (one-sided: est >= exact)."""
    from planet_dump_ng_spark.operators.sketches import (
        _km_positions,
        cms_heavy_hitters,
    )
    from planet_dump_ng_spark.plans.registry import table

    w, d = 64, 3
    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    jobs.run_to_memory(
        jobs.cms_registers_stream(stream, "user_id", w=w, d=d),
        "cms_mem", output_mode="complete",
    )
    got = {(r.i, r.pos): r.bucket_total for r in spark.table("cms_mem").collect()}

    ev = table(spark, sf_dir, "events")
    expected = {
        (r.i, r.pos): r.bucket_total
        for r in ev.select(
            F.posexplode(
                F.array(
                    *[
                        _km_positions(F.xxhash64(F.col("user_id")), i, w)
                        for i in range(d)
                    ]
                )
            ).alias("i", "pos")
        )
        .groupBy("i", "pos")
        .agg(F.count(F.lit(1)).alias("bucket_total"))
        .collect()
    }
    assert got == expected

    # estimates probed from the STREAMED grid == the batch sketch's
    batch_hh = {
        r.key: (r.est_count, r.exact_count)
        for r in cms_heavy_hitters(ev, "user_id", w=w, d=d, topk=10).collect()
    }
    cand = spark.createDataFrame(
        [(k,) for k in batch_hh], "key bigint"
    )
    streamed_est = {
        r.key: r.est_count
        for r in jobs.cms_estimate_from_registers(
            spark.table("cms_mem"), cand, w=w, d=d
        ).collect()
    }
    for k, (est, exact) in batch_hh.items():
        assert streamed_est[k] == est
        assert est >= exact
    # a never-seen key estimates small (0 unless every row collides)
    ghost = spark.createDataFrame([(-987654321,)], "key bigint")
    g = jobs.cms_estimate_from_registers(
        spark.table("cms_mem"), ghost, w=w, d=d
    ).collect()[0]
    assert g.est_count >= 0


def test_bm25_index_ingest_stream_converges_to_batch(spark, sf_dir, tmp_path):
    """Streaming adds into the persisted BM25 index: after bootstrapping
    on half the corpus and streaming the rest in (1 file per
    micro-batch), served query results are bit-identical to the direct
    bm25_scores over the FULL corpus; replaying the same stream from a
    fresh checkpoint appends nothing (idempotent redelivery)."""
    from planet_dump_ng_spark.operators import text_index as ti
    from planet_dump_ng_spark.operators.text import bm25_scores
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text", "n_chars"
    )
    head = docs.filter(F.col("doc_id") % 2 == 0)
    tail = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "bm25_stream_idx")
    postings, doclen = ti.build_bm25_index(head)
    ti.write_bm25_index(postings, doclen, idx)
    n_head = ti.read_bm25_meta(idx)["n_docs"]

    src = str(tmp_path / "tail_docs")
    tail.repartition(3).write.mode("overwrite").parquet(src)
    stream = jobs.read_documents_stream(spark, src, max_files_per_trigger=1)
    jobs.bm25_index_ingest_stream(
        stream, idx, str(tmp_path / "ckpt1")
    )
    meta = ti.read_bm25_meta(idx)
    assert meta["n_docs"] == docs.count() and meta["n_docs"] > n_head

    terms = ["vector", "hash", "merge"]
    lp, ld, m = ti.read_bm25_index(spark, idx)
    served = {
        r.doc_id: (r.n_matched_terms, r.score_q)
        for r in ti.bm25_index_query(
            spark, lp, ld, terms, n_shards=m["n_shards"]
        ).collect()
    }
    direct = {
        r.doc_id: (r.n_matched_terms, r.score_q)
        for r in bm25_scores(docs, terms).collect()
    }
    assert served == direct and len(served) > 0

    # redelivery: replay the SAME files through a fresh checkpoint —
    # the idempotent add folds in nothing, scores unchanged
    stream2 = jobs.read_documents_stream(spark, src, max_files_per_trigger=2)
    jobs.bm25_index_ingest_stream(stream2, idx, str(tmp_path / "ckpt2"))
    assert ti.read_bm25_meta(idx)["n_docs"] == meta["n_docs"]
    lp2, ld2, m2 = ti.read_bm25_index(spark, idx)
    served2 = {
        r.doc_id: (r.n_matched_terms, r.score_q)
        for r in ti.bm25_index_query(
            spark, lp2, ld2, terms, n_shards=m2["n_shards"]
        ).collect()
    }
    assert served2 == served


def test_ivfpq_ingest_stream_matches_batch_add(spark, sf_dir, tmp_path):
    """Streaming adds into the persisted IVFPQ index: after
    bootstrapping on the base vectors and streaming the rest in (1 file
    per micro-batch), the code table is row-identical to a single batch
    ivfpq_add_to_dir of the same tail (frozen quantizers make encoding
    batching-invariant); replaying the stream from a fresh checkpoint
    appends nothing."""
    from planet_dump_ng_spark.operators.ivf import (
        ivfpq_add_to_dir,
        ivfpq_build,
        write_ivfpq_index,
    )
    from planet_dump_ng_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    tail = emb.filter(F.col("vec_id") % 5 == 0)
    coarse, books, codes = ivfpq_build(base, dim=64)

    def _codes(d):
        return {
            tuple(r) for r in spark.read.parquet(f"{d}/codes").collect()
        }

    idx_s = str(tmp_path / "ivfpq_stream_idx")
    idx_b = str(tmp_path / "ivfpq_batch_idx")
    write_ivfpq_index(coarse, books, codes, idx_s)
    write_ivfpq_index(coarse, books, codes, idx_b)

    src = str(tmp_path / "tail_emb")
    tail.repartition(3).write.mode("overwrite").parquet(src)
    stream = jobs.read_embeddings_stream(spark, src, max_files_per_trigger=1)
    jobs.ivfpq_ingest_stream(stream, idx_s, str(tmp_path / "ckpt_a"))

    n = ivfpq_add_to_dir(spark, idx_b, tail)
    assert n == tail.count() > 0
    assert _codes(idx_s) == _codes(idx_b)

    # redelivery: same files, fresh checkpoint -> nothing appended
    stream2 = jobs.read_embeddings_stream(spark, src, max_files_per_trigger=2)
    jobs.ivfpq_ingest_stream(stream2, idx_s, str(tmp_path / "ckpt_b"))
    assert _codes(idx_s) == _codes(idx_b)


def test_lsh_dedup_stream_capped_matches_batch(spark, sf_dir, tmp_path):
    """A corpus bucket artifact built WITH the representative cap
    (corpus_lsh_buckets max_bucket) makes the stream probe equal the
    capped batch join — the cap is a property of the artifact, applied
    once at build time, identical for both execution modes."""
    from planet_dump_ng_spark.operators.dedup import minhash_lsh_join
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    capped = jobs.corpus_lsh_buckets(corpus, max_bucket=2).persist()
    capped.count()
    # the cap holds structurally: no bucket exceeds 2 rows
    over = (
        capped.groupBy("band", "bh").count().filter(F.col("count") > 2).count()
    )
    assert over == 0

    cols = ["doc_id", "source", "lang", "text", "n_chars"]
    docs_dir = str(tmp_path / "docs_stream_cap")
    docs.select(cols).repartition(4).write.mode("overwrite").parquet(docs_dir)
    stream = jobs.read_documents_stream(spark, docs_dir, max_files_per_trigger=2)
    new_stream = stream.filter(F.col("doc_id") % 10 == 0)
    jobs.run_to_memory(
        jobs.lsh_dedup_stream(new_stream, capped), "lshcap_mem",
        output_mode="append",
    )
    got = {
        (r.id_a, r.id_b)
        for r in spark.table("lshcap_mem").select("id_a", "id_b").collect()
    }
    expected = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_join(new, corpus, max_bucket=2).collect()
    }
    assert got == expected
    assert expected, "fixture should contain at least one capped candidate"
    capped.unpersist()
