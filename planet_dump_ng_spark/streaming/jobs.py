"""Structured Streaming jobs sharing logic with the batch plans
(plans/streaming_plans.py) — the stream-batch equivalence contract is
pinned by tests/test_streaming.py.

The reference is pure batch (SURVEY.md section 2.7); these jobs are the
engine's streaming extension: the same rollup/sessionization semantics
expressed over an unbounded source with watermarks and state.

Scale notes: windowed aggregation state is bounded by the watermark
horizon x group cardinality; sessionization state is one small tuple per
active user, dropped after the state timeout.  Both shuffle once on the
group key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet directory (the local
    stand-in for Kafka; swap ``format`` + options to go there)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming form of hourly_event_rollup: tumbling window + watermark.
    Late rows beyond the watermark are dropped; with complete/update
    output the converged result equals the batch rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"), "event_type", "n_events", "total_value"
        )
    )


_SESSION_STATE_SCHEMA = "last_us long, session_id long"
_SESSION_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, session_id long"
)
GAP_US = 30 * 60 * 1_000_000


def _make_sessionizer(state_timeout_ms: int | None):
    def sessionize_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """applyInPandasWithState worker: carries (last event time, current
        session ordinal) per user across micro-batches.  Within a batch the
        user's rows are sorted by (ts, event_id) — identical gap semantics
        to the batch window plan (microsecond precision)."""
        if state.hasTimedOut:
            state.remove()  # idle user: drop the state tuple
            return
        (user_id,) = key
        if state.exists:
            last_us, session_id = state.get
        else:
            last_us, session_id = None, 0
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out_sessions = []
        for us in rows["ts"].astype("int64") // 1000:  # ns -> us truncation
            if last_us is None or us - last_us > GAP_US:
                session_id += 1
            out_sessions.append(session_id)
            last_us = us
        state.update((int(last_us), int(session_id)))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": rows["event_id"].to_numpy(),
                "ts": rows["ts"].to_numpy(),
                "session_id": out_sessions,
            }
        )

    return sessionize_group


def sessionize_stream(
    events: DataFrame, state_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming gap-sessionization via applyInPandasWithState — the
    custom stateful operator path (one small state tuple per active user).

    Pass ``state_timeout_ms`` (e.g. 3600000) on a real unbounded stream so
    idle users' state is evicted; leave None for bounded/availableNow runs
    — a pending processing-time timeout keeps the query alive until it
    fires, so an availableNow drain would never terminate."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(state_timeout_ms),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain the stream into an in-memory table (tests / local runs)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


DOCUMENTS_SCHEMA = (
    "doc_id bigint, source string, lang string, text string, n_chars bigint"
)


def read_documents_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a documents parquet directory (the local
    stand-in for an ingest bus feeding the training-data pipeline)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


EMBEDDINGS_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def read_embeddings_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an embeddings parquet directory — the
    vector-side twin of :func:`read_documents_stream` (an encoder
    service's output bus feeding the ANN index)."""
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def ivfpq_ingest_stream(
    emb_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Streaming ingest into the persisted IVFPQ index — the vector
    twin of :func:`bm25_index_ingest_stream`: each micro-batch folds in
    via operators.ivf.ivfpq_add_to_dir (idempotent anti-join on vec_id,
    frozen-quantizer encode, cell-partitioned append), so redelivered
    batches append nothing and the artifact converges to exactly the
    rows a sequence of CLI adds would produce (pinned in
    tests/test_streaming.py).  Quantizers stay frozen — per-batch cost
    is batch x broadcast-tiny centroid tables; periodic retrains (when
    embedding_drift_by_dim alarms) swap the artifact wholesale.
    foreachBatch because the fold is a multi-table artifact write.
    """
    from planet_dump_ng_spark.operators.ivf import ivfpq_add_to_dir

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        ivfpq_add_to_dir(
            batch_df.sparkSession,
            index_dir,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
        )

    q = (
        emb_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def curate_ingest_stream(
    docs_stream: DataFrame,
    dataset_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
    **curate_kwargs,
) -> list:
    """Continuous curation ingest: each micro-batch runs the FULL
    incremental curation (llm_pipeline.curate_increment — idempotent
    id/fingerprint dedup vs the dataset, asymmetric batch-vs-corpus LSH
    probing the persisted ``_dedup`` artifact, decontamination/scrub/
    quality gates, content-stable split append) and the dataset plus its
    probe artifact grow in lockstep.  This IS the production 100 TB
    ingest shape: per-batch cost proportional to the batch, exactly-once
    EFFECT without sink transactions because the increment itself is
    idempotent (a redelivered micro-batch anti-joins away on doc_id and
    appends nothing — the property tests/test_round5_curation.py pins).
    foreachBatch because the increment is a multi-table artifact write;
    gates/fractions/leakage policy inherit the dataset's recorded
    curation parameters unless overridden via ``curate_kwargs``.
    ``compact_every`` folds the dedup_compact maintenance pass in every
    N processed batches (each increment appends a few small files to
    the probe artifact; a long-running ingest otherwise degrades to
    file-count-bound probe scans — the same reason ivfpq/bm25 ingest
    pair with their compactors).  Returns the per-batch attrition
    reports (driver-side audit trail).
    """
    from planet_dump_ng_spark.llm_pipeline import (
        compact_artifacts,
        curate_increment,
    )

    reports: list = []
    n_done = 0

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_done
        if not batch_df.head(1):  # empty trigger: nothing to curate
            return
        _, report = curate_increment(batch_df, dataset_dir, **curate_kwargs)
        reports.append((batch_id, report))
        n_done += 1
        if compact_every and n_done % compact_every == 0:
            # the one shared maintenance entry point: _dedup tables plus
            # the exact-family _pindex when present — identical to the
            # CLI's --compact-dedup, by construction
            compact_artifacts(batch_df.sparkSession, dataset_dir)

    q = (
        docs_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return reports


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST document seen per
    canonical fingerprint (operators.text.fingerprint — same whitespace
    normalization as the batch dedup, so the survivor-set semantics line
    up when arrival order follows doc_id).

    State is one row per distinct fingerprint.  On a real unbounded run,
    add ``.withWatermark`` on an event-time column so Spark can expire
    state; for the training-ingest shape (bounded backfills, daily
    drops), the unbounded-state form is exactly the semantics wanted:
    a document that arrived months ago must still suppress today's copy.
    At cluster scale the state store shuffles on the fingerprint — the
    same single-shuffle layout as the batch groupBy.
    """
    from planet_dump_ng_spark.operators.text import fingerprint

    return docs.withColumn("fp", fingerprint("text")).dropDuplicates(["fp"])


def curate_stream(docs: DataFrame) -> DataFrame:
    """Streaming curation transform: PII scrub + quality/repetition gates.

    Every per-document curation operator is a stateless map — exactly the
    class of transformation Structured Streaming runs unchanged — so the
    batch operators compose directly onto a stream: scrub first, then
    score, then gate.  No state store, no watermark, no shuffle: each
    micro-batch flows through the same codegen'd expressions the batch
    pipeline uses, so stream output == batch output row-for-row (pinned
    by tests/test_streaming.py::test_curate_stream_matches_batch).
    """
    from planet_dump_ng_spark.operators.text import (
        rule_quality_features,
        scrub_pii,
    )

    scrubbed = docs.withColumn("text", scrub_pii("text"))
    # fused quality+repetition extractor: one tokenizer pass per row,
    # bit-identical to the repetition_features(quality_features(...))
    # composition (pinned equal to batch by test_streaming)
    feats = rule_quality_features(scrubbed)
    return feats.select(
        "doc_id",
        "source",
        "text",
        "n_tokens",
        "stopword_ratio",
        "repetition_keep",
        (
            (F.col("n_tokens") >= 20)
            & (F.col("stopword_ratio") <= 0.7)
            & F.col("repetition_keep")
        ).alias("quality_keep"),
    )


def view_purchase_join_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join: each view joins the
    purchases of the same user landing within 30 minutes after it.

    Both sides carry a watermark, so Spark can bound the join state: a
    buffered view is dropped once the purchase-side watermark passes
    v_ts + 30 min, and a buffered purchase once the view-side watermark
    passes p_ts.  State is therefore (watermark horizon x arrival rate)
    per side, independent of stream length — the property that makes
    this join viable on an unbounded 100 TB/day bus.  The batch analog
    (plans/streaming_plans.view_purchase_join) is the oracle-checked
    form; equivalence is pinned by tests/test_streaming.py.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = views.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND p_ts >= v_ts "
            "AND p_ts <= v_ts + interval 30 minutes"
        ),
        "inner",
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment: each micro-batch of events
    left-joins the (small, slowly-changing) customer dimension.

    The static side is re-resolved per micro-batch, so a dimension
    refresh is picked up without restarting the query; broadcasting it
    means the stream side never shuffles — the same plan shape as the
    batch `event_attribution` (plans/relational.py), whose oracle checks
    the join semantics.  No watermark, no state store.
    """
    pub = dim.filter(F.col("c_acctbal") > 0).select("c_custkey", "c_name")
    joined = events.join(
        F.broadcast(pub), events["user_id"] == pub["c_custkey"], "left"
    )
    return joined.select(
        "event_id",
        F.when(F.col("c_custkey").isNotNull(), F.col("user_id")).alias("uid"),
        F.col("c_name").alias("display_name"),
    )


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact event dedup with BOUNDED state: a duplicate event_id
    arriving within the watermark horizon of the original is dropped,
    and state older than the horizon is evicted.

    This is the at-least-once -> exactly-once repair stage in front of
    a bus that can redeliver (duplicates arrive close to the original),
    where the unbounded-state ``dedup_stream`` contract (suppress
    forever) would accumulate state linear in stream length.  State here
    is (watermark horizon x event rate) — a constant at any stream
    length, which is what makes the operator viable on an unbounded
    100 TB/day feed.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def idempotent_parquet_sink(target_dir: str):
    """foreachBatch writer achieving exactly-once parquet output: each
    micro-batch overwrites its own ``batch_id=N`` directory, so a batch
    replayed after a failure (same offsets -> same rows, Spark's replay
    contract) lands byte-identically instead of duplicating.  Combined
    with the checkpoint's offset log this is the standard
    at-least-once -> exactly-once construction for non-transactional
    stores."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{target_dir}/batch_id={batch_id}")

    return write_batch


def write_stream_exactly_once(
    stream_df: DataFrame, target_dir: str, checkpoint_dir: str
):
    """Drain a stream into batch_id-partitioned parquet with replay
    idempotence; returns the finished StreamingQuery.  Read the result
    with ``spark.read.option("basePath", target).parquet(target)``."""
    q = (
        stream_df.writeStream.foreachBatch(idempotent_parquet_sink(target_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def sessionize_stream_native(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-sessionization via the BUILT-IN session_window aggregation —
    the engine-native alternative to the applyInPandasWithState
    sessionizer, for pipelines that only need per-session aggregates
    (no per-event session labels).  Session state merges inside the
    state store and closes once the watermark passes the gap, so
    memory is bounded by active sessions only.

    session_window's end is exclusive (last event + gap); the custom
    sessionizer reports the last event time, so this returns both the
    raw window and session_end = window.end - gap for comparison.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
        .select(
            "user_id",
            "n_events",
            "session_start",
            (F.col("win.end") - F.expr(f"interval {gap}")).alias("session_end"),
        )
    )


def sliding_distinct_stream(
    events: DataFrame, watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming form of sliding_distinct_users: distinct users per
    trailing 3-hour window, sliding hourly.

    Two chained stateful operators (Spark 3.5+ multiple-stateful
    support): a watermark-bounded ``dropDuplicates`` on (window, user)
    — the streaming replacement for COUNT(DISTINCT), which streaming
    aggregation cannot express directly — feeding a windowed count in
    append mode.  State: one row per (window, user) until the
    watermark passes the window end (the sliding window column carries
    event time, so both operators' state is bounded), exactly the
    batch plan's 3x fan-out expressed as window assignment.
    """
    return (
        events.withWatermark("ts", watermark)
        .select(F.window("ts", "3 hours", "1 hour").alias("win"), "user_id")
        .dropDuplicates(["win", "user_id"])
        .groupBy("win")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("win").end.alias("window_end"), "n_users")
    )


def histogram_stream(
    events: DataFrame,
    lo: float,
    hi: float,
    n_bins: int = 256,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form of the binned-quantile sketch's histogram stage:
    per-bin counts over fixed [lo, hi) bounds, continuously maintained.

    The histogram is the part of operators.sketches.binned_quantiles
    that is a true mergeable sketch (partial counts add), so it streams
    naturally as one windowless grouped count in update/complete mode —
    state is O(n_bins), independent of stream length.  Bounds must be
    FIXED a priori (a stream has no global min/max); production systems
    take them from a prior batch profile, exactly like the quantile
    targets here.  Quantile extraction stays a cheap batch query over
    the n_bins-row result (see tests), so the expensive part — one pass
    over the data — is the streaming part.
    """
    width = (hi - lo) / float(n_bins)
    # driver-side bounds are caller-supplied: a degenerate/inverted range
    # (incl. subnormal hi - lo underflowing to width 0.0) must fail HERE,
    # not as a per-row ANSI DIVIDE_BY_ZERO that kills the running query
    if width <= 0.0:
        raise ValueError(
            f"histogram bounds [{lo}, {hi}) with {n_bins} bins give "
            "non-positive bin width"
        )
    bin_col = F.when(F.col("value") >= hi, F.lit(n_bins - 1)).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast(
                    "int"
                ),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hll_registers_stream(
    events: DataFrame,
    value_col: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Streaming HyperLogLog register maintenance: the continuously-
    updated distinct-count sketch (state = 2^p MAX registers,
    independent of stream length — the smallest possible stateful
    aggregation for a distinct estimate a plain streaming groupBy
    cannot express).

    This is the streaming half of the hll_merge_weekly story: batch
    ingest days persist register tables, the live tail maintains this
    stream, and the two MAX-merge losslessly because registers are a
    commutative monoid.  Register math is identical to
    operators.sketches.hll_registers (same xxhash64 split, same rho),
    so the streamed registers — and therefore the finalized estimate
    double — converge bit-for-bit to the batch sketch (pinned in
    tests/test_streaming.py).  Finalization
    (hll_estimate_from_registers) stays a cheap batch query over the
    2^p-row result; the one-pass-over-the-data part is what streams.

    Deliberately NO watermark: the groupBy key is the register index j,
    not a time window, so state is bounded by the 2^p key space itself
    and a watermark would evict nothing (and a MAX over ALL events ever
    seen is exactly the sketch's semantics — late data must still fold
    in).  Run it in complete or update output mode; an append-mode sink
    can never receive rows from an unwindowed running aggregate.
    """
    from planet_dump_ng_spark.operators.sketches import _unsigned_split

    wbits = 64 - p
    j, w = _unsigned_split(F.xxhash64(F.col(value_col)), wbits)
    return (
        events
        .select(j.alias("j"), w.alias("w"))
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(wbits + 1)).otherwise(
                F.lit(wbits + 1) - F.length(F.bin(F.col("w")))
            ),
        )
        .groupBy("j")
        .agg(F.max("rho").alias("rho"))
    )


def token_counts_stream(docs: DataFrame) -> DataFrame:
    """Streaming word-count table over a documents stream — the
    mergeable stage of token_drift_tv_by_source's which-feed-changed
    alarm: per-word counts add across micro-batches (update/complete
    output), state is O(stream vocabulary) independent of stream length,
    and the drift compare against a static corpus snapshot stays a cheap
    batch query over the result (:func:`token_drift_vs_corpus`) — the
    same live-tail/persisted-aggregate split the streaming HLL and
    histogram use.  No watermark: the count table has no time dimension
    (complete/update mode), matching the batch word-count exactly.
    """
    from planet_dump_ng_spark.operators.text import tokens

    return (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def token_drift_vs_corpus(
    stream_counts: DataFrame, corpus_counts: DataFrame
) -> DataFrame:
    """One-row total-variation distance between a streamed word-count
    table (:func:`token_counts_stream` result) and a static corpus
    count table with columns (w, c).

    Same discipline as the batch drift query: shared words contribute
    per-word 1e-12-truncated |share gaps| summed as exact integers;
    each side's exclusive-word mass is folded analytically (one closed
    form per side), so the join input is only the SHARED vocabulary.
    """
    # rename the corpus side's join key: aliasing mints fresh attribute
    # ids, so the compare works even when both inputs are the SAME plan
    # (self-drift = 0 sanity checks)
    a = stream_counts.select("w", F.col("c").alias("ca"))
    b = corpus_counts.select(F.col("w").alias("wb"), F.col("c").alias("cb"))
    na = a.agg(F.sum("ca").cast("bigint").alias("na"))
    nb = b.agg(F.sum("cb").cast("bigint").alias("nb"))
    j = a.join(b, F.col("w") == F.col("wb")).drop("wb")
    diff_q = (
        F.abs(
            F.col("ca").cast("double") / F.col("na")
            - F.col("cb").cast("double") / F.col("nb")
        )
        * 1e12
    ).cast("long")
    p = (
        j.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .agg(
            F.count(F.lit(1)).alias("n_shared_types"),
            F.sum(diff_q).cast("bigint").alias("shared_q"),
            F.sum("ca").cast("bigint").alias("shared_a"),
            F.sum("cb").cast("bigint").alias("shared_b"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    only_a_q = (
        ((F.col("na") - F.col("shared_a")).cast("double") / F.col("na")) * 1e12
    ).cast("long")
    only_b_q = (
        ((F.col("nb") - F.col("shared_b")).cast("double") / F.col("nb")) * 1e12
    ).cast("long")
    tv_q = F.col("shared_q") + only_a_q + only_b_q
    return p.select(
        "n_shared_types",
        "na",
        "nb",
        tv_q.alias("tv_q"),
        (tv_q.cast("double") / 1e12 / 2).alias("tv_distance"),
    )


def bm25_index_ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Streaming ingest into the persisted BM25 index
    (operators.text_index): each micro-batch folds in via the
    IDEMPOTENT bm25_index_add — the batch is tokenized alone,
    anti-joined on doc_id against already-indexed docs, and appended
    into the term-sharded postings layout.  Because the add is
    idempotent, redelivered batches (at-least-once sources, checkpoint
    replay after a crash) append NOTHING — the index converges to
    exactly-once content without any sink-side transaction, and the
    final artifact is bit-identical to a from-scratch batch build over
    the same documents (pinned in tests/test_streaming.py).

    This is the live tail of the build/add/query lifecycle: batch
    builds bootstrap the index, this stream keeps it current, and
    queries keep hitting only the query terms' shards.  foreachBatch is
    the right primitive — the fold is a multi-table write (postings +
    doclen + meta header refresh) that no single-sink writeStream can
    express.  Runs with availableNow (drain-what-exists) semantics;
    production would use a continuous trigger.
    """
    from planet_dump_ng_spark.operators import text_index as ti

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        ti.bm25_index_add(
            batch_df.sparkSession,
            index_dir,
            batch_df,
            id_col=id_col,
            text_col=text_col,
        )

    q = (
        docs_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_registers_stream(
    events: DataFrame,
    value_col: str = "user_id",
    w: int = 256,
    d: int = 3,
) -> DataFrame:
    """Streaming Count-Min register maintenance — the hot-key detector's
    live tail (state = the d x w counter grid, independent of both
    stream length AND key cardinality, which is the whole point: a
    plain streaming per-key count would hold state per distinct key).

    Register math is identical to operators.sketches.cms_heavy_hitters'
    build (same xxhash64, same Kirsch-Mitzenmacher positions), and
    because each register is a plain SUM of per-row contributions, the
    streamed grid converges bit-for-bit to the batch sketch under any
    micro-batch slicing (pinned in tests/test_streaming.py) — and the
    live grid SUM-merges losslessly with batch-built daily grids, the
    counter analog of the HLL registers' MAX-merge (both are
    commutative monoids).

    Deliberately NO watermark: the groupBy key is the grid coordinate,
    not a time window — state is bounded by d*w itself and a watermark
    would evict nothing.  Complete/update output mode; heavy-hitter
    estimates stay a cheap batch probe over the d*w-row result
    (:func:`cms_estimate_from_registers`).
    """
    from planet_dump_ng_spark.operators.sketches import _km_positions

    pos = events.select(
        F.posexplode(
            F.array(
                *[
                    _km_positions(F.xxhash64(F.col(value_col)), i, w)
                    for i in range(d)
                ]
            )
        ).alias("i", "pos")
    )
    return pos.groupBy("i", "pos").agg(
        F.count(F.lit(1)).alias("bucket_total")
    )


def cms_estimate_from_registers(
    registers: DataFrame,
    candidates: DataFrame,
    key_col: str = "key",
    w: int = 256,
    d: int = 3,
) -> DataFrame:
    """Batch probe of a (streamed or persisted) Count-Min register grid:
    per candidate key, est_count = MIN over the d rows' counters —
    one-sided (never undercounts), exactly cms_heavy_hitters' estimate
    when the grid was built over the same rows.  The candidate list is
    whatever keys the caller cares about (e.g. the current join's key
    sample); absent grid cells read as 0, so never-seen keys estimate 0.
    """
    from planet_dump_ng_spark.operators.sketches import _km_positions

    key_pos = candidates.select(F.col(key_col).alias("key")).distinct().select(
        "key",
        F.posexplode(
            F.array(
                *[
                    _km_positions(F.xxhash64(F.col("key")), i, w)
                    for i in range(d)
                ]
            )
        ).alias("i", "pos"),
    )
    return (
        key_pos.join(F.broadcast(registers), ["i", "pos"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("bucket_total"), F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


def corpus_lsh_buckets(
    corpus: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """(id, band, bh) bucket table of the standing corpus — the
    precomputed artifact the streaming near-dup join probes.  Batch-side:
    compute once per corpus snapshot, persist (or at real scale, keep as
    a table bucketed by (band, bh)).  Delegates to the one bucket-table
    definition in operators.dedup so artifact writers and probers can
    never diverge.  ``max_bucket`` bakes the representative cap
    (operators.dedup.cap_lsh_buckets) into the artifact at build time —
    every later batch/stream probe then meets O(cap) candidates per hot
    bucket with no per-probe re-ranking."""
    from planet_dump_ng_spark.operators.dedup import (
        cap_lsh_buckets,
        lsh_buckets,
    )

    b = lsh_buckets(corpus, num_hashes=num_hashes, bands=bands, k=k, seed=seed)
    return cap_lsh_buckets(b, max_bucket) if max_bucket is not None else b


EMBEDDINGS_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def read_embeddings_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an embeddings parquet directory (the local
    stand-in for the encoder-output topic)."""
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def corpus_semantic_cells(
    corpus: DataFrame, dim: int, n_cells: int | None = None
) -> tuple[DataFrame, dict]:
    """Batch-side artifact pair for the streaming semantic probe:
    (corpus assignment table (vec_id, v, cell, norm), frozen quantizer).

    The quantizer (derived cell count, sample-capped two-level Lloyd —
    operators.ivf.train_semantic_quantizer) is the thing that must be
    SHARED between the corpus snapshot and the live tail: re-training on
    the stream would re-block the space and candidates would silently
    stop matching the snapshot's cells.  Compute once per corpus
    snapshot and persist the assignment (or at real scale, write it as
    a table partitioned by cell)."""
    from planet_dump_ng_spark.operators.ivf import (
        assign_semantic_cells,
        train_semantic_quantizer,
    )

    vecs = corpus.select(
        F.col("vec_id"), F.col("embedding").alias("v")
    )
    quant = train_semantic_quantizer(vecs, dim, n_cells)
    return assign_semantic_cells(vecs, quant), quant


def semantic_dedup_stream(
    new_vecs: DataFrame,
    quant: dict,
    corpus_cells: DataFrame,
    threshold: float = 0.35,
) -> DataFrame:
    """Streaming SEMANTIC near-dup probe: incoming embeddings against the
    STANDING corpus — the paraphrase-level sibling of lsh_dedup_stream
    and the live tail of semantic_dedup (SemDeDup blocking).

    Each micro-batch row is assigned its cell by the FROZEN two-level
    quantizer (map-only Arrow kernel — works unchanged on streaming
    DataFrames), then one STREAM-STATIC equi-join on the cell id probes
    the corpus assignment table and the exact-fold cosine
    (operators.ivf.fold_dot_udf — bit-identical to the batch pair
    stage) keeps pairs at or above ``threshold``.  Stateless, so
    matches emit in append mode with zero watermark bookkeeping; cost
    per micro-batch is proportional to the batch times its cells'
    corpus occupancy — the same sum(cell * batch_cell) bound the batch
    operator's pair space has, never batch x corpus.

    Emits (vec_id, matched_id, cosine).  Zero-norm rows on either side
    never pair (the batch operator's NaN guard).
    """
    from planet_dump_ng_spark.operators.ivf import (
        assign_semantic_cells,
        fold_dot_udf,
    )

    fold_dot = fold_dot_udf()
    a = assign_semantic_cells(
        new_vecs.select("vec_id", F.col("embedding").alias("v")), quant
    )
    b = corpus_cells.select(
        F.col("vec_id").alias("matched_id"),
        F.col("v").alias("nv"),
        "cell",
        F.col("norm").alias("nnorm"),
    )
    return (
        a.filter(F.col("norm") > 0)
        .join(b, "cell")
        .filter(F.col("nnorm") > 0)
        .filter(F.col("vec_id") != F.col("matched_id"))
        .withColumn(
            "cosine",
            fold_dot("v", "nv") / (F.sqrt("norm") * F.sqrt("nnorm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_id", "matched_id", "cosine")
    )


def lsh_dedup_stream(
    docs: DataFrame,
    corpus_buckets: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Streaming near-dup candidate detection: incoming documents LSH-join
    the STANDING corpus — the live tail of dedup_incremental_lsh.

    Per document the signature is the map-only single-expression MinHash
    (operators.dedup.minhash_signature — the explode+agg formulation
    needs a grouped aggregate, which would force update-mode state; a
    streaming micro-batch is small, so the expression form's per-row
    cost is the right trade here), bands explode, and a STREAM-STATIC
    equi-join on (band, bh) probes the corpus bucket table — stateless,
    so any candidate emits in append mode with zero watermark
    bookkeeping.  A (doc, corpus_id) pair sharing several bands emits
    once per shared band, exactly like the batch join before its
    DISTINCT: candidate dedup + exact-Jaccard verify belong to the
    downstream batch verifier either way (stream-batch equivalence on
    the distinct candidate set is pinned in tests/test_streaming.py).
    """
    from planet_dump_ng_spark.operators.dedup import (
        lsh_bands,
        minhash_signature,
    )

    rows = num_hashes // bands
    sig = minhash_signature("text", num_hashes=num_hashes, k=k, seed=seed)
    bb = docs.select(
        F.col("doc_id").alias("id_a"),
        F.explode(lsh_bands(sig, bands, rows)).alias("bb"),
    ).select("id_a", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    cb = corpus_buckets.select(
        F.col("id").alias("id_b"), "band", "bh"
    )
    return (
        bb.join(cb, ["band", "bh"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "band")
    )


def corpus_span_hashes(docs: DataFrame, span_tokens: int = 10) -> DataFrame:
    """Distinct span-hash table of the standing corpus — the precomputed
    artifact the streaming span-novelty probe anti-joins.  Batch-side:
    compute once per corpus snapshot (operators.dedup.span_occurrences),
    persist; at real scale keep it bucketed by h."""
    from planet_dump_ng_spark.operators.dedup import span_occurrences

    return span_occurrences(docs, span_tokens).select("h").distinct()


def span_novelty_stream(
    docs: DataFrame, corpus_spans: DataFrame, span_tokens: int = 10
) -> DataFrame:
    """Streaming span novelty: the live tail of C4-style span dedup.
    Incoming documents explode into non-overlapping ``span_tokens``-token
    windows (map-only) and LEFT-ANTI join the STANDING corpus span-hash
    table — emitting exactly the spans the batch rewrite would KEEP,
    i.e. the text mass a new batch actually adds (a span the corpus
    already owns would be excised).  Stateless stream-static join: any
    row emits in append mode with zero watermark bookkeeping, and the
    emitted set is identical to the batch anti-join over the same
    batch/corpus split (pinned in tests).  Spans repeated WITHIN the
    stream are each emitted (first-occurrence election among themselves
    belongs to the batch compactor, same division of labor as
    lsh_dedup_stream's downstream verifier).
    """
    from planet_dump_ng_spark.operators.dedup import span_occurrences

    occ = span_occurrences(docs, span_tokens)
    return occ.join(corpus_spans.select("h"), "h", "left_anti").select(
        "doc_id", "span_idx", "n_span_tokens", "h"
    )


def bpe_encode_stream(docs: DataFrame, tokenizer_dir: str) -> DataFrame:
    """Streaming encode under a FROZEN persisted tokenizer
    (operators.tokenizer): per-doc BPE symbol statistics as a pure
    stateless row map — tokenization and char counts JVM-side, the
    per-word symbol fold Arrow-batched with the artifact's rule list
    broadcast as plan literals.  No aggregation, no watermark: every row
    emits in append mode, so the live tail of tokenizer-budget
    accounting (tokens entering a training mix per feed) runs at
    ingest rate.  The emitted rows are pinned equal to the batch
    bpe_apply_stats over the same files; the rule list is read ONCE at
    stream construction — retraining the tokenizer means restarting the
    stream, which is the point (a training run must never straddle two
    tokenizers)."""
    from planet_dump_ng_spark.operators.tokenizer import (
        _collect_rules,
        bpe_apply_stats_stateless,
        read_bpe_tokenizer,
    )

    merges, _ = read_bpe_tokenizer(docs.sparkSession, tokenizer_dir)
    return bpe_apply_stats_stateless(docs, _collect_rules(merges))


def dsir_score_stream(docs: DataFrame, model_dir: str) -> DataFrame:
    """Streaming DSIR scoring under a FROZEN persisted model
    (operators.dsir.write_dsir_model) — the ingest-time domain gate:
    every arriving document gets its log importance weight before it
    reaches the training mix.

    Stateless row map, so append mode with zero watermark bookkeeping:
    the token array is projected once per row, grams and bucket ids
    derive JVM-side (the same pmod(xxhash64) featurizer the model was
    trained under — read_dsir_model refuses a foreign featurizer), and
    ONE Arrow-batched pandas UDF folds each row's bucket list through a
    numpy lookup of the score dimension.  The score table is collected
    ONCE at stream construction (bounded: <= n_buckets rows, the model
    artifact contract) — retraining the model means restarting the
    stream, exactly like bpe_encode_stream's frozen rule list.  Grams
    in buckets the model never saw are DROPPED from both the count and
    the sum — the batch path's inner join semantics — and docs with no
    scored feature at all are filtered (the batch per-doc aggregate
    never sees them).  Pinned bit-equal to dsir_score_with_model over
    the same files in tests/test_dsir.py."""
    import numpy as np

    from planet_dump_ng_spark.operators import dsir as ds

    scores, meta = ds.read_dsir_model(docs.sparkSession, model_dir)
    nb = int(meta["n_buckets"])
    delta = np.zeros(nb, dtype=np.int64)
    present = np.zeros(nb, dtype=bool)
    for r in scores.select("bucket", "delta_q20").collect():
        delta[int(r.bucket)] = int(r.delta_q20)
        present[int(r.bucket)] = True

    @F.pandas_udf("n_feats bigint, logw_q20 bigint")
    def fold(buckets: pd.Series) -> pd.DataFrame:
        out_n, out_w = [], []
        for b in buckets:
            if b is None or len(b) == 0:
                # null/empty text: the batch path's explode emits no
                # feature rows, so the doc is absent there — score 0
                # here and let the n_feats > 0 filter drop it
                out_n.append(0)
                out_w.append(0)
                continue
            idx = np.asarray(b, dtype=np.int64)
            seen = present[idx]
            out_n.append(int(seen.sum()))
            out_w.append(int(delta[idx[seen]].sum()))
        return pd.DataFrame({"n_feats": out_n, "logw_q20": out_w})

    from planet_dump_ng_spark.operators import text as tx

    t = docs.select("doc_id", tx.tokens("text").alias("__toks"))
    bucketed = t.select(
        "doc_id",
        F.transform(
            ds.grams_from_tokens(F.col("__toks")),
            lambda g: F.pmod(F.xxhash64(g), F.lit(nb)),
        ).alias("__buckets"),
    )
    return (
        bucketed.select("doc_id", fold("__buckets").alias("s"))
        .select(
            "doc_id",
            F.col("s.n_feats").alias("n_feats"),
            F.col("s.logw_q20").alias("logw_q20"),
            (F.col("s.logw_q20").cast("double") / F.lit(1048576.0)).alias(
                "logw_bits"
            ),
        )
        .filter(F.col("n_feats") > 0)
    )
