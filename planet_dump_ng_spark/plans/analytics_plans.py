"""Event-analytics queries: cohort retention, windowed dedup, sweep-line
concurrency, percentile bands, winsorized stats, incremental rollup
merge, partition-skew audit, and snapshot diff (CDC extract).

Product-analytics shapes over the ``events`` table that the reference's
relational surface doesn't cover but any telemetry/training-log pipeline
needs.  All oracle-checked; all window use is partitioned (the plan
audit in tests/test_plan_quality.py enforces it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.plans.registry import register, table


@register(
    "retention_cohorts",
    """
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    first AS (SELECT user_id, MIN(d) AS first_d FROM ev GROUP BY user_id)
    SELECT CAST(date_trunc('week', first_d) AS TIMESTAMP) AS cohort_week,
           date_diff('day', first_d, d) // 7 AS week_offset,
           COUNT(DISTINCT ev.user_id) AS n_active
    FROM ev JOIN first USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
    doc="Classic cohort-retention matrix: users bucketed by the ISO week "
    "of their first event, distinct-active counted at each whole-week "
    "offset since.  Two shuffles (per-user min, cohort agg) plus a "
    "user_id equi-join that reuses the first agg's partitioning; the "
    "distinct is Spark's standard two-phase expand.  No windows.",
    tags=("events", "agg", "bench"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        ev.join(first, "user_id")
        .select(
            F.date_trunc("week", "first_d").alias("cohort_week"),
            F.expr("CAST(datediff(d, first_d) DIV 7 AS BIGINT)").alias(
                "week_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "dedup_events_window",
    """
    WITH ev AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    b AS (
      SELECT *,
             (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS window_start_s
      FROM ev
    )
    SELECT window_start_s, user_id, event_type,
           event_id AS first_event_id, n_events
    FROM (
      SELECT window_start_s, user_id, event_type, event_id,
             row_number() OVER (PARTITION BY window_start_s, user_id, event_type
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY window_start_s, user_id, event_type)
               AS n_events
      FROM b
    ) WHERE rn = 1
    """,
    doc="Batch analog of the streaming dropDuplicatesWithinWatermark job: "
    "keep the first event per (user, type) inside each 10-minute "
    "tumbling window (tie-break by event_id), carrying the duplicate "
    "count.  One groupBy on (window, user, type) with a lexicographic "
    "MIN(struct(ts, event_id)) — no window function at all on the "
    "Spark side, so state is one row per group and the agg is "
    "map-side combinable.  The oracle spells the same semantics with "
    "row_number, which is the formulation that would NOT scale.",
    tags=("events", "dedup"),
)
def dedup_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes")
    return (
        ev.groupBy(
            F.unix_timestamp(w["start"]).alias("window_start_s"),
            "user_id",
            "event_type",
        )
        .agg(
            F.min(F.struct("ts", "event_id")).alias("first"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "window_start_s",
            "user_id",
            "event_type",
            F.col("first")["event_id"].alias("first_event_id"),
            "n_events",
        )
    )


@register(
    "peak_concurrency_daily",
    """
    WITH ev AS (
      SELECT CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 300 SECOND AS e
      FROM events
    ),
    p AS (
      SELECT s, e, date_trunc('hour', s) AS h0,
             date_trunc('hour', s) + INTERVAL 1 HOUR AS mid
      FROM ev
    ),
    deltas AS (
      SELECT h0 AS hour, s AS t, 1 AS delta FROM p
      UNION ALL SELECT h0, least(e, mid), -1 FROM p
      UNION ALL SELECT mid, mid, 1 FROM p WHERE e > mid
      UNION ALL SELECT mid, e, -1 FROM p WHERE e > mid
    ),
    run AS (
      SELECT hour,
             SUM(delta) OVER (PARTITION BY hour ORDER BY t, delta) AS c
      FROM deltas
    )
    SELECT date_trunc('day', hour) AS day,
           CAST(MAX(c) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY day
    """,
    doc="Distributed sweep-line: peak number of concurrent 5-minute "
    "sessions per day.  Each interval becomes +1/-1 deltas; intervals "
    "that cross an hour boundary split there (they can cross at most "
    "one, since the interval is shorter than the bucket), so every "
    "delta lands inside one hour and the running sum needs NO "
    "cross-partition carry — the window partitions by HOUR, the "
    "finest bucket the interval length allows, bounding per-partition "
    "state 24x tighter than day partitioning; daily peaks then reduce "
    "as MAX over hourly peaks (a boundary-crossing session is open in "
    "both hours' sweeps, so no peak is lost).  Equal timestamps order "
    "ends (-1) before starts (+1), and the default RANGE frame "
    "aggregates peer rows together, so the running max is "
    "deterministic under ties on both engines.",
    tags=("events", "window", "bench"),
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select(
        F.col("ts").alias("s"),
        F.expr("ts + INTERVAL 300 SECONDS").alias("e"),
        F.date_trunc("hour", "ts").alias("h0"),
        F.expr("date_trunc('hour', ts) + INTERVAL 1 HOUR").alias("mid"),
    )
    deltas = (
        ev.select(
            F.explode(
                F.filter(
                    F.array(
                        F.struct(
                            F.col("h0").alias("hour"),
                            F.col("s").alias("t"),
                            F.lit(1).alias("delta"),
                        ),
                        F.struct(
                            F.col("h0").alias("hour"),
                            F.least("e", "mid").alias("t"),
                            F.lit(-1).alias("delta"),
                        ),
                        F.when(
                            F.col("e") > F.col("mid"),
                            F.struct(
                                F.col("mid").alias("hour"),
                                F.col("mid").alias("t"),
                                F.lit(1).alias("delta"),
                            ),
                        ),
                        F.when(
                            F.col("e") > F.col("mid"),
                            F.struct(
                                F.col("mid").alias("hour"),
                                F.col("e").alias("t"),
                                F.lit(-1).alias("delta"),
                            ),
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("x")
        )
        .select("x.hour", "x.t", "x.delta")
    )
    w = W.partitionBy("hour").orderBy("t", "delta")
    run = deltas.withColumn("c", F.sum("delta").over(w))
    return run.groupBy(F.date_trunc("day", "hour").alias("day")).agg(
        F.max("c").cast("bigint").alias("peak_concurrency")
    )


@register(
    "winsorized_event_stats",
    """
    WITH bounds AS (
        SELECT event_type,
               quantile_disc(value, 0.25) AS q1,
               quantile_disc(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type AS event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(least(greatest(e.value, b.q1 - 1.5 * (b.q3 - b.q1)),
                               b.q3 + 1.5 * (b.q3 - b.q1))
                         AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS wmean,
           CAST(SUM(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1)
                           OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY e.event_type
    """,
    doc="The apply half of value_outlier_bounds: clamp each value into the "
    "IQR fence and take the order-independent decimal mean.  Exact "
    "discrete quantiles (actual elements, engine-agnostic) feed a "
    "broadcast join back over the fact table; the clamp is per-row "
    "arithmetic on two doubles, and the mean uses the decimal-quantize "
    "sum so executor summation order can't flip bits.  Two scans, no "
    "full-data sort — the standard robust-stats shape for feature "
    "cleaning at scale.",
    tags=("agg", "quality"),
)
def winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    clamped = F.least(F.greatest(F.col("value"), lo), hi)
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(clamped.cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("wmean"),
            F.sum(
                ((F.col("value") < lo) | (F.col("value") > hi)).cast("long")
            ).alias("n_clipped"),
        )
    )


@register(
    "incremental_event_rollup",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
           MIN(value) AS vmin,
           MAX(value) AS vmax
    FROM events GROUP BY event_type
    """,
    doc="Incremental-view maintenance: the fact table splits at a date "
    "watermark into a 'base' partition and a 'delta' batch, each "
    "aggregated independently, and the two partial-aggregate tables "
    "merge by re-aggregation (SUM of counts/sums, MIN of mins, MAX of "
    "maxes).  The oracle aggregates the unsplit table directly — "
    "hash-equality proves the merge is lossless, which is exactly the "
    "algebraic-aggregate property that lets a nightly delta update a "
    "100 TB rollup without rescanning history.  Decimal sums make the "
    "merge exact; a plain double sum would NOT survive this test.",
    tags=("agg", "events"),
)
def incremental_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cutoff = F.expr("TIMESTAMP '2024-06-01 00:00:00'")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").cast("double").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )


@register(
    "hourly_latency_bands",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           COUNT(*) AS n,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.95) AS p95,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY hour
    """,
    doc="Telemetry percentile bands: exact discrete p50/p95/p99 of value "
    "per hour bucket.  percentile_disc selects actual elements, so both "
    "engines agree bit-for-bit with no interpolation arithmetic; the "
    "sort is per-group inside a partitioned aggregate, never global.",
    tags=("events", "agg"),
)
def hourly_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
    )


def _skew_oracle() -> str:
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    h = xxh64_long_inline("user_id")
    return f"""
    WITH shards AS (
      SELECT (({h}) % 32 + 32) % 32 AS shard, COUNT(*) AS n_rows
      FROM events GROUP BY shard
    ),
    total AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM shards)
    SELECT shard, n_rows,
           CAST(n_rows AS DOUBLE) * 32 / total.t AS skew_ratio
    FROM shards, total
    """


@register(
    "partition_skew_audit",
    _skew_oracle(),
    doc="Shuffle-health introspection: row count per hash shard for a "
    "32-way repartition on user_id, plus each shard's ratio to the "
    "uniform share.  The audit buckets with xxhash64 (replayed exactly "
    "in the DuckDB oracle) as a stand-in for shuffle HashPartitioning, "
    "which actually uses Murmur3 — a different uniform hash, so shard "
    "SIZES approximate what repartition('user_id') would produce while "
    "staying oracle-replayable; the skew SIGNAL (hot keys landing "
    "together) is hash-independent.  "
    "A ratio >> 1 is the skew signal that says salt this key before "
    "joining at scale.  One map-side-combinable count; the scalar "
    "total broadcasts back.",
    tags=("events", "skew"),
)
def partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    shards = ev.groupBy(
        F.pmod(F.xxhash64("user_id"), F.lit(32)).alias("shard")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    total = shards.agg(F.sum("n_rows").cast("bigint").alias("t"))
    return shards.crossJoin(F.broadcast(total)).select(
        "shard",
        "n_rows",
        (F.col("n_rows").cast("double") * 32 / F.col("t")).alias("skew_ratio"),
    )


@register(
    "snapshot_diff_users",
    """
    WITH v1 AS (
      SELECT user_id, COUNT(*) AS n1
      FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-07-01 00:00:00'
      GROUP BY user_id
    ),
    v2 AS (
      SELECT user_id, COUNT(*) AS n2
      FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-04-01 00:00:00'
      GROUP BY user_id
    )
    SELECT coalesce(v1.user_id, v2.user_id) AS user_id,
           CASE WHEN v1.user_id IS NULL THEN 'added'
                WHEN v2.user_id IS NULL THEN 'removed'
                WHEN v1.n1 <> v2.n2 THEN 'changed'
                ELSE 'same' END AS status,
           coalesce(v1.n1, 0) AS n1,
           coalesce(v2.n2, 0) AS n2
    FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
    """,
    doc="Dataset-version diff (CDC extract — the inverse of "
    "merge_upsert_orders' CDC apply): two snapshot windows of the fact "
    "table aggregate to per-key states, and a single full outer join "
    "classifies every key as added/removed/changed/same.  Both "
    "aggregates and the join share the user_id hash partitioning, so "
    "the plan is two map-side-combinable aggs + one co-partitioned "
    "join — the shape a nightly snapshot-reconciliation run needs.",
    tags=("events", "join"),
)
def snapshot_diff_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v1 = (
        ev.filter(F.col("ts") < F.lit("2024-07-01 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    v2 = (
        ev.filter(F.col("ts") >= F.lit("2024-04-01 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.user_id") == F.col("v2.user_id"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("v1.user_id"), F.col("v2.user_id")).alias("user_id"),
        F.when(F.col("v1.user_id").isNull(), "added")
        .when(F.col("v2.user_id").isNull(), "removed")
        .when(F.col("v1.n1") != F.col("v2.n2"), "changed")
        .otherwise("same")
        .alias("status"),
        F.coalesce(F.col("v1.n1"), F.lit(0)).alias("n1"),
        F.coalesce(F.col("v2.n2"), F.lit(0)).alias("n2"),
    )


@register(
    "time_decayed_user_scores",
    """
    WITH w AS (
      SELECT user_id,
             value / CAST(1 << LEAST(GREATEST(
               date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') // 7,
               0), 30) AS DOUBLE) AS wv
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(wv AS DECIMAL(38,6))) AS DOUBLE) AS decayed_score
    FROM w GROUP BY user_id
    """,
    doc="Exponential time-decay aggregate: each event's value is halved "
    "per whole week of age at the 2024-02-01 anchor, then summed per "
    "user — the freshness-weighted engagement score a ranking/feature "
    "pipeline recomputes nightly.  Decay weights are exact powers of "
    "two (value / 2^weeks is pure exponent arithmetic, no float "
    "rounding), so each weighted value is bit-identical across "
    "engines, and the sum uses the decimal quantization that makes "
    "addition order-independent.  Map-only weighting + one map-side-"
    "combinable agg — one shuffle, scales linearly.  The week clamp "
    "(30) bounds the shift so ancient events degrade to ~1e-9 weight "
    "instead of overflowing the shift.",
    tags=("events", "agg"),
)
def time_decayed_user_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    weeks = F.least(
        F.greatest(
            F.floor(
                F.datediff(F.lit("2024-02-01").cast("date"), F.to_date("ts"))
                / 7
            ),
            F.lit(0),
        ),
        F.lit(30),
    )  # clamp below too: an event after the anchor must not shift negative
    staged = ev.select("user_id", "value", weeks.cast("int").alias("weeks"))
    wv = F.col("value") / F.expr("CAST(shiftleft(1, weeks) AS DOUBLE)")
    return (
        staged.select("user_id", wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("wv").cast("decimal(38,6)"))
            .cast("double")
            .alias("decayed_score"),
        )
    )


@register(
    "rolling_zscore_anomalies",
    """
    WITH st AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             COUNT(*) OVER w AS n_prev,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE)
               AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, value,
           (value - s / n_prev)
             / sqrt((s2 - s * s / n_prev) / n_prev) AS zscore
    FROM st
    WHERE n_prev >= 12
      AND (s2 - s * s / n_prev) / n_prev > 0
      AND abs((value - s / n_prev)
              / sqrt((s2 - s * s / n_prev) / n_prev)) >= 3.0
    """,
    doc="Rolling z-score anomaly detection: each event is scored against "
    "the mean/stddev of its user's previous 24 events (warm-up of 12), "
    "and |z| >= 3 rows surface — the streaming-telemetry outlier gate, "
    "expressed as a bounded-frame window so state per key is O(24).  "
    "One shuffle (partition by user), sort within partition; the "
    "rolling sums are decimal-quantized so the frame arithmetic is "
    "order-independent and both engines agree bit-for-bit; mean/var "
    "derive from the sums with scalar IEEE ops (deterministic), and "
    "value*value is a single rounding computed identically.  Ties in "
    "ts break on event_id so the frame contents are total-ordered.",
    tags=("events", "window"),
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, -1)
    )
    st = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s") / F.col("n_prev")
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n_prev")) / F.col(
        "n_prev"
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        st.filter((F.col("n_prev") >= 12) & (var > 0) & (F.abs(z) >= 3.0))
        .select("event_id", "user_id", "ts", "value", z.alias("zscore"))
    )


@register(
    "sliding_distinct_users",
    """
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             + to_hours(o.off) AS window_end_hour,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events, (SELECT unnest(range(0, 3)) AS off) o
    GROUP BY window_end_hour
    """,
    doc="Sliding-window distinct count: users active in the trailing "
    "3-hour window, reported hourly.  Implemented with the bounded "
    "fan-out trick — each event replicates into the 3 hourly windows "
    "it participates in (a fixed 3x map-side expansion), then one "
    "COUNT(DISTINCT) per window bucket — instead of a self-join or a "
    "range join, so the shuffle key is the window bucket and the cost "
    "is 3x the input scan regardless of window overlap.  This is the "
    "batch replica of the streaming sliding-window aggregate "
    "(window(ts, '3 hours', '1 hour')); distinct uses Spark's two-"
    "phase expand.  Trailing partial windows past the data's edge are "
    "kept (deterministic, same on both engines).",
    tags=("events", "agg"),
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            F.explode(
                F.array(F.lit(0), F.lit(1), F.lit(2))
            ).alias("off"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .select(
            "user_id",
            (
                F.col("h")
                + F.make_interval(hours=F.col("off"))
            ).alias("window_end_hour"),
        )
        .groupBy("window_end_hour")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "customer_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             epoch_us(MAX(CAST(o_orderdate AS TIMESTAMP))) AS last_order_us,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT
        percentile_disc(0.25) WITHIN GROUP (ORDER BY last_order_us) AS l1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY last_order_us) AS l2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY last_order_us) AS l3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS f1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency) AS f2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS f3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary) AS m2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m3
      FROM rfm
    )
    SELECT custkey,
           CASE WHEN last_order_us <= l1 THEN 1 WHEN last_order_us <= l2 THEN 2
                WHEN last_order_us <= l3 THEN 3 ELSE 4 END AS r_seg,
           CASE WHEN frequency <= f1 THEN 1 WHEN frequency <= f2 THEN 2
                WHEN frequency <= f3 THEN 3 ELSE 4 END AS f_seg,
           CASE WHEN monetary <= m1 THEN 1 WHEN monetary <= m2 THEN 2
                WHEN monetary <= m3 THEN 3 ELSE 4 END AS m_seg,
           frequency, monetary
    FROM rfm, cuts
    """,
    doc="RFM quartile segmentation: per-customer recency/frequency/"
    "monetary from one orders aggregate, quartile boundaries as ONE "
    "global percentile_disc aggregate (a 1-row table — order "
    "statistics, so engine-exact), broadcast back to classify every "
    "customer 1-4 on each axis.  The broadcast-cuts shape replaces "
    "the ntile global window an RFM query would naively use (which "
    "funnels all rows through one task); cost is two passes over the "
    "per-customer aggregate, both map-side combinable.  Monetary "
    "uses the decimal-quantized sum so the quartile cut compares "
    "bit-identical doubles on both engines.",
    tags=("events", "agg"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.unix_micros(F.max(F.col("o_orderdate").cast("timestamp"))).alias(
            "last_order_us"
        ),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("monetary"),
    )
    cuts = rfm.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"{c[0]}{i}")
            for c in ("last_order_us", "frequency", "monetary")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def seg(col: str, p: str):
        return (
            F.when(F.col(col) <= F.col(f"{p}1"), 1)
            .when(F.col(col) <= F.col(f"{p}2"), 2)
            .when(F.col(col) <= F.col(f"{p}3"), 3)
            .otherwise(4)
            .alias(f"{p}_seg")
        )

    return rfm.crossJoin(F.broadcast(cuts)).select(
        "custkey",
        seg("last_order_us", "l").alias("r_seg"),
        seg("frequency", "f"),
        seg("monetary", "m"),
        "frequency",
        "monetary",
    )


@register(
    "range_partition_bounds",
    """
    WITH ks AS (SELECT o_orderkey AS k FROM orders),
    cuts AS (SELECT percentile_disc(1/8.0) WITHIN GROUP (ORDER BY k) AS b1, percentile_disc(2/8.0) WITHIN GROUP (ORDER BY k) AS b2, percentile_disc(3/8.0) WITHIN GROUP (ORDER BY k) AS b3, percentile_disc(4/8.0) WITHIN GROUP (ORDER BY k) AS b4, percentile_disc(5/8.0) WITHIN GROUP (ORDER BY k) AS b5, percentile_disc(6/8.0) WITHIN GROUP (ORDER BY k) AS b6, percentile_disc(7/8.0) WITHIN GROUP (ORDER BY k) AS b7 FROM ks),
    bounds AS (SELECT CAST(1 AS INT) AS cut, b1 AS bound FROM cuts UNION ALL SELECT CAST(2 AS INT) AS cut, b2 AS bound FROM cuts UNION ALL SELECT CAST(3 AS INT) AS cut, b3 AS bound FROM cuts UNION ALL SELECT CAST(4 AS INT) AS cut, b4 AS bound FROM cuts UNION ALL SELECT CAST(5 AS INT) AS cut, b5 AS bound FROM cuts UNION ALL SELECT CAST(6 AS INT) AS cut, b6 AS bound FROM cuts UNION ALL SELECT CAST(7 AS INT) AS cut, b7 AS bound FROM cuts)
    SELECT cut, CAST(bound AS DOUBLE) AS bound,
           (SELECT COUNT(*) FROM ks WHERE k <= bound) AS n_below
    FROM bounds
    """,
    doc="Range-partitioner bound election: the 7 order-statistic cut "
    "points that split o_orderkey into 8 balanced ranges, with the "
    "below-count audit per bound — the primitive behind "
    "repartitionByRange / global sort at scale (Spark samples to pick "
    "these; here they are exact percentile_disc order statistics, so "
    "both engines agree bit-for-bit and the balance guarantee is "
    "checkable).  One aggregate computes all 7 bounds (no global "
    "window), and the audit is a broadcast of the 7-row bound table "
    "against a count aggregate.",
    tags=("layout", "agg"),
)
def range_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    cuts = o.agg(
        *[
            F.expr(
                f"percentile_disc({i}/8.0) WITHIN GROUP (ORDER BY k)"
            ).alias(f"b{i}")
            for i in range(1, 8)
        ]
    )
    bounds = cuts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("cut"),
                        F.col(f"b{i}").alias("bound"),
                    )
                    for i in range(1, 8)
                ]
            )
        ).alias("c")
    ).select("c.cut", "c.bound")
    audited = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("cut", "bound")
        .agg(
            F.sum((F.col("k") <= F.col("bound")).cast("bigint")).alias(
                "n_below"
            )
        )
    )
    return audited


@register(
    "event_transition_counts",
    """
    WITH seq AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             LAG(event_type) OVER w AS prev_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tr AS (SELECT prev_type AS from_type, event_type AS to_type,
                  COUNT(*) AS n
           FROM seq
           WHERE prev_type IS NOT NULL AND gap_us <= 1800000000
           GROUP BY from_type, to_type),
    tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
            FROM tr GROUP BY from_type)
    SELECT tr.from_type, tr.to_type, tr.n,
           CAST(tr.n AS DOUBLE) / tot.n_from AS p_transition
    FROM tr JOIN tot USING (from_type)
    """,
    doc="Session-scoped event-transition matrix (first-order Markov "
    "counts): adjacent event pairs within a user's stream, broken at "
    "30-minute gaps (the user_sessionization boundary), aggregated to "
    "(from, to) counts with the per-source transition probability — "
    "the behavioral sequence-mining table funnels and next-action "
    "models start from.  One user-partitioned LAG window (state O(1) "
    "per row), one map-side-combinable count, a broadcast-sized "
    "row-normalization join; gap compares at exact microseconds per "
    "the engine's time-gap convention.",
    tags=("events", "window"),
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    )
    tr = (
        seq.filter(
            F.col("prev_type").isNotNull()
            & (F.col("gap_us") <= 1_800_000_000)
        )
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tr.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("n_from")
    )
    return tr.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from")).alias("p_transition"),
    )


@register(
    "mad_outlier_bounds",
    """
    WITH med AS (
        SELECT event_type, quantile_disc(value, 0.50) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, med, quantile_disc(ad, 0.50) AS mad
        FROM dev GROUP BY event_type, med
    )
    SELECT d.event_type, d.med, d.mad,
           CAST(count(*) FILTER (d2.ad > 3.5 * d.mad) AS BIGINT)
             AS n_outliers
    FROM mad d JOIN dev d2 ON d2.event_type = d.event_type
    GROUP BY d.event_type, d.med, d.mad
    """,
    doc="MAD (median-absolute-deviation) outlier gate per event type — "
    "the robust-statistics complement to value_outlier_bounds' IQR "
    "fence (MAD has a 50% breakdown point; IQR only 25%, so heavy "
    "contamination shifts the IQR fence but not this one).  Two exact "
    "discrete-quantile aggregates (median, then median of absolute "
    "deviations — each an order statistic both engines pick "
    "identically), each bound table broadcast back; |x - med| is one "
    "IEEE op, the 3.5-MAD modified-z fence compares deterministic "
    "doubles.  Three scans total, no global sort.",
    tags=("agg", "quality"),
)
def mad_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)").alias(
            "med"
        )
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY ad)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad.drop("med")), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                (F.col("ad") > 3.5 * F.col("mad")).cast("bigint")
            ).alias("n_outliers")
        )
    )
