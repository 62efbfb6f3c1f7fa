"""Event-stream analytics: batch-mode plans whose logic is shared with the
Structured Streaming variants in ``planet_dump_ng_spark.streaming``.

The oracle gate runs the batch form; tests assert the streaming form
produces identical results on the same data (stream-batch equivalence)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from planet_dump_ng_spark.plans.registry import register, table
from planet_dump_ng_spark.plans.relational import DSUM_SQL, dsum


@register(
    "hourly_event_rollup",
    f"""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(x='value')} AS total_value
    FROM events GROUP BY hour, event_type
    """,
    doc="Tumbling-window rollup (batch analog of the streaming windowed agg).",
    tags=("streaming", "agg", "bench"),
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )


@register(
    "user_sessionization",
    """
    WITH us AS (
      -- events.ts is TIMESTAMP_NS in the parquet; the Spark side truncates
      -- to microseconds on read, so truncate here too before ordering or
      -- aggregating (ns-precision min/max would hash-mismatch).
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
    ),
    gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM us
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30 min): window lag + running sum, "
    "the batch analog of the stateful streaming sessionizer.",
    tags=("streaming", "window", "bench"),
)
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap compare at MICROSECOND precision on both sides: ts carries
    # sub-second fractions, so casting to whole seconds flips boundaries
    # exactly at gaps like 1800.5s (Spark<=1800 vs oracle >30min).
    gaps = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
            <= 30 * 60 * 1_000_000,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "event_type_pivot",
    """
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'view')     AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'error')    AS error
    FROM events GROUP BY day
    """,
    doc="Pivot (daily event-type matrix) — conditional-aggregation form.",
    tags=("streaming", "pivot"),
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    # pivot leaves NULL for absent combos; the oracle's FILTER form yields 0
    return piv.select(
        "day",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "view", "purchase", "signup", "error"]],
    )


@register(
    "view_purchase_join",
    """
    SELECT v.user_id AS user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))
               AS lag_us
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
    doc="View->purchase attribution within 30 min: batch analog of the "
    "watermarked stream-stream interval join (streaming/jobs.py). "
    "Equi-join on user_id bounds the fan-out; the time predicate is a "
    "residual filter, not a theta-join — scales as one hash join.",
    tags=("streaming", "join", "temporal"),
)
def view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = v.join(
        p,
        (v["user_id"] == p["p_user_id"])
        & (p["p_ts"] >= v["v_ts"])
        & (p["p_ts"] <= v["v_ts"] + F.expr("interval 30 minutes")),
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


@register(
    "value_outlier_bounds",
    """
    WITH bounds AS (
        SELECT event_type,
               quantile_disc(value, 0.25) AS q1,
               quantile_disc(value, 0.50) AS med,
               quantile_disc(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT b.event_type AS event_type, b.q1 AS q1, b.med AS med, b.q3 AS q3,
           CAST(count(*) FILTER (e.value < b.q1 - 1.5 * (b.q3 - b.q1)
                              OR e.value > b.q3 + 1.5 * (b.q3 - b.q1))
                AS BIGINT) AS n_outliers
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY b.event_type, b.q1, b.med, b.q3
    """,
    doc="IQR outlier gate per event type: exact discrete quantiles "
    "(percentile_disc picks actual elements, so both engines agree "
    "bit-for-bit), then the tiny bounds table broadcast-joins back for "
    "the outlier count — two scans, no sort of the full data.",
    tags=("agg", "quality"),
)
def value_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)").alias("med"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    joined = ev.join(F.broadcast(bounds), "event_type")
    return (
        joined.withColumn(
            "is_out",
            (F.col("value") < F.col("q1") - 1.5 * iqr)
            | (F.col("value") > F.col("q3") + 1.5 * iqr),
        )
        .groupBy("event_type", "q1", "med", "q3")
        .agg(F.sum(F.col("is_out").cast("long")).alias("n_outliers"))
        .select("event_type", "q1", "med", "q3", "n_outliers")
    )
