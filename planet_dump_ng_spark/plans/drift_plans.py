"""Dataset drift monitoring — the continuous-training guardrail family.

A pipeline that retrains on a rolling corpus needs to know when today's
ingest stops looking like yesterday's BEFORE the model does: embedding
distributions shifting (upstream encoder changed, source mix moved) and
scalar feature distributions shifting (instrumentation change, new
client version).  Both checks here are one-pass aggregations whose
shuffle state is tiny (dims, or histogram bins) and whose arithmetic is
engine-exact: truncated-integer sums for means, quantized |share|
differences for the distance — no transcendentals, so the DuckDB oracle
matches bit-for-bit.

Cohorts are split on id parity as the stand-in for yesterday/today
partitions; at scale the split is two date predicates over the same
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.plans.registry import register, table

_DIM = 64


@register(
    "embedding_drift_by_dim",
    f"""
    WITH e AS (SELECT vec_id % 2 = 0 AS a, embedding::DOUBLE[] AS v
               FROM embeddings),
    x AS (SELECT a, pos, v[pos] AS val
          FROM e, (SELECT unnest(range(1, {_DIM + 1})) AS pos))
    SELECT CAST(pos AS INT) AS pos,
           CAST(SUM(CASE WHEN a THEN CAST(trunc(val * 1e12) AS BIGINT) END)
             AS DOUBLE) / 1e12
             / SUM(CASE WHEN a THEN 1 ELSE 0 END) AS mean_a,
           CAST(SUM(CASE WHEN NOT a THEN CAST(trunc(val * 1e12) AS BIGINT) END)
             AS DOUBLE) / 1e12
             / SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS mean_b,
           abs(CAST(SUM(CASE WHEN a THEN CAST(trunc(val * 1e12) AS BIGINT) END)
             AS DOUBLE) / 1e12
             / SUM(CASE WHEN a THEN 1 ELSE 0 END)
             - CAST(SUM(CASE WHEN NOT a THEN CAST(trunc(val * 1e12) AS BIGINT) END)
             AS DOUBLE) / 1e12
             / SUM(CASE WHEN NOT a THEN 1 ELSE 0 END)) AS abs_shift
    FROM x GROUP BY pos
    """,
    doc="Embedding drift by dimension: per-dim centroid means of two "
    "cohorts (id-parity stand-in for yesterday/today) and the absolute "
    "shift — the encoder-regression / source-mix-change alarm.  One "
    "posexplode + one aggregate; shuffle state is dim rows regardless "
    "of corpus size; 1e-12-truncated integer sums (the IVF Lloyd "
    "quantization) keep both engines bit-identical.",
    tags=("drift", "agg"),
)
def embedding_drift_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2 == 0).alias("a"),
        F.posexplode("embedding").alias("pos0", "val"),
    )
    tq = (F.col("val").cast("double") * 1e12).cast("long")
    a, na = F.when(F.col("a"), tq), F.sum(F.when(F.col("a"), 1).otherwise(0))
    b, nb = (
        F.when(~F.col("a"), tq),
        F.sum(F.when(~F.col("a"), 1).otherwise(0)),
    )
    mean_a = F.sum(a).cast("double") / F.lit(1e12) / na
    mean_b = F.sum(b).cast("double") / F.lit(1e12) / nb
    return (
        e.groupBy((F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(
            mean_a.alias("mean_a"),
            mean_b.alias("mean_b"),
            F.abs(mean_a - mean_b).alias("abs_shift"),
        )
    )


_N_BINS = 256
_LO, _HI = 0.0, 500.0
_W = (_HI - _LO) / _N_BINS


def _bin_sql(col: str = "value") -> str:
    return (
        f"CASE WHEN {col} >= {_HI!r} THEN {_N_BINS - 1} "
        f"ELSE least(greatest(CAST(floor(({col} - {_LO!r}) / {_W!r}) AS INT), 0), "
        f"{_N_BINS - 1}) END"
    )


@register(
    "value_drift_tv",
    f"""
    WITH h AS (SELECT event_id % 2 = 0 AS a, {_bin_sql()} AS bin
               FROM events),
    c AS (SELECT bin,
                 SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                 SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS cb
          FROM h GROUP BY bin),
    n AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM c)
    SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
           COUNT(*) AS n_bins_hit,
           CAST(SUM(CAST(trunc(abs(CAST(c.ca AS DOUBLE) / n.na
                                   - CAST(c.cb AS DOUBLE) / n.nb) * 1e12)
                         AS BIGINT)) AS BIGINT) AS tv_q,
           CAST(SUM(CAST(trunc(abs(CAST(c.ca AS DOUBLE) / n.na
                                   - CAST(c.cb AS DOUBLE) / n.nb) * 1e12)
                         AS BIGINT)) AS DOUBLE) / 1e12 / 2 AS tv_distance
    FROM c, n
    GROUP BY n.na, n.nb
    """,
    doc="Scalar-feature drift: total-variation distance between two "
    "cohorts' value histograms (fixed 256 equi-width bins — the "
    "streaming histogram's bounds contract) — the instrumentation-"
    "change alarm.  TV = half the L1 gap of bin shares; each |share "
    "difference| is truncated to 1e-12 and summed as an exact integer, "
    "so the distance is order-independent and hash-exact.  Two "
    "aggregations, O(bins) shuffle state.",
    tags=("drift", "sketch", "agg", "bench"),
)
def value_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        (F.col("event_id") % 2 == 0).alias("a"), "value"
    )
    bin_col = F.when(F.col("value") >= _HI, F.lit(_N_BINS - 1)).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col("value") - F.lit(_LO)) / F.lit(_W)).cast("int"),
                F.lit(0),
            ),
            F.lit(_N_BINS - 1),
        )
    )
    c = ev.groupBy(bin_col.alias("bin")).agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("a"), 1).otherwise(0)).alias("cb"),
    )
    n = c.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    diff_q = (
        F.abs(
            F.col("ca").cast("double") / F.col("na")
            - F.col("cb").cast("double") / F.col("nb")
        )
        * 1e12
    ).cast("long")
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).alias("n_bins_hit"),
            F.sum(diff_q).alias("tv_q"),
        )
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "n_bins_hit",
            F.col("tv_q").cast("bigint").alias("tv_q"),
            (F.col("tv_q").cast("double") / F.lit(1e12) / F.lit(2.0)).alias(
                "tv_distance"
            ),
        )
    )
