"""Embedding linear-algebra queries: the distributed Gram matrix.

The Spark side computes partition-local d x d partials (one numpy matmul
per Arrow batch, operators/linalg.py) and shuffles only d^2 small rows;
the DuckDB oracle replays the same reduction naively by unnesting the
vector twice — both sides truncate each per-row product to an integer
first, so the sums are associative-exact and hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from planet_dump_ng_spark.plans.registry import register, table

_DIM = 64


@register(
    "embedding_gram",
    f"""
    WITH elems AS (
        SELECT vec_id, i - 1 AS i, v
        FROM (SELECT vec_id, unnest(embedding) AS v,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    )
    SELECT a.i AS i, b.i AS j,
           CAST(SUM(CAST(trunc(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE) * 1e12)
                         AS BIGINT)) AS BIGINT) AS dot_q
    FROM elems a JOIN elems b ON a.vec_id = b.vec_id
    GROUP BY a.i, b.i
    """,
    doc=f"Quantized Gram matrix X^T X of the {_DIM}-dim embeddings: "
    "partition-local numpy partials + one d^2-row shuffle on the Spark "
    "side vs a naive unnest pair-join in the oracle. The scan is the "
    "only data-sized stage at any scale.",
    tags=("linalg", "embedding", "bench"),
)
def embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.linalg import gram_matrix

    emb = table(spark, sf_dir, "embeddings")
    return gram_matrix(emb, "embedding", _DIM)


@register(
    "event_trend_by_type",
    """
    WITH q AS (SELECT event_type,
                 CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - 1700000000 AS x,
                 CAST(trunc(value * 1e3) AS BIGINT) AS y
               FROM events),
    s AS (SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM q GROUP BY event_type)
    SELECT event_type, n, sx, sy, sxx, sxy,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
                THEN 0.0
                ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END
             AS slope,
           (CAST(sy AS DOUBLE)
            - (CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
                    THEN 0.0
                    ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END)
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
    FROM s
    """,
    doc="Per-group OLS trend fit via applyInPandas "
    "(operators.linalg.fit_group_trends): one Arrow batch per "
    "event_type feeds a Python closed-form fit — the grouped-map UDF "
    "path (per-group model fitting), completing the Pandas surface "
    "beside mapInPandas and applyInPandasWithState.  Moments are "
    "exact integer sums (rebased epoch seconds x truncated "
    "milli-values), so batch row ORDER cannot change the result and "
    "the Python model is hash-verified against this SQL replay; the "
    "slope/intercept derivation is a fixed double op sequence.  One "
    "shuffle on the group key; group count bounds parallelism.",
    tags=("window", "udf"),
)
def event_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.linalg import fit_group_trends

    return fit_group_trends(table(spark, sf_dir, "events"))
