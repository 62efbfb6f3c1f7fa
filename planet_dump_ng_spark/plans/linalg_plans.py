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
