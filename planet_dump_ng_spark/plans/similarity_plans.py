"""Similarity-search queries over ``embeddings`` (array<float>).

The exact brute-force top-k is oracle-checked against DuckDB computing the
identical decimal-exact cosine; the LSH variant is approximate by design
(rows-only check + recall test in tests/test_similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import similarity as sim
from planet_dump_ng_spark.plans.registry import register, table

# deterministic dot product in DuckDB: zip lists positionally, multiply in
# double, strict left-to-right list_reduce fold — bit-identical to
# operators.similarity._dot_exact (Spark F.aggregate) on the same lists.
_DOT = (
    "list_reduce(list_prepend(0.0, list_transform("
    "list_zip({a}::DOUBLE[], {b}::DOUBLE[]), p -> p[1] * p[2])), (acc, x) -> acc + x)"
)

_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {_DOT.format(a='qv', b='cv')}
           / (sqrt({_DOT.format(a='qv', b='qv')}) * sqrt({_DOT.format(a='cv', b='cv')}))
           AS cosine
  FROM q, c WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


@register(
    "ann_cosine_topk",
    _ORACLE,
    doc="Exact brute-force cosine top-5 per query vector (decimal-exact dot).",
    tags=("similarity", "bench"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.cosine_topk(emb, queries, k=5)


@register(
    "ann_lsh_topk",
    None,  # approximate by design — recall measured in tests
    doc="Hyperplane-LSH bucketed cosine top-5 (the 100 TB scale path).",
    tags=("similarity",),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.lsh_cosine_topk(emb, queries, dim=64, k=5, n_planes=8)


@register(
    "ann_ivf_topk",
    None,  # approximate by design — recall measured in tests
    doc="IVF cosine top-5: mini k-means coarse quantizer, n_probe nearest "
    "cells per query, exact rerank (the second ANN scale path).",
    tags=("similarity", "iterative"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import ivf_cosine_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_cosine_topk(emb, queries, dim=64, k=5, n_cells=8, n_probe=3)
