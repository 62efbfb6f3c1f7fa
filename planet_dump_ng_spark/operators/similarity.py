"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products are computed with built-in array expressions (zip_with +
  aggregate) entirely JVM-side.  Determinism rests on both engines doing
  the IDENTICAL strict left-to-right IEEE-double fold over the same list
  (not on order-independence — double addition is not associative); do
  not reorder the reduction.
- ``lsh_cosine_topk``: random-hyperplane (SimHash-for-vectors) bucketing —
  the 100 TB path.  Queries only join corpus vectors sharing a hyperplane
  bucket, turning O(|Q|x|C|) into O(|Q| x bucket_size x n_tables).

At cluster scale the corpus side is hash-partitioned by bucket; queries
are typically small enough to broadcast.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

def _dot_exact(a: Column, b: Column) -> Column:
    """Deterministic dot product: IEEE double multiply + strict left-to-right
    fold.  Bit-identical to DuckDB's ``list_reduce`` over the same lists
    (verified empirically), so oracle comparisons are exact without decimal
    quantization."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot_exact(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot_exact(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours per query (excluding self).

    queries is expected to be small (broadcast); ties break on ascending
    corpus id so ranking is total and deterministic.

    Norms are hoisted into the per-side projections: each vector's norm
    is computed once (N + Q fold evaluations) instead of inside every
    pair (3 folds per pair), leaving one dot product per pair in the
    N x Q hot loop.  The norm value is the same IEEE expression either
    way, so results are bit-identical.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_exact(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes from sha256 bits
    (Box-Muller over hash-derived uniforms)."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        i = 0
        while len(vals) < dim:
            d = hashlib.sha256(f"{seed}:{p}:{i}".encode()).digest()
            for off in range(0, 32, 16):
                u1 = (int.from_bytes(d[off : off + 8], "big") + 1) / (2**64 + 2)
                u2 = int.from_bytes(d[off + 8 : off + 16], "big") / (2**64)
                vals.append(
                    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)
                )
            i += 1
        planes.append(vals[:dim])
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit b = sign(vec . plane_b) -> int."""
    bucket = F.lit(0)
    for b, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        pl = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, pl, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def _lsh_buckets_vectorized(
    dim: int, n_planes: int, n_tables: int, seed: int
):
    """All n_tables bucket ids in ONE Arrow-batched matmul.

    The expression form (lsh_bucket x n_tables) evaluates
    n_tables*n_planes interpreted higher-order-function folds per row;
    here a single (batch, dim) @ (dim, n_tables*n_planes) numpy product
    computes every dot at BLAS speed, then sign bits pack into per-table
    bucket ids.  This is the sanctioned Python path: built-ins cannot
    express a batched matmul."""
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplanes(dim, n_planes, seed + 1000 * t)
            for t in range(n_tables)
        ],
        dtype=np.float64,
    )  # (tables, planes, dim)
    mat = planes.reshape(n_tables * n_planes, dim).T  # (dim, T*P)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        dots = m @ mat  # (batch, T*P)
        bits = (dots >= 0).reshape(len(m), n_tables, n_planes)
        ids = (bits * weights).sum(axis=2)  # (batch, tables)
        return pd.Series(list(ids))

    return buckets


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket equi-join, then exact cosine
    rerank within the shared bucket.

    Multi-table LSH: each of ``n_tables`` independent hyperplane sets gets
    its own bucket column; a (query, candidate) pair is considered if it
    collides in ANY table (recall 1-(1-p)^T vs single-table p).  The
    buckets are carried as an array and the table-bucket pairs exploded, so
    the corpus is scanned ONCE regardless of n_tables, and the join stays a
    single shuffle/broadcast equi-join on (table, bucket) — at 100 TB the
    corpus side hash-partitions by that composite key and the exploded
    factor is n_tables, not n_tables scans."""

    buckets = _lsh_buckets_vectorized(dim, n_planes, n_tables, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bkt"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bkt"),
    )
    scored = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a pair colliding in several tables must score once, not T times
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def rp_project(
    vec: Column, dim: int, out_dim: int, seed: int = 7, prefix: str = "d"
) -> list[Column]:
    """Johnson-Lindenstrauss random projection to ``out_dim`` scalar
    columns: ``d_j = <v, r_j>`` with deterministic pseudo-Gaussian
    directions (:func:`_hyperplanes`, sha256 Box-Muller — same generator
    as the LSH planes, different seed).

    The pre-ANN compression step of an embedding pipeline: map-only, no
    shuffle, and the projection matrix is a plan literal — at 100 TB the
    executors never exchange anything, and a (1 +- eps) distance
    guarantee holds with out_dim = O(log n / eps^2).  Each dot uses the
    strict left-to-right fold (:func:`_dot_exact`), so outputs compare
    bit-exactly against a DuckDB ``list_reduce`` oracle.
    """
    planes = _hyperplanes(dim, out_dim, seed)
    return [
        _dot_exact(vec, F.array(*[F.lit(x) for x in plane])).alias(
            f"{prefix}{j:02d}"
        )
        for j, plane in enumerate(planes)
    ]


def quantize_int8(
    vec: Column, scale_out: str = "scale", q_out: str = "q"
) -> list[Column]:
    """Symmetric int8 quantization of a float vector (the storage-side
    operator a 100 TB embedding store runs before indexing: 4x smaller,
    SIMD-dottable).  scale = max |x|; q_i = trunc(x_i / scale * 127).

    Truncation (not rounding) keeps both engines bit-identical — double
    HALF_UP vs HALF_EVEN rounding diverges on exact .5 products, which
    float32-expanded doubles routinely produce.  All-zero vectors keep
    scale 0 and quantize to zeros (no 0/0 NaN).
    """
    x = F.transform(vec, lambda v: F.abs(v.cast("double")))
    scale = F.array_max(x)
    q = F.when(scale == 0, F.transform(vec, lambda v: F.lit(0))).otherwise(
        F.transform(
            vec, lambda v: (v.cast("double") / scale * 127).cast("int")
        )
    )
    return [scale.alias(scale_out), q.alias(q_out)]


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al.): instead of piling on hash
    tables, each query ALSO probes every 1-bit-perturbed bucket — the
    buckets a near neighbour most likely fell into when one hyperplane
    sign flipped.  Recall comparable to many-table LSH at a fraction of
    the corpus-side index: the corpus stores n_tables bucket entries per
    vector (here 2 vs the plain path's 8) while the probe fan-out
    (n_planes+1 buckets/table) rides the tiny query side.  That trade —
    index storage for query-side work — is exactly what a 100 TB
    embedding store wants, since the corpus index dominates cost.

    Plan: same single-scan posexploded bucket join as lsh_cosine_topk;
    only the QUERY side explodes the XOR-perturbation set, so the
    shuffle key stays (table, bucket) and the corpus side is untouched.
    """
    buckets = _lsh_buckets_vectorized(dim, n_planes, n_tables, seed)
    masks = [0] + [1 << b for b in range(n_planes)]
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bkt0"),
        )
        .select(
            "query_id",
            "qv",
            "tbl",
            F.explode(
                F.array(*[F.col("bkt0").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("bkt"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bkt"),
    )
    scored = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def rerank_exact(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine re-rank of an ANN shortlist (FAISS's IndexRefine):
    ``candidates`` is any (query_id, neighbor_id) candidate table — an
    IVFPQ/LSH/PQ shortlist at k' > k — and the output is the exact-cosine
    top-``k`` WITHIN those candidates per query.

    This is the standard recall-repair stage: the compressed index does
    the corpus-scale winnowing (n_sub bytes per vector), then the float
    vectors are fetched for only |Q| * k' candidate rows and scored
    exactly, so ranking errors introduced by quantization are repaired at
    a cost proportional to the shortlist, never the corpus.

    Plan: one equi-join of the shortlist against the corpus on
    neighbor_id (shuffle keyed on the 8-byte id; the corpus side prunes
    to candidate ids via the join), query vectors broadcast, then the
    same hoisted-norm exact-fold cosine and (cosine DESC, id ASC) window
    rank as :func:`cosine_topk` — bit-identical scoring, so the exact
    and re-ranked paths agree wherever they overlap.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        candidates.select("query_id", "neighbor_id")
        .join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_exact(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
