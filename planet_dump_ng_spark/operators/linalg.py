"""Distributed linear algebra over embedding columns: Gram matrix
accumulation and PCA projection.

The Gram matrix X^T X is the workhorse reduction behind PCA, whitening,
ridge regression and linear probes: it is computed as partition-local
d x d partials (one BLAS matmul per Arrow batch) that are summed — the
shuffle moves only d^2 rows per partition, never the data, so the cost
is one scan regardless of row count.  The d x d result is tiny (d is a
model constant, e.g. 64-4096), so the eigendecomposition happens on the
driver with numpy and only the projection matrix is broadcast back.

Oracle exactness: each per-row product is truncated to an integer
(trunc(v_i * v_j * 1e12)) BEFORE summation, making the reduction
associative-exact — the same value DuckDB computes with
SUM(CAST(trunc(a.v * b.v * 1e12) AS BIGINT)) over an unnested pair
join.  float32 -> float64 widening and the float64 product are IEEE
exact (24-bit mantissas), so both engines truncate identical doubles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: fixed-point scale for the associative-exact Gram reduction
GRAM_SCALE = 1e12


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """``(i, j, dot_q)`` for 0 <= i, j < dim: the quantized Gram matrix
    ``sum_rows trunc(v_i * v_j * GRAM_SCALE)`` of the embedding column.

    One mapInPandas pass emits a d x d partial per Arrow batch; the only
    shuffle is the final sum of those partials.
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # quantize each row's outer product, then sum in int64 —
            # associative, so partition boundaries can't change the result
            acc = np.zeros((dim, dim), dtype=np.int64)
            for lo in range(0, len(x), 256):  # bound the n*d*d temporary
                chunk = x[lo : lo + 256]
                outer = np.einsum("ni,nj->nij", chunk, chunk)
                acc += np.trunc(outer * GRAM_SCALE).astype(np.int64).sum(axis=0)
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "part": acc.ravel()}
            )

    parts = df.select(vec_col).mapInPandas(partials, "i int, j int, part long")
    return parts.groupBy("i", "j").agg(F.sum("part").alias("dot_q"))


def pca_components(gram: DataFrame, dim: int, k: int) -> np.ndarray:
    """Top-k eigenvectors (rows) of the quantized Gram matrix.  The
    d x d matrix is collected to the driver — d is a model constant, so
    this is a fixed small transfer independent of data size."""
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram.collect():
        g[r.i, r.j] = r.dot_q / GRAM_SCALE
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # deterministic sign: make each component's largest-|.| entry positive
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps


def project(df: DataFrame, vec_col: str, components: np.ndarray) -> DataFrame:
    """Project each embedding onto the given components (k x d), appending
    an ``array<double>`` column ``proj``.  The component matrix rides
    along as a literal (broadcast with the plan); the projection itself
    is a JVM-side aggregate fold — no Python in the per-row path."""
    k, d = components.shape
    comp_lit = F.array(
        *[
            F.array(*[F.lit(float(components[c, i])) for i in range(d)])
            for c in range(k)
        ]
    )
    return df.withColumn(
        "proj",
        F.transform(
            comp_lit,
            lambda comp: F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"),
                    comp,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )
