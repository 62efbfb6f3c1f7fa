"""IVF (inverted-file) approximate nearest neighbour: the second scale
path for similarity search next to hyperplane LSH.

Pipeline: train a coarse quantizer (mini distributed k-means, Lloyd
rounds as DataFrame ops — the engine's second iterative algorithm next
to connected components), assign every corpus vector to its nearest
centroid cell, then answer queries by probing only the ``n_probe``
closest cells and reranking with the exact deterministic cosine.

Scale notes: centroids are tiny (n_cells x dim) and ride a broadcast;
assignment is map-only; the probe join is an equi-join on cell id, so
the corpus shuffles once by cell and queries touch
n_probe/n_cells of it — the classic IVF cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from planet_dump_ng_spark.operators.similarity import cosine


def _nearest_centroid(vec, centroids: list[tuple[int, list[float]]]):
    """Expression: argmin over centroids of squared L2 distance (exact
    arithmetic on broadcast literals).  Ties break on the lower cell id
    via the (dist, cell) struct min."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(cid).alias("cell"),
            )
            for cid, c in centroids
        ]
    )
    return F.array_min(scored)["cell"]


def train_kmeans(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 8,
    n_rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Lloyd iterations as DataFrame jobs.

    Deterministic init: the ``n_cells`` corpus vectors with the smallest
    xxhash64(id) (a seeded pseudo-random but reproducible sample).  Each
    round: assign to nearest centroid (map-only vs broadcast literals),
    recompute exact means per cell (1e-12-truncated integer sums, the
    engine-stable quantization), collect the tiny centroid table.  Empty
    cells keep their previous centroid.
    """
    seeds = (
        corpus.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h", id_col)
        .limit(n_cells)
        .collect()
    )
    centroids = [
        (i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)
    ]
    for _ in range(n_rounds):
        assigned = corpus.select(
            vec_col, _nearest_centroid(F.col(vec_col), centroids).alias("cell")
        )
        means = (
            assigned.select(
                "cell", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(
                (
                    F.sum((F.col("val").cast("double") * 1e12).cast("long"))
                    .cast("double")
                    / F.lit(1e12)
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()
        )
        new = dict(centroids)
        for r in means:
            new[r["cell"]] = [float(x) for x in r["centroid"]]
        centroids = sorted(new.items())
    return centroids


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the ``n_probe`` nearest cells per query,
    exact-cosine rerank inside them."""
    centroids = train_kmeans(corpus, dim, n_cells, vec_col=vec_col, id_col=id_col)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cell"),
    )
    # per query: the n_probe closest cells by centroid distance
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(x) for x in cvec]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(cid).alias("cell"),
            )
            for cid, cvec in centroids
        ]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            F.transform(F.slice(F.array_sort(dists), 1, n_probe), lambda s: s["cell"])
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
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


def assign_cells(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 8,
    n_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cell) assignment under the trained coarse quantizer —
    the IVF building block shared by the ANN probe path and semantic
    dedup.  Map-only against broadcast centroid literals."""
    centroids = train_kmeans(
        corpus, dim, n_cells, n_rounds, vec_col=vec_col, id_col=id_col
    )
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cell"),
    )


def semantic_dedup(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: cluster embeddings with
    the IVF coarse quantizer, then inside each cell mark every vector
    that has a lower-id neighbour with cosine >= threshold as a
    duplicate (the kept vector of each near-dup group is the lowest
    id — deterministic canonical election without a components pass).

    Scale shape: the k-means is the usual broadcast-Lloyd loop; the
    candidate pair space is blocked by cell (sum of squared cell sizes,
    not corpus^2) via one equi-join on the cell id; the final verdict
    is one per-vector aggregate.  At 100 TB the cell count rises to
    keep cells bounded and AQE splits any skewed mega-cell.
    """
    a = assign_cells(
        corpus, dim, n_cells, id_col=id_col, vec_col=vec_col
    ).persist()
    from planet_dump_ng_spark.operators.similarity import cosine

    b = a.select(
        F.col("vec_id").alias("nid"), F.col("v").alias("nv"), "cell"
    )
    close_lower = (
        a.join(b, "cell")
        .filter(F.col("nid") < F.col("vec_id"))
        .filter(cosine(F.col("v"), F.col("nv")) >= threshold)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_close_lower"))
    )
    out = (
        a.join(close_lower, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce("n_close_lower", F.lit(0)).alias("n_close_lower"),
            F.col("n_close_lower").isNull().alias("kept"),
        )
        .persist()
    )
    out.count()
    a.unpersist()
    return out
