"""Iterative graph operators: connected components by min-label
propagation (the dup-cluster builder a dedup pipeline runs after pair
generation).

This is the engine's iterative-algorithm pattern: a driver-side loop over
DataFrame transformations with a convergence check per round — Pregel
shape, no RDDs.  Each round is one shuffle (join on edge endpoints +
min-aggregate); rounds needed = graph diameter, which for near-dup
clusters is tiny.  State stays distributed; only the scalar
changed-count reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Assign each node min(reachable node id) as its component label.

    nodes: one column ``id_col``; edges: ``src_col``/``dst_col``
    (undirected — symmetrized internally).  Converges in O(diameter)
    rounds; raises if ``max_iter`` rounds don't reach a fixpoint.
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("lab"))
    persisted_prev: DataFrame | None = None
    for _ in range(max_iter):
        # candidate label per node: min over own label and neighbours' labels
        nbr = (
            sym.join(labels, sym.v == labels.id)
            .select(F.col("u").alias("id"), "lab")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("lab").alias("lab"))
            .persist()  # cut the lineage: each round builds on materialized state
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        if persisted_prev is not None:
            persisted_prev.unpersist()
        persisted_prev = new_labels
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("lab").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
