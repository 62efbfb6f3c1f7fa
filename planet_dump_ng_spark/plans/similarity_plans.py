"""Similarity-search queries over ``embeddings`` (array<float>).

All fully oracle-checked: the brute-force top-k against the identical
decimal-exact cosine, the LSH variant against its deterministic
hyperplanes embedded as SQL literals, IVF against unrolled Lloyd-round
CTEs; recall vs the exact baseline is pinned in tests/test_similarity.py."""

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


def _lsh_oracle(dim: int = 64, k: int = 5, n_planes: int = 8, n_tables: int = 8,
                seed: int = 42) -> str:
    """DuckDB replica of the multi-table hyperplane-LSH ANN.

    The hyperplanes are deterministic (sha256 Box-Muller,
    operators.similarity._hyperplanes), so they embed as
    '<repr>'::DOUBLE literals (string-parse, which IS correctly rounded
    — a bare decimal literal would be DECIMAL-typed and DuckDB's
    DECIMAL->DOUBLE cast shifts the last ulp).  Only the SIGN of each
    (vector, plane) dot matters for bucketing: the BLAS matmul in the
    pandas UDF and DuckDB's left-to-right fold can still round
    differently in the last ulp, but a sign flip needs |dot| below the
    rounding difference (~1e-15 of operand scale) — not observed at any
    test SF, and the exact-cosine rerank after the bucket join uses the
    strict fold that is bit-identical across engines.
    """
    from planet_dump_ng_spark.operators.similarity import _hyperplanes

    def dot(vec: str, plane: list[float]) -> str:
        lits = ", ".join(f"'{x!r}'::DOUBLE" for x in plane)
        return (
            f"list_reduce(list_prepend(0.0, list_transform("
            f"list_zip({vec}, [{lits}]), p -> p[1] * p[2])), (acc, x) -> acc + x)"
        )

    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        terms = " + ".join(
            f"(CASE WHEN {dot('v', planes[b])} >= 0 THEN {1 << b} ELSE 0 END)"
            for b in range(n_planes)
        )
        buckets.append(f"({terms})")
    bks = "[" + ", ".join(buckets) + "]"
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bk AS MATERIALIZED (SELECT vec_id, v, {bks} AS bks FROM emb),
    tb AS (SELECT vec_id, v, t.tb AS tbl, bks[t.tb + 1] AS bkt
           FROM bk, (SELECT unnest(range(0, {n_tables})) AS tb) t),
    cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
             FROM tb q JOIN tb c ON q.tbl = c.tbl AND q.bkt = c.bkt
             WHERE q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             {_DOT.format(a='q.v', b='c.v')}
               / (sqrt({_DOT.format(a='q.v', b='q.v')})
                  * sqrt({_DOT.format(a='c.v', b='c.v')})) AS cosine
      FROM cand
      JOIN bk q ON q.vec_id = cand.query_id
      JOIN bk c ON c.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "ann_lsh_topk",
    _lsh_oracle(),
    doc="Hyperplane-LSH bucketed cosine top-5 (the 100 TB scale path); "
    "oracle replays the deterministic hyperplane buckets as SQL literals.",
    tags=("similarity",),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.lsh_cosine_topk(emb, queries, dim=64, k=5, n_planes=8)


_IVF_DIST = (
    "list_reduce(list_prepend(0.0, list_transform("
    "list_zip({v}, {c}), p -> (p[1] - p[2]) * (p[1] - p[2]))),"
    " (acc, x) -> acc + x)"
)


def _ivf_cte_prefix(dim: int = 64, n_cells: int = 8, n_rounds: int = 3,
                    vec_sql: str = "embedding::DOUBLE[]", p: str = "",
                    from_sql: str = "embeddings") -> tuple[str, str]:
    """(CTE prefix, final-centroid CTE name) for the unrolled Lloyd
    rounds — shared by the IVF ANN oracle and the semantic-dedup
    oracle.  The prefix defines ``{p}emb(vec_id, v)`` plus centroid
    tables ``{p}c0..cN``; callers append their own assignment/probe
    CTEs.  ``vec_sql``/``p`` parameterize the vector expression and a
    CTE name prefix so several independent quantizers (the PQ
    subspaces) can coexist in one query; ``from_sql`` points the input
    at another CTE (the IVFPQ residual table) instead of embeddings.

    Every stage is engine-deterministic by construction: the k-means init
    orders by Spark's xxhash64(vec_id) (hashLong replica), assignments
    break distance ties on the lower cell id, and the per-cell means use
    the 1e-12-truncated integer-sum quantization — so the unrolled
    rounds land on bit-identical centroids in both engines."""
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    dist = _IVF_DIST
    rounds = []
    for r in range(n_rounds):
        prev, cur = f"{p}c{r}", f"{p}c{r + 1}"
        rounds.append(f"""
    {p}a{r} AS (SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
        FROM {p}emb e, {prev} c) WHERE rn = 1),
    {p}m{r} AS (SELECT cell, pos,
                    CAST(SUM(CAST(trunc(v[pos] * 1e12) AS BIGINT)) AS DOUBLE)
                      / 1e12 / COUNT(*) AS m
             FROM {p}a{r}, (SELECT unnest(range(1, {dim + 1})) AS pos)
             GROUP BY cell, pos),
    {p}g{r} AS (SELECT cell, list(m ORDER BY pos) AS centroid
                FROM {p}m{r} GROUP BY cell),
    {cur} AS (SELECT p.cell, COALESCE(g.centroid, p.centroid) AS centroid
              FROM {prev} p LEFT JOIN {p}g{r} g USING (cell))""")
    final = f"{p}c{n_rounds}"
    prefix = f"""
    {p}emb AS MATERIALIZED (SELECT vec_id, {vec_sql} AS v FROM {from_sql}),
    {p}seeds AS (SELECT vec_id, v, ROW_NUMBER() OVER (
                ORDER BY {xxh64_long_inline('vec_id')}, vec_id) AS rn
                 FROM {p}emb),
    {p}c0 AS (SELECT CAST(rn - 1 AS INT) AS cell, v AS centroid
           FROM {p}seeds WHERE rn <= {n_cells}),
    {','.join(rounds)}"""
    return prefix, final


def _ivf_oracle(dim: int = 64, k: int = 5, n_cells: int = 8, n_probe: int = 3,
                n_rounds: int = 3) -> str:
    """DuckDB replica of the IVF ANN pipeline (operators.ivf): the
    shared Lloyd-round prefix plus probe/rerank CTEs; the exact-cosine
    rerank matches the strict left-to-right fold."""
    dist = _IVF_DIST
    prefix, final = _ivf_cte_prefix(dim, n_cells, n_rounds)
    return f"""
    WITH {prefix},
    corpus AS (SELECT vec_id AS neighbor_id, v AS cv, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
        FROM emb e, {final} c) WHERE rn = 1),
    probes AS (SELECT query_id, qv, cell FROM (
        SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
        FROM emb e, {final} c WHERE e.vec_id % 100 = 0) WHERE rn <= {n_probe}),
    scored AS (
      SELECT p.query_id, c.neighbor_id,
             {_DOT.format(a='p.qv', b='c.cv')}
               / (sqrt({_DOT.format(a='p.qv', b='p.qv')})
                  * sqrt({_DOT.format(a='c.cv', b='c.cv')})) AS cosine
      FROM corpus c JOIN probes p USING (cell)
      WHERE c.neighbor_id <> p.query_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "ann_ivf_topk",
    _ivf_oracle(),
    doc="IVF cosine top-5: mini k-means coarse quantizer, n_probe nearest "
    "cells per query, exact rerank (the second ANN scale path); oracle "
    "unrolls the deterministic Lloyd rounds as CTEs.",
    tags=("similarity", "iterative"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import ivf_cosine_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_cosine_topk(emb, queries, dim=64, k=5, n_cells=8, n_probe=3)


def _rp_oracle(dim: int = 64, out_dim: int = 16, seed: int = 7) -> str:
    """JL projection replica: one strict-fold dot per output dim, the
    deterministic directions embedded as float literals (same pattern as
    the LSH hyperplane oracle)."""
    from planet_dump_ng_spark.operators.similarity import _hyperplanes

    cols = []
    for j, plane in enumerate(_hyperplanes(dim, out_dim, seed)):
        # '<repr>'::DOUBLE, not a bare numeric literal: DuckDB types bare
        # decimals as DECIMAL(p,s) and its DECIMAL->DOUBLE cast is not
        # correctly rounded (int128 / 10^s in double arithmetic), which
        # shifts ~1-ulp on a fifth of the values; the VARCHAR->DOUBLE
        # parse IS correctly rounded and matches Spark's F.lit exactly.
        lits = ", ".join(f"'{x!r}'::DOUBLE" for x in plane)
        cols.append(
            f"list_reduce(list_prepend(0.0, list_transform("
            f"list_zip(embedding::DOUBLE[], [{lits}]), p -> p[1] * p[2])),"
            f" (acc, x) -> acc + x) AS d{j:02d}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


@register(
    "embedding_rp_project",
    _rp_oracle(),
    doc="Johnson-Lindenstrauss random projection 64 -> 16 dims "
    "(operators.similarity.rp_project): map-only, zero shuffle, the "
    "projection matrix is a plan literal broadcast inside the codegen'd "
    "expression — the pre-ANN compression step (distances preserved "
    "within 1 +- eps at out_dim = O(log n / eps^2)).  Each output dim "
    "is a strict left-to-right fold, bit-identical to the DuckDB "
    "list_reduce oracle.",
    tags=("similarity",),
)
def embedding_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", *sim.rp_project(F.col("embedding"), dim=64, out_dim=16, seed=7)
    )


#: single source of truth for the recall evaluations' cutoff — the
#: denominator, the index top-k calls, and the oracle template all read
#: it, so tuning k cannot desynchronize them (the column name stays
#: recall_at_5 and is asserted against the constant).
_RECALL_K = 5
assert _RECALL_K == 5, "rename recall_at_5 columns when changing the cutoff"


def _recall_oracle(index_sql: str, k: int = _RECALL_K) -> str:
    return f"""
    SELECT ex.query_id,
           COUNT(l.neighbor_id) AS n_hit,
           CAST(COUNT(l.neighbor_id) AS DOUBLE) / {k} AS recall_at_5
    FROM ({_ORACLE}) ex
    LEFT JOIN ({index_sql}) l
      ON ex.query_id = l.query_id AND ex.neighbor_id = l.neighbor_id
    GROUP BY ex.query_id
    """


def _recall_vs_exact(
    emb: DataFrame, queries: DataFrame, index_df: DataFrame, k: int = _RECALL_K
) -> DataFrame:
    """recall@k of an ANN index result against exact brute-force top-k:
    left join on (query, neighbor), count the non-null hits."""
    exact = sim.cosine_topk(emb, queries, k=k).select("query_id", "neighbor_id")
    idx = index_df.select(
        F.col("query_id").alias("qid"), F.col("neighbor_id").alias("nid")
    )
    j = exact.join(
        idx, (exact.query_id == idx.qid) & (exact.neighbor_id == idx.nid), "left"
    )
    return j.groupBy("query_id").agg(
        F.count("nid").alias("n_hit"),
        (F.count("nid").cast("double") / F.lit(float(k))).alias("recall_at_5"),
    )


@register(
    "ann_lsh_recall",
    _recall_oracle(_lsh_oracle()),
    doc="ANN quality evaluation: recall@5 of the hyperplane-LSH index "
    "against the exact brute-force top-5, per query vector — the eval "
    "metric an embedding-store rollout watches when tuning "
    "n_planes/n_tables.  Composes the two (independently hash-green, "
    "deterministically tie-broken) top-k plans with a left join + "
    "count(non-null); recall is a ratio of small ints, so it compares "
    "exactly across engines.  At scale both sides are the already-"
    "materialized index outputs, so the metric costs one key-keyed "
    "join + one per-query count.",
    tags=("similarity", "eval"),
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    lsh = sim.lsh_cosine_topk(emb, queries, dim=64, k=_RECALL_K, n_planes=8)
    return _recall_vs_exact(emb, queries, lsh)


@register(
    "ann_ivf_recall",
    _recall_oracle(_ivf_oracle()),
    doc="ANN quality evaluation for the IVF path: recall@5 of the "
    "n_probe=3 k-means index against exact brute-force top-5 per query "
    "(same composition as ann_lsh_recall — the n_cells/n_probe tuning "
    "signal).",
    tags=("similarity", "eval", "iterative"),
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import ivf_cosine_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ivf = ivf_cosine_topk(
        emb, queries, dim=64, k=_RECALL_K, n_cells=8, n_probe=3
    )
    return _recall_vs_exact(emb, queries, ivf)


@register(
    "embedding_quantize_int8",
    """
    SELECT vec_id, scale,
           array_to_string(
             CASE WHEN scale = 0
                  THEN list_transform(embedding::DOUBLE[], x -> 0)
                  ELSE list_transform(embedding::DOUBLE[],
                                      x -> CAST(trunc(x / scale * 127) AS INT))
             END, ',') AS q
    FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
          FROM embeddings)
    """,
    doc="Symmetric int8 embedding quantization (trunc keeps engines "
    "bit-identical; see operators.similarity.quantize_int8): the "
    "storage-side compaction step before ANN indexing at scale.  The "
    "int8 vector is emitted comma-joined so the output is driver-hashable "
    "(the operator itself keeps the array form).",
    tags=("similarity",),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.similarity import quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", *quantize_int8(F.col("embedding"))).select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform("q", lambda x: x.cast("string")), ","
        ).alias("q"),
    )


def _semantic_dedup_oracle(dim: int = 64, n_cells: int = 8,
                           threshold: float = 0.35) -> str:
    """Semantic-dedup replica of the SCALED operator path
    (operators.ivf.semantic_dedup with derived knobs): bounded
    training sample (smallest xxhash64, the Spark replica), TWO Lloyd
    prefixes over the sample (fine cells + k1 = ceil(sqrt(n_cells))
    super cells), the fine->super nearest map, the two-stage
    super-then-fine assignment argmin, then the cell-blocked lower-id
    pair count and left join back.  Every argmin orders by (exact-fold
    dist, lower id), matching the numpy kernels bit-for-bit."""
    from planet_dump_ng_spark.operators.ivf import (
        TRAIN_ROWS_PER_CELL,
        derive_super_cells,
    )
    from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_long_inline

    k1 = derive_super_cells(n_cells)
    cap = TRAIN_ROWS_PER_CELL * n_cells
    dist = _IVF_DIST
    fprefix, ffinal = _ivf_cte_prefix(
        dim, n_cells, vec_sql="v", p="f_", from_sql="tr"
    )
    sprefix, sfinal = _ivf_cte_prefix(
        dim, k1, vec_sql="v", p="s_", from_sql="tr"
    )
    cos = (
        f"{_DOT.format(a='a.v', b='b.v')}"
        f" / (sqrt({_DOT.format(a='a.v', b='a.v')})"
        f" * sqrt({_DOT.format(a='b.v', b='b.v')}))"
    )
    na = _DOT.format(a='a.v', b='a.v')
    nb = _DOT.format(a='b.v', b='b.v')
    return f"""
    WITH emb AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    tr AS MATERIALIZED (SELECT vec_id, v FROM (
        SELECT vec_id, v, ROW_NUMBER() OVER (
            ORDER BY {xxh64_long_inline('vec_id')}, vec_id) AS rn
        FROM emb) WHERE rn <= {cap}),
    {fprefix},
    {sprefix},
    fmap AS (SELECT fcell, scell FROM (
        SELECT f.cell AS fcell, s.cell AS scell,
               ROW_NUMBER() OVER (PARTITION BY f.cell
                 ORDER BY {dist.format(v='f.centroid', c='s.centroid')}, s.cell) AS rn
        FROM {ffinal} f, {sfinal} s) WHERE rn = 1),
    asup AS (SELECT vec_id, v, scell FROM (
        SELECT e.vec_id, e.v, s.cell AS scell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='s.centroid')}, s.cell) AS rn
        FROM emb e, {sfinal} s
        WHERE s.cell IN (SELECT scell FROM fmap)) WHERE rn = 1),
    assign AS (SELECT vec_id, v, cell FROM (
        SELECT a.vec_id, a.v, m.fcell AS cell,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {dist.format(v='a.v', c='f.centroid')}, m.fcell) AS rn
        FROM asup a JOIN fmap m ON m.scell = a.scell
        JOIN {ffinal} f ON f.cell = m.fcell) WHERE rn = 1),
    cl AS (SELECT a.vec_id, COUNT(*) AS n_close_lower
           FROM assign a JOIN assign b
             ON a.cell = b.cell AND b.vec_id < a.vec_id
           WHERE {na} > 0 AND {nb} > 0 AND {cos} >= {threshold!r}
           GROUP BY a.vec_id)
    SELECT a.vec_id, a.cell,
           COALESCE(cl.n_close_lower, 0) AS n_close_lower,
           cl.vec_id IS NULL AS kept
    FROM assign a LEFT JOIN cl USING (vec_id)
    """


def _oracle_n_cells() -> int:
    """The cell count ``semantic_dedup`` will DERIVE on the oracle
    dataset: the driver's gate runs at sf0.01, so read that table's
    parquet row count (metadata only — no scan) and push it through the
    same :func:`~planet_dump_ng_spark.operators.ivf.derive_n_cells` the
    operator uses.  Both sides of the correctness gate therefore
    parameterize on the SAME corpus-derived count; the fallback (table
    unreadable at import time) is the derivation's floor."""
    from planet_dump_ng_spark.operators.ivf import (
        SEMANTIC_MIN_CELLS,
        derive_n_cells,
    )

    try:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(
            "/root/testdata/sf0.01/embeddings.parquet"
        ).metadata.num_rows
    except Exception:
        return SEMANTIC_MIN_CELLS
    return derive_n_cells(n)


@register(
    "dedup_semantic_ivf",
    _semantic_dedup_oracle(n_cells=_oracle_n_cells()),
    doc="SemDeDup-shaped semantic deduplication "
    "(operators.ivf.semantic_dedup): embeddings cluster under the IVF "
    "coarse quantizer (deterministic Lloyd rounds), then inside each "
    "cell every vector with a lower-id neighbour at cosine >= 0.35 is "
    "marked duplicate — the kept member of each near-dup group is the "
    "lowest id, elected without a connected-components pass.  The pair "
    "space is cell-blocked (sum of squared cell sizes, the SemDeDup "
    "cost model), the verdict is one per-vector count + left join, and "
    "the cell count is DERIVED from the corpus row count "
    "(derive_n_cells: ceil(n/250), floor 8) so mean cell size — and "
    "with it total pair work per row — stays bounded with no hand-tuned "
    "knob while AQE splits skewed mega-cells.  Oracle unrolls the same "
    "Lloyd rounds as the IVF ANN oracle (shared CTE prefix) with the "
    "same derived cell count and replays the exact-fold cosine, so "
    "both engines agree bit-for-bit.",
    tags=("dedup", "similarity", "iterative", "bench"),
)
def dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import semantic_dedup

    emb = table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, dim=64, threshold=0.35)


def _pq_oracle(dim: int = 64, n_sub: int = 4, n_cells: int = 8,
               n_rounds: int = 2) -> str:
    """PQ replica: one parameterized Lloyd-prefix per subspace (prefixed
    CTE names), per-subspace min-distance assignment, id-merged codes
    and the left-assoc error sum."""
    sub_dim = dim // n_sub
    dist = _IVF_DIST
    prefixes, assigns = [], []
    for s in range(n_sub):
        p = f"s{s}_"
        vec_sql = f"(embedding::DOUBLE[])[{s * sub_dim + 1}:{(s + 1) * sub_dim}]"
        prefix, final = _ivf_cte_prefix(
            sub_dim, n_cells, n_rounds, vec_sql=vec_sql, p=p
        )
        prefixes.append(prefix)
        assigns.append(f"""
    {p}asg AS (SELECT vec_id, CAST(cell AS INT) AS code{s}, d AS d{s} FROM (
        SELECT e.vec_id, c.cell,
               {dist.format(v='e.v', c='c.centroid')} AS d,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
        FROM {p}emb e, {final} c) WHERE rn = 1)""")
    joins = " ".join(f"JOIN s{s}_asg USING (vec_id)" for s in range(1, n_sub))
    codes = ", ".join(f"code{s}" for s in range(n_sub))
    err = " + ".join(f"d{s}" for s in range(n_sub))
    return f"""
    WITH {','.join(prefixes)},
    {','.join(assigns)}
    SELECT vec_id, {codes}, {err} AS recon_err
    FROM s0_asg {joins}
    """


@register(
    "embedding_pq_codes",
    _pq_oracle(),
    doc="Product quantization (operators.ivf.pq_encode): 64 dims -> 4 "
    "independent 16-dim subspace codebooks (k=8, two Lloyd rounds "
    "each) -> 4 codes + reconstruction error per vector — the third "
    "ANN compression next to int8 quantization and the JL projection "
    "(dim floats become n_sub bytes; asymmetric-distance queries "
    "answer from codebook lookup tables).  Subspace codebooks train "
    "independently off one cached corpus scan; encoding is n_sub "
    "broadcast joins merged on the id.  Oracle instantiates the "
    "parameterized Lloyd CTE prefix once per subspace (prefixed "
    "names) and replays the assignment and the left-assoc error sum "
    "bit-for-bit.",
    tags=("similarity", "iterative"),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import pq_encode

    emb = table(spark, sf_dir, "embeddings")
    return pq_encode(emb, dim=64, n_sub=4, n_cells=8, n_rounds=2)


def _pq_adc_oracle(dim: int = 64, n_sub: int = 4, n_cells: int = 8,
                   n_rounds: int = 2, k: int = 5) -> str:
    """ADC replica on top of the PQ chains: per-subspace query LUTs from
    the same prefixed centroid tables, code-keyed joins, left-assoc
    distance sum, per-query rank."""
    sub_dim = dim // n_sub
    dist = _IVF_DIST
    prefixes, assigns, luts = [], [], []
    for s in range(n_sub):
        p = f"s{s}_"
        vec_sql = f"(embedding::DOUBLE[])[{s * sub_dim + 1}:{(s + 1) * sub_dim}]"
        prefix, final = _ivf_cte_prefix(
            sub_dim, n_cells, n_rounds, vec_sql=vec_sql, p=p
        )
        prefixes.append(prefix)
        assigns.append(f"""
    {p}asg AS (SELECT vec_id, CAST(cell AS INT) AS code{s} FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
        FROM {p}emb e, {final} c) WHERE rn = 1)""")
        luts.append(f"""
    l{s} AS (SELECT q.vec_id AS query_id, CAST(c.cell AS INT) AS code{s},
                    {dist.format(v='q.v', c='c.centroid')} AS d{s}
             FROM {p}emb q, {final} c WHERE q.vec_id % 100 = 0)""")
    code_joins = " ".join(
        f"JOIN s{s}_asg USING (vec_id)" for s in range(1, n_sub)
    )
    lut_joins = " ".join(
        f"JOIN l{s} ON l{s}.query_id = l0.query_id"
        f" AND l{s}.code{s} = codes.code{s}"
        for s in range(1, n_sub)
    )
    codes_cols = ", ".join(f"code{s}" for s in range(n_sub))
    err = " + ".join(f"d{s}" for s in range(n_sub))
    return f"""
    WITH {','.join(prefixes)},
    {','.join(assigns)},
    codes AS (SELECT vec_id, {codes_cols} FROM s0_asg {code_joins}),
    {','.join(luts)}
    SELECT query_id, neighbor_id, rank, adc_dist FROM (
      SELECT l0.query_id, codes.vec_id AS neighbor_id,
             {err} AS adc_dist,
             ROW_NUMBER() OVER (PARTITION BY l0.query_id
               ORDER BY {err}, codes.vec_id) AS rank
      FROM codes
      JOIN l0 ON l0.code0 = codes.code0
      {lut_joins}
      WHERE codes.vec_id <> l0.query_id)
    WHERE rank <= {k}
    """


@register(
    "ann_pq_adc_topk",
    _pq_adc_oracle(),
    doc="PQ asymmetric-distance top-5 (operators.ivf.pq_adc_topk): the "
    "query path product quantization exists for — per-query lookup "
    "tables of sub-distances to each codebook centroid (tiny, "
    "broadcast), approximate distance = sum of n_sub LUT lookups "
    "keyed by the STORED CODES, so the corpus scan touches n_sub "
    "bytes per vector, never the floats.  Completes the ANN family "
    "(brute / LSH / IVF / PQ-ADC).  Oracle reuses the per-subspace "
    "Lloyd chains plus LUT CTEs; left-assoc distance sums and "
    "(dist, id) tie-breaks keep both engines bit-identical.",
    tags=("similarity", "iterative"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import pq_adc_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return pq_adc_topk(emb, queries, dim=64, k=5, n_sub=4, n_cells=8)


@register(
    "ann_pq_recall",
    _recall_oracle(_pq_adc_oracle()),
    doc="ANN quality evaluation for the PQ-ADC path: recall@5 of the "
    "codes-only asymmetric-distance index against exact brute-force "
    "top-5 per query — the compression-vs-quality tuning signal "
    "(n_sub/n_cells), same composition as ann_lsh_recall and "
    "ann_ivf_recall.",
    tags=("similarity", "eval", "iterative"),
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import pq_adc_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    pq = pq_adc_topk(emb, queries, dim=64, k=_RECALL_K, n_sub=4, n_cells=8)
    return _recall_vs_exact(emb, queries, pq)


def _ivfpq_oracle(dim: int = 64, n_cells: int = 8, coarse_rounds: int = 2,
                  n_sub: int = 4, pq_cells: int = 8, pq_rounds: int = 2,
                  n_probe: int = 2, k: int = 5) -> str:
    """IVFPQ replica: coarse Lloyd prefix -> residual CTE -> one PQ Lloyd
    prefix per subspace trained FROM the residual CTE (the from_sql
    parameterization) -> code assignment, probe selection, residual
    LUTs, rank."""
    sub_dim = dim // n_sub
    dist = _IVF_DIST
    cprefix, cfinal = _ivf_cte_prefix(dim, n_cells, coarse_rounds, p="cq_")
    prefixes, assigns, luts = [], [], []
    for s in range(n_sub):
        p = f"s{s}_"
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        prefix, final = _ivf_cte_prefix(
            sub_dim, pq_cells, pq_rounds,
            vec_sql=f"rv[{lo}:{hi}]", p=p, from_sql="resid",
        )
        prefixes.append(prefix)
        assigns.append(f"""
    {p}asg AS (SELECT vec_id, CAST(cell AS INT) AS code{s} FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
        FROM {p}emb e, {final} c) WHERE rn = 1)""")
        luts.append(f"""
    l{s} AS (SELECT q.query_id, q.cell, CAST(c.cell AS INT) AS code{s},
                    {dist.format(v=f'q.qres[{lo}:{hi}]', c='c.centroid')} AS d{s}
             FROM qp q, {final} c)""")
    code_joins = " ".join(
        f"JOIN s{s}_asg USING (vec_id)" for s in range(n_sub)
    )
    codes_cols = ", ".join(f"code{s}" for s in range(n_sub))
    lut_joins = " ".join(
        f"JOIN l{s} ON l{s}.query_id = l0.query_id"
        f" AND l{s}.cell = codes.cell AND l{s}.code{s} = codes.code{s}"
        for s in range(1, n_sub)
    )
    err = " + ".join(f"d{s}" for s in range(n_sub))
    return f"""
    WITH {cprefix},
    cq_asg AS (SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
        FROM cq_emb e, {cfinal} c) WHERE rn = 1),
    resid AS MATERIALIZED (SELECT a.vec_id, a.cell,
        list_transform(range(1, {dim + 1}), i -> a.v[i] - c.centroid[i]) AS rv
        FROM cq_asg a JOIN {cfinal} c USING (cell)),
    {','.join(prefixes)},
    {','.join(assigns)},
    codes AS (SELECT r.vec_id, r.cell, {codes_cols}
              FROM resid r {code_joins}),
    qp AS MATERIALIZED (SELECT query_id, cell,
        list_transform(range(1, {dim + 1}), i -> qv[i] - centroid[i]) AS qres
        FROM (SELECT e.vec_id AS query_id, e.v AS qv, c.cell, c.centroid,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {dist.format(v='e.v', c='c.centroid')}, c.cell) AS rn
              FROM cq_emb e, {cfinal} c WHERE e.vec_id % 100 = 0)
        WHERE rn <= {n_probe}),
    {','.join(luts)}
    SELECT query_id, neighbor_id, rank, adc_dist FROM (
      SELECT l0.query_id, codes.vec_id AS neighbor_id,
             {err} AS adc_dist,
             ROW_NUMBER() OVER (PARTITION BY l0.query_id
               ORDER BY {err}, codes.vec_id) AS rank
      FROM codes
      JOIN l0 ON l0.cell = codes.cell AND l0.code0 = codes.code0
      {lut_joins}
      WHERE codes.vec_id <> l0.query_id)
    WHERE rank <= {k}
    """


@register(
    "ann_ivfpq_topk",
    _ivfpq_oracle(),
    doc="IVF+PQ asymmetric-distance top-5 (operators.ivf.ivfpq_adc_topk) "
    "— the COMPOSED index (FAISS IVFADC): coarse quantizer routes "
    "vectors to cells, product quantization encodes the RESIDUAL "
    "(vector minus coarse centroid — better-centered than raw "
    "vectors, which is why real systems compose the two), queries "
    "probe the 2 nearest cells and rank candidates by summed "
    "residual-LUT lookups.  Candidate scan per query = n_probe/"
    "n_cells of the code table at n_sub bytes/vector; every LUT is "
    "broadcast-tiny.  Oracle chains the coarse Lloyd prefix, a "
    "residual CTE, and four PQ Lloyd prefixes trained FROM that "
    "residual CTE (the from_sql parameterization) — ten unrolled "
    "k-means chains in one hash-exact query.",
    tags=("similarity", "iterative"),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import ivfpq_adc_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivfpq_adc_topk(
        emb, queries, dim=64, k=5, n_cells=8, coarse_rounds=2,
        n_sub=4, pq_cells=8, pq_rounds=2, n_probe=2,
    )


@register(
    "ann_ivfpq_recall",
    _recall_oracle(_ivfpq_oracle()),
    doc="ANN quality evaluation for the composed IVFPQ index: recall@5 "
    "against exact brute-force top-5 per query — the metric that "
    "exposes the compression-plus-probe quality tradeoff (n_probe x "
    "n_sub x pq_cells) that neither parent eval (ann_ivf_recall, "
    "ann_pq_recall) captures alone.",
    tags=("similarity", "eval", "iterative"),
)
def ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.ivf import ivfpq_adc_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = ivfpq_adc_topk(
        emb, queries, dim=64, k=_RECALL_K, n_cells=8, coarse_rounds=2,
        n_sub=4, pq_cells=8, pq_rounds=2, n_probe=2,
    )
    return _recall_vs_exact(emb, queries, idx)


def _matryoshka_oracle(sub: int = 16, k: int = 5) -> str:
    """Brute-force cosine top-k over the FIRST ``sub`` dims only."""
    sl = f"(embedding::DOUBLE[])[1:{sub}]"
    return f"""
    WITH q AS (SELECT vec_id AS query_id, {sl} AS qv
               FROM embeddings WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS neighbor_id, {sl} AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             {_DOT.format(a='qv', b='cv')}
               / (sqrt({_DOT.format(a='qv', b='qv')})
                  * sqrt({_DOT.format(a='cv', b='cv')})) AS cosine
      FROM q, c WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "ann_matryoshka_recall",
    _recall_oracle(_matryoshka_oracle()),
    doc="Matryoshka-truncation retrieval eval: recall@5 of brute-force "
    "cosine over ONLY the first 16 of 64 dims against the full-width "
    "exact top-5 — the MRL (matryoshka representation learning) "
    "question 'how much retrieval quality do truncated prefixes keep', "
    "which decides whether a store can serve 4x-smaller vectors.  "
    "Fourth compression eval beside int8 / JL projection / PQ; same "
    "deterministic recall composition as the other ann_*_recall "
    "queries (exact folds, (cosine, id) tie-breaks).",
    tags=("similarity", "eval"),
)
def ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    queries_t = trunc.filter(F.col("vec_id") % 100 == 0)
    idx = sim.cosine_topk(trunc, queries_t, k=_RECALL_K)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _recall_vs_exact(emb, queries, idx)


def _int8_topk_oracle(k: int = 5) -> str:
    """Brute-force cosine top-k over the int8-quantized vectors (cosine
    is invariant to the per-vector positive scale, so the int arrays
    compare directly)."""
    qv = ("CASE WHEN s = 0 THEN list_transform(embedding::DOUBLE[], x -> 0.0) "
          "ELSE list_transform(embedding::DOUBLE[], "
          "x -> CAST(CAST(trunc(x / s * 127) AS INT) AS DOUBLE)) END")
    return f"""
    WITH iq AS (SELECT vec_id, {qv} AS v
                FROM (SELECT vec_id, embedding,
                             list_max(list_transform(embedding::DOUBLE[],
                                                     x -> abs(x))) AS s
                      FROM embeddings)),
    q AS (SELECT vec_id AS query_id, v AS qv FROM iq WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS neighbor_id, v AS cv FROM iq),
    scored AS (
      SELECT query_id, neighbor_id,
             {_DOT.format(a='qv', b='cv')}
               / (sqrt({_DOT.format(a='qv', b='qv')})
                  * sqrt({_DOT.format(a='cv', b='cv')})) AS cosine
      FROM q, c WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "ann_int8_recall",
    _recall_oracle(_int8_topk_oracle()),
    doc="Int8-quantization retrieval eval: recall@5 of brute-force cosine "
    "over the symmetric-int8 vectors (quantize_int8's exact truncation; "
    "cosine is scale-invariant so the int arrays compare directly — a "
    "nonzero vector always keeps its max element at +-127, so int8 "
    "introduces no new zero norms) against the full-precision exact "
    "top-5 — the eval that "
    "says whether the 4x storage cut costs retrieval quality.  Fifth "
    "compression eval; same deterministic recall composition.",
    tags=("similarity", "eval"),
)
def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.similarity import quantize_int8

    emb = table(spark, sf_dir, "embeddings")
    iq = emb.select("vec_id", *quantize_int8(F.col("embedding"))).select(
        "vec_id",
        F.transform("q", lambda x: x.cast("double")).alias("embedding"),
    )
    queries_q = iq.filter(F.col("vec_id") % 100 == 0)
    idx = sim.cosine_topk(iq, queries_q, k=_RECALL_K)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _recall_vs_exact(emb, queries, idx)


def _multiprobe_oracle(dim: int = 64, k: int = 5, n_planes: int = 8,
                       n_tables: int = 2, seed: int = 42) -> str:
    """Multi-probe replica: the plain LSH bucket literals for n_tables
    tables, with the QUERY side expanded over the XOR 1-bit
    perturbation masks."""
    from planet_dump_ng_spark.operators.similarity import _hyperplanes

    def dot(vec: str, plane: list[float]) -> str:
        lits = ", ".join(f"'{x!r}'::DOUBLE" for x in plane)
        return (
            f"list_reduce(list_prepend(0.0, list_transform("
            f"list_zip({vec}, [{lits}]), p -> p[1] * p[2])), (acc, x) -> acc + x)"
        )

    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        terms = " + ".join(
            f"(CASE WHEN {dot('v', planes[b])} >= 0 THEN {1 << b} ELSE 0 END)"
            for b in range(n_planes)
        )
        buckets.append(f"({terms})")
    bks = "[" + ", ".join(buckets) + "]"
    masks = [0] + [1 << b for b in range(n_planes)]
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bk AS MATERIALIZED (SELECT vec_id, v, {bks} AS bks FROM emb),
    tb AS (SELECT vec_id, v, t.tb AS tbl, bks[t.tb + 1] AS bkt
           FROM bk, (SELECT unnest(range(0, {n_tables})) AS tb) t),
    tbq AS (SELECT vec_id, v, tbl, xor(bkt, m.m) AS bkt
            FROM tb, (SELECT unnest({masks}) AS m) m
            WHERE vec_id % 100 = 0),
    cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
             FROM tbq q JOIN tb c ON q.tbl = c.tbl AND q.bkt = c.bkt
             WHERE c.vec_id <> q.vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             {_DOT.format(a='q.v', b='c.v')}
               / (sqrt({_DOT.format(a='q.v', b='q.v')})
                  * sqrt({_DOT.format(a='c.v', b='c.v')})) AS cosine
      FROM cand
      JOIN bk q ON q.vec_id = cand.query_id
      JOIN bk c ON c.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "ann_multiprobe_topk",
    _multiprobe_oracle(),
    doc="Multi-probe LSH top-5 (operators.similarity.lsh_multiprobe_topk, "
    "Lv et al.): 2 tables + every 1-bit-perturbed query bucket probed — "
    "measured recall@5 0.24 vs the plain 8-table path's 0.12 at sf0.01 "
    "with 1/4 the CORPUS index entries — cheap query-side fan-out buys "
    "back the index storage that dominates at 100 TB.  Oracle expands "
    "the query side "
    "over the XOR masks against the same hyperplane bucket literals.",
    tags=("similarity",),
)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return sim.lsh_multiprobe_topk(
        emb, queries, dim=64, k=5, n_planes=8, n_tables=2
    )


@register(
    "ann_multiprobe_recall",
    _recall_oracle(_multiprobe_oracle()),
    doc="ANN quality evaluation for multi-probe LSH: recall@5 against the "
    "exact top-5 — read beside ann_lsh_recall to see the 2-table+probes "
    "vs 8-table trade directly; same deterministic recall composition.",
    tags=("similarity", "eval"),
)
def ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    idx = sim.lsh_multiprobe_topk(
        emb, queries, dim=64, k=_RECALL_K, n_planes=8, n_tables=2
    )
    return _recall_vs_exact(emb, queries, idx)


def _rp_topk_oracle(dim: int = 64, out_dim: int = 16, seed: int = 7,
                    k: int = 5) -> str:
    """Brute-force cosine top-k in the JL-projected space: project with
    the same '<repr>'::DOUBLE literal matrix, then the standard scored/
    ranked shape over the 16-dim lists."""
    from planet_dump_ng_spark.operators.similarity import _hyperplanes

    dims = []
    for plane in _hyperplanes(dim, out_dim, seed):
        lits = ", ".join(f"'{x!r}'::DOUBLE" for x in plane)
        dims.append(
            f"list_reduce(list_prepend(0.0, list_transform("
            f"list_zip(embedding::DOUBLE[], [{lits}]), p -> p[1] * p[2])),"
            f" (acc, x) -> acc + x)"
        )
    vec = "[" + ", ".join(dims) + "]"
    return f"""
    WITH pr AS MATERIALIZED (SELECT vec_id, {vec} AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM pr WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS neighbor_id, v AS cv FROM pr),
    scored AS (
      SELECT query_id, neighbor_id,
             {_DOT.format(a='qv', b='cv')}
               / (sqrt({_DOT.format(a='qv', b='qv')})
                  * sqrt({_DOT.format(a='cv', b='cv')})) AS cosine
      FROM q, c WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "ann_rp_recall",
    _recall_oracle(_rp_topk_oracle()),
    doc="JL-projection retrieval eval: recall@5 of brute-force cosine in "
    "the 16-dim randomly-projected space (embedding_rp_project's exact "
    "literal matrix and strict folds) against the full 64-dim exact "
    "top-5 — read beside ann_matryoshka_recall: a LEARNED prefix "
    "(matryoshka) vs an OBLIVIOUS projection at the same 4x "
    "compression.  Completes six compression evals (int8 / prefix / "
    "RP / LSH / IVF / PQ) under one deterministic recall composition.",
    tags=("similarity", "eval"),
)
def ann_rp_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.similarity import rp_project

    emb = table(spark, sf_dir, "embeddings")
    proj = emb.select(
        "vec_id",
        F.array(
            *[
                c.cast("double")
                for c in rp_project(F.col("embedding"), 64, 16, seed=7)
            ]
        ).alias("embedding"),
    )
    queries_p = proj.filter(F.col("vec_id") % 100 == 0)
    idx = sim.cosine_topk(proj, queries_p, k=_RECALL_K)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return _recall_vs_exact(emb, queries, idx)
