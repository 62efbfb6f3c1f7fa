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


def _centroids_df(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Centroid table as DATA, not plan literals: embedding the n_cells x
    dim floats as expression literals (the round-2/3 formulation) made
    every Lloyd round pay Catalyst + whole-stage-codegen for a ~500-leaf
    expression tree — planning dominated the 2k-row execution.  A
    broadcast join against this tiny table keeps the plan constant-size
    per round (and is the formulation that still works when n_cells
    grows to thousands at 100 TB, where a literal tree would not even
    compile)."""
    return spark.createDataFrame(
        [(int(cid), [float(x) for x in c]) for cid, c in centroids],
        "cell int, centroid array<double>",
    )


def _dist2():
    """Exact squared-L2 between the row vector ``v`` and the joined
    ``centroid`` — same strict fold (zip, per-dim square, left-to-right
    sum) the literal formulation used, so results are bit-identical.
    Built lazily: constructing Column expressions needs an active
    SparkContext, and this module must stay importable before one
    exists (e.g. CLI arg-parse paths)."""
    return F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vecs: DataFrame, cdf: DataFrame) -> DataFrame:
    """(vec_id, v) x broadcast centroids -> (vec_id, v, cell): nearest
    cell by exact squared L2, ties to the lower cell id via the
    lexicographic struct MIN (identical to ROW_NUMBER ORDER BY dist,
    cell of the oracle).  any_value(v) is deterministic here — every
    candidate row of a vec_id carries the same v."""
    return (
        vecs.join(F.broadcast(cdf))
        .select(
            "vec_id",
            "v",
            F.struct(_dist2().alias("dist"), F.col("cell").alias("cell")).alias(
                "dc"
            ),
        )
        .groupBy("vec_id")
        .agg(
            F.any_value("v").alias("v"),
            F.min("dc")["cell"].alias("cell"),
        )
    )


def train_kmeans_df(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 8,
    n_rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd iterations as ONE lazy DataFrame chain -> (cell, centroid).

    Deterministic init: the ``n_cells`` corpus vectors with the smallest
    xxhash64(id) (a seeded pseudo-random but reproducible sample — the
    only driver round-trip; it also lets cell ids come from Python
    enumeration instead of a partition-less rank window).  Each round:
    assign to nearest centroid (broadcast join against the tiny centroid
    table), recompute exact means per cell (1e-12-truncated integer
    sums, the engine-stable quantization).  Empty cells keep their
    previous centroid via the left join + coalesce.

    The recurrence MATERIALIZES each round (the tiny centroid table is
    collected and re-seeded as data): a fully lazy chain is tempting but
    wrong — round r+1's plan references round r's centroid table twice
    (assignment AND the carry-forward left join), so lazy chaining
    doubles the plan per round and Spark recomputes the recurrence
    exponentially (measured 1.6x slower at 3 rounds).  An 8-row collect
    per round is the cheap way to cut that lineage.  The caller should
    persist ``corpus`` — each round rescans it once.
    """
    return _centroids_df(
        corpus.sparkSession,
        train_kmeans(
            corpus, dim, n_cells, n_rounds, vec_col=vec_col, id_col=id_col
        ),
    )


def train_kmeans(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 8,
    n_rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Lloyd rounds with an 8-row driver materialization per round (see
    train_kmeans_df for why the lineage cut beats a lazy chain)."""
    vecs = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    seeds = (
        vecs.withColumn("_h", F.xxhash64(F.col("vec_id")))
        .orderBy("_h", "vec_id")
        .limit(n_cells)
        .collect()
    )
    centroids = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seeds)]
    for _ in range(n_rounds):
        assigned = _assign(
            vecs, _centroids_df(corpus.sparkSession, centroids)
        )
        means = (
            assigned.select(
                "cell", F.posexplode("v").alias("pos", "val")
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
    exact-cosine rerank inside them.

    Cache discipline: the corpus stays persisted only through training
    and the assignment materialization, then releases; what survives
    for the returned (lazy) plan is the much smaller assignment table.
    """
    corpus = corpus.persist()
    cdf = train_kmeans_df(
        corpus, dim, n_cells, vec_col=vec_col, id_col=id_col
    )

    c = (
        _assign(
            corpus.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
            ),
            cdf,
        )
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("cv"),
            "cell",
        )
        .persist()
    )
    c.count()
    corpus.unpersist()
    # per query: the n_probe closest cells by centroid distance (rank over
    # the broadcast-joined centroid table; ties on dist go to the lower
    # cell id, matching the oracle's ORDER BY dist, cell)
    pw = W.partitionBy("query_id").orderBy("dist", "cell")
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
        )
        .join(F.broadcast(cdf))
        .select(
            "query_id",
            F.col("v").alias("qv"),
            "cell",
            _dist2().alias("dist"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
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
    dedup.  One broadcast join against the lazily-trained centroid
    table (the caller should have ``corpus`` persisted)."""
    cdf = train_kmeans_df(
        corpus, dim, n_cells, n_rounds, vec_col=vec_col, id_col=id_col
    )
    return _assign(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
        ),
        cdf,
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
    corpus = corpus.select(id_col, vec_col).persist()
    a = assign_cells(
        corpus, dim, n_cells, id_col=id_col, vec_col=vec_col
    ).persist()
    a.count()
    corpus.unpersist()
    from planet_dump_ng_spark.operators.similarity import _dot_exact, cosine

    # zero-norm guard: a failed-encode all-zeros vector yields
    # cosine = 0/0 = NaN, and both engines order NaN ABOVE any number,
    # so NaN >= threshold would mark every higher-id cell-mate as a
    # duplicate of a vector it has no similarity to.  Zero vectors
    # simply never participate in pairs (they stay kept themselves).
    pos = _dot_exact(F.col("v"), F.col("v")) > 0
    b = a.filter(pos).select(
        F.col("vec_id").alias("nid"), F.col("v").alias("nv"), "cell"
    )
    close_lower = (
        a.filter(pos)
        .join(b, "cell")
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



def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    n_sub: int = 4,
    n_cells: int = 8,
    n_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[DataFrame]:
    """One trained (cell, centroid) codebook DataFrame per subspace —
    shared by pq_encode (storage side) and pq_adc_topk (query side)."""
    sub_dim = dim // n_sub

    def train_one(s: int) -> DataFrame:
        sub = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias("sub"),
        )
        return train_kmeans_df(
            sub, sub_dim, n_cells, n_rounds, vec_col="sub", id_col="vec_id"
        )

    # subspace trainings are independent Lloyd loops over the same cached
    # corpus — submit them concurrently so their per-round driver
    # materializations overlap (the dominant cost is round latency, not
    # executor work; measured ~2x on the IVFPQ pipeline at sf0.1)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_sub) as pool:
        return list(pool.map(train_one, range(n_sub)))


def pq_encode(
    corpus: DataFrame,
    dim: int,
    n_sub: int = 4,
    n_cells: int = 8,
    n_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization: split each vector into ``n_sub`` subspaces,
    train an independent k-means codebook per subspace, and encode every
    vector as ``n_sub`` small codes plus its total reconstruction error
    -> (vec_id, code0..code{n_sub-1}, recon_err).

    The third ANN compression next to int8 quantization and the JL
    projection: storage drops from dim floats to n_sub bytes while
    asymmetric distance queries stay answerable from codebook lookup
    tables.  Each subspace training is the same broadcast-Lloyd loop as
    the IVF coarse quantizer over a dim/n_sub slice (codebooks are tiny
    and independent — at scale they train concurrently from one cached
    corpus scan); encoding is n_sub broadcast joins merged on the id.
    recon_err is the sum of per-subspace squared distances to the chosen
    centroid — exactly the quantity PQ minimizes, and a deterministic
    left-to-right sum of exact fold results.
    """
    sub_dim = dim // n_sub
    assert sub_dim * n_sub == dim, "dim must divide evenly into subspaces"
    corpus = corpus.persist()
    books = pq_codebooks(
        corpus, dim, n_sub, n_cells, n_rounds, id_col=id_col, vec_col=vec_col
    )
    out = None
    for s in range(n_sub):
        sub = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias("sub"),
        )
        cdf = books[s]
        assigned = (
            sub.withColumnRenamed("sub", "v")
            .join(F.broadcast(cdf))
            .select(
                "vec_id",
                F.struct(
                    _dist2().alias("dist"), F.col("cell").alias("cell")
                ).alias("dc"),
            )
            .groupBy("vec_id")
            .agg(F.min("dc").alias("dc"))
            .select(
                "vec_id",
                F.col("dc")["cell"].cast("int").alias(f"code{s}"),
                F.col("dc")["dist"].alias(f"_d{s}"),
            )
        )
        out = assigned if out is None else out.join(assigned, "vec_id")
    err = F.col("_d0")
    for s in range(1, n_sub):
        err = err + F.col(f"_d{s}")
    result = out.select(
        "vec_id",
        *[f"code{s}" for s in range(n_sub)],
        err.alias("recon_err"),
    ).persist()
    result.count()
    corpus.unpersist()
    return result


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_sub: int = 4,
    n_cells: int = 8,
    n_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k: approximate nearest neighbours from
    CODES ONLY — the query path product quantization exists for.

    Per query and subspace, a lookup table of squared distances from the
    query's sub-vector to each codebook centroid (n_queries x n_cells
    rows — tiny, broadcast); each corpus vector's approximate distance
    is then the sum of ``n_sub`` LUT lookups keyed by its stored codes,
    so the scan over the corpus touches ONLY the code columns (n_sub
    bytes/vector at scale), never the original floats.  Ranking is a
    per-query window with (dist, id) tie-break, exactly like the other
    ANN paths.

    Cache discipline mirrors ivf_cosine_topk: the corpus persists only
    through training + encoding; the returned plan reads the much
    smaller code table.
    """
    sub_dim = dim // n_sub
    corpus = corpus.persist()
    books = pq_codebooks(
        corpus, dim, n_sub, n_cells, n_rounds, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(
        corpus, dim, n_sub, n_cells, n_rounds, id_col=id_col, vec_col=vec_col
    )  # persisted + materialized inside
    corpus.unpersist()

    adc = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        *[f"code{s}" for s in range(n_sub)],
    )
    for s in range(n_sub):
        lut = (
            queries.select(
                F.col(id_col).alias("query_id"),
                F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias("v"),
            )
            .join(F.broadcast(books[s]))
            .select(
                "query_id",
                F.col("cell").alias(f"code{s}"),
                _dist2().alias(f"_d{s}"),
            )
        )
        join_on = (
            [f"code{s}"] if s == 0 else ["query_id", f"code{s}"]
        )
        adc = adc.join(F.broadcast(lut), join_on)
    dist = F.col("_d0")
    for s in range(1, n_sub):
        dist = dist + F.col(f"_d{s}")
    scored = adc.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", dist.alias("adc_dist")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    coarse_rounds: int = 2,
    n_sub: int = 4,
    pq_cells: int = 8,
    pq_rounds: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ asymmetric-distance top-k — the composed index (FAISS's
    IVFADC): a coarse quantizer routes each vector to a cell, product
    quantization encodes the RESIDUAL (vector minus its coarse
    centroid — residuals are far better centered than raw vectors, the
    reason real systems compose the two), and queries probe only the
    ``n_probe`` nearest cells, ranking candidates by the sum of
    per-subspace LUT lookups on the residual codes.

    Scale shape = the product of the two parents': the corpus shuffles
    once by coarse cell; per query the candidate scan covers
    n_probe/n_cells of the code table (n_sub bytes per vector, never
    the floats); all LUTs are (queries x probed cells x pq_cells)
    rows — broadcast.  Every stage is the deterministic machinery the
    separate IVF and PQ paths already hash-verify: exact-fold L2,
    1e-12-truncated Lloyd means, (dist, id) tie-breaks.
    """
    coarse, books, codes = ivfpq_build(
        corpus, dim, n_cells, coarse_rounds, n_sub, pq_cells, pq_rounds,
        id_col=id_col, vec_col=vec_col,
    )
    return ivfpq_query(
        coarse, books, codes, queries, dim, k=k, n_sub=n_sub,
        n_probe=n_probe, id_col=id_col, vec_col=vec_col,
    )


def ivfpq_build(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 8,
    coarse_rounds: int = 2,
    n_sub: int = 4,
    pq_cells: int = 8,
    pq_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[DataFrame], DataFrame]:
    """Train the IVFPQ index -> (coarse centroids, per-subspace residual
    codebooks, code table).  These three tables ARE the index artifact:
    persist them (write_ivfpq_index) and serve queries without ever
    touching the raw vectors again — the build-once/query-many shape of
    a production vector store."""
    sub_dim = dim // n_sub
    assert sub_dim * n_sub == dim, "dim must divide evenly into subspaces"
    corpus = corpus.persist()
    vecs = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    coarse = train_kmeans_df(
        corpus, dim, n_cells, coarse_rounds, vec_col=vec_col, id_col=id_col
    )
    # residual table: v - centroid(cell) — float64 subtraction of exact
    # operands, deterministic on both engines
    resid = (
        _assign(vecs, coarse)
        .join(F.broadcast(coarse), "cell")
        .select(
            "vec_id",
            "cell",
            F.zip_with(
                "v", "centroid", lambda a, b: a.cast("double") - b
            ).alias("rv"),
        )
        .persist()
    )
    resid.count()
    corpus.unpersist()
    books = pq_codebooks(
        resid, dim, n_sub, pq_cells, pq_rounds, id_col="vec_id", vec_col="rv"
    )
    codes = None
    for s in range(n_sub):
        sub = resid.select(
            "vec_id", F.slice("rv", s * sub_dim + 1, sub_dim).alias("v")
        )
        assigned = (
            sub.join(F.broadcast(books[s]))
            .select(
                "vec_id",
                F.struct(
                    _dist2().alias("dist"), F.col("cell").alias("cell")
                ).alias("dc"),
            )
            .groupBy("vec_id")
            .agg(F.min("dc")["cell"].cast("int").alias(f"code{s}"))
        )
        codes = assigned if codes is None else codes.join(assigned, "vec_id")
    codes = (
        resid.select("vec_id", "cell").join(codes, "vec_id").persist()
    )
    codes.count()
    resid.unpersist()
    return coarse, books, codes


def write_ivfpq_index(
    coarse: DataFrame, books: list[DataFrame], codes: DataFrame, out_dir: str
) -> None:
    """Persist the trained index as three parquet tables (coarse /
    codebooks / codes).  Codebooks stack into one table with a
    ``subspace`` key.  The codes table is the only corpus-sized piece
    (n_sub small ints + cell per vector)."""
    d = out_dir.rstrip("/")
    coarse.write.mode("overwrite").parquet(f"{d}/coarse")
    stacked = None
    for s, b in enumerate(books):
        bs = b.select(F.lit(s).alias("subspace"), "cell", "centroid")
        stacked = bs if stacked is None else stacked.unionByName(bs)
    stacked.write.mode("overwrite").parquet(f"{d}/codebooks")
    codes.write.mode("overwrite").parquet(f"{d}/codes")


def read_ivfpq_index(
    spark, index_dir: str, n_sub: int = 4
) -> tuple[DataFrame, list[DataFrame], DataFrame]:
    """Load an index written by write_ivfpq_index."""
    d = index_dir.rstrip("/")
    coarse = spark.read.parquet(f"{d}/coarse")
    stacked = spark.read.parquet(f"{d}/codebooks")
    books = [
        stacked.filter(F.col("subspace") == s).select("cell", "centroid")
        for s in range(n_sub)
    ]
    codes = spark.read.parquet(f"{d}/codes")
    return coarse, books, codes


def ivfpq_query(
    coarse: DataFrame,
    books: list[DataFrame],
    codes: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_sub: int = 4,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve top-k from a (possibly loaded-from-disk) IVFPQ index: probe
    the n_probe nearest coarse cells, rank by summed residual-LUT
    lookups over the stored codes.  Reads only the code table plus the
    broadcast-sized centroid/codebook tables — never raw vectors."""
    sub_dim = dim // n_sub
    # query side: n_probe nearest coarse cells, query residual per probe
    pw = W.partitionBy("query_id").orderBy("dist", "cell")
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
        )
        .join(F.broadcast(coarse))
        .select(
            "query_id", "v", "cell", "centroid", _dist2().alias("dist")
        )
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= n_probe)
        .select(
            "query_id",
            "cell",
            F.zip_with(
                "v", "centroid", lambda a, b: a.cast("double") - b
            ).alias("qres"),
        )
    )
    adc = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        *[f"code{s}" for s in range(n_sub)],
    )
    for s in range(n_sub):
        lut = (
            probes.select(
                "query_id",
                "cell",
                F.slice("qres", s * sub_dim + 1, sub_dim).alias("v"),
            )
            .join(
                F.broadcast(books[s].withColumnRenamed("cell", f"code{s}")),
            )
            .select(
                "query_id",
                "cell",
                F.col(f"code{s}").cast("int").alias(f"code{s}"),
                _dist2().alias(f"_d{s}"),
            )
        )
        join_on = (
            ["cell", f"code{s}"]
            if s == 0
            else ["query_id", "cell", f"code{s}"]
        )
        adc = adc.join(F.broadcast(lut), join_on)
    dist = F.col("_d0")
    for s in range(1, n_sub):
        dist = dist + F.col(f"_d{s}")
    scored = adc.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", dist.alias("adc_dist")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivfpq_add(
    coarse: DataFrame,
    books: list[DataFrame],
    new_vectors: DataFrame,
    dim: int,
    n_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental index ingest (the FAISS ``add()`` shape): encode NEW
    vectors against the FROZEN quantizers — assign each to its nearest
    existing coarse cell, encode its residual with the existing
    per-subspace codebooks — and return their code-table rows to append
    (same schema as ivfpq_build's codes).  No retraining: per-batch
    cost is the batch size x broadcast-tiny centroid tables, never the
    corpus, which is what makes continuous ingest viable; periodic
    re-trains when drift accumulates (embedding_drift_by_dim is the
    trigger signal) swap the artifact wholesale.
    """
    sub_dim = dim // n_sub
    assert sub_dim * n_sub == dim, "dim must divide evenly into subspaces"
    vecs = new_vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    resid = (
        _assign(vecs, coarse)
        .join(F.broadcast(coarse), "cell")
        .select(
            "vec_id",
            "cell",
            F.zip_with(
                "v", "centroid", lambda a, b: a.cast("double") - b
            ).alias("rv"),
        )
    )
    codes = None
    for s in range(n_sub):
        sub = resid.select(
            "vec_id", F.slice("rv", s * sub_dim + 1, sub_dim).alias("v")
        )
        assigned = (
            sub.join(F.broadcast(books[s]))
            .select(
                "vec_id",
                F.struct(
                    _dist2().alias("dist"), F.col("cell").alias("cell")
                ).alias("dc"),
            )
            .groupBy("vec_id")
            .agg(F.min("dc")["cell"].cast("int").alias(f"code{s}"))
        )
        codes = assigned if codes is None else codes.join(assigned, "vec_id")
    return resid.select("vec_id", "cell").join(codes, "vec_id")
