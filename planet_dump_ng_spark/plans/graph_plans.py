"""Graph analytics over relational-derived graphs: triangle counting on
the supplier co-supply graph and market-basket co-occurrence mining.

Both graphs are DERIVED inside the plan from lineitem — the pattern a
100 TB pipeline uses (entity graph built from interaction logs), and both
plans bound their fan-out structurally:

- co-supply edges come from a per-part self-join (suppliers sharing a
  part), so the blow-up is bounded by suppliers-per-part, not graph size;
  a min-shared-parts threshold keeps the projected graph sparse;
- market-basket pairs come from a per-order self-join; TPC-H orders have
  <= 7 lines, so the fan-out is <= 21 pairs per order at any scale.

Triangle counting uses degree ordering (orient each edge from the
lower-(degree, id) endpoint) so every wedge is enumerated exactly once at
its smallest-degree apex — the standard bound that keeps the wedge join
skew-free even on power-law graphs (a hub of degree d contributes
O(d^1.5) oriented wedges, not O(d^2)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from planet_dump_ng_spark.plans.registry import register, table

#: distinct supplier pairs sharing >= 3 parts (s1 < s2), as SQL
_COSUPPLY_SQL = """
    WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    edges AS (
        SELECT a.s AS s1, b.s AS s2
        FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
        GROUP BY a.s, b.s
        HAVING count(*) >= 3
    )
"""


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier pairs sharing >= 3 parts (s1 < s2), persisted —
    the projected co-supply graph shared by cosupply_triangles and
    kcore_suppliers (the DataFrame form of _COSUPPLY_SQL)."""
    li = table(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    a = sp.alias("a")
    b = sp.alias("b")
    return (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .count()
        .filter(F.col("count") >= 3)
        .select("s1", "s2")
        .persist()
    )


@register(
    "cosupply_triangles",
    _COSUPPLY_SQL
    + """
    , deg AS (
        SELECT v, count(*) AS d FROM (
            SELECT s1 AS v FROM edges UNION ALL SELECT s2 AS v FROM edges
        ) GROUP BY v
    ),
    oriented AS (
        SELECT CASE WHEN (da.d, e.s1) < (db.d, e.s2) THEN e.s1 ELSE e.s2 END AS lo,
               CASE WHEN (da.d, e.s1) < (db.d, e.s2) THEN e.s2 ELSE e.s1 END AS hi
        FROM edges e
        JOIN deg da ON da.v = e.s1
        JOIN deg db ON db.v = e.s2
    )
    SELECT count(*) AS n_triangles,
           (SELECT count(*) FROM edges) AS n_edges
    FROM oriented w1
    JOIN oriented w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
    JOIN oriented c ON c.lo = w1.hi AND c.hi = w2.hi
    """,
    doc="Triangle count on the supplier co-supply graph (>= 3 shared "
    "parts) via degree-ordered wedge enumeration: each edge is oriented "
    "low->high by (degree, id), wedges join at the low apex, and the "
    "closing edge is probed with one equi-join — three shuffles total, "
    "hub-skew bounded by the orientation.",
    tags=("graph", "join"),
)
def cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.graph import triangle_count

    edges = _cosupply_edges(spark, sf_dir)
    tri = triangle_count(edges)
    return tri.crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))


@register(
    "market_basket_pairs",
    """
    WITH pairs AS (
        SELECT a.l_partkey AS part1, b.l_partkey AS part2
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part1, part2, count(*) AS n_orders_together
    FROM pairs GROUP BY part1, part2
    ORDER BY n_orders_together DESC, part1, part2
    LIMIT 50
    """,
    doc="Market-basket mining: parts co-occurring in an order.  One "
    "groupBy gathers each order's (bounded-width) part list, and the "
    "<= C(w,2) pairs generate in-memory from the sorted array — a "
    "single shuffle of the fact table where the equivalent self-join "
    "(the oracle's formulation) shuffles it twice and rejoins.  The "
    "sorted-array index pairs (i<j, ps[i]<ps[j]) reproduce the "
    "join's multiplicity semantics exactly, duplicate part rows "
    "included.  Top-k is a total-order TakeOrderedAndProject, not a "
    "global window.  ~35% faster at sf0.1.",
    tags=("graph", "join", "bench"),
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    arr = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pairs = arr.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(ps)-1), j -> "
                "transform(filter(sequence(0, j-1), i -> ps[i] < ps[j]), "
                "i -> struct(ps[i] AS part1, ps[j] AS part2))))"
            )
        ).alias("p")
    ).select("p.part1", "p.part2")
    counts = pairs.groupBy("part1", "part2").agg(
        F.count(F.lit(1)).alias("n_orders_together")
    )
    return counts.orderBy(
        F.col("n_orders_together").desc(), "part1", "part2"
    ).limit(50)


def _kcore_oracle(k: int = 3, n_rounds: int = 3) -> str:
    """Unrolled fixed-round peel over the symmetrized co-supply graph.
    The per-round keep set is DISTINCT on node id, so the restriction
    joins replicate Spark's left-semi exactly (no multiplicity)."""
    rounds = []
    for r in range(n_rounds):
        rounds.append(f"""
    d{r} AS (SELECT src, COUNT(*) AS d FROM e{r} GROUP BY src),
    k{r} AS (SELECT src FROM d{r} WHERE d >= {k}),
    e{r + 1} AS (SELECT e.src, e.dst FROM e{r} e
                 JOIN k{r} a ON e.src = a.src
                 JOIN k{r} b ON e.dst = b.src)""")
    return (
        _COSUPPLY_SQL
        + f""",
    e0 AS (SELECT s1 AS src, s2 AS dst FROM edges
           UNION ALL SELECT s2, s1 FROM edges),
    {','.join(rounds)}
    SELECT src AS id, COUNT(*) AS degree FROM e{n_rounds} GROUP BY src
    """
    )


@register(
    "kcore_suppliers",
    _kcore_oracle(),
    doc="3-core of the supplier co-supply graph after 3 fixed peel "
    "rounds (operators.graph.kcore): drop degree<3 nodes, restrict "
    "edges to survivors, repeat — the graph-curation filter that "
    "separates a dense genuinely-connected core from low-core noise "
    "(spam rings, boilerplate mills in a dup graph).  Fixed rounds "
    "keep it oracle-unrollable; each round is one degree aggregate + "
    "two left-semi survivor joins, no windows.  Fifth fully-oracled "
    "iterative algorithm.",
    tags=("graph", "iterative"),
)
def kcore_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.graph import kcore

    und = _cosupply_edges(spark, sf_dir)
    edges = und.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst")
    ).unionByName(und.select(F.col("s2").alias("src"), F.col("s1").alias("dst")))
    # kcore materializes its result eagerly, so the projected-edge cache
    # (read twice by the symmetrization) can be released here
    out = kcore(edges, k=3, n_rounds=3)
    und.unpersist(blocking=True)
    return out


def _lpa_oracle(n_rounds: int = 3) -> str:
    """Unrolled synchronous-LPA rounds (operators.graph.label_propagation
    replica): per round, each node adopts its in-neighbors' most frequent
    label, ties to the smallest label (row_number over (n DESC, label))."""
    rounds = []
    for r in range(n_rounds):
        rounds.append(f"""
    m{r} AS (SELECT e.dst AS src, l.label, COUNT(*) AS n
             FROM e JOIN l{r} l ON e.src = l.src
             GROUP BY e.dst, l.label),
    l{r + 1} AS (SELECT src, label FROM (
                   SELECT src, label,
                          row_number() OVER (PARTITION BY src
                                             ORDER BY n DESC, label) AS rn
                   FROM m{r}) WHERE rn = 1)""")
    return f"""
    WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    e AS (SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM pairs
          UNION ALL
          SELECT l_partkey * 2 + 1, l_suppkey * 2 FROM pairs),
    l0 AS (SELECT DISTINCT src, src AS label FROM e),
    {','.join(rounds)}
    SELECT src AS id, label AS community FROM l{n_rounds}
    """


@register(
    "label_propagation_communities",
    _lpa_oracle(),
    doc="Community detection by synchronous label propagation over the "
    "symmetrized supplier-part graph: 3 fixed rounds, most-frequent "
    "neighbor label, ties to the smallest label (a total order, so the "
    "result is deterministic under any partitioning — classic async "
    "LPA is not).  The Spark argmax is a lexicographic "
    "MAX(struct(n, -label)) aggregate, one state row per node and "
    "map-side combinable; the oracle spells it with a row_number "
    "window.  Fourth fully-oracled iterative algorithm next to "
    "connected components, PageRank, and IVF k-means.",
    tags=("graph", "iterative"),
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.graph import label_propagation

    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    fwd = pairs.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return label_propagation(edges, n_rounds=3)


def _bfs_oracle(n_rounds: int = 3) -> str:
    """Unrolled BFS frontier rounds over the co-supply graph from the
    minimum supplier id (operators.graph.bfs_levels replica)."""
    rounds = []
    for r in range(n_rounds):
        rounds.append(f"""
    d{r + 1} AS (SELECT id, CAST(MIN(dist) AS INT) AS dist FROM (
            SELECT id, dist FROM d{r}
            UNION ALL
            SELECT e.dst AS id, d.dist + 1 AS dist
            FROM e JOIN d{r} d ON e.src = d.id)
        GROUP BY id)""")
    return (
        _COSUPPLY_SQL
        + f"""
    , e AS (SELECT s1 AS src, s2 AS dst FROM edges
            UNION ALL SELECT s2, s1 FROM edges),
    d0 AS (SELECT MIN(src) AS id, CAST(0 AS INT) AS dist FROM e),
    {','.join(rounds)}
    SELECT id AS suppkey, dist AS hops FROM d{n_rounds}
    """
    )


@register(
    "bfs_supplier_hops",
    _bfs_oracle(),
    doc="Bounded-hop BFS (operators.graph.bfs_levels): hop distance from "
    "the minimum-id supplier over the symmetrized co-supply graph, "
    "three frontier expansions — the n-hop-neighborhood primitive "
    "(blast-radius / ego-network queries).  The seventh fully-oracled "
    "iterative algorithm: the source is elected declaratively (MIN "
    "broadcast back, no driver round-trip), each round joins the "
    "persisted src-partitioned edge arrangement once, and MIN-collapse "
    "keeps frontier state at one row per reached node.  Oracle unrolls "
    "the rounds as CTEs over the shared co-supply edge SQL.",
    tags=("graph", "iterative"),
)
def bfs_supplier_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from planet_dump_ng_spark.operators.graph import bfs_levels

    und = _cosupply_edges(spark, sf_dir)
    edges = und.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst")
    ).unionByName(und.select(F.col("s2").alias("src"), F.col("s1").alias("dst")))
    out = bfs_levels(edges, n_rounds=3).select(
        F.col("id").alias("suppkey"), F.col("dist").alias("hops")
    )
    und.unpersist(blocking=True)
    return out
