"""Extended TPC-H-shaped coverage: the join/aggregate/subquery shapes a
replacement engine must run (semi/anti joins, scalar subqueries,
correlated aggregates, disjunctive predicates, having, top-k) — all
oracle-checked.

Scale notes: dimension sides broadcast; semi/anti joins shuffle on the
natural key; scalar subqueries become broadcast cross joins of 1-row
aggregates (never driver-side collect in the plan); top-k uses
rank-with-tiebreak windows so results are total-ordered and
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from planet_dump_ng_spark.plans.registry import register, table
from planet_dump_ng_spark.plans.relational import DAVG_SQL, DSUM_SQL, davg, dsum


@register(
    "q02_min_acctbal_supplier",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN (SELECT s_nationkey, min(s_acctbal) AS mn
          FROM supplier GROUP BY s_nationkey) m
      ON s.s_nationkey = m.s_nationkey AND s.s_acctbal = m.mn
    """,
    doc="Min-per-group + join-back (TPC-H Q2 shape) as a single window pass.",
    tags=("join", "window", "bench"),
)
def q02_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    w = W.partitionBy("s_nationkey")
    return (
        supp.withColumn("_mn", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_mn"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


@register(
    "q04_order_priority_semi",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    doc="EXISTS semi-join (TPC-H Q4 shape): left_semi, no row duplication.",
    tags=("join", "semi"),
)
def q04_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q06_revenue_forecast",
    f"""
    SELECT {DSUM_SQL.format(x='l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Pure scan-filter-aggregate (TPC-H Q6 shape); filters push to parquet.",
    tags=("agg", "bench"),
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "q07_nation_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {DSUM_SQL.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE (sn.n_name = 'CHINA' AND cn.n_name = 'INDIA')
       OR (sn.n_name = 'INDIA' AND cn.n_name = 'CHINA')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="Bi-directional nation-pair volume (TPC-H Q7 shape).",
    tags=("join", "agg"),
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .filter(
            ((F.col("supp_nation") == "CHINA") & (F.col("cust_nation") == "INDIA"))
            | ((F.col("supp_nation") == "INDIA") & (F.col("cust_nation") == "CHINA"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))


@register(
    "q10_returned_topk",
    f"""
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             {DSUM_SQL.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC) AS rnk
      FROM rev
    ) WHERE rnk <= 20
    """,
    doc="Top-k with deterministic tiebreak (TPC-H Q10 shape): decimal-exact "
    "revenue makes the double sort keys engine-identical.",
    tags=("join", "topk", "bench"),
)
def q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    # Top-k first (TakeOrderedAndProject: per-partition top-k + driver merge),
    # NOT a partition-less row_number over the full aggregate — that plans a
    # single-task global WindowExec, which dies at 100x the per-customer
    # aggregate.  The rank window then runs over only the <=20 survivors.
    # limit() yields a single physical partition, so partitioning the window
    # by spark_partition_id() is a global rank there — and unlike
    # partitionBy(lit(0)) it is not constant-folded away, so Spark does not
    # plan (or warn about) a partition-less WindowExec.
    order = [F.col("revenue").desc(), F.col("c_custkey").asc()]
    top = rev.orderBy(*order).limit(20)
    w = W.partitionBy(F.spark_partition_id()).orderBy(*order)
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("c_custkey", "c_name", "n_name", "revenue", "rnk")
    )


@register(
    "q12_priority_by_flag",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_count,
           COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l_returnflag
    """,
    doc="Conditional aggregation after join (TPC-H Q12 shape).",
    tags=("join", "agg"),
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_count"),
            F.count(F.when(~high, 1)).alias("low_count"),
        )
    )


@register(
    "q13_order_count_histogram",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    doc="Two-level aggregation over a left join (TPC-H Q13 shape).",
    tags=("join", "agg", "bench"),
)
def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_share",
    f"""
    SELECT CAST(100.0 AS DOUBLE)
           * {DSUM_SQL.format(x="CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
           / {DSUM_SQL.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="Promo revenue share (TPC-H Q14 shape): ratio of two exact sums.",
    tags=("join", "agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast("decimal(38,6)")).cast("double")
            / F.sum(rev.cast("decimal(38,6)")).cast("double")
        ).alias("promo_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    f"""
    SELECT {DSUM_SQL.format(x='l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey, {DAVG_SQL.format(x='l_quantity')} AS aq
          FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.aq
    """,
    doc="Correlated per-group average (TPC-H Q17 shape) as aggregate+join-back.",
    tags=("join", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity", "aq")
    )
    return (
        li.join(F.broadcast(avg_q), li.l_partkey == avg_q.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_orders",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {DSUM_SQL.format(x='l.l_quantity')} AS sum_qty
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(38,6))) > 150
    """,
    doc="Group-filter (HAVING) over a fact join (TPC-H Q18 shape).",
    tags=("join", "agg", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            dsum("l_quantity", "sum_qty"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("_dq"),
        )
        .filter(F.col("_dq") > 150)
        .drop("_dq")
    )


@register(
    "q19_disjunctive_filter",
    f"""
    SELECT {DSUM_SQL.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="OR-of-conjunctions predicate join (TPC-H Q19 shape).",
    tags=("join", "filter"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@register(
    "customers_without_orders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="Anti join (NOT EXISTS): customers with no urgent order.",
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q22_idle_rich_customers",
    f"""
    WITH avg_bal AS (
      SELECT {DAVG_SQL.format(x='c_acctbal')} AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           {DSUM_SQL.format(x='c.c_acctbal')} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
    doc="Scalar subquery (broadcast 1-row cross join) + anti join "
    "(TPC-H Q22 shape).",
    tags=("join", "anti", "subquery"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal", "ab"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# -- the remaining TPC-H shapes (Q8/Q9/Q11/Q15/Q16/Q20/Q21), adapted to the
# testdata schema: there is no partsupp table and lineitem carries no
# receipt/commit dates, so supply-cost terms use p_retailprice, availqty
# comparisons use the (supplier, part) shipped-quantity history, and
# "late" means shipped more than 90 days after the order date.


@register(
    "q08_market_share",
    f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS v,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           {DSUM_SQL.format(x="CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END")}
             / {DSUM_SQL.format(x='v')} AS mkt_share
    FROM vol GROUP BY o_year
    """,
    doc="National market share (TPC-H Q8 shape): ratio of two decimal-exact "
    "sums over an 8-table join; every dimension side broadcasts.",
    tags=("join", "agg", "bench"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(F.col("n_nationkey").alias("cnk"), "n_regionkey")
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    v = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            v.alias("v"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("v")).otherwise(F.lit(0))
    return vol.groupBy("o_year").agg(
        (
            F.sum(nat.cast("decimal(38,6)")).cast("double")
            / F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
        ).alias("mkt_share")
    )


@register(
    "q09_product_profit",
    f"""
    SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           {DSUM_SQL.format(
               x='l.l_extendedprice * (1 - l.l_discount)'
               ' - p.p_retailprice * l.l_quantity * 0.8')} AS sum_profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%anvil%'
    GROUP BY nation, o_year
    """,
    doc="Product-line profit by nation and year (TPC-H Q9 shape; supply "
    "cost adapted to p_retailprice — no partsupp table in the testdata).",
    tags=("join", "agg"),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").contains("anvil"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.8)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"))
    )


@register(
    "q11_important_parts",
    f"""
    WITH pv AS (
      SELECT l.l_partkey,
             {DSUM_SQL.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT {DSUM_SQL.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS t,
                   COUNT(DISTINCT l.l_partkey) AS np
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_5')
    SELECT pv.l_partkey AS p_partkey, pv.value
    FROM pv, tot WHERE pv.value > 2.0 * tot.t / tot.np
    """,
    doc="HAVING over a scalar subquery (TPC-H Q11 shape, partsupp value "
    "adapted to shipped revenue): per-part aggregate filtered against a "
    "broadcast 1-row global total; the 2x-average threshold is "
    "scale-invariant, so the query selects rows at every SF.",
    tags=("join", "agg", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    v = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(F.col("l_partkey"), v.alias("v"))
    )
    pv = base.groupBy("l_partkey").agg(dsum("v", "value"))
    tot = base.agg(
        dsum("v", "t"), F.count_distinct("l_partkey").alias("np")
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.lit(2.0) * F.col("t") / F.col("np"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="Revenue view + scalar-max filter (TPC-H Q15 shape): the max rides "
    "a broadcast 1-row aggregate; decimal-exact sums make the double "
    "equality engine-safe.",
    tags=("join", "agg", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="Distinct-supplier counts by part attributes (TPC-H Q16 shape, "
    "supplier-part pairs from lineitem — no partsupp in the testdata).",
    tags=("join", "agg", "distinct"),
)
def q16_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shippers",
    """
    WITH pq AS (
      SELECT l.l_suppkey, l.l_partkey,
             sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                      THEN l.l_quantity ELSE 0 END) AS q_year,
             sum(l.l_quantity) AS q_all
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'blue%'
      GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM pq
                  WHERE pq.l_suppkey = s.s_suppkey AND pq.q_year > 0.5 * pq.q_all)
    """,
    doc="Nested semi-join over a correlated quantity aggregate (TPC-H Q20 "
    "shape; availqty adapted to the (supplier, part) shipment history).",
    tags=("join", "semi", "subquery"),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("blue"))
    supp = table(spark, sf_dir, "supplier")
    in_year = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    pq = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_year, F.col("l_quantity")).otherwise(F.lit(0))).alias(
                "q_year"
            ),
            F.sum("l_quantity").alias("q_all"),
        )
    )
    excess = pq.filter(F.col("q_year") > F.lit(0.5) * F.col("q_all"))
    return supp.join(
        excess, supp.s_suppkey == excess.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_waiting_supplier",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    all_l AS (SELECT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM all_l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
    doc="The only-late-supplier count (TPC-H Q21 shape): semi + anti join "
    "against the same derived table ('late' = shipped >90 days after the "
    "order date; the testdata has no receipt/commit dates).",
    tags=("join", "semi", "anti", "bench"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    others = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    only_late = others.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        only_late.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
