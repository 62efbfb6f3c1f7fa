"""Relational core: the reference's operator inventory (SURVEY.md section 2)
re-expressed over the driver's synthetic star schema.

Each query exercises one or more reference operators (cited per query) so
the DuckDB oracle gate proves the Spark implementation of that operator.
TPC-H-shaped queries double as the bench headline set.

Scale notes (100 TB): every join below is either broadcast (dimension
tables: region/nation/customer/supplier/part are tiny relative to facts) or
a shuffled equi-join on the natural key that AQE can re-plan; aggregations
are partial-aggregate friendly (sum/count/min/max), so map-side combine
keeps shuffle volume at num_groups x partitions, not row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from planet_dump_ng_spark.plans.registry import register, table

# -- determinism helpers (see registry.py docstring) -------------------------


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent float sum: quantize to DECIMAL(38,6), sum exactly,
    return double.  Matches ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``
    in DuckDB bit-for-bit because decimal addition is associative."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum divided by count in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(c)
    ).alias(alias)


DSUM_SQL = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"
DAVG_SQL = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({x})"


# -- flagship: TPC-H Q1 shape (scan -> filter -> partial agg) ----------------
# Reference parity: per-table scan + fold aggregate (table_extractor.hpp:31-47)
# generalized to grouped aggregation; filters push to the parquet scan.


@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM_SQL.format(x='l_quantity')} AS sum_qty,
           {DSUM_SQL.format(x='l_extendedprice')} AS sum_base_price,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DAVG_SQL.format(x='l_quantity')} AS avg_qty,
           {DAVG_SQL.format(x='l_extendedprice')} AS avg_price,
           {DAVG_SQL.format(x='l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary (TPC-H Q1 shape): grouped decimal-exact aggregates.",
    tags=("agg", "bench"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -- TPC-H Q3 shape: selective fact-fact join with broadcast dimension -------


@register(
    "q03_shipping_priority",
    f"""
    SELECT l_orderkey,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """,
    doc="Shipping priority (TPC-H Q3 shape): broadcast dim + fact join.",
    tags=("join", "agg", "bench"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# -- TPC-H Q5 shape: star join through two dimension chains ------------------


@register(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="Local supplier volume (TPC-H Q5 shape): 6-table star join.",
    tags=("join", "agg", "bench"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


# -- element assembly (J1/J2/J3 + A4): parent x ordered children lists -------
# Reference parity: fetch_associated merge (copy_elements.cpp:166-176) +
# per-element inner lists ordered by key bytes / sequence_id
# (extract_kv.cpp:73-91).  orders stands in for elements, lineitem for the
# 1:N inner table; the canonical ordered-list rendering proves the
# collect_list + array_sort semantics the XML/PBF sinks rely on.


@register(
    "assemble_order_lines",
    """
    SELECT o.o_orderkey,
           COALESCE(string_agg(l.l_linenumber, ',' ORDER BY l.l_linenumber), '') AS line_numbers,
           COUNT(l.l_orderkey) AS line_count,
           CAST(COALESCE(SUM(CAST(l.l_quantity AS DECIMAL(38,6))), 0) AS DOUBLE) AS total_qty
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    """,
    doc="Element-assembly join: parent + ordered child list (J1-J3, A4).",
    tags=("join", "assembly", "bench"),
)
def assemble_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("line_numbers"),
            F.count("l_orderkey").alias("line_count"),
            F.coalesce(
                F.sum(F.col("l_quantity").cast("decimal(38,6)")), F.lit(0)
            )
            .cast("double")
            .alias("total_qty"),
        )
    )


# -- history filter (A1): latest-version-per-id window -----------------------
# Reference parity: history_filter.cpp:30-257 keeps max version per id then
# drops invisible rows.  Here: latest event per user (ties broken by
# event_id desc), keeping only rows with value <= 450 as the "visible"
# stand-in (an arbitrary cut that leaves both kept and dropped rows).


@register(
    "latest_event_per_user",
    """
    SELECT event_id, user_id, ts, event_type,
           CAST(CAST(value AS DECIMAL(38,6)) AS DOUBLE) AS value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND value <= 450
    """,
    doc="Latest-version-per-id window + visibility filter (A1/F5).",
    tags=("window", "bench"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("value") <= 450))
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.col("value").cast("decimal(38,6)").cast("double").alias("value"),
        )
    )


# -- max-timestamp aggregate (A2) --------------------------------------------
# Reference parity: running max per table + global max across tables
# (table_extractor.hpp:10-19, planet-dump.cpp:144-151).


@register(
    "max_data_timestamp",
    """
    SELECT max(t) AS max_ts FROM (
      SELECT max(o_orderdate) AS t FROM orders
      UNION ALL SELECT max(l_shipdate) FROM lineitem
      UNION ALL SELECT max(ts) FROM events
    )
    """,
    doc="Global max timestamp across tables (A2) -> drives metadata header.",
    tags=("agg",),
)
def max_data_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        table(spark, sf_dir, "orders").agg(F.max("o_orderdate").alias("t")),
        table(spark, sf_dir, "lineitem").agg(F.max("l_shipdate").alias("t")),
        table(spark, sf_dir, "events").agg(F.max("ts").alias("t")),
    ]
    un = parts[0].unionAll(parts[1]).unionAll(parts[2])
    return un.agg(F.max("t").alias("max_ts"))


# -- attribution joins (J6/J7 + F4/F9): broadcast dim with anonymization -----
# Reference parity: uid->display_name only for data_public users
# (copy_elements.cpp:328-337); misses render anonymous (xml_writer.cpp:376-386).
# customer plays the users dimension; "public" = c_acctbal > 0.


@register(
    "event_attribution",
    """
    SELECT e.event_id,
           CASE WHEN c.c_custkey IS NOT NULL THEN e.user_id END AS uid,
           c.c_name AS display_name
    FROM events e
    LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0) c
      ON e.user_id = c.c_custkey
    """,
    doc="Broadcast attribution join with anonymous fallback (J6/J7/F4/F9).",
    tags=("join", "bench"),
)
def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pub = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_name")
    )
    joined = ev.join(F.broadcast(pub), ev.user_id == pub.c_custkey, "left")
    return joined.select(
        "event_id",
        F.when(F.col("c_custkey").isNotNull(), F.col("user_id")).alias("uid"),
        F.col("c_name").alias("display_name"),
    )


# -- comments_count (A3/F6): count of visible children per parent ------------


@register(
    "visible_event_counts",
    """
    SELECT user_id, COUNT(*) AS comments_count
    FROM events WHERE value > 0 GROUP BY user_id
    """,
    doc="Visible-children count per parent (A3/F6 comments_count).",
    tags=("agg",),
)
def visible_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("comments_count"))
    )


# -- redaction + negative-id filters (F2/F3) ---------------------------------


@register(
    "redaction_filter",
    """
    SELECT event_id, user_id, event_type
    FROM events
    WHERE props IS NOT NULL AND event_id >= 0
    """,
    doc="Redaction (IS NULL) + negative-id filters pushed to scan (F2/F3).",
    tags=("filter",),
)
def redaction_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull() & (F.col("event_id") >= 0))
        .select("event_id", "user_id", "event_type")
    )


# -- scalar surface: ISO-8601 Zulu formatting (C4/C5) ------------------------


@register(
    "iso8601_format",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts
    FROM events
    """,
    doc="ISO-8601 Zulu render (C4, xml_writer.cpp:81-123) + unix secs (C5).",
    tags=("scalar",),
)
def iso8601_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_ts"),
        F.unix_timestamp("ts").alias("unix_ts"),
    )


# -- scalar surface: fixed-point -> %.7f degrees (C6) ------------------------


@register(
    "fixed_point_degrees",
    """
    SELECT event_id, printf('%.7f', (event_id * 997 % 1800000000 - 900000000) / 10000000.0) AS degrees
    FROM events
    """,
    doc="Fixed-point int 1e-7 -> '%.7f' degree string (C6, xml_writer.cpp:14,546). "
    "Integer numerators terminate within 7 decimals, so rounding is tie-free.",
    tags=("scalar",),
)
def fixed_point_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    fixed = F.col("event_id") * 997 % 1800000000 - 900000000
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.format_string("%.7f", fixed / F.lit(10000000.0)).alias("degrees"),
    )


# -- implicit union with discriminator (SURVEY 2.5: 3 tag tables, one schema) -


@register(
    "union_element_counts",
    """
    SELECT src, COUNT(*) AS n, COUNT(DISTINCT id) AS n_ids FROM (
      SELECT 'order' AS src, o_orderkey AS id FROM orders
      UNION ALL SELECT 'line' AS src, l_orderkey AS id FROM lineitem
      UNION ALL SELECT 'event' AS src, event_id AS id FROM events
    ) GROUP BY src
    """,
    doc="unionByName with discriminator (the 3-tag-table implicit union).",
    tags=("setop",),
)
def union_element_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.lit("order").alias("src"), F.col("o_orderkey").alias("id")
    )
    l = table(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("src"), F.col("l_orderkey").alias("id")
    )
    e = table(spark, sf_dir, "events").select(
        F.lit("event").alias("src"), F.col("event_id").alias("id")
    )
    return (
        o.unionByName(l)
        .unionByName(e)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("id").alias("n_ids"))
    )
