"""SQL-API parity: ANSI-compatible oracle texts run UNCHANGED through
spark.sql over registered temp views and match the DataFrame-API plans —
the engine's SQL surface is the same query, not a translation."""

import pytest

from planet_dump_ng_spark import plans
from planet_dump_ng_spark.session import load_tables

plans.load_all()

#: queries whose oracle SQL is ANSI enough to execute on Spark verbatim
ANSI_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q02_min_acctbal_supplier",
    "q04_order_priority_semi",
    "q06_revenue_forecast",
    "q07_nation_volume",
    "q10_returned_topk",
    "q13_order_count_histogram",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q22_idle_rich_customers",
    "full_outer_activity",
    "key_set_ops",
    "event_value_ranks",
    "topk_lines_per_order",
    "global_top_orders",
    "rollup_revenue",
]


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    load_tables(spark, sf_dir)


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_sql_text_matches_dataframe_plan(spark, sf_dir, name):
    spec = plans.QUERIES[name]
    df_rows = spec.spark(spark, sf_dir).collect()
    sql_rows = spark.sql(spec.oracle).collect()
    key = lambda r: tuple(
        sorted((k, str(v)) for k, v in r.asDict().items())
    )
    assert sorted(map(key, df_rows)) == sorted(map(key, sql_rows)), name
