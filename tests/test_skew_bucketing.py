"""Salted join equivalence + bucketed join exchange elimination."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import skew


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i, 1 if i % 3 else 2) for i in range(100)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unused")], "rk long, label string"
    )
    plain = {
        (r.row_id, r.label)
        for r in left.join(right, left.k == right.rk, "left").collect()
    }
    salted = {
        (r.row_id, r.label)
        for r in skew.salted_join(left, right, "k", "rk", n_salts=4).collect()
    }
    assert salted == plain


def test_salted_join_inner(spark):
    left = spark.createDataFrame([(1, 10), (2, 99)], "id long, k long")
    right = spark.createDataFrame([(10, "a")], "rk long, v string")
    rows = skew.salted_join(left, right, "k", "rk", n_salts=3, how="inner").collect()
    assert [(r.id, r.v) for r in rows] == [(1, "a")]


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    skew.write_bucketed(a, "bk_a", ["k"], n_buckets=8, sort_cols=["k"])
    skew.write_bucketed(b, "bk_b", ["k"], n_buckets=8, sort_cols=["k"])
    try:
        joined = skew.read_bucketed(spark, "bk_a").join(
            skew.read_bucketed(spark, "bk_b"), "k"
        )
        text = _plan(joined)
        assert "Exchange" not in text, text  # co-located: shuffle-free join
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
