"""Semantic guarantees of the sketch operators — accuracy envelopes and
the structural properties (no Bloom false negatives, Count-Min never
undercounts) that the hash-exact oracles can't express by themselves."""

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import sketches as sk
from planet_dump_ng_spark.plans.registry import table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return table(spark, sf_dir, "lineitem")


def test_hll_estimate_accuracy(lineitem):
    rows = sk.hll_distinct(lineitem, "l_returnflag", "l_orderkey", p=8).collect()
    assert len(rows) == 3
    for r in rows:
        # raw-estimate regime (n/m >> 1): standard error ~1.04/sqrt(256)
        # = 6.5%; allow 3 sigma
        assert abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct < 0.20
        assert 0 < r.hll_registers <= 256


def test_hll_exact_small_group(spark):
    # every register empty except a handful: estimate degrades (that's the
    # documented linear-counting gap) but registers and plumbing stay sane
    df = spark.range(10).select(
        F.lit("g").alias("g"), (F.col("id") % 5).alias("v")
    )
    row = sk.hll_distinct(df, "g", "v", p=8).collect()[0]
    assert row.exact_distinct == 5
    assert row.hll_registers <= 5


def test_kmv_estimate_accuracy(lineitem):
    rows = sk.kmv_distinct(lineitem, "l_returnflag", "l_partkey", k=64).collect()
    assert len(rows) == 3
    for r in rows:
        # KMV std error ~1/sqrt(k-2) = 12.7%; allow 3 sigma
        assert abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct < 0.40


def test_kmv_small_group_is_exact(spark):
    df = spark.range(20).select(
        F.lit("g").alias("g"), (F.col("id") % 7).alias("v")
    )
    row = sk.kmv_distinct(df, "g", "v", k=64).collect()[0]
    # fewer than k distinct values: the sketch saw everything
    assert row.kmv_estimate == row.exact_distinct == 7


def test_bloom_no_false_negatives(spark, sf_dir, lineitem):
    build = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    out = sk.bloom_prune_join(
        lineitem, build, "l_orderkey", "o_orderkey", "l_returnflag"
    ).collect()
    assert out
    # every truly-matching key must pass the filter, so per group the
    # true matches equal the exact semi-join count
    exact = {
        r.l_returnflag: r.n
        for r in lineitem.join(
            build.select("o_orderkey").distinct(),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "semi",
        )
        .select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in out:
        assert r.n_true_match == exact[r.l_returnflag]
        assert r.n_false_pos >= 0
        assert r.n_bloom_pass == r.n_true_match + r.n_false_pos
        # m=65536, k=3 at this build size: FP rate well under 5%
        assert r.n_false_pos <= 0.05 * r.n_bloom_pass


def test_cms_never_undercounts(lineitem):
    rows = sk.cms_heavy_hitters(lineitem, "l_partkey", w=256, d=3, topk=20).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est_count >= r.exact_count
    # deterministic ordering: est desc, key asc
    keys = [(-r.est_count, r.key) for r in rows]
    assert keys == sorted(keys)


def test_cms_top_hitter_found(spark):
    # a planted heavy hitter dominates every bucket it lands in
    df = spark.range(1000).select(
        F.when(F.col("id") < 500, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    rows = sk.cms_heavy_hitters(df, "k", w=64, d=3, topk=5).collect()
    assert rows[0].key == 7
    assert rows[0].exact_count == 500
