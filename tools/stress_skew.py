"""Zipf-skew stress probe: the uniform replication in stress_scale.py
preserves key cardinalities, so it never tests the ONE regime that kills
LSH/span/basket plans at 100 TB — a single hot key (viral boilerplate, a
mega order).  This tool builds a skewed twin of sf0.1:

- ``documents``: the base corpus plus Zipf-sized boilerplate clusters —
  cluster of rank r holds ceil(hot / r) EXACT copies of the rank-r base
  document (r = 1..n_clusters, fresh doc_ids).  The rank-1 cluster is a
  ``hot``-doc mega-bucket: all-pairs LSH emission would cost ~hot^2/2
  candidate rows from it, star emission exactly hot-1.
- ``lineitem``: the base table plus one mega order — ``hot_parts``
  synthetic lines on a single existing orderkey (the market-basket
  C(w,2) wedge).
- every other table: copied through unchanged.

Timed queries run on base sf0.1 vs the skewed twin; beside the wall
ratio the tool prints ``mass_ratio`` (skewed rows / base rows for the
table the query reads) — a healthy containment keeps
``ratio`` within a small factor of ``mass_ratio`` while a
pair-quadratic plan blows past it.

Usage: python tools/stress_skew.py [hot] [query ...]
Writes one JSON line; safe to re-run (reuses generated data for the
same ``hot``).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/pdng-stress-skew"
ID_BASE = 50_000_000  # synthetic ids start far above any real key
N_CLUSTERS = 50

DEFAULT_QUERIES = [
    # the containment pair: same semantics family, opposite cost model
    "dedup_lsh_star",
    "dedup_star_cluster_sizes",
    "dedup_incremental_lsh_capped",
    # linear-by-construction span/ngram paths under maximal span sharing
    "span_dedup_c4",
    "duplicated_ngram_fraction",
    # prefix-filtered exact family: the Zipf mega-cluster concentrates
    # posting mass on the boilerplate's smallest-hash shingles — the
    # audit shows it, and the pair join's cost should track its OUTPUT
    # (the cluster's true pair mass), never the corpus
    "prefix_posting_size_audit",
    "dedup_ngram_jaccard_prefix",
    # the mega-order wedge
    "market_basket_pairs",
]


def build(spark, hot: int) -> dict[str, float]:
    """Write the skewed twin; returns per-table row mass ratios."""
    from pyspark.sql import functions as F

    from planet_dump_ng_spark.plans.registry import table as load

    marker = os.path.join(DST, f".built-{hot}")
    rebuild = not os.path.exists(marker)
    if rebuild:
        shutil.rmtree(DST, ignore_errors=True)
        os.makedirs(DST, exist_ok=True)

    ratios: dict[str, float] = {}
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        df = load(spark, SRC, t)
        n_base = df.count()
        out = os.path.join(DST, f"{t}.parquet")
        if t == "documents":
            # Zipf clusters: rank r contributes ceil(hot / r) exact
            # copies of the rank-r document (ordered by doc_id)
            ranked = (
                df.orderBy("doc_id").limit(N_CLUSTERS).collect()
            )
            sizes = [max(1, -(-hot // (r + 1))) for r in range(N_CLUSTERS)]
            rows = []
            nid = ID_BASE
            for r, src_row in enumerate(ranked):
                d = src_row.asDict()
                for _ in range(sizes[r]):
                    c = dict(d)
                    c["doc_id"] = nid
                    nid += 1
                    rows.append(c)
            extra = spark.createDataFrame(rows, df.schema)
            skewed = df.unionByName(extra)
        elif t == "lineitem":
            # one mega order: hot//2 synthetic lines on the smallest
            # existing orderkey, each a distinct synthetic partkey
            k = df.agg(F.min("l_orderkey")).first()[0]
            proto = df.filter(F.col("l_orderkey") == k).limit(1)
            extra = (
                proto.crossJoin(
                    spark.range(max(1, hot // 2)).select(
                        F.col("id").alias("_i")
                    )
                )
                .withColumn("l_partkey", (F.col("_i") + ID_BASE))
                .withColumn(
                    "l_linenumber", (F.col("_i") + 100).cast("int")
                )
                .drop("_i")
                .select(*df.columns)
            )
            skewed = df.unionByName(extra)
        else:
            skewed = df
        if rebuild:
            skewed.write.mode("overwrite").parquet(out)
        ratios[t] = round(skewed.count() / max(n_base, 1), 2)
    if rebuild:
        open(marker, "w").close()
    return ratios


def main() -> int:
    from planet_dump_ng_spark import plans
    from planet_dump_ng_spark.session import get_spark

    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    names = sys.argv[2:] or DEFAULT_QUERIES
    plans.load_all()
    spark = get_spark("stress-skew", master="local[32]", shuffle_partitions=64)
    mass = build(spark, hot)

    out = {"hot": hot, "mass_ratio": mass, "queries": {}}
    for name in names:
        fn = plans.QUERIES[name].spark
        times = {}
        for label, d in (("t_base", SRC), ("t_skew", DST)):
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            times[label] = round(time.perf_counter() - t0, 2)
        times["ratio"] = round(times["t_skew"] / max(times["t_base"], 1e-9), 2)
        out["queries"][name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
