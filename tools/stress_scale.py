"""10x scale-stress probe: replicate the sf0.1 tables with offset keys
into /tmp/pdng-stress (approximately sf1), then time the heaviest
registry queries there vs sf0.1.

Replication keeps per-key cardinalities and distributions (each copy
offsets every id-like column by copy * stride, so joins match within a
copy and never across copies) — the ratio t(10x)/t(1x) against the 10x
data growth is the direct super-linearity signal for the queries whose
cost model matters most at 100 TB.

Usage: python tools/stress_scale.py [n_copies] [query ...]
Writes one JSON line; safe to re-run (reuses the generated data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/pdng-stress"
STRIDE = 10_000_000

#: id-like columns to offset per table (non-key columns replicate as-is;
#: foreign keys offset together so joins stay within a copy)
TABLES = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "part": [],
    "supplier": [],
    "nation": [],
    "region": [],
}

DEFAULT_QUERIES = [
    "dedup_semantic_ivf",
    "bpe_learn_merges",
    "dedup_minhash_lsh",
    "market_basket_pairs",
    "bloom_join_prune",
    "duplicated_ngram_fraction",
    "binned_quantile_estimate",
    "assemble_order_lines",
    "ngram_containment_pairs",
    "ann_ivfpq_topk",
    "quality_classifier_score",
    "exact_substring_duplication",
    "bm25_keyword_search",
    "hybrid_rrf_search",
    "minhash_jaccard_estimate",
    "doc_unigram_surprisal",
]


def build(spark, n_copies: int) -> None:
    from pyspark.sql import functions as F

    from planet_dump_ng_spark.plans.registry import table as load

    os.makedirs(DST, exist_ok=True)
    for t, keys in TABLES.items():
        out = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = load(spark, SRC, t)
        copies = df.crossJoin(
            spark.range(n_copies).select(F.col("id").alias("_copy"))
        )
        for k in keys:
            copies = copies.withColumn(
                k, F.col(k) + F.col("_copy") * STRIDE
            )
        copies.drop("_copy").write.mode("overwrite").parquet(out)


def main() -> int:
    from planet_dump_ng_spark import plans
    from planet_dump_ng_spark.session import get_spark

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    plans.load_all()
    spark = get_spark("stress", master="local[32]", shuffle_partitions=64)
    build(spark, n_copies)

    out = {"n_copies": n_copies, "queries": {}}
    for name in names:
        fn = plans.QUERIES[name].spark
        times = {}
        for label, d in (("t_base", SRC), ("t_stress", DST)):
            t0 = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            times[label] = round(time.perf_counter() - t0, 2)
        times["ratio"] = round(times["t_stress"] / max(times["t_base"], 1e-9), 2)
        out["queries"][name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
