"""Corpus keyword-search CLI — BM25 retrieval over a documents parquet
with arbitrary user terms (operators.text.bm25_scores):

    python -m planet_dump_ng_spark.search_cli \\
        --input docs.parquet --terms vector hash merge \\
        --k 10 [--out topk.parquet]

Prints the top-k (doc_id, matched terms, score) as JSON lines; with
``--out`` also writes the FULL scored table as parquet for downstream
joins.  Cost is proportional to documents containing a term, not the
corpus (term-filtered inverted explode; df/avgdl broadcast aggregates).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-search")
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--terms", required=True, nargs="+", help="query terms")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--k1", type=float, default=1.2)
    p.add_argument("--b", type=float, default=0.75)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--out", help="optional parquet path for the full scored table")
    return p


def main(argv: list[str] | None = None) -> int:
    from planet_dump_ng_spark.operators.text import bm25_scores
    from planet_dump_ng_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-search")
    docs = spark.read.parquet(args.input)
    scored = bm25_scores(
        docs, args.terms, k1=args.k1, b=args.b,
        id_col=args.id_col, text_col=args.text_col,
    )
    if args.out:
        scored.write.mode("overwrite").parquet(args.out)
    top = scored.orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    ).limit(args.k)
    for r in top.collect():
        print(json.dumps({
            "doc_id": r.doc_id,
            "n_matched_terms": r.n_matched_terms,
            "bm25_score": r.bm25_score,
        }))
    scored.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
