"""BM25 index lifecycle CLI — build, incrementally extend, and query
the persisted inverted-index artifact (operators.text_index):

    python -m planet_dump_ng_spark.bm25_cli build \\
        --input docs.parquet --index-dir ./idx
    python -m planet_dump_ng_spark.bm25_cli add \\
        --input new_batch.parquet --index-dir ./idx
    python -m planet_dump_ng_spark.bm25_cli query \\
        --index-dir ./idx --terms vector hash merge --k 10 \\
        [--out topk.parquet]

The index is two parquet tables (term-sharded postings + doc lengths)
and a meta.json header — build once, serve many; ``add`` tokenizes
only the new batch (idempotent on doc_id); ``query`` reads only the
query terms' shards, never the raw text, and returns exactly what
search_cli's direct path would (same scoring kernel).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-bm25")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="index a corpus from scratch")
    b.add_argument("--input", required=True, help="documents parquet")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--n-shards", type=int, default=64)

    a = sub.add_parser("add", help="index a new batch into an existing index")
    a.add_argument("--input", required=True, help="new documents parquet")
    a.add_argument("--index-dir", required=True)
    a.add_argument("--id-col", default="doc_id")
    a.add_argument("--text-col", default="text")

    c = sub.add_parser(
        "compact",
        help="rewrite postings/doclen at full width (merge the small "
        "files left by incremental adds; content and scores unchanged)",
    )
    c.add_argument("--index-dir", required=True)

    q = sub.add_parser("query", help="score terms from the persisted index")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--terms", required=True, nargs="+")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--k1", type=float, default=1.2)
    q.add_argument("--b", type=float, default=0.75)
    q.add_argument("--out", help="optional parquet path for the full scored table")
    return p


def main(argv: list[str] | None = None) -> int:
    from planet_dump_ng_spark.operators import text_index as ti
    from planet_dump_ng_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-bm25")

    if args.cmd == "build":
        docs = spark.read.parquet(args.input)
        postings, doclen = ti.build_bm25_index(
            docs, id_col=args.id_col, text_col=args.text_col,
            n_shards=args.n_shards,
        )
        ti.write_bm25_index(
            postings, doclen, args.index_dir, n_shards=args.n_shards
        )
        meta = ti.read_bm25_meta(args.index_dir)
        print(json.dumps({"built": args.index_dir, **meta}))
        return 0

    if args.cmd == "add":
        batch = spark.read.parquet(args.input)
        n_batch = batch.count()
        n_added = ti.bm25_index_add(
            spark, args.index_dir, batch,
            id_col=args.id_col, text_col=args.text_col,
        )
        print(json.dumps({
            "added": n_added,
            "skipped_existing": n_batch - n_added,
            "index": args.index_dir,
        }))
        return 0

    if args.cmd == "compact":
        stats = ti.bm25_index_compact(spark, args.index_dir)
        print(json.dumps({"compacted": args.index_dir, **stats}))
        return 0

    # query
    postings, doclen, meta = ti.read_bm25_index(spark, args.index_dir)
    scored = ti.bm25_index_query(
        spark, postings, doclen, args.terms,
        k1=args.k1, b=args.b, n_shards=meta["n_shards"],
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
