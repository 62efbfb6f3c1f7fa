"""DSIR model lifecycle CLI — train the bucket-score model once,
persist it, weight or select from any corpus with the frozen scores:

    python -m planet_dump_ng_spark.dsir_cli train \\
        --input docs.parquet --model-dir ./dsir --target "lang = 'en'"
    python -m planet_dump_ng_spark.dsir_cli score \\
        --input crawl.parquet --model-dir ./dsir --out weights.parquet
    python -m planet_dump_ng_spark.dsir_cli select \\
        --input crawl.parquet --model-dir ./dsir --k 1000 --out kept.parquet

The artifact is one parquet table (bucket, target_count, raw_count,
delta_q20 — exact integers) plus a meta.json header written LAST as the
commit marker; ``--target`` is any SQL boolean expression over the
input's columns, recorded verbatim in the header as provenance.
``score``/``select`` run one feature scan over the batch and a
broadcast join of the dimension-sized score table; selection is
deterministic top-k by mean per-feature weight.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-dsir")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="fit bucket scores and persist them")
    t.add_argument("--input", required=True, help="raw corpus parquet")
    t.add_argument("--model-dir", required=True)
    t.add_argument(
        "--target",
        required=True,
        help="SQL boolean expression marking target-distribution rows, "
        "e.g. \"lang = 'en'\" or \"source = 'curated'\"",
    )
    t.add_argument("--text-col", default="text")
    t.add_argument("--n-buckets", type=int, default=4096)

    s = sub.add_parser("score", help="weight a corpus under frozen scores")
    s.add_argument("--input", required=True)
    s.add_argument("--model-dir", required=True)
    s.add_argument("--text-col", default="text")
    s.add_argument(
        "--id-col",
        default="doc_id",
        help="document id column of the input corpus (default doc_id)",
    )
    s.add_argument("--out", help="optional parquet path for the weights")

    k = sub.add_parser("select", help="top-k docs by mean feature weight")
    k.add_argument("--input", required=True)
    k.add_argument("--model-dir", required=True)
    k.add_argument("--text-col", default="text")
    k.add_argument(
        "--id-col",
        default="doc_id",
        help="document id column of the input corpus (default doc_id)",
    )
    k.add_argument("--k", type=int, required=True)
    k.add_argument("--out", help="optional parquet path for the selection")
    return p


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import functions as F

    from planet_dump_ng_spark.operators import dsir as ds
    from planet_dump_ng_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-dsir")

    if args.cmd == "train":
        docs = spark.read.parquet(args.input)
        meta = ds.write_dsir_model(
            docs,
            F.expr(args.target),
            args.model_dir,
            text_col=args.text_col,
            n_buckets=args.n_buckets,
            target_desc=args.target,
        )
        print(json.dumps({"trained": args.model_dir, **meta}))
        return 0

    docs = spark.read.parquet(args.input)
    if args.id_col not in docs.columns:
        raise SystemExit(
            f"--id-col {args.id_col!r} is not a column of {args.input} "
            f"(columns: {', '.join(docs.columns)})"
        )
    w = ds.dsir_score_with_model(
        docs, args.model_dir, text_col=args.text_col, id_col=args.id_col
    )
    if args.cmd == "select":
        mean_bits = (
            F.col("logw_q20").cast("double")
            / F.col("n_feats")
            / F.lit(1048576.0)
        ).alias("mean_logw_bits")
        w = (
            w.select(args.id_col, "n_feats", "logw_q20", mean_bits)
            .orderBy(F.col("mean_logw_bits").desc(), args.id_col)
            .limit(args.k)
        )
    if args.out:
        w.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"written": args.out, "n_rows": spark.read.parquet(args.out).count()}))
    else:
        stats = w.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("logw_q20").alias("min_q20"),
            F.max("logw_q20").alias("max_q20"),
        ).first()
        print(
            json.dumps(
                {
                    "n_docs": stats["n_docs"],
                    "min_logw_bits": (stats["min_q20"] or 0) / 1048576.0,
                    "max_logw_bits": (stats["max_q20"] or 0) / 1048576.0,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
