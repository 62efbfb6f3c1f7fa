"""Bigram-LM artifact lifecycle CLI — train the surprisal model once,
persist it, score any corpus under the frozen counts (the standalone
face of the ``curate(--max-surprisal-bits)`` gate):

    python -m planet_dump_ng_spark.lm_cli train \\
        --input docs.parquet --model-dir ./lm
    python -m planet_dump_ng_spark.lm_cli score \\
        --input crawl.parquet --model-dir ./lm --out scores.parquet
    python -m planet_dump_ng_spark.lm_cli gate \\
        --input crawl.parquet --model-dir ./lm --max-bits 4.6 \\
        --out kept.parquet

The artifact is two parquet tables of exact BIGINT bigram counts
(``cnt``: p, w, c and ``ctx``: p, cp) plus a meta.json header written
LAST as the commit marker (operators/lm.py — the dsir/tokenizer
crash-window protocol).  Scoring is integer bit-length backoff: a seen
bigram costs floor-log2(count(prev)) - floor-log2(count(prev,next))
bits, a novel continuation floor-log2(count(prev)) + 1, a novel
context floor-log2(total) + 1 — no libm anywhere, so scores are
bit-identical across engines and re-runs.  ``gate`` keeps docs whose
MEAN per-bigram surprisal clears the ceiling (docs with <2 tokens
carry no transition evidence and drop, matching the curation stage).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-lm")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="fit bigram counts and persist them")
    t.add_argument("--input", required=True, help="training corpus parquet")
    t.add_argument("--model-dir", required=True)
    t.add_argument("--text-col", default="text")

    s = sub.add_parser("score", help="score a corpus under frozen counts")
    s.add_argument("--input", required=True)
    s.add_argument("--model-dir", required=True)
    s.add_argument("--text-col", default="text")
    s.add_argument(
        "--id-col",
        default="doc_id",
        help="document id column of the input corpus (default doc_id)",
    )
    s.add_argument("--out", help="optional parquet path for the scores")

    g = sub.add_parser(
        "gate", help="keep docs whose mean surprisal clears the ceiling"
    )
    g.add_argument("--input", required=True)
    g.add_argument("--model-dir", required=True)
    g.add_argument("--text-col", default="text")
    g.add_argument(
        "--id-col",
        default="doc_id",
        help="document id column of the input corpus (default doc_id)",
    )
    g.add_argument(
        "--max-bits",
        type=float,
        required=True,
        help="surprisal ceiling in mean bits per bigram (the curation "
        "stage's --max-surprisal-bits)",
    )
    g.add_argument("--out", help="optional parquet path for the kept docs")
    return p


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import functions as F

    from planet_dump_ng_spark.operators import lm
    from planet_dump_ng_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-lm")

    if args.cmd == "train":
        docs = spark.read.parquet(args.input)
        meta = lm.write_bigram_lm(docs, args.model_dir, text_col=args.text_col)
        print(
            f"{'trained':12s} {meta['n_bigrams']} bigram instances, "
            f"{meta['n_bigram_types']} types, "
            f"{meta['n_contexts']} contexts"
        )
        return 0

    docs = spark.read.parquet(args.input)
    scores = lm.score_with_bigram_lm(
        docs, args.model_dir, text_col=args.text_col, id_col=args.id_col
    )
    if args.cmd == "score":
        if args.out:
            scores.write.mode("overwrite").parquet(args.out)
        row = scores.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("mean_bits").alias("m"),
            F.sum("n_oov_bigrams").alias("oov"),
        ).first()
        print(
            f"{'scored':12s} {row['n']} docs, corpus mean "
            f"{row['m']:.3f} bits/bigram, {row['oov']} OOV bigrams"
        )
        return 0

    # gate
    keep = scores.filter(F.col("mean_bits") <= F.lit(args.max_bits)).select(
        args.id_col
    )
    kept = docs.join(keep, args.id_col, "left_semi")
    if args.out:
        kept.write.mode("overwrite").parquet(args.out)
    n_in, n_keep = docs.count(), kept.count()
    print(f"{'gated':12s} kept {n_keep}/{n_in} docs at {args.max_bits} bits")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
