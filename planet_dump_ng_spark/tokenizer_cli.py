"""BPE tokenizer lifecycle CLI — train the merge rules once, persist
the artifact, encode any corpus with the frozen rules:

    python -m planet_dump_ng_spark.tokenizer_cli train \\
        --input docs.parquet --tokenizer-dir ./tok --n-merges 64
    python -m planet_dump_ng_spark.tokenizer_cli encode \\
        --input other.parquet --tokenizer-dir ./tok --out stats.parquet

The artifact is two parquet tables (merge rules in round order + the
final symbol vocabulary) and a meta.json header written last as the
commit marker; ``encode`` replays the rules on the new corpus's
distinct-word table only (operators.tokenizer.bpe_apply_stats) and is
pinned bit-equal to training-time encoding in tests.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-tokenizer")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="learn merge rules and persist them")
    t.add_argument("--input", required=True, help="documents parquet")
    t.add_argument("--tokenizer-dir", required=True)
    t.add_argument("--text-col", default="text")
    t.add_argument("--n-merges", type=int, default=8)

    e = sub.add_parser("encode", help="encode a corpus with frozen rules")
    e.add_argument("--input", required=True, help="documents parquet")
    e.add_argument("--tokenizer-dir", required=True)
    e.add_argument("--text-col", default="text")
    e.add_argument("--out", help="optional parquet path for per-doc stats")
    return p


def main(argv: list[str] | None = None) -> int:
    from planet_dump_ng_spark.operators import tokenizer as tk
    from planet_dump_ng_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-tokenizer")

    if args.cmd == "train":
        docs = spark.read.parquet(args.input)
        meta = tk.write_bpe_tokenizer(
            docs, args.tokenizer_dir,
            text_col=args.text_col, n_merges=args.n_merges,
        )
        print(json.dumps({"trained": args.tokenizer_dir, **meta}))
        return 0

    # encode
    merges, meta = tk.read_bpe_tokenizer(spark, args.tokenizer_dir)
    docs = spark.read.parquet(args.input)
    stats = tk.bpe_apply_stats(docs, merges, text_col=args.text_col)
    if args.out:
        # summarize from the written parquet, not the live plan — the
        # encode job must run once, not once per action
        stats.write.mode("overwrite").parquet(args.out)
        stats = spark.read.parquet(args.out)
    from pyspark.sql import functions as F

    row = stats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(c).alias(c) for c in ("n_tokens", "n_chars", "n_symbols")],
    ).first()
    print(json.dumps({
        "encoded_docs": row["n_docs"],
        "n_tokens": row["n_tokens"],
        "n_chars": row["n_chars"],
        "n_symbols": row["n_symbols"],
        **meta,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
