"""Prefix-index lifecycle CLI — build, incrementally extend, compact,
and probe the persisted exact near-dup artifact (operators.dedup
``write_prefix_index`` / ``prefix_index_add`` / ``prefix_index_compact``
/ ``ngram_jaccard_join(corpus_index=...)``):

    python -m planet_dump_ng_spark.pindex_cli build \\
        --input corpus.parquet --index-dir ./pindex --threshold 0.5
    python -m planet_dump_ng_spark.pindex_cli add \\
        --input new_batch.parquet --index-dir ./pindex
    python -m planet_dump_ng_spark.pindex_cli compact --index-dir ./pindex
    python -m planet_dump_ng_spark.pindex_cli probe \\
        --input batch.parquet --index-dir ./pindex --threshold 0.8 \\
        [--out pairs.parquet]

The same build-once / extend-per-batch / probe-many shape as the
ann/bm25/dsir artifact CLIs: the index is two parquet tables (``docs``
shingle sets + ``pindex`` exploded prefix entries) under a meta.json
header recording k / threshold-floor / featurizer provenance, all
validated loudly at add and probe time.  ``probe`` emits the EXACT
(batch doc, corpus doc) Jaccard pairs at the requested threshold —
identical to a derive-from-corpus run, with per-batch cost following
the batch's candidate fan-out rather than a corpus rescan.  Probing
below the recorded floor refuses (pairs would silently be lost);
rebuild at the lower threshold instead.  This is the artifact
``curate(near_dedup="exact")`` persists beside its dataset — the CLI
serves corpora curated elsewhere or ad-hoc dedup sweeps.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-pindex")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="index a corpus from scratch")
    b.add_argument("--input", required=True, help="corpus documents parquet")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--k", type=int, default=3, help="shingle width in tokens")
    b.add_argument(
        "--threshold", type=float, default=0.5,
        help="the MINIMUM Jaccard the index will serve (prefix length "
        "floor; higher probe thresholds only over-index)",
    )

    a = sub.add_parser("add", help="extend the index with a new batch "
                       "(idempotent on the id column)")
    a.add_argument("--input", required=True, help="new documents parquet")
    a.add_argument("--index-dir", required=True)
    a.add_argument("--id-col", default="doc_id")
    a.add_argument("--text-col", default="text")

    c = sub.add_parser(
        "compact",
        help="rewrite docs/pindex at full width (merge the small files "
        "left by incremental adds; probe results unchanged)",
    )
    c.add_argument("--index-dir", required=True)

    q = sub.add_parser(
        "probe",
        help="exact (batch, corpus) near-dup pairs from the persisted index",
    )
    q.add_argument("--input", required=True, help="batch documents parquet")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--id-col", default="doc_id")
    q.add_argument("--text-col", default="text")
    q.add_argument(
        "--threshold", type=float, default=None,
        help="probe Jaccard threshold (default: the index's recorded "
        "floor); below the floor refuses.  Shingle width is always the "
        "index's recorded k — a different k cannot probe this index",
    )
    q.add_argument("--out", help="optional parquet path for the pair table")
    q.add_argument("--show", type=int, default=10,
                   help="print the first N pairs as JSON lines")
    return p


def main(argv: list[str] | None = None) -> int:
    from planet_dump_ng_spark.operators import dedup as dd
    from planet_dump_ng_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-pindex")
    if args.cmd == "build":
        meta = dd.write_prefix_index(
            spark.read.parquet(args.input),
            args.index_dir,
            text_col=args.text_col,
            id_col=args.id_col,
            k=args.k,
            threshold=args.threshold,
        )
        print(json.dumps(meta))
        return 0
    if args.cmd == "add":
        meta = dd.prefix_index_add(
            spark.read.parquet(args.input),
            args.index_dir,
            text_col=args.text_col,
            id_col=args.id_col,
        )
        print(json.dumps(meta))
        return 0
    if args.cmd == "compact":
        print(json.dumps(dd.prefix_index_compact(spark, args.index_dir)))
        return 0
    # probe
    _, _, meta = dd.read_prefix_index(spark, args.index_dir)
    pairs = dd.ngram_jaccard_join(
        spark.read.parquet(args.input),
        text_col=args.text_col,
        id_col=args.id_col,
        k=meta["k"],
        threshold=(
            args.threshold if args.threshold is not None
            else meta["threshold"]
        ),
        corpus_index=args.index_dir,
    )
    n = None
    if args.out:
        # the join runs ONCE, into the parquet; count and preview read
        # the materialized file instead of re-executing the probe
        pairs.write.mode("overwrite").parquet(args.out)
        pairs = spark.read.parquet(args.out)
        n = pairs.count()
    for row in pairs.limit(args.show).collect():
        print(json.dumps(row.asDict()))
    if n is not None:
        print(f"# {n} pairs -> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
