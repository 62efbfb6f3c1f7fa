"""PBF ingest CLI — planet/history .osm.pbf into analytics-ready parquet:

    python -m planet_dump_ng_spark.ingest_cli \\
        --input planet.osm.pbf --output /data/osm \\
        [--kinds nodes ways relations] [--partitions 0]

Writes one parquet dataset per element kind (``<output>/nodes`` etc.)
via the blob-granular parallel reader (sources.pbf_source.read_pbf_df:
the file is indexed once on the driver — a metadata-only scan of blob
headers — then decoded blob-range-parallel in executors, so ingest
scales with cores, not file count).  Tags land as sorted (k, v) struct
arrays, timestamps as unix seconds, anonymous elements as NULL
uid/user — the same shapes the PBF sink emits, so sink-then-ingest
round-trips (pinned in tests/test_golden_pbf.py).

Prints one JSON line per kind: {"kind": ..., "rows": N, "path": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

KINDS = ("nodes", "ways", "relations")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-ingest")
    p.add_argument("--input", required=True, help=".osm.pbf file")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--kinds",
        nargs="+",
        default=list(KINDS),
        choices=KINDS,
        help="element kinds to extract (default: all three)",
    )
    p.add_argument(
        "--partitions",
        type=int,
        default=0,
        help="decode parallelism (0 = min(blob count, 64))",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from planet_dump_ng_spark.session import get_spark
    from planet_dump_ng_spark.sources.pbf_source import read_pbf_df

    args = build_parser().parse_args(argv)
    if not os.path.isfile(args.input):
        print(f"ingest: no such file: {args.input}", file=sys.stderr)
        return 2
    spark = get_spark("planet-dump-ng-spark-ingest")
    for kind in args.kinds:
        df = read_pbf_df(spark, args.input, kind, n_partitions=args.partitions)
        path = os.path.join(args.output, kind)
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        print(json.dumps({"kind": kind, "rows": n, "path": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
