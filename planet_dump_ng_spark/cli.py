"""Command-line entry point mirroring the reference's flag surface
(src/planet-dump.cpp:27-114).

    python -m planet_dump_ng_spark.cli \\
        --dump-file liechtenstein.sql \\
        --xml planet.osm.bz2 --history-pbf history.osm.pbf

Differences from the reference, by design:
- ``--dump-file`` takes a PLAIN-format dump (``pg_restore -f -`` output);
  pg_restore against the custom format is one subprocess away and kept
  outside the engine.
- ``--compress-command`` is accepted for drop-in compatibility but
  only bzip2 and gzip semantics are honored, selected by output suffix:
  .bz2/.gz outputs are compressed cluster-parallel by the XML sink
  (multistream bz2 / multi-member gz) — no executor shells out, so an
  arbitrary compressor command cannot run and is rejected loudly rather
  than silently producing differently-encoded files.
- ``--max-concurrency`` maps to shuffle partitions (the Spark analog of
  per-table sort threads).
- ``--resume`` reuses the staged per-table parquet (operator S9) instead
  of re-splitting/re-parsing the dump.
"""

from __future__ import annotations

import argparse
import sys

from planet_dump_ng_spark import pipeline
from planet_dump_ng_spark.session import get_spark

#: (flag, kind, anonymize) — one output file per supplied flag, matching
#: the reference's writer list construction (planet-dump.cpp:180-240).
OUTPUT_FLAGS = [
    ("xml", "planet", False),
    ("xml_no_userinfo", "planet", True),
    ("history_xml", "history", False),
    ("history_xml_no_userinfo", "history", True),
    ("pbf", "pbf", False),
    ("pbf_no_userinfo", "pbf", True),
    ("history_pbf", "pbf-history", False),
    ("history_pbf_no_userinfo", "pbf-history", True),
    ("changesets", "changesets", False),
    ("changesets_no_userinfo", "changesets", True),
    ("changeset_discussions", "discussions", False),
    ("changeset_discussions_no_userinfo", "discussions", True),
]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="planet-dump-ng-spark",
        description="Convert an OpenStreetMap database dump to planet files.",
    )
    p.add_argument("--dump-file", "-f", required=True, help="plain-format pg dump")
    p.add_argument(
        "--dense-nodes",
        "-d",
        type=_parse_bool,
        default=True,
        metavar="BOOL",
        help="use dense nodes for PBF output (default true)",
    )
    p.add_argument("--work-dir", default=None, help="staging dir (default: <dump>.work)")
    p.add_argument("--generator", default="planet-dump-ng-spark")
    p.add_argument("--resume", action="store_true", help="reuse staged tables")
    p.add_argument("--max-concurrency", type=int, default=32, help="shuffle partitions")
    p.add_argument("--xml", "-x")
    p.add_argument("--history-xml", "-X")
    p.add_argument("--pbf", "-p")
    p.add_argument("--history-pbf", "-P")
    p.add_argument("--changesets", "-C")
    p.add_argument("--changeset-discussions", "-D")
    p.add_argument("--xml-no-userinfo")
    p.add_argument("--history-xml-no-userinfo")
    p.add_argument("--pbf-no-userinfo")
    p.add_argument("--history-pbf-no-userinfo")
    p.add_argument("--changesets-no-userinfo")
    p.add_argument("--changeset-discussions-no-userinfo")
    # data metainfo overrides (reference: planet-dump.cpp:62-72)
    p.add_argument("--meta-author", help="copyright attr override")
    p.add_argument("--meta-source", help="bound origin / PBF source override")
    p.add_argument("--meta-copyleft", help="license attr override")
    p.add_argument("--meta-attribution", help="attribution attr override")
    p.add_argument(
        "--meta-file", "-M", help="data metainfo configuration file (key=value)"
    )
    p.add_argument(
        "--compress-command",
        "-c",
        default="bzip2 -c",
        help="compression filter (reference planet-dump.cpp:34-35); only "
        "bzip2/gzip are honored — compression runs cluster-parallel in the sink, "
        "not through a shell",
    )
    return p


def check_compress_command(cmd: str) -> None:
    """Reject unknown compressors instead of silently mis-encoding.

    The reference pipes every XML writer through an arbitrary shell
    command; this engine compresses inside the executors (parallel
    multistream bz2 / multi-member gz — both formats concatenate
    legally), so only the two compressors reference users actually
    pass are honored, selected by the OUTPUT SUFFIX (.bz2/.gz)."""
    prog = (cmd or "").strip().split()
    known = ("bzip2", "pbzip2", "lbzip2", "gzip", "pigz")
    if not prog or prog[0].rsplit("/", 1)[-1] not in known:
        raise SystemExit(
            f"--compress-command {cmd!r} is not supported: compression is "
            "cluster-parallel inside the sink (no shell); use bzip2 or "
            "gzip (suffix-selected: .bz2/.gz), or emit an uncompressed "
            "path and recompress downstream"
        )


def _parse_bool(s: str) -> bool:
    """boost::program_options bool_switch value grammar
    (accepts the same spellings the reference's -d flag does)."""
    v = s.strip().lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"invalid bool: {s!r}")


#: meta-file key -> meta dict key (same mapping as the CLI flags)
_META_KEYS = {
    "meta-author": "copyright",
    "meta-source": "source",
    "meta-copyleft": "license",
    "meta-attribution": "attribution",
}


def parse_meta_file(path: str) -> dict:
    """Parse the --meta-file config (reference planet-dump.cpp:105-114:
    boost parse_config_file — ``key = value`` lines, ``#`` comments).

    Returns a meta dict with the same keys meta_from_args produces.
    Unknown keys error, matching boost's strict option registry."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for lineno, raw in enumerate(fh, 1):
            line = raw.split("#", 1)[0].strip()
            if not line or (line.startswith("[") and line.endswith("]")):
                continue  # section headers don't apply to our flat keys
            if "=" not in line:
                raise ValueError(f"{path}:{lineno}: expected key=value, got {raw!r}")
            k, v = (s.strip() for s in line.split("=", 1))
            if k not in _META_KEYS:
                raise ValueError(f"{path}:{lineno}: unknown metainfo key {k!r}")
            out[_META_KEYS[k]] = v
    return out


def meta_from_args(args: argparse.Namespace) -> dict:
    # boost po::store keeps the first-stored value, so explicit CLI flags
    # beat --meta-file entries (planet-dump.cpp:105-114): start from the
    # file and let flags overwrite.
    out = (
        parse_meta_file(args.meta_file)
        if getattr(args, "meta_file", None)
        else {}
    )
    for attr, key in [
        ("meta_author", "copyright"),
        ("meta_source", "source"),
        ("meta_copyleft", "license"),
        ("meta_attribution", "attribution"),
    ]:
        v = getattr(args, attr, None)
        if v:
            out[key] = v
    return out


def outputs_from_args(args: argparse.Namespace) -> list[pipeline.OutputSpec]:
    outs = []
    for attr, kind, anon in OUTPUT_FLAGS:
        path = getattr(args, attr, None)
        if path:
            outs.append(pipeline.OutputSpec(path, kind, anonymize=anon))
    return outs


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    check_compress_command(args.compress_command)
    outputs = outputs_from_args(args)
    if not outputs:
        print("at least one output flag is required", file=sys.stderr)
        return 2  # mirrors the reference's usage error (planet-dump.cpp:92-98)
    spark = get_spark("planet-dump-ng-spark", shuffle_partitions=args.max_concurrency)
    work_dir = args.work_dir or args.dump_file + ".work"
    pipeline.run_dump(
        spark,
        args.dump_file,
        outputs,
        work_dir,
        generator=args.generator,
        resume=args.resume,
        meta=meta_from_args(args),
        dense_nodes=args.dense_nodes,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
