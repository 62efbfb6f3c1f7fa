"""Distributed OSM PBF source: read a .osm.pbf back into typed
DataFrames, parallelized at blob granularity.

The sink's counterpart (sinks/pbf_sink.py writes, this reads — round-trip
pinned by tests).  Plan shape: one cheap sequential pass over the file
reads ONLY the 4-byte+BlobHeader framing to index blob (offset, size)
extents (no decompression — IO is a seek per blob), then Spark
parallelizes the actual zlib + protobuf decode across blob ranges via
``mapPartitions``; each task re-opens the file and decodes its slice.
At cluster scale the file lives on a shared FS and the index pass reads
~50 bytes per ~4 MiB blob.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

from planet_dump_ng_spark.functions import protowire as pw

NODES_SCHEMA = (
    "id long, version long, visible boolean, ts long, changeset_id long, "
    "uid long, user string, latitude long, longitude long, "
    "tags array<struct<k:string,v:string>>"
)
WAYS_SCHEMA = (
    "id long, version long, visible boolean, ts long, changeset_id long, "
    "uid long, user string, nds array<long>, "
    "tags array<struct<k:string,v:string>>"
)
RELATIONS_SCHEMA = (
    "id long, version long, visible boolean, ts long, changeset_id long, "
    "uid long, user string, "
    "members array<struct<member_type:string,member_id:long,member_role:string>>, "
    "tags array<struct<k:string,v:string>>"
)


def index_blobs(path: str) -> list[tuple[str, int, int]]:
    """Sequential framing scan: [(blob_type, payload_offset, total_len)].
    Reads headers only — never blob bodies."""
    out = []
    with open(path, "rb") as fh:
        while True:
            head = fh.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">i", head)
            bh = fh.read(hlen)
            btype, dsize = "", 0
            for field, _, val in pw.iter_fields(bh):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    dsize = val
            offset = fh.tell()
            out.append((btype, offset, dsize))
            fh.seek(offset + dsize)
    return out


def _decode_slice(path: str, kind: str):
    """Partition worker: decode this partition's (offset, size) blob
    extents and yield rows of the requested element kind."""
    from planet_dump_ng_spark.sinks import pbf_sink

    def run(rows):
        import zlib

        with open(path, "rb") as fh:
            for r in rows:
                fh.seek(r.offset)
                blob = fh.read(r.size)
                payload = b""
                for field, _, val in pw.iter_fields(blob):
                    if field == 1:
                        payload = val
                    elif field == 3:
                        payload = zlib.decompress(val)
                nodes: list = []
                ways: list = []
                relations: list = []
                pbf_sink._parse_block(payload, nodes, ways, relations)
                if kind == "nodes":
                    for n in nodes:
                        yield (*n[:7], n[7], n[8], list(n[9]))
                elif kind == "ways":
                    for w in ways:
                        yield (*w[:7], list(w[7]), list(w[8]))
                else:
                    for rel in relations:
                        yield (*rel[:7], list(rel[7]), list(rel[8]))

    return run


def read_pbf_df(
    spark: SparkSession, path: str, kind: str = "nodes", n_partitions: int = 0
) -> DataFrame:
    """Parallel PBF read: ``kind`` in nodes/ways/relations.

    Tags come back as sorted (k, v) structs; timestamps as unix seconds
    (``ts``); anonymous elements carry NULL uid/user.
    """
    schema = {
        "nodes": NODES_SCHEMA,
        "ways": WAYS_SCHEMA,
        "relations": RELATIONS_SCHEMA,
    }[kind]
    extents = [
        (off, size)
        for btype, off, size in index_blobs(path)
        if btype == "OSMData"
    ]
    if not extents:
        return spark.createDataFrame([], schema)
    n_partitions = n_partitions or min(len(extents), 64)
    ext_df = spark.createDataFrame(extents, "offset long, size long").repartition(
        n_partitions
    )
    rdd = ext_df.rdd.mapPartitions(_decode_slice(path, kind))
    return spark.createDataFrame(rdd, schema)
