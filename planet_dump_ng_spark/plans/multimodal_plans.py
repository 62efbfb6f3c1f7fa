"""Multimodal pipeline entries.  The decode step is a deterministic stub
(operators.multimodal) whose outputs derive from sha256 of the payload;
DuckDB has sha256 too, so even the stub path is fully oracle-checked —
the hash-match proves the mapInPandas plumbing (batch shape, schema,
frame explode) end-to-end, while the decoder body stays an honestly
marked fake.  tests/test_multimodal.py additionally pins exact values
against a pure-Python reference."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from planet_dump_ng_spark.operators import multimodal as mm
from planet_dump_ng_spark.plans.registry import register, table

_FMT = (
    "CASE WHEN doc_id % 3 = 0 THEN 'png' "
    "WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'mp4' END"
)


def _hex_byte(i: int) -> str:
    """Value of byte ``i`` (0-based) of the hex digest column ``h``."""
    return (
        f"(strpos('0123456789ABCDEF', substr(h, {2 * i + 1}, 1)) * 16"
        f" + strpos('0123456789ABCDEF', substr(h, {2 * i + 2}, 1)) - 17)"
    )


#: replica of operators.multimodal._fake_decode over DuckDB's sha256
_META_SQL = f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           {_FMT} AS format,
           CAST(16 + {_hex_byte(0)} % 240 AS INT) AS width,
           CAST(16 + {_hex_byte(1)} % 240 AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 IN (0, 1) THEN 1
                     ELSE 1 + {_hex_byte(2)} % 120 END AS INT) AS n_frames
    FROM (SELECT doc_id, text, upper(sha256(text)) AS h FROM documents)
"""


@register(
    "multimodal_image_meta",
    _META_SQL,
    doc="Binary payload -> mapInPandas decode -> typed metadata (stubbed "
    "decoder, real Arrow plumbing); the oracle replays the sha256-derived "
    "stub, hash-checking the whole decode path.",
    tags=("multimodal",),
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return mm.decode_image_meta(mm.attach_binary_payload(docs))


@register(
    "multimodal_frame_sample",
    f"""
    WITH meta AS ({_META_SQL})
    SELECT doc_id, format,
           unnest(list_transform(range(0, n_frames, 30), x -> CAST(x AS INT)))
             AS frame_idx
    FROM meta WHERE n_frames > 1
    """,
    doc="Frame sampling explode over decoded video metadata (one row per "
    "sampled frame index).",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    meta = mm.decode_image_meta(mm.attach_binary_payload(docs))
    return mm.sample_frames(meta, every_n=30)


@register(
    "multimodal_payload_stats",
    """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg'
                ELSE 'mp4' END AS format,
           COUNT(*) AS n_docs,
           -- DuckDB SUM(BIGINT) yields HUGEINT (int128); cast back so the
           -- column type matches Spark's bigint.
           CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
             AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY format
    """,
    doc="Payload-level stats on the binary column (oracle-checked: byte "
    "lengths are engine-exact even though decode is not).",
    tags=("multimodal", "agg"),
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    wp = mm.attach_binary_payload(docs)
    return (
        wp.groupBy(F.col("media_meta.format").alias("format"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("payload").cast("bigint")).alias("total_bytes"),
            F.max(F.length("payload")).cast("bigint").alias("max_bytes"),
        )
    )


@register(
    "multimodal_resize_meta",
    f"""
    WITH meta AS ({_META_SQL})
    SELECT doc_id, format, width, height,
           CAST(greatest(1, floor(width * least(1.0, 64.0 / greatest(width, height))))
             AS INT) AS out_width,
           CAST(greatest(1, floor(height * least(1.0, 64.0 / greatest(width, height))))
             AS INT) AS out_height
    FROM meta
    """,
    doc="Aspect-preserving resize at the metadata level "
    "(operators.multimodal.resize_meta): the scaled dimensions the real "
    "resizer would produce; the double scale factor and floor are "
    "engine-exact.",
    tags=("multimodal",),
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    meta = mm.decode_image_meta(mm.attach_binary_payload(docs))
    return mm.resize_meta(meta, max_side=64).select(
        "doc_id", "format", "width", "height", "out_width", "out_height"
    )


@register(
    "multimodal_payload_dedup",
    """
    SELECT upper(sha256(text)) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies,
           CAST(MIN(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes
    FROM documents
    GROUP BY content_hash
    """,
    doc="Exact dedup over the opaque binary payload column: group by the "
    "full sha256 content hash (computed JVM-side on the bytes, no "
    "Python round-trip), keep the lowest doc_id.  The canonical "
    "asset-dedup step for image/audio corpora — payloads never leave "
    "the executor, and the hash groupBy is one map-side-combinable "
    "shuffle of 32-byte keys, not payloads.",
    tags=("multimodal", "dedup"),
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    wp = mm.attach_binary_payload(docs)
    return wp.groupBy(
        F.upper(F.sha2("payload", 256)).alias("content_hash")
    ).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.length("payload")).cast("bigint").alias("n_bytes"),
    )


def _audio_energy_sql(n_windows: int = 8) -> str:
    bytes_ = ", ".join(f"{_hex_byte(3 + i)}" for i in range(n_windows))
    return f"""
    SELECT doc_id,
           CAST({n_windows} AS INT) AS n_windows,
           CAST(list_max([{bytes_}]) AS INT) AS peak_energy,
           CAST(list_sum([{bytes_}]) AS DOUBLE) / {n_windows} AS mean_energy
    FROM (SELECT doc_id, upper(sha256(text)) AS h FROM documents
          WHERE doc_id % 3 = 2)
    """


@register(
    "multimodal_audio_energy",
    _audio_energy_sql(),
    doc="Audio modality: per-window energy extraction over the payloads "
    "whose format carries an audio track, reduced to peak/mean per doc "
    "(operators.multimodal.audio_energy_stats).  The decoder is the "
    "honestly-marked sha256 stub; the oracle replays it byte-for-byte, "
    "hash-checking the Arrow mapInPandas plumbing (batch shape, filter "
    "pushdown ahead of the Python stage, fixed output schema) exactly "
    "as the image path does.  Mean is an exact integer sum / constant.",
    tags=("multimodal",),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return mm.audio_energy_stats(mm.attach_binary_payload(docs))


@register(
    "modality_coverage",
    """
    WITH d AS (SELECT doc_id FROM documents),
    e AS (SELECT vec_id FROM embeddings)
    SELECT CAST(COUNT(d.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(e.vec_id) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_paired,
           CAST(SUM(CASE WHEN e.vec_id IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_docs_missing_vector,
           CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_orphan_vectors,
           CAST(SUM(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
                    THEN 1 ELSE 0 END) AS DOUBLE)
             / greatest(COUNT(d.doc_id), 1) AS coverage
    FROM d FULL OUTER JOIN e ON e.vec_id = d.doc_id
    """,
    doc="Cross-modality integrity audit: full-outer reconciliation of the "
    "text corpus against the embedding store (vec_id = doc_id contract) "
    "— paired mass, docs missing a vector (semantic stages silently "
    "skip them: llm_pipeline.curate's left_anti contract), and orphan "
    "vectors (stale embeddings for deleted docs — wasted index space "
    "and a staleness signal).  One full-outer join on the id + one "
    "aggregate; at scale both sides are id-bucketed so the join "
    "co-locates.",
    tags=("multimodal", "agg"),
)
def modality_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id")
    e = table(spark, sf_dir, "embeddings").select("vec_id")
    j = d.join(e, d.doc_id == e.vec_id, "full_outer")
    paired = (F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull()).cast(
        "int"
    )
    return j.agg(
        F.count("doc_id").cast("bigint").alias("n_docs"),
        F.count("vec_id").cast("bigint").alias("n_vectors"),
        F.sum(paired).cast("bigint").alias("n_paired"),
        F.sum(F.col("vec_id").isNull().cast("int"))
        .cast("bigint")
        .alias("n_docs_missing_vector"),
        F.sum(F.col("doc_id").isNull().cast("int"))
        .cast("bigint")
        .alias("n_orphan_vectors"),
        (
            F.sum(paired).cast("double")
            / F.greatest(F.count("doc_id"), F.lit(1))
        ).alias("coverage"),
    )
