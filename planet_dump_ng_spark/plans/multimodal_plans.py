"""Multimodal pipeline entries.  The decode step is a deterministic stub
(operators.multimodal) whose outputs depend on sha256 of the payload —
not SQL-expressible, so these register rows-only (the driver's weaker
check); tests/test_multimodal.py pins exact values against a pure-Python
reference."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from planet_dump_ng_spark.operators import multimodal as mm
from planet_dump_ng_spark.plans.registry import register, table


@register(
    "multimodal_image_meta",
    None,  # sha256-derived stub decode is not SQL-expressible
    doc="Binary payload -> mapInPandas decode -> typed metadata (stubbed "
    "decoder, real Arrow plumbing).",
    tags=("multimodal",),
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return mm.decode_image_meta(mm.attach_binary_payload(docs))


@register(
    "multimodal_frame_sample",
    None,
    doc="Frame sampling explode over decoded video metadata.",
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
