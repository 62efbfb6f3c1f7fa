"""JSONL document connector — the training-corpus interchange format.

Web-scale corpora (Common Crawl derivatives, chat logs, instruction
sets) ship as newline-delimited JSON; this connector reads them with an
EXPLICIT schema (never schema inference, which costs a full extra pass
over 100 TB and can silently widen types between drops) and quarantines
malformed lines instead of failing the job or silently dropping them —
auditable ingest is the same attrition-accounting philosophy as
llm_pipeline.CurationReport.

Scale notes: the JSON line parse is JVM-side (Jackson inside the
FileScan), splittable per line for uncompressed/bzip2 inputs, and the
schema projection prunes unparsed fields at the scan.  Corrupt-record
capture is Spark's PERMISSIVE mode with a named rescue column, so one
pass yields both the clean table and the quarantine — no second read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: canonical documents schema (matches the synthetic documents table);
#: the rescue column must be nullable string and NOT part of the data.
DOCUMENTS_JSONL_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint, _corrupt string"
)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(clean docs, quarantine) from a JSONL directory or file.

    A line is quarantined when it is not valid JSON or when a typed
    field fails to cast (PERMISSIVE mode nulls the row and fills the
    rescue column with the raw line).  The clean side drops the rescue
    column; the quarantine side carries the raw line plus the input
    file for triage.  Rows that parse but lack ``doc_id`` are
    quarantined too — a document without an identity cannot be
    deduplicated or split deterministically downstream.
    """
    raw = (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    bad = raw.filter(
        F.col("_corrupt").isNotNull() | F.col("doc_id").isNull()
    ).select(
        F.coalesce(F.col("_corrupt"), F.to_json(F.struct("*"))).alias(
            "raw_line"
        ),
        F.input_file_name().alias("input_file"),
    )
    good = raw.filter(
        F.col("_corrupt").isNull() & F.col("doc_id").isNotNull()
    ).drop("_corrupt")
    return good, bad


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Partitioned JSONL writer (one file per partition, executor-
    parallel) — the interchange-format export side."""
    docs.write.mode("overwrite").json(path)
