"""Parquet staging + resume markers (reference operator S9).

The reference writes per-table sorted KV files once, then every output
pass re-reads them (src/dump_archive.cpp:28-63, '.complete' marker files
with a max-timestamp payload).  The Spark analog: decode each COPY table
ONCE into a parquet stage directory with a completion marker; every
downstream action then scans columnar parquet (pruned + pushed-down)
instead of re-parsing text — which matters doubly here because Spark
re-executes lineage per write action.

Resume semantics match dump_archive.cpp:37-54: a table with a marker is
skipped entirely; without a marker its stage dir is discarded and rebuilt.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MARKER = "_COMPLETE"


def stage_table(
    spark: SparkSession,
    df: DataFrame,
    stage_dir: str,
    table: str,
    resume: bool = False,
) -> DataFrame:
    """Write ``df`` to <stage_dir>/<table> parquet (idempotent) and return
    a DataFrame reading it back.  With ``resume`` and a completion marker
    present, skips the write and reads the existing stage."""
    path = os.path.join(stage_dir, table)
    marker = os.path.join(path, MARKER)
    # The read-back schema is the decode plan's own schema — passing it
    # explicitly skips the per-table parquet footer-inference job (12
    # staged tables = 12 jobs per pipeline run whose wall is pure
    # job-launch latency; the operators/lm.py read-back trick).  File
    # sources force user schemas nullable on read, which is exactly what
    # footer inference yields for these decoded tables, so the plan is
    # unchanged beyond the skipped jobs.
    if resume and os.path.exists(marker):
        return spark.read.schema(df.schema).parquet(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    df.write.mode("overwrite").parquet(path)
    with open(marker, "w") as fh:
        fh.write("complete\n")
    return spark.read.schema(df.schema).parquet(path)


def is_staged(stage_dir: str, table: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, table, MARKER))
