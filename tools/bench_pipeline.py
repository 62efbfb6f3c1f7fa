#!/usr/bin/env python
"""End-to-end OSM pipeline benchmark: full dump -> planet XML + history
XML + planet PBF + history PBF + changesets, timed per phase.

    python tools/bench_pipeline.py [dump.(sql|dmp)] [work_dir]

Defaults to the reference's Liechtenstein fixture (needs pg_restore).
Prints one JSON line: {"metric": "pipeline_total", "value": sec,
"phases": {...}, "input_mb": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_dump_ng_spark import pipeline  # noqa: E402
from planet_dump_ng_spark.session import get_spark  # noqa: E402

DEFAULT_DUMP = "/root/reference/test/liechtenstein-2013-08-03.dmp"


def main() -> int:
    dump = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DUMP
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pdng-bench"
    spark = get_spark("pipeline_bench")
    # warm the JVM, codegen, and python worker pool so phases measure the
    # pipeline rather than first-job startup
    import pandas as _pd  # noqa: F401
    from pyspark.sql import functions as F

    warm = spark.range(1000).select(
        F.pandas_udf(lambda s: s, "long")(F.col("id")).alias("x")
    )
    warm.write.format("noop").mode("overwrite").save()
    phases: dict[str, float] = {}

    t0 = time.perf_counter()
    if dump.endswith(".dmp"):
        from planet_dump_ng_spark.sources import extract_custom_dump

        os.makedirs(work, exist_ok=True)
        dump = extract_custom_dump(dump, os.path.join(work, "extracted.sql"))
    from planet_dump_ng_spark.sources import split_dump_file

    copy_dir = os.path.join(work, "copy")
    split_dump_file(dump, copy_dir, list(pipeline.ELEMENT_TABLES))
    phases["extract_split"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tables = pipeline.load_copy_tables(spark, copy_dir)
    from planet_dump_ng_spark import staging

    stage_dir = os.path.join(work, "stage")
    tables = {
        t: staging.stage_table(spark, df, stage_dir, t) for t, df in tables.items()
    }
    phases["decode_stage"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    frames = pipeline.build_planet(spark, tables)
    phases["assemble_plan"] = round(time.perf_counter() - t0, 2)

    # one multicast call: the assembled frames persist once and feed all
    # five sinks (the reference's multi-writer barrier, as .persist())
    t0 = time.perf_counter()
    pipeline.write_outputs(
        frames,
        [
            pipeline.OutputSpec(os.path.join(work, "planet.osm.bz2"), "planet"),
            pipeline.OutputSpec(os.path.join(work, "history.osm.bz2"), "history"),
            pipeline.OutputSpec(os.path.join(work, "changesets.osm.bz2"), "changesets"),
            pipeline.OutputSpec(os.path.join(work, "planet.osm.pbf"), "pbf"),
            pipeline.OutputSpec(os.path.join(work, "history.osm.pbf"), "pbf-history"),
        ],
    )
    phases["emit_5_outputs"] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "pipeline_total",
                "value": round(sum(phases.values()), 2),
                "unit": "sec",
                "phases": phases,
                "input_mb": round(os.path.getsize(dump) / 1e6, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
