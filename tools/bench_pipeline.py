#!/usr/bin/env python
"""End-to-end OSM pipeline benchmark: full dump -> planet XML + history
XML + planet PBF + history PBF + changesets, timed per phase.

    python tools/bench_pipeline.py [dump.(sql|dmp)] [work_dir]

Defaults to the reference's Liechtenstein fixture (needs pg_restore).
Prints one JSON line: {"metric": "pipeline_total", "value": sec,
"phases": {...}, "input_mb": N}.  The phase runner lives in bench.py
(pipeline_bench), which also folds these numbers into the per-round
bench JSON.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _LIECHTENSTEIN, pipeline_bench  # noqa: E402
from planet_dump_ng_spark.session import get_spark  # noqa: E402


def main() -> int:
    dump = sys.argv[1] if len(sys.argv) > 1 else _LIECHTENSTEIN
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

    out = pipeline_bench(spark, dump, work)
    if not out:
        print(json.dumps({"metric": "pipeline_total", "error": "dump not found"}))
        return 1
    print(
        json.dumps(
            {
                "metric": "pipeline_total",
                "value": out["total"],
                "unit": "sec",
                "phases": out["phases"],
                "input_mb": out["input_mb"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
