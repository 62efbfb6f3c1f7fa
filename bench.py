#!/usr/bin/env python
"""Headline benchmark: run every ``bench``-tagged query from the registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed with the ``noop`` sink (whole plan runs on
executors, nothing is collected to the driver), which is the closest local
analog of a cluster write action.  Only the JSON line goes to stdout; Spark
chatter stays on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from planet_dump_ng_spark import plans
    from planet_dump_ng_spark.session import get_spark

    plans.load_all()
    spark = get_spark("planet_dump_ng_spark_bench")

    # JVM/codegen warm-up on the smallest SF so measured timings reflect the
    # plan, not first-query JIT + class-load cost.
    warm = plans.QUERIES["q01_pricing_summary"]
    warm.spark(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, spec in plans.QUERIES.items():
        if "bench" not in spec.tags:
            continue
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
