#!/usr/bin/env python
"""Per-job wall-clock profile of the END-TO-END bench sections (the OSM
pipeline and the curation family) — the profile_query.py twin for the
sections bench.py times as wholes.  Runs the section under an
event-logging session, then prints per-job durations grouped by job
group/description plus per-stage executor metrics, so "emit_5_outputs
got slower" resolves to the job (and sink) that slowed.

    python tools/profile_pipeline.py [pipeline|curation|curation_exact|
                                      increment|increment_exact] [--runs N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_dump_ng_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    section = args[0] if args else "pipeline"
    runs = 2
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "profile_pipeline",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    import bench as bench_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    best = None
    for r in range(runs):
        sc.setJobDescription(f"SECTION:{section}:run{r}")
        t0 = time.perf_counter()
        if section == "pipeline":
            out = bench_mod.pipeline_bench(spark)
        elif section == "curation":
            out = bench_mod.curation_bench(spark, sf_dir)
        elif section == "curation_exact":
            out = bench_mod.curation_bench(
                spark, sf_dir, work="/tmp/pdng-curate-exact-prof",
                near_dedup="exact",
            )
        elif section == "increment":
            out = bench_mod.increment_bench(spark, sf_dir, n_runs=1)
        elif section == "increment_exact":
            out = bench_mod.increment_bench(
                spark, sf_dir, work="/tmp/pdng-incr-exact-prof", n_runs=1,
                near_dedup="exact",
            )
        else:
            raise SystemExit(f"unknown section {section}")
        dt = time.perf_counter() - t0
        print(f"== {section} run{r}: {dt:.2f}s  detail={json.dumps(out)[:400]}")
        best = dt if best is None else min(best, dt)
    sc.setJobDescription(None)
    print(f"== {section}: best {best:.2f}s over {runs} runs")
    spark.stop()

    candidates = [
        os.path.join(evdir, f) for f in os.listdir(evdir) if app_id in f
    ]
    files: list[str] = []
    for path in candidates:
        if os.path.isdir(path):
            files.extend(
                os.path.join(path, f)
                for f in sorted(os.listdir(path))
                if f.startswith("events")
            )
        else:
            files.append(path)
    jobs = {}
    stages = {}
    for path in files:
        for line in open(path):
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties", {}) or {}
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "pool": props.get("spark.scheduler.pool", ""),
                    "t0": ev["Submission Time"],
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                st.update(
                    {
                        "name": si["Stage Name"].split("\n")[0][:80],
                        "tasks": si["Number of Tasks"],
                        "ms": (
                            si.get("Completion Time", 0)
                            - si.get("Submission Time", 0)
                        ),
                    }
                )
    for jid, j in sorted(jobs.items()):
        if "t1" not in j:
            continue
        names = "; ".join(
            stages[s]["name"]
            for s in j["stages"]
            if s in stages and "name" in stages[s]
        )[:120]
        pool = f" pool={j['pool']}" if j.get("pool") else ""
        print(
            f"job {jid:4d} {(j['t1'] - j['t0']) / 1000:6.2f}s"
            f"{pool}  {j['desc'][:60]}  [{names}]"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
