#!/usr/bin/env python
"""Per-job wall-clock profile of registry queries (or bench sections).

Runs each named query with the noop sink under an event-logging Spark
session, then reports per-job durations (job description, submit->end) and
per-stage executor-run vs shuffle metrics — the local stand-in for the
Spark UI the optimization guide's section 1/7 workflow assumes.

    python tools/profile_query.py <query> [query ...] [--sf DIR] [--runs N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_dump_ng_spark import plans  # noqa: E402
from planet_dump_ng_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    plans.load_all()
    spark = get_spark(
        "profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    for name in names:
        spec = plans.QUERIES[name]
        # warm-up at small sf
        spec.spark(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        best = None
        for r in range(runs):
            sc.setJobDescription(f"PROFILE:{name}:run{r}")
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        print(f"== {name}: best {best:.3f}s over {runs} runs")
    spark.stop()
    # parse event log
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        for f in os.listdir(evdir):
            if f.startswith(app_id):
                path = os.path.join(evdir, f)
    jobs = {}
    stages = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:80],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0)),
                }
    per_desc: dict[str, list] = {}
    for jid, j in sorted(jobs.items()):
        if "t1" not in j:
            continue
        d = j["desc"] or "(none)"
        per_desc.setdefault(d, []).append((jid, j["t1"] - j["t0"], j["stages"]))
    for d, js in per_desc.items():
        if not d.startswith("PROFILE:"):
            continue
        total = sum(ms for _, ms, _ in js)
        print(f"\n## {d}  jobs={len(js)} total={total/1000:.2f}s")
        for jid, ms, st in js:
            names_ = []
            for s in st:
                if s in stages:
                    names_.append(f"{stages[s]['name']}({stages[s]['ms']}ms/{stages[s]['tasks']}t)")
            print(f"  job {jid}: {ms/1000:.2f}s  stages: {'; '.join(names_[:6])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
