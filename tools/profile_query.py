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
            "spark.eventLog.compress": "false",
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
    # parse event log (Spark 4 rolling layout: eventlog_v2_<appid>/events_*)
    candidates = [
        os.path.join(evdir, f)
        for f in os.listdir(evdir)
        if app_id in f
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
    import io
    try:
        import zstandard as _zstd
    except ImportError:
        _zstd = None
    def _open_ev(p):
        if p.endswith(".zstd"):
            if _zstd is None:
                raise RuntimeError("zstandard module needed for .zstd event logs")
            return io.TextIOWrapper(_zstd.ZstdDecompressor().stream_reader(open(p, "rb")))
        return open(p)
    for path in files:
        for line in _open_ev(path):
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
                st = stages.setdefault(si["Stage ID"], {})
                st.update({
                    "name": si["Stage Name"].split("\n")[0][:80],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0)),
                })
            elif e == "SparkListenerTaskEnd":
                st = stages.setdefault(ev["Stage ID"], {})
                tm = ev.get("Task Metrics") or {}
                st["run_ms"] = st.get("run_ms", 0) + tm.get("Executor Run Time", 0)
                st["cpu_ms"] = st.get("cpu_ms", 0) + tm.get("Executor CPU Time", 0) // 1_000_000
                st["gc_ms"] = st.get("gc_ms", 0) + tm.get("JVM GC Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                st["sh_read_mb"] = st.get("sh_read_mb", 0) + (
                    srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
                ) / 1e6
                st["fetch_ms"] = st.get("fetch_ms", 0) + srm.get("Fetch Wait Time", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                st["sh_write_mb"] = st.get("sh_write_mb", 0) + swm.get("Shuffle Bytes Written", 0) / 1e6
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
            print(f"  job {jid}: {ms/1000:.2f}s")
            for s in st:
                g = stages.get(s)
                if not g or "name" not in g:
                    continue
                print(
                    f"    s{s} {g['ms']/1000:6.2f}s {g['tasks']:4d}t "
                    f"run={g.get('run_ms',0)/1000:7.1f}s cpu={g.get('cpu_ms',0)/1000:7.1f}s "
                    f"gc={g.get('gc_ms',0)/1000:5.1f}s fetchwait={g.get('fetch_ms',0)/1000:5.1f}s "
                    f"shR={g.get('sh_read_mb',0):7.1f}MB shW={g.get('sh_write_mb',0):7.1f}MB  {g['name'][:60]}"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
