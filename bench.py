#!/usr/bin/env python
"""Headline benchmark: run every ``bench``-tagged query from the registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "pipeline": {"total": N, "phases": {...}}, "sf": ...}

Each query is fully executed with the ``noop`` sink (whole plan runs on
executors, nothing is collected to the driver), which is the closest local
analog of a cluster write action.  The ``pipeline`` section times the
end-to-end OSM dump -> 5 planet outputs run on the reference's
Liechtenstein fixture, so sink/assembly throughput regressions are visible
per round, not just query latency.  Only the JSON line goes to stdout;
Spark chatter stays on stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_LIECHTENSTEIN = "/root/reference/test/liechtenstein-2013-08-03.dmp"


def pipeline_bench(spark, dump: str = _LIECHTENSTEIN,
                   work: str = "/tmp/pdng-bench") -> dict:
    """Run the full dump -> planet/history XML + PBF + changesets pipeline,
    timed per phase.  Returns {"total": sec, "phases": {...}, "input_mb": N};
    {} if the fixture dump is unavailable."""
    if not os.path.exists(dump):
        return {}
    from planet_dump_ng_spark import pipeline, staging
    from planet_dump_ng_spark.sources import (
        extract_tables_parallel,
        split_dump_file,
    )

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    phases: dict[str, float] = {}

    t0 = time.perf_counter()
    copy_dir = os.path.join(work, "copy")
    if dump.endswith(".dmp"):
        # per-table concurrent pg_restore fan-out (reference strategy)
        extract_tables_parallel(dump, copy_dir, list(pipeline.ELEMENT_TABLES))
    else:
        split_dump_file(dump, copy_dir, list(pipeline.ELEMENT_TABLES))
    phases["extract_split"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    tables = pipeline.load_copy_tables(spark, copy_dir)
    stage_dir = os.path.join(work, "stage")
    # stage concurrently, as run_dump does — the per-table decode jobs are
    # independent and local tables are small, so job-launch overhead
    # dominates a sequential loop
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=12) as pool:
        futs = {
            t: pool.submit(staging.stage_table, spark, df, stage_dir, t)
            for t, df in tables.items()
        }
        tables = {t: f.result() for t, f in futs.items()}
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

    return {
        "total": round(sum(phases.values()), 2),
        "phases": phases,
        "input_mb": round(os.path.getsize(dump) / 1e6, 1),
    }


def curation_bench(
    spark, sf_dir: str, work: str = "/tmp/pdng-curate-bench",
    near_dedup: str = "lsh",
) -> dict:
    """Time the end-to-end LLM curation pipeline (llm_pipeline.curate) at
    the bench SF: dedup chain -> decontamination -> scrub -> rule +
    classifier quality gates -> split materialization + pack manifest.
    The second end-to-end throughput number beside the OSM pipeline —
    sink/stage regressions in the curation path show up here per round.
    ``near_dedup`` selects the detection family so the exact
    (prefix-filtered SSJoin) path gets its own measured number beside
    the LSH default.  Returns {"total": sec, "rows_in": N,
    "rows_out": N}; {} if the documents table is unavailable."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        return {}
    from planet_dump_ng_spark.llm_pipeline import curate

    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(work + "_dedup", ignore_errors=True)
    shutil.rmtree(work + "_pindex", ignore_errors=True)
    docs = spark.read.parquet(docs_path)
    bench_set = docs.filter((docs.doc_id % 97) == 0).select("doc_id", "text")
    t0 = time.perf_counter()
    _, report = curate(
        docs,
        work,
        bench=bench_set,
        classifier_margin=0.0,
        pack_capacity=2048,
        near_dedup=near_dedup,
    )
    total = round(time.perf_counter() - t0, 2)
    stages = dict(report.stages)
    out = {
        "total": total,
        "phases": dict(report.phase_s),
        "rows_in": stages.get("raw", 0),
        "rows_out": min(stages.values()) if stages else 0,
    }
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(work + "_dedup", ignore_errors=True)
    shutil.rmtree(work + "_pindex", ignore_errors=True)
    return out


def served_bench(
    spark, sf_dir: str, n_runs: int = 2, corpus_index: str | None = None
) -> dict:
    """Build/probe split for the persisted prefix-index serving path
    (write_prefix_index -> ngram_jaccard_join(corpus_index=...)): at
    scale the BUILD runs once per corpus snapshot while the PROBE runs
    per ingest batch, so one fused timing (what the registry query
    necessarily measures under the driver gate) hides probe
    regressions behind build noise.  Best-of-n per phase with the raw
    runs recorded.  ``corpus_index`` reuses an existing artifact (the
    sf1 anchor probes a prebuilt twin index so the probe number is
    pure probe).  Returns {build_s, probe_s, rows, runs}."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        return {}
    import tempfile

    from pyspark.sql import functions as F

    from planet_dump_ng_spark.operators import dedup as dd

    docs = spark.read.parquet(docs_path)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    runs: list[dict] = []
    rows = None
    for _ in range(n_runs):
        r: dict = {}
        if corpus_index is None:
            idx = tempfile.mkdtemp(prefix="pdng-bench-pindex-")
            t0 = time.perf_counter()
            dd.write_prefix_index(corpus, idx, k=3, threshold=0.5)
            r["build_s"] = round(time.perf_counter() - t0, 3)
        else:
            idx = corpus_index
        t0 = time.perf_counter()
        out = dd.ngram_jaccard_join(
            batch, k=3, threshold=0.5, corpus_index=idx
        )
        if rows is None:
            # the count rides the timed noop write via an Observation —
            # a separate count() would re-execute the whole probe join
            from pyspark.sql import Observation, functions as F2

            obs = Observation()
            out = out.observe(obs, F2.count(F2.lit(1)).alias("n"))
            out.write.format("noop").mode("overwrite").save()
            r["probe_s"] = round(time.perf_counter() - t0, 3)
            rows = obs.get["n"]
        else:
            out.write.format("noop").mode("overwrite").save()
            r["probe_s"] = round(time.perf_counter() - t0, 3)
        runs.append(r)
        if corpus_index is None:
            shutil.rmtree(idx, ignore_errors=True)
    best = {
        k: min(r[k] for r in runs) for k in runs[0]
    }
    best["rows"] = rows
    best["runs"] = runs
    return best


def increment_bench(
    spark, sf_dir: str, work: str = "/tmp/pdng-incr-bench", n_runs: int = 3,
    near_dedup: str = "lsh",
) -> dict:
    """Time incremental curation: build the standing dataset from 75% of
    the corpus once per run (not timed), then time curating the remaining
    25% batch INTO it (llm_pipeline.curate_increment).  The datum that
    makes the continuous-ingest claim checkable: per-batch cost should sit
    well under the full re-curation the increment path exists to avoid.
    Best-of-3 like the other end-to-end sections (the section is one
    seconds-scale run; JVM tiering and host noise swing singles 30%+ —
    round 8's [10.28, 17.46] s spread on unchanged code is why the
    anchor needs three samples with the raw list reported), with the
    winning run's per-phase wall seconds (report.phase_s) so a
    regression names the phase, not just the total.
    Returns {"total": sec, "runs": [...], "phases": {...},
    "batch_rows": N, "appended": N}."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        return {}
    from pyspark.sql import functions as F

    from planet_dump_ng_spark.llm_pipeline import curate, curate_increment

    docs = spark.read.parquet(docs_path)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    runs: list[dict] = []
    for _ in range(n_runs):
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(work + "_dedup", ignore_errors=True)
        shutil.rmtree(work + "_pindex", ignore_errors=True)
        curate(base, work, near_dedup=near_dedup)
        t0 = time.perf_counter()
        manifest, report = curate_increment(batch, work)
        total = round(time.perf_counter() - t0, 2)
        appended = sum(r.n_rows for r in manifest.collect())
        runs.append(
            {
                "total": total,
                "phases": dict(report.phase_s),
                "batch_rows": dict(report.stages).get("raw", 0),
                "appended": appended,
            }
        )
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(work + "_dedup", ignore_errors=True)
    shutil.rmtree(work + "_pindex", ignore_errors=True)
    best = min(runs, key=lambda r: r["total"])
    best["runs"] = [r["total"] for r in runs]
    return best


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from planet_dump_ng_spark import plans
    from planet_dump_ng_spark.session import get_spark

    plans.load_all()
    spark = get_spark("planet_dump_ng_spark_bench")

    # Per-query JVM/codegen warm-up at the smallest SF so measured timings
    # reflect the plan's execution at the bench SF, not first-run
    # whole-stage-codegen compilation and class loading (which dominate
    # sub-second queries and don't exist in a long-lived cluster session).
    bench_specs = {
        name: spec
        for name, spec in plans.QUERIES.items()
        if "bench" in spec.tags
    }
    for spec in bench_specs.values():
        spec.spark(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # Two timed passes, report the min: single-shot numbers swing 30%+
    # with JIT tiering and run order in a fresh JVM; min-of-2 measures the
    # plan, not the noise (cluster sessions are long-lived anyway).  Both
    # raw runs ride along in "query_runs" so a round-over-round diff can
    # tell a plan regression (both runs slow) from one noisy sample —
    # round 5 burned review time on two sub-second "regressions" that the
    # run lists would have dismissed at a glance.  Sub-2 s queries get a
    # THIRD pass: at that scale one JIT/GC hiccup is 30%+ of the total,
    # and best-of-2 left two seconds-scale "regressions" unprovable in
    # round 7's review.
    timings: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {name: [] for name in bench_specs}
    for _ in range(2):
        for name, spec in bench_specs.items():
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            query_runs[name].append(dt)
            timings[name] = min(timings.get(name, dt), dt)
    for name, spec in bench_specs.items():
        if timings[name] < 2.0:
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            query_runs[name].append(dt)
            timings[name] = min(timings[name], dt)

    # Scale-ratio probe for the slowest queries: re-time them one SF down
    # (10x less data) and record t(bench_sf) / t(small_sf).  A plan with
    # healthy distributed scaling stays WELL below 10x (fixed per-job
    # overhead amortizes, parallelism absorbs data growth); a super-linear
    # blowup — skewed LSH band bucket, wedge explosion on a hub node —
    # surfaces as a ratio at or above the data growth, a number per round
    # instead of an anecdote.
    small_dir = os.environ.get("SPARK_GRAFT_SMALL_SF_DIR", "/root/testdata/sf0.01")
    scale_ratio: dict[str, dict[str, float]] = {}
    if os.path.isdir(small_dir) and os.path.abspath(small_dir) != os.path.abspath(
        sf_dir
    ):
        slowest = sorted(timings, key=timings.__getitem__, reverse=True)[:5]
        small_t: dict[str, float] = {}
        for _ in range(2):
            for name in slowest:
                t0 = time.perf_counter()
                bench_specs[name].spark(spark, small_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                small_t[name] = min(small_t.get(name, dt), dt)
        scale_ratio = {
            name: {
                "t_small": small_t[name],
                "t_bench": timings[name],
                "ratio": round(timings[name] / max(small_t[name], 1e-9), 2),
            }
            for name in slowest
        }

    # sf1 anchor: all per-query timing above is seconds-scale at sf0.1,
    # where JVM warm-up and job-launch overhead are a visible fraction;
    # one 10x-replicated run (tools/stress_scale.build keeps per-key
    # cardinalities, offsets ids per copy) re-times the slowest queries
    # where shuffles dominate noise.  The paired ratio against the 10x
    # data growth is the super-linearity gate: a plan that blows past
    # 10x does not survive the next 100x.  SPARK_GRAFT_SF1=0 skips.
    sf1: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            sys.path.insert(
                0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
            )
            import stress_scale

            stress_scale.SRC = sf_dir
            # per-source twin dir: a cached twin of a DIFFERENT base SF
            # must not be mistaken for this one
            stress_scale.DST = "/tmp/pdng-stress-" + os.path.basename(
                os.path.normpath(sf_dir)
            )
            stress_scale.build(spark, 10)
            # slowest 10 + the queries whose scale claims the round's
            # brief graded (the prefix-filtered exact jaccard must show
            # its ratio even when it's fast at sf0.1)
            anchored = sorted(
                timings, key=timings.__getitem__, reverse=True
            )[:10]
            # Pair-ENUMERATING queries also record output rows at both
            # scales: the replicated twin multiplies every dup-cluster
            # size by 10, so the TRUE pair output grows ~100-1000x and a
            # raw time ratio reads as super-linear when the per-output-
            # row cost actually fell — rows_ratio is the denominator
            # that makes the anchor honest.
            extras = (
                "dedup_ngram_jaccard_prefix",
                "dedup_ngram_jaccard_ingest",
            )
            for extra in extras:
                if extra in timings and extra not in anchored:
                    anchored.append(extra)
            for name in anchored:
                # contain failures per query: one query that can't run
                # on the replicated twin must not discard the ratios
                # already measured for the others
                try:
                    t0 = time.perf_counter()
                    bench_specs[name].spark(
                        spark, stress_scale.DST
                    ).write.format("noop").mode("overwrite").save()
                    t_sf1 = round(time.perf_counter() - t0, 3)
                    sf1[name] = {
                        "t_bench": timings[name],
                        "t_sf1": t_sf1,
                        "ratio": round(t_sf1 / max(timings[name], 1e-9), 2),
                    }
                    if name in extras:
                        # a rows-count failure must not discard the time
                        # ratio already measured above
                        try:
                            r_b = bench_specs[name].spark(
                                spark, sf_dir
                            ).count()
                            r_1 = bench_specs[name].spark(
                                spark, stress_scale.DST
                            ).count()
                            sf1[name]["rows_bench"] = r_b
                            sf1[name]["rows_sf1"] = r_1
                            sf1[name]["rows_ratio"] = round(
                                r_1 / max(r_b, 1), 1
                            )
                        except Exception as e:
                            sf1[name]["rows_error"] = str(e)[:120]
                except Exception as e:
                    sf1[name] = {"error": str(e)[:200]}
        except Exception as e:  # the anchor must never sink the bench
            sf1 = {"error": str(e)[:200]}

    # sf1 anchor for the two end-to-end PRODUCTION paths: curation and
    # increment have no >sf0.1 evidence otherwise.  Single runs (a full
    # 10x curation per sample; best-of-N would double a minutes-scale
    # section) with per-phase attribution — the ratio against the 10x
    # data growth is the number the 100 TB claim rests on.
    cur_sf1: dict = {}
    incr_sf1: dict = {}
    if isinstance(sf1, dict) and sf1 and "error" not in sf1:
        # independent failure domains: an increment failure must not
        # overwrite a measured curation anchor (or vice versa)
        try:
            cur_sf1 = curation_bench(
                spark, stress_scale.DST, work="/tmp/pdng-curate-sf1"
            )
        except Exception as e:
            cur_sf1 = {"error": str(e)[:200]}
        try:
            incr_sf1 = increment_bench(
                spark, stress_scale.DST, work="/tmp/pdng-incr-sf1", n_runs=1
            )
        except Exception as e:
            incr_sf1 = {"error": str(e)[:200]}

    # the EXACT family's 10x twins: curation_exact (below) is
    # end-to-end-benched at the bench SF only — without these a
    # super-linear exact-family regression (the pair-enumerating
    # prefix join is the stage with quadratic potential) would be
    # invisible until production scale.  Same single-run budget and
    # independent failure domains as the LSH anchors above.
    cur_exact_sf1: dict = {}
    incr_exact_sf1: dict = {}
    if isinstance(sf1, dict) and sf1 and "error" not in sf1:
        try:
            cur_exact_sf1 = curation_bench(
                spark, stress_scale.DST,
                work="/tmp/pdng-curate-exact-sf1", near_dedup="exact",
            )
        except Exception as e:
            cur_exact_sf1 = {"error": str(e)[:200]}
        try:
            incr_exact_sf1 = increment_bench(
                spark, stress_scale.DST, work="/tmp/pdng-incr-exact-sf1",
                n_runs=1, near_dedup="exact",
            )
        except Exception as e:
            incr_exact_sf1 = {"error": str(e)[:200]}

    # The end-to-end sections are the noisiest samples on a shared host
    # (observed: identical code, 8 s -> 55 s emit within one evening while
    # CPU microbenchmarks stayed flat).  Best-of-3 with all totals
    # recorded measures the pipeline, not the host's noise window; the
    # calibration loop (fixed single-core work) is the tell — if calib_s
    # swings between rounds, wall-clock deltas are environment, not code.
    pipe_runs = [pipeline_bench(spark) for _ in range(3)]
    pipe = min((p for p in pipe_runs if p), key=lambda p: p["total"], default={})
    if pipe:
        pipe["runs"] = [p.get("total") for p in pipe_runs if p]
    def _best_of(n: int, **kwargs) -> dict:
        # best-of-n with the raw run list attached — one definition for
        # every curation-family section
        runs = [curation_bench(spark, sf_dir, **kwargs) for _ in range(n)]
        best = min((c for c in runs if c), key=lambda c: c["total"], default={})
        if best:
            best["runs"] = [c.get("total") for c in runs if c]
        return best

    cur = _best_of(3)
    # the exact (prefix-filtered SSJoin) curation family: the round-9
    # path needs its own end-to-end number beside the LSH default.
    # best-of-2, not 3 — it is a secondary variant of an already
    # best-of-3'd section, and bench wall-clock is a budget
    cur_exact = _best_of(
        2, work="/tmp/pdng-curate-exact-bench", near_dedup="exact"
    )
    incr = increment_bench(spark, sf_dir)
    # exact-family increment at the bench SF: the denominator its sf1
    # twin's ratio needs (best-of-2 — secondary variant, same budget
    # rule as cur_exact)
    incr_exact = increment_bench(
        spark, sf_dir, work="/tmp/pdng-incr-exact-bench", n_runs=2,
        near_dedup="exact",
    )
    # build/probe split for the prefix-index serving path, plus a 10x
    # probe anchor against a PREBUILT twin index: the per-batch probe is
    # the recurring cost at scale, so it gets its own number and ratio
    served = served_bench(spark, sf_dir)
    served_sf1: dict = {}
    if (
        served
        and isinstance(sf1, dict)
        and sf1
        and "error" not in sf1
    ):
        idx = None
        try:
            import tempfile

            from pyspark.sql import functions as F

            from planet_dump_ng_spark.operators import dedup as dd

            twin_docs = spark.read.parquet(
                os.path.join(stress_scale.DST, "documents.parquet")
            )
            idx = tempfile.mkdtemp(prefix="pdng-bench-pindex-sf1-")
            t0 = time.perf_counter()
            dd.write_prefix_index(
                twin_docs.filter(F.col("doc_id") % 4 != 0), idx,
                k=3, threshold=0.5,
            )
            build_s = round(time.perf_counter() - t0, 3)
            served_sf1 = served_bench(
                spark, stress_scale.DST, n_runs=2, corpus_index=idx
            )
            served_sf1["build_s"] = build_s
            served_sf1["probe_ratio"] = round(
                served_sf1["probe_s"] / max(served["probe_s"], 1e-9), 2
            )
            served_sf1["rows_ratio"] = round(
                served_sf1["rows"] / max(served["rows"], 1), 1
            )
        except Exception as e:
            served_sf1 = {"error": str(e)[:200]}
        finally:
            # the sf1-scale index must not outlive a failed run
            if idx is not None:
                shutil.rmtree(idx, ignore_errors=True)

    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i
    calib_s = round(time.perf_counter() - t0, 3)

    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    # Verification-staleness telemetry: the driver checks a 50-query
    # prefix per round and __spark_entry__ rotates greens oldest-first,
    # so the oldest latest-green round bounds how stale any green claim
    # can be.  never_checked counts queries with no green row yet (new
    # registrations land here until their first driver pass).
    registry: dict = {
        "n_queries": len(plans.QUERIES),
        "n_oracled": sum(1 for s in plans.QUERIES.values() if s.oracle),
    }
    try:
        import __spark_entry__ as entry_mod

        green = entry_mod._driver_green()
        registry["oldest_driver_round"] = (
            min(green.values()) if green else None
        )
        registry["never_checked"] = sum(
            1 for n in plans.QUERIES if n not in green
        )
        # union with the self-run oracle ledger (check_oracle --record):
        # the driver re-oracles a 50-query prefix per round, so the
        # repo runs the stale tail itself and records it — the union is
        # the true verification floor, the driver-only number above
        # keeps the provenance distinction honest.  self_newer counts
        # queries whose freshest green evidence is a self-check.
        self_ledger: dict = {}
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "SELFCHECK.json",
                )
            ) as fh:
                self_ledger = json.load(fh)
        except (OSError, ValueError):
            pass
        union = {
            n: max(green.get(n, 0), self_ledger.get(n, 0))
            for n in plans.QUERIES
            if n in green or n in self_ledger
        }
        registry["oldest_green_round"] = (
            min(union.values()) if union else None
        )
        registry["self_newer"] = sum(
            1
            for n in union
            if self_ledger.get(n, 0) > green.get(n, 0)
        )
    except Exception as e:
        registry["staleness_error"] = str(e)[:120]

    def _ratio(anchor: dict, base: dict) -> dict:
        if not anchor or "error" in anchor or not base:
            return anchor
        out = {"total": anchor.get("total")}
        if base.get("total"):
            out["ratio_vs_bench_sf"] = round(
                anchor["total"] / base["total"], 2
            )
        return out

    # The driver records only the LAST 2000 CHARS of stdout and parses
    # the JSON line from that window, so the one line must fit WHOLE in
    # 2000 chars with margin (round 9's line overflowed and the round
    # lost its round-over-round comparison; round 10's 2417-char line
    # parsed only by driver-side luck).  Shrunk this round (r11): the
    # per-section "runs" arrays, the per-query sf1_ratio table and the
    # sf1 e2e totals move to BENCH_DETAIL.json (committed beside the
    # repo — nothing is lost, it just stops riding the fragile stdout
    # line); the five e2e sections fold into one "e2e" map and the sf1
    # anchors into "sf1_e2e" ratio scalars.  Timed regions, methodology
    # and the metric/value/unit/sf/queries contract are UNCHANGED — the
    # r10 line shape is reproducible from BENCH_DETAIL.json.  Measured:
    # r10 data in this shape = 1774 chars (226 margin); per-query map
    # stays LAST so a cut head still preserves every per-query pair.
    compact = {
        "metric": "bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf,
        "calib_s": calib_s,
        "registry": {
            k: registry[k]
            for k in (
                "n_queries",
                "oldest_driver_round",
                "oldest_green_round",
                "never_checked",
            )
            if k in registry
        },
        "e2e": {
            "pipeline": pipe.get("total"),
            "curation": cur.get("total"),
            "curation_exact": cur_exact.get("total"),
            "increment": incr.get("total"),
            "increment_exact": incr_exact.get("total"),
        },
        "served": {
            "build_s": served.get("build_s"),
            "probe_s": served.get("probe_s"),
        },
        "served_sf1": {
            k: served_sf1[k]
            for k in ("build_s", "probe_s", "probe_ratio", "rows_ratio", "error")
            if k in served_sf1
        },
        "sf1_e2e": {
            name: anchor["ratio_vs_bench_sf"]
            for name, anchor in (
                ("curation", _ratio(cur_sf1, cur)),
                ("increment", _ratio(incr_sf1, incr)),
                ("curation_exact", _ratio(cur_exact_sf1, cur_exact)),
                ("increment_exact", _ratio(incr_exact_sf1, incr_exact)),
            )
            if isinstance(anchor, dict) and "ratio_vs_bench_sf" in anchor
        },
        "queries": {n: round(t, 2) for n, t in timings.items()},
    }
    detail = {
        **compact,
        "registry": registry,
        "queries": timings,
        "query_runs": query_runs,
        "scale_ratio": scale_ratio,
        # scalar = time ratio; [time_ratio, rows_ratio] for the pair-
        # enumerating extras whose output itself grows super-linearly
        "sf1_ratio": {
            n: (
                [v["ratio"], v["rows_ratio"]]
                if "rows_ratio" in v
                else v["ratio"] if "ratio" in v else "err"
            )
            for n, v in sf1.items()
            if isinstance(v, dict)
        },
        "sf1": sf1,
        "pipeline": pipe,
        "curation": cur,
        "increment": incr,
        "curation_exact": cur_exact,
        "served": served,
        "served_sf1": served_sf1,
        "curation_sf1_full": cur_sf1,
        "increment_sf1_full": incr_sf1,
        "increment_exact": incr_exact,
        "curation_exact_sf1_full": cur_exact_sf1,
        "increment_exact_sf1_full": incr_exact_sf1,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    # tightest separators: the driver keeps only the last 2000 chars of
    # stdout, and the default ", " padding alone overflows that window
    print(json.dumps(compact, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
