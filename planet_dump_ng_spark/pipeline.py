"""End-to-end planet pipeline (reference lifecycle, SURVEY.md section 3).

Mirrors src/planet-dump.cpp:154-271 as a DataFrame program:

  phase 1  extract:  per-table COPY decode -> typed frames (optionally
           staged to parquet for resume, operator S9)
  phase 2  assemble: filters + inner joins + attribution per element type
  phase 3  emit:     one write action per requested output variant; the
           shared assembled frame is persisted so N sinks = N actions on
           one lineage (the reference's multicast barrier machinery,
           copy_elements.cpp:372-415, becomes .persist()).

The reference's fixed inter-type ordering (changesets before elements so
writers learn changeset->uid, planet-dump.cpp:242-249) dissolves into an
explicit join in attribute_elements — no ordering constraint remains.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from planet_dump_ng_spark.operators import assembly, history
from planet_dump_ng_spark.sinks import pbf_sink, xml_sink
from planet_dump_ng_spark.sources import (
    extract_custom_dump,  # noqa: F401 — kept public for single-pass callers
    extract_tables_parallel,
    read_copy_table,
    split_dump_file,
)

ELEMENT_TABLES = (
    "users",
    "changesets",
    "changeset_tags",
    "changeset_comments",
    "nodes",
    "node_tags",
    "ways",
    "way_nodes",
    "way_tags",
    "relations",
    "relation_members",
    "relation_tags",
)


@dataclass
class PlanetFrames:
    """The engine's central IR: assembled + attributed per-type frames."""

    changesets: DataFrame  # id, ..., tags, comments, comments_count, uid, user
    nodes: DataFrame  # id, version, ..., tags, uid, user
    ways: DataFrame  # + nds
    relations: DataFrame  # + members
    max_ts: datetime | None  # A2 global data timestamp


def load_copy_tables(
    spark: SparkSession, copy_dir: str, tables: tuple[str, ...] = ELEMENT_TABLES
) -> dict[str, DataFrame]:
    """Phase 1: one typed frame per table from per-table COPY text files
    (<copy_dir>/<table>.copy, as produced by sources.split_dump_file)."""
    out = {}
    for t in tables:
        path = os.path.join(copy_dir, f"{t}.copy")
        out[t] = read_copy_table(spark, path, t)
    return out


def build_planet(spark: SparkSession, tables: dict[str, DataFrame]) -> PlanetFrames:
    """Phase 2: assemble every element type and compute the data timestamp."""
    max_ts_row = assembly.max_data_timestamp(
        (tables["changesets"], "created_at"),
        (tables["nodes"], "timestamp"),
        (tables["ways"], "timestamp"),
        (tables["relations"], "timestamp"),
        (tables["changeset_comments"], "created_at"),
    ).collect()[0]
    max_ts = max_ts_row["max_ts"]

    nodes = assembly.attribute_elements(
        assembly.assemble_elements(tables["nodes"], tables["node_tags"], "nodes"),
        tables["changesets"],
        tables["users"],
    )
    ways = assembly.attribute_elements(
        assembly.assemble_elements(
            tables["ways"], tables["way_tags"], "ways", inners=tables["way_nodes"]
        ),
        tables["changesets"],
        tables["users"],
    )
    relations = assembly.attribute_elements(
        assembly.assemble_elements(
            tables["relations"],
            tables["relation_tags"],
            "relations",
            inners=tables["relation_members"],
        ),
        tables["changesets"],
        tables["users"],
    )
    changesets = assembly.assemble_changesets(
        tables["changesets"],
        tables["changeset_tags"],
        tables["changeset_comments"],
        tables["users"],
    )
    return PlanetFrames(changesets, nodes, ways, relations, max_ts)


@dataclass
class OutputSpec:
    """One requested output file (one CLI flag in the reference)."""

    path: str
    kind: str  # 'planet' | 'history' | 'changesets' | 'discussions'
    #        | 'pbf' | 'pbf-history'
    anonymize: bool = False  # the -no-userinfo variants (F9)


def write_outputs(
    frames: PlanetFrames,
    outputs: list[OutputSpec],
    generator: str = "planet-dump-ng-spark",
    meta: dict | None = None,
    dense_nodes: bool = True,
    compress_command: str | None = None,
) -> None:
    """Phase 3: one ordered single-file write per output spec.

    'planet' applies the current-view filter (A1+F5); 'history' keeps all
    versions; 'changesets'/'discussions' consume only the changesets frame
    (F7).  Frames are persisted when consumed by >1 output (multicast).
    """
    # Scope canChangeCachedPlanOutputPartitioning=true over the WHOLE
    # phase: the conf is captured when each InMemoryRelation is created
    # (the .persist() inside arrange()), so it must be live before the
    # arrangements are built, not just around the write jobs.  With the
    # default (false) the persisted arrangements are frozen at the static
    # shuffle width, so a small dump pays width-many tasks + part files
    # per frame per output (measured ~2x on the 5-output fixture emit,
    # 12.4 -> 6.9 s best-of-4 interleaved A/B).  AQE coalescing follows
    # the advisory size, so at planet scale the arrangements keep their
    # thousands of ~advisory-sized partitions — scale-adaptive.  NOT set
    # globally: it hides cache partitioning from consumers, which costs
    # plans that REUSE it (pagerank's per-round rank cache gained one
    # exchange per consumer in the pinned budgets).  The emit's consumers
    # only scan the arrangements in partition order, so here the
    # unknown-partitioning trade costs nothing.
    _CACHED_REPART = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    spark_for_conf = frames.changesets.sparkSession
    _prev_repart = spark_for_conf.conf.get(_CACHED_REPART, None)
    spark_for_conf.conf.set(_CACHED_REPART, "true")
    try:
        _write_outputs_body(
            frames, outputs, generator, meta, dense_nodes, compress_command
        )
    finally:
        if _prev_repart is None:
            spark_for_conf.conf.unset(_CACHED_REPART)
        else:
            spark_for_conf.conf.set(_CACHED_REPART, _prev_repart)


def _write_outputs_body(
    frames: PlanetFrames,
    outputs: list[OutputSpec],
    generator: str,
    meta: dict | None,
    dense_nodes: bool,
    compress_command: str | None,
) -> None:
    """The body of :func:`write_outputs` (split out so the cached-
    repartitioning conf scope above wraps the arrangement persists AND
    the write jobs — InMemoryRelation captures the conf at persist
    time)."""
    from pyspark.sql import functions as F

    # -- shared arrangement: sort each needed element stream ONCE --------
    # Every output variant consumes the same (id, version)-ordered stream;
    # rendering/anonymization are order-preserving projections, so one
    # range-partition + sort (persisted when >1 variant reads it) feeds
    # every sink — the reference's single-pass multicast
    # (copy_elements.cpp:372-415) as cached arrangements.
    # PBF strictness (pbf_writer.cpp:312-318): with full user info, an
    # element referencing a missing changeset must error, not silently go
    # anonymous (only XML is silent).  One union-ed anti-join up front.
    if any(o.kind in ("pbf", "pbf-history") and not o.anonymize for o in outputs):
        refs = (
            frames.nodes.select("changeset_id")
            .unionByName(frames.ways.select("changeset_id"))
            .unionByName(frames.relations.select("changeset_id"))
        )
        assembly.check_changesets_present(refs, frames.changesets)

    uses_current = sum(o.kind in ("planet", "pbf") for o in outputs)
    uses_history = sum(o.kind in ("history", "pbf-history") for o in outputs)
    uses_changesets = sum(
        o.kind in ("planet", "history", "changesets", "discussions")
        for o in outputs
    )

    def arrange(df, cols, n_users):
        a = df.repartitionByRange(*[F.col(c) for c in cols]).sortWithinPartitions(
            *[F.col(c) for c in cols]
        )
        return a.persist() if n_users > 1 else a

    arranged = {}
    if uses_history:
        for t, df in (
            ("nodes", frames.nodes),
            ("ways", frames.ways),
            ("relations", frames.relations),
        ):
            arranged[("h", t)] = arrange(df, ["id", "version"], uses_history)
    if uses_current:
        for t, df in (
            ("nodes", frames.nodes),
            ("ways", frames.ways),
            ("relations", frames.relations),
        ):
            arranged[("c", t)] = arrange(
                history.current_view(df), ["id", "version"], uses_current
            )
    cs_arranged = (
        arrange(frames.changesets, ["id"], uses_changesets)
        if uses_changesets
        else None
    )

    def emit_one(spec: OutputSpec) -> None:
        if spec.kind in ("changesets", "discussions"):
            rendered = xml_sink.render_changesets(
                cs_arranged,
                frames.max_ts,
                anonymize=spec.anonymize,
                discussions=spec.kind == "discussions",
            )
            xml_sink.write_xml_file(
                [(rendered, ["id"])],
                spec.path,
                generator,
                frames.max_ts,
                pre_arranged=True,
                meta=meta,
                compress_command=compress_command,
            )
            return

        hist = spec.kind in ("history", "pbf-history")
        v = "h" if hist else "c"
        n, w, r = (
            arranged[(v, "nodes")],
            arranged[(v, "ways")],
            arranged[(v, "relations")],
        )
        if spec.kind in ("pbf", "pbf-history"):
            pbf_sink.write_pbf_file(
                n,
                w,
                r,
                spec.path,
                history=hist,
                anonymize=spec.anonymize,
                generator=generator,
                max_ts=frames.max_ts,
                pre_arranged=True,
                source=(meta or {}).get("source", pbf_sink.OSM_API_ORIGIN),
                dense_nodes=dense_nodes,
            )
            return
        parts = [
            (
                xml_sink.render_changesets(
                    cs_arranged, frames.max_ts, anonymize=spec.anonymize
                ),
                ["id"],
            ),
            (xml_sink.render_nodes(n, hist, spec.anonymize), ["id", "version"]),
            (xml_sink.render_ways(w, hist, spec.anonymize), ["id", "version"]),
            (xml_sink.render_relations(r, hist, spec.anonymize), ["id", "version"]),
        ]
        xml_sink.write_xml_file(
            parts, spec.path, generator, frames.max_ts, pre_arranged=True,
            meta=meta, compress_command=compress_command,
        )

    # The reference's writers consume ONE multicast pass concurrently
    # (planet-dump.cpp:242-259, one thread per writer).  Spark analog:
    # materialize each shared arrangement once (cheap count actions, so
    # concurrent sinks never race to compute the same cache), then submit
    # the independent per-output job chains from threads — the scheduler
    # overlaps their stages, and driver-side part concatenation (pure
    # I/O) overlaps other outputs' executor work.
    from concurrent.futures import ThreadPoolExecutor

    shared = [df for df in arranged.values() if df.is_cached]
    if cs_arranged is not None and cs_arranged.is_cached:
        shared.append(cs_arranged)
    _write_all(outputs, arranged, cs_arranged, shared, emit_one)

    for df in arranged.values():
        if df.is_cached:
            df.unpersist()
    if cs_arranged is not None and cs_arranged.is_cached:
        cs_arranged.unpersist()


def _write_all(outputs, arranged, cs_arranged, shared, emit_one) -> None:
    """The emit body of :func:`write_outputs` (split out so the cached-
    repartitioning conf scope above wraps exactly the jobs it was
    measured on)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    if len(outputs) > 1:
        with ThreadPoolExecutor(max_workers=max(len(shared), 1)) as pool:
            list(pool.map(lambda df: df.count(), shared))
        # submit (not map): map surfaces only the FIRST failure while
        # sibling outputs still run to completion — failed or
        # partially-written paths must all be reported, not just one.
        # Each output runs in its OWN on-demand FAIR pool (pool name =
        # thread-local property): with every job in one pool the pool's
        # internal FIFO still serializes whole stages across outputs;
        # one-pool-per-output is what actually round-robins task slots
        # between the writers (session.py sets spark.scheduler.mode=FAIR).
        pooled = list(arranged.values()) + (
            [cs_arranged] if cs_arranged is not None else []
        )
        spark = pooled[0].sparkSession if pooled else None

        def emit_pooled(spec: OutputSpec) -> None:
            if spark is not None:
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", f"emit-{os.path.basename(spec.path)}"
                )
                # label the output's job chain (guide §1: label your jobs)
                # — sub-threads created inside the sinks inherit it, so
                # event logs attribute every job to its output file
                spark.sparkContext.setJobDescription(
                    f"emit:{os.path.basename(spec.path)}"
                )
            try:
                emit_one(spec)
            finally:
                if spark is not None:
                    spark.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", None
                    )
                    spark.sparkContext.setJobDescription(None)

        with ThreadPoolExecutor(max_workers=len(outputs)) as pool:
            futures = {
                spec.path: pool.submit(emit_pooled, spec) for spec in outputs
            }
        failures = {
            path: f.exception() for path, f in futures.items() if f.exception()
        }
        if failures:
            detail = "; ".join(f"{p}: {e!r}" for p, e in failures.items())
            raise RuntimeError(
                f"{len(failures)}/{len(outputs)} outputs failed: {detail}"
            ) from next(iter(failures.values()))
    else:
        for spec in outputs:
            emit_one(spec)


def run_dump(
    spark: SparkSession,
    dump_file: str,
    outputs: list[OutputSpec],
    work_dir: str,
    generator: str = "planet-dump-ng-spark",
    resume: bool = False,
    stage: bool = True,
    meta: dict | None = None,
    dense_nodes: bool = True,
    compress_command: str | None = None,
) -> PlanetFrames:
    """Full lifecycle from a plain-format pg_dump file.

    With ``stage`` (default) every table is decoded once into parquet
    (staging.py, operator S9) so the N output actions scan columnar data
    instead of re-parsing COPY text N times; ``resume`` additionally skips
    tables whose stage is already marked complete."""
    from planet_dump_ng_spark import staging

    copy_dir = os.path.join(work_dir, "copy")
    stage_dir = os.path.join(work_dir, "stage")
    all_staged = stage and all(
        staging.is_staged(stage_dir, t) for t in ELEMENT_TABLES
    )
    if resume and all_staged:
        tables = {
            t: spark.read.parquet(os.path.join(stage_dir, t))
            for t in ELEMENT_TABLES
        }
    else:
        if dump_file.endswith(".dmp"):  # custom-format archive: S1 front-end
            # per-table parallel pg_restore fan-out (the reference's 12
            # concurrent extraction passes) — no monolithic .sql
            # intermediate, no single-core split pass
            os.makedirs(work_dir, exist_ok=True)
            extract_tables_parallel(dump_file, copy_dir, list(ELEMENT_TABLES))
        else:
            split_dump_file(dump_file, copy_dir, list(ELEMENT_TABLES))
        tables = load_copy_tables(spark, copy_dir)
        if stage:
            # stage all 12 tables CONCURRENTLY: independent write jobs,
            # submitted from threads so the scheduler overlaps them (the
            # Spark analog of the reference's 12 parallel extraction
            # threads, planet-dump.cpp:127-140)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=12) as pool:
                futures = {
                    t: pool.submit(
                        staging.stage_table, spark, df, stage_dir, t, resume
                    )
                    for t, df in tables.items()
                }
                tables = {t: f.result() for t, f in futures.items()}
    frames = build_planet(spark, tables)
    write_outputs(
        frames,
        outputs,
        generator,
        meta=meta,
        dense_nodes=dense_nodes,
        compress_command=compress_command,
    )
    return frames
