"""Round-7 curation hardening: star emission is the curation DEFAULT
(the O(B) mega-bucket containment runs without opt-in), the LSH probe
geometry is single-sourced from _DEDUP_LSH, and the ingest bucket cap
(max_bucket) is a recorded artifact parameter with the same
inherit-or-refuse discipline as fractions/leakage_free/lsh_mode."""

import inspect
import json
import os

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.llm_pipeline import (
    _DEDUP_LSH,
    _dedup_artifact_dir,
    curate,
    curate_increment,
    dedup_compact,
)
from planet_dump_ng_spark.operators import dedup as dd
from planet_dump_ng_spark.plans.registry import table


def _mega_cluster_docs(spark, n_cluster=120, n_unique=20):
    """A viral-boilerplate corpus: one cluster of n_cluster NEAR-copies
    (same boilerplate body, one distinct trailing token each — exact
    dedup must NOT collapse them, so the LSH stage meets the full
    mega-bucket) plus n_unique unrelated docs."""
    body = (
        "breaking news syndicated boilerplate weather report for the "
        "region today sunny with a chance of showers and mild winds "
        "throughout the afternoon commute expect delays on the harbor "
        "bridge while crews finish resurfacing work near the northern "
        "interchange officials advise travelers to plan extra time and "
        "check the transit agency schedule before leaving home tonight"
    )
    rows = [
        (i, body + f" city{i}", "crawl") for i in range(n_cluster)
    ] + [
        (
            1000 + j,
            f"document {j} carries its own entirely distinct subject "
            f"matter about topic {j} with vocabulary {j * 7} nothing "
            f"shared beyond common words number {j * 13} end",
            "curated",
        )
        for j in range(n_unique)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_defaults_to_star_mode():
    """The scale-safe emission is the default, pairs is the opt-in.
    Since round 10 the signature default is None — "no explicit
    choice" — which resolves to star under the LSH family (and is the
    only legal value under near_dedup='exact', where a concrete mode
    raises instead of being silently discarded); the behavioral pin
    that a default run records lsh_mode='star' is
    test_max_bucket_recorded_and_inherited and the mega-bucket test
    below."""
    assert inspect.signature(curate).parameters["lsh_mode"].default is None


def test_default_emission_is_linear_on_mega_bucket(spark):
    """Candidate mass under curate()'s DEFAULT mode on a boilerplate
    mega-cluster is O(B) (star: bucket-min edges, <= bands * B and >=
    B-1 for a fully-colliding cluster), while the pairs control on the
    same corpus is quadratic — the round-5/6 scale-killer, now closed
    by default."""
    n_cluster = 120
    docs = _mega_cluster_docs(spark, n_cluster=n_cluster)
    # curate() resolves the None signature default to "star" under the
    # LSH family — replay that resolution here
    default_mode = (
        inspect.signature(curate).parameters["lsh_mode"].default or "star"
    )
    star = dd.minhash_lsh_candidates(
        docs, **_DEDUP_LSH, mode=default_mode
    ).count()
    pairs = dd.minhash_lsh_candidates(docs, **_DEDUP_LSH, mode="pairs").count()
    linear_bound = _DEDUP_LSH["bands"] * (n_cluster + 20)
    assert star <= linear_bound, f"default emission not linear: {star}"
    assert star >= n_cluster - 1  # the cluster is fully connected
    assert pairs >= n_cluster * (n_cluster - 1) // 2  # quadratic control


def test_default_curation_meta_records_star(spark, tmp_path):
    docs = _mega_cluster_docs(spark)
    out = str(tmp_path / "star_ds")
    curate(docs, out, min_tokens=5)
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["lsh_mode"] == "star"
    # one survivor for the whole near-dup cluster (min-id election is a
    # connectivity consumer — star loses nothing)
    surv = spark.read.parquet(out).filter(F.col("doc_id") < 1000)
    assert [r.doc_id for r in surv.collect()] == [0]


def test_increment_lsh_mode_contradiction_raises(spark, sf_dir, tmp_path):
    """An explicit lsh_mode contradicting the recorded one must refuse:
    appends never rewrite meta.json, so accepting it would falsify the
    dataset's own dedup record."""
    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "modefail_ds")
    curate(base, out)  # records lsh_mode="star"
    with pytest.raises(ValueError, match="lsh_mode"):
        curate_increment(batch, out, lsh_mode="pairs")
    # inheriting (None) and restating the recorded mode both pass
    curate_increment(batch, out, lsh_mode="star")


def test_max_bucket_meta_roundtrip_and_baked_cap(spark, tmp_path):
    """curate(max_bucket=N) records the cap in meta.json AND bakes it
    into the persisted bucket table (cap_lsh_buckets smallest-id
    representatives): no (band, bh) bucket holds more than N rows."""
    docs = _mega_cluster_docs(spark)
    out = str(tmp_path / "cap_ds")
    curate(docs, out, min_tokens=5, max_bucket=4)
    art = _dedup_artifact_dir(out)
    meta = json.load(open(f"{art}/meta.json"))
    assert meta["max_bucket"] == 4
    widths = (
        spark.read.parquet(f"{art}/buckets")
        .groupBy("band", "bh")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert widths <= 4


def test_capped_increment_matches_capped_join_semantics(spark, sf_dir, tmp_path):
    """A dataset curated with max_bucket=N hands increments exactly the
    dedup_incremental_lsh_capped candidate shape: probing the baked
    artifact equals minhash_lsh_join(batch, corpus, max_bucket=N) over
    the full derived bucket table (write-time cap + probe-time re-cap
    compose to the same smallest-N representative election)."""
    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "capjoin_ds")
    # disable filters that would drop docs so corpus == base survivors
    # of dedup only; keep it simple: curate with permissive gates
    curate(base, out, min_tokens=1, max_stopword_ratio=1.0, max_bucket=4)
    corpus = spark.read.parquet(out)
    art = _dedup_artifact_dir(out)
    via_artifact = dd.minhash_lsh_join(
        batch, corpus, **_DEDUP_LSH,
        corpus_buckets=spark.read.parquet(f"{art}/buckets"),
        max_bucket=4,
    )
    direct = dd.minhash_lsh_join(batch, corpus, **_DEDUP_LSH, max_bucket=4)
    got = {(r.id_a, r.id_b) for r in via_artifact.collect()}
    want = {(r.id_a, r.id_b) for r in direct.collect()}
    assert got == want


def test_increment_inherits_and_validates_max_bucket(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "capinherit_ds")
    curate(base, out, max_bucket=4)
    with pytest.raises(ValueError, match="max_bucket"):
        curate_increment(batch, out, max_bucket=8)
    # inherit: runs clean and the appended buckets respect the cap
    # within the appended batch
    curate_increment(batch, out)
    art = _dedup_artifact_dir(out)
    meta = json.load(open(f"{art}/meta.json"))
    assert meta["max_bucket"] == 4


def test_compact_restores_global_cap(spark, sf_dir, tmp_path):
    """Per-increment appends cap within their batch, so the stored
    union can exceed the cap between compactions; dedup_compact
    re-elects the global smallest-N representatives."""
    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "capcompact_ds")
    curate(base, out, max_bucket=2)
    curate_increment(batch, out)
    art = _dedup_artifact_dir(out)
    dedup_compact(spark, out)
    after = spark.read.parquet(f"{art}/buckets")
    widths = after.groupBy("band", "bh").count().agg(F.max("count")).first()[0]
    assert widths <= 2
    # and the surviving rows are exactly the global smallest-id election
    # over what was stored pre-compact (cap is idempotent on the result)
    recap = dd.cap_lsh_buckets(after, 2)
    assert recap.count() == after.count()


def test_lsh_geometry_single_sourced():
    """_DEDUP_LSH is the ONE definition of the curation probe geometry:
    no hardcoded num_hashes/bands literals survive outside it (an edit
    to _DEDUP_LSH must never silently desync curate() from the artifact
    record curate_increment validates against)."""
    import planet_dump_ng_spark.llm_pipeline as lp

    src = open(inspect.getsourcefile(lp), encoding="utf-8").read()
    assert src.count("num_hashes") == src.count("_DEDUP_LSH = {") == 1
    assert "bands=16" not in src and "num_hashes=64" not in src


def test_bpe_n_merges_zero_is_loud(spark):
    from planet_dump_ng_spark.operators.tokenizer import (
        bpe_vocab,
        write_bpe_tokenizer,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="n_merges"):
        write_bpe_tokenizer(docs, "/tmp/never-written-tokenizer", n_merges=0)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_vocab(docs, n_merges=0)
    assert not os.path.exists("/tmp/never-written-tokenizer/meta.json")


def test_synced_marker_skips_and_restores_stale_check(spark, sf_dir, tmp_path):
    """_synced is the known-clean marker: while present, the increment
    trusts the artifact (no dataset-vs-fingerprint count jobs — pinned by
    showing a count mismatch is NOT repaired); once absent, the full
    check fires and rebuilds.  Every real crash window deletes the
    marker before the dataset grows, so the skip is safe."""
    import os

    from planet_dump_ng_spark.llm_pipeline import _DEDUP_LSH  # noqa: F401

    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    out = str(tmp_path / "sync_ds")
    curate(base, out)
    art = _dedup_artifact_dir(out)
    assert os.path.exists(f"{art}/_synced")

    # forge extra fingerprint rows: counts now MISMATCH the dataset, but
    # the marker says known-clean, so the increment must not rebuild
    # (a rebuild would erase the forged rows)
    forged = spark.createDataFrame(
        [(99_999_991, bytes(16)), (99_999_992, bytes(16))],
        spark.read.parquet(f"{art}/fingerprints").schema,
    )
    forged.write.mode("append").parquet(f"{art}/fingerprints")
    curate_increment(b1, out)
    fp_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{art}/fingerprints")
        .select("doc_id")
        .collect()
    }
    assert 99_999_991 in fp_ids  # check was skipped, no rebuild

    # remove the marker: the full count check fires, detects the forged
    # mismatch and rebuilds the artifact from the dataset
    os.remove(f"{art}/_synced")
    curate_increment(b2, out)
    fp = spark.read.parquet(f"{art}/fingerprints")
    assert 99_999_991 not in {r.doc_id for r in fp.select("doc_id").collect()}
    assert fp.count() == spark.read.parquet(out).count()
    assert os.path.exists(f"{art}/_synced")  # restored after the append


def test_increment_report_has_phase_timings(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "phase_ds")
    _, base_report = curate(base, out)
    # curate() carries the same per-stage wall-second attribution
    for phase in ("raw", "exact_dedup", "near_dedup", "quality",
                  "materialize", "dedup_artifact"):
        assert phase in base_report.phase_s, base_report.phase_s
    _, report = curate_increment(batch, out)
    for phase in ("setup", "stale_check", "batch_exact", "corpus_exact",
                  "near_dedup", "quality", "append", "artifact_extend"):
        assert phase in report.phase_s, report.phase_s
    assert all(v >= 0 for v in report.phase_s.values())
    # token audit is opt-in on the ingest path: doc counts recorded,
    # token mass only when asked
    assert report.stages and not report.tokens
    _, report2 = curate_increment(
        docs.filter(F.col("doc_id") % 8 == 5), out, audit_tokens=True
    )
    assert dict(report2.tokens).keys() == dict(report2.stages).keys()


def test_auto_mode_picks_star_on_mega_bucket(spark, tmp_path):
    """lsh_mode='auto' measures the widest LSH bucket and lands on star
    when it exceeds auto_star_width; the artifact records the RESOLVED
    mode (never 'auto'), the report carries decision + evidence, and
    the min-id survivor election is unchanged."""
    n_cluster = 300
    docs = _mega_cluster_docs(spark, n_cluster=n_cluster)
    out = str(tmp_path / "auto_star_ds")
    _, report = curate(docs, out, min_tokens=5, lsh_mode="auto")
    assert report.lsh_mode_resolved == "star"
    assert report.lsh_auto_widest > 256  # the mega bucket, seen
    assert "lsh_auto_probe" in report.phase_s
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["lsh_mode"] == "star"
    surv = spark.read.parquet(out).filter(F.col("doc_id") < 1000)
    assert [r.doc_id for r in surv.collect()] == [0]


def test_auto_mode_picks_pairs_on_benign_corpus(spark, tmp_path):
    """With every bucket under auto_star_width, auto takes the
    exhaustive pairs path (affordable, strictly better recall)."""
    docs = _mega_cluster_docs(spark, n_cluster=0, n_unique=25)
    out = str(tmp_path / "auto_pairs_ds")
    _, report = curate(docs, out, min_tokens=5, lsh_mode="auto")
    assert report.lsh_mode_resolved == "pairs"
    assert report.lsh_auto_widest <= 256
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["lsh_mode"] == "pairs"


def test_auto_mode_threshold_knob(spark, tmp_path):
    """auto_star_width is the decision boundary: the same 120-doc
    cluster resolves pairs at the default width and star under a
    tighter one."""
    docs = _mega_cluster_docs(spark, n_cluster=120)
    out = str(tmp_path / "auto_knob_ds")
    _, report = curate(
        docs, out, min_tokens=5, lsh_mode="auto", auto_star_width=64
    )
    assert report.lsh_mode_resolved == "star"
    assert report.lsh_auto_widest > 64


def test_increment_rejects_auto(spark, sf_dir, tmp_path):
    """'auto' is a curate-time probe over the full corpus; an increment
    must inherit the recorded concrete decision instead."""
    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "auto_inc_ds")
    curate(base, out)
    with pytest.raises(ValueError, match="auto"):
        curate_increment(batch, out, lsh_mode="auto")


def test_resolved_mode_recorded_for_concrete_modes(spark, tmp_path):
    """report.lsh_mode_resolved mirrors the concrete mode when no probe
    runs (so consumers can always read one field)."""
    docs = _mega_cluster_docs(spark, n_cluster=0, n_unique=10)
    out = str(tmp_path / "resolved_ds")
    _, report = curate(docs, out, min_tokens=5, lsh_mode="pairs")
    assert report.lsh_mode_resolved == "pairs"
    assert report.lsh_auto_widest is None
