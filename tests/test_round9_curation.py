"""Round 9: the exact near-dedup family wired into curation.

Pins the curate()/curate_increment() ``near_dedup="exact"`` path (the
prefix-filtered SSJoin whose output is identical to exhaustive all-pairs
Jaccard — no LSH recall trade), the persisted ``_pindex`` prefix-index
artifact lifecycle (write / add / compact, with the header-last crash
protocol), the inherit-or-refuse policy record, and the real MP4
container parse that completes the multimodal decode set.
"""

import json
import os
import shutil
import struct

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.llm_pipeline import (
    _pindex_dir,
    curate,
    curate_increment,
)
from planet_dump_ng_spark.operators import dedup as dd


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _clean(out):
    for sfx in ("", "_dedup", "_pindex", "_dsir", "_pack"):
        shutil.rmtree(out + sfx, ignore_errors=True)


# -- curate(near_dedup="exact") ------------------------------------------------


def test_exact_curation_leaves_no_near_dups_and_is_leak_free(
    spark, sf_dir, tmp_path
):
    """The exact family's guarantee, verified against ground truth: after
    curate(near_dedup='exact', leakage_free=True) the materialized
    dataset holds NO pair at the dedup threshold, and NO pair at
    split_jaccard straddles splits (the exhaustive leakage guarantee the
    star-mode LSH path documents as its recall caveat)."""
    out = str(tmp_path / "exds")
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 4 != 0)
    curate(docs, out, near_dedup="exact", leakage_free=True)
    ds = spark.read.parquet(out)
    nd = dd.ngram_jaccard_pairs(
        ds.select("doc_id", "text"), k=3, threshold=0.8, prefix_filter=True
    ).count()
    assert nd == 0, f"{nd} near-dup pairs survived exact curation"
    pairs = dd.ngram_jaccard_pairs(
        ds.select("doc_id", "text"), k=3, threshold=0.3, prefix_filter=True
    )
    sp = ds.select("doc_id", "split")
    leak = (
        pairs.join(
            sp.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leak == 0, f"{leak} cross-split near-dup pairs"
    # policy record: family recorded, no banding mode claimed, no
    # buckets table written (exact datasets probe _pindex instead)
    meta = json.load(open(out + "_dedup/meta.json"))
    assert meta["near_dedup"] == "exact"
    assert "lsh_mode" not in meta
    assert not os.path.exists(out + "_dedup/buckets")
    pmeta = json.load(open(out + "_pindex/meta.json"))
    assert pmeta["threshold"] == 0.3  # leakage-free floor = split_jaccard
    assert pmeta["n_docs"] == ds.count()


def test_exact_increment_stays_in_step_and_is_idempotent(
    spark, sf_dir, tmp_path
):
    out = str(tmp_path / "exinc")
    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    curate(base, out, near_dedup="exact")
    manifest, report = curate_increment(batch, out)
    appended = sum(r.n_rows for r in manifest.collect())
    assert appended > 0
    ds = spark.read.parquet(out)
    pmeta = json.load(open(out + "_pindex/meta.json"))
    assert pmeta["n_docs"] == ds.count(), "pindex out of step with dataset"
    # the grown dataset still holds no near-dup pair at the threshold
    assert (
        dd.ngram_jaccard_pairs(
            ds.select("doc_id", "text"), k=3, threshold=0.8,
            prefix_filter=True,
        ).count()
        == 0
    )
    # redelivery is a no-op for the dataset AND the artifact
    m2, _ = curate_increment(batch, out)
    assert sum(r.n_rows for r in m2.collect()) == 0
    assert json.load(open(out + "_pindex/meta.json")) == pmeta


def test_near_dedup_inherit_or_refuse(spark, sf_dir, tmp_path):
    out = str(tmp_path / "refuse")
    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0).limit(20)
    curate(base, out, near_dedup="exact")
    with pytest.raises(ValueError, match="near_dedup"):
        curate_increment(batch, out, near_dedup="lsh")
    out2 = str(tmp_path / "refuse2")
    curate(base, out2)  # default lsh
    assert json.load(open(out2 + "_dedup/meta.json"))["near_dedup"] == "lsh"
    with pytest.raises(ValueError, match="near_dedup"):
        curate_increment(batch, out2, near_dedup="exact")
    with pytest.raises(ValueError, match="near_dedup"):
        curate(docs.limit(5), str(tmp_path / "bad"), near_dedup="fuzzy")


def test_exact_increment_matches_lsh_increment_superset(
    spark, sf_dir, tmp_path
):
    """The exact family can only remove MORE near-dups than LSH (its
    pair set is a superset of the verified-LSH set), so the exact
    increment's survivor count is <= the LSH increment's on the same
    batch."""
    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    oe, ol = str(tmp_path / "e"), str(tmp_path / "l")
    curate(base, oe, near_dedup="exact")
    curate(base, ol, near_dedup="lsh")
    me, _ = curate_increment(batch, oe)
    ml, _ = curate_increment(batch, ol)
    n_exact = sum(r.n_rows for r in me.collect())
    n_lsh = sum(r.n_rows for r in ml.collect())
    assert n_exact <= n_lsh


# -- prefix-index lifecycle verbs -----------------------------------------------


@pytest.fixture()
def built_index(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "pindex")
    corpus = _docs(spark, sf_dir).filter((F.col("doc_id") % 4).isin(1, 2))
    meta = dd.write_prefix_index(corpus, idx, k=3, threshold=0.5)
    return idx, meta


def test_prefix_index_add_equals_fresh_build(spark, sf_dir, built_index):
    """Extend == rebuild: probing an added-to index returns exactly what
    a fresh build over the grown corpus returns (the physical-append-
    never-semantic-change contract the registry query oracles)."""
    idx, _ = built_index
    docs = _docs(spark, sf_dir)
    dd.prefix_index_add(docs.filter(F.col("doc_id") % 4 == 3), idx)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    served = dd.ngram_jaccard_join(
        batch, k=3, threshold=0.5, corpus_index=idx
    )
    derived = dd.ngram_jaccard_join(
        batch, docs.filter(F.col("doc_id") % 4 != 0), k=3, threshold=0.5
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, derived.collect())
    )


def test_prefix_index_add_is_idempotent(spark, sf_dir, built_index):
    idx, meta0 = built_index
    part3 = _docs(spark, sf_dir).filter(F.col("doc_id") % 4 == 3)
    m1 = dd.prefix_index_add(part3, idx)
    assert m1["n_docs"] > meta0["n_docs"]
    m2 = dd.prefix_index_add(part3, idx)  # redelivery
    assert m2 == m1


def test_prefix_index_add_counts_match_tables(spark, sf_dir, built_index):
    idx, _ = built_index
    meta = dd.prefix_index_add(
        _docs(spark, sf_dir).filter(F.col("doc_id") % 4 == 3), idx
    )
    assert spark.read.parquet(f"{idx}/docs").count() == meta["n_docs"]
    assert (
        spark.read.parquet(f"{idx}/pindex").count()
        == meta["n_prefix_entries"]
    )


def test_prefix_index_add_crash_window_reads_as_no_index(
    spark, sf_dir, built_index, monkeypatch
):
    """A kill inside prefix_index_add (header deleted, appends in
    flight) must leave a directory read_prefix_index REFUSES — the
    half-appended index can never serve."""
    idx, _ = built_index
    os.remove(f"{idx}/meta.json")  # the add's first destructive step
    with pytest.raises(ValueError, match="not a prefix index"):
        dd.read_prefix_index(spark, idx)
    with pytest.raises(ValueError, match="not a prefix index"):
        dd.prefix_index_add(_docs(spark, sf_dir).limit(5), idx)


def test_increment_rebuilds_pindex_after_crash_window(
    spark, sf_dir, tmp_path
):
    """curate_increment on an exact dataset whose _pindex lost its
    header (crash inside a prior add) rebuilds it from the corpus and
    completes; the rebuilt index is in step with the grown dataset."""
    out = str(tmp_path / "crash")
    docs = _docs(spark, sf_dir)
    curate(docs.filter(F.col("doc_id") % 4 != 0), out, near_dedup="exact")
    os.remove(_pindex_dir(out) + "/meta.json")  # simulate the crash
    # the _synced marker must not mask the damage: a crash inside the
    # add happened AFTER the marker was deleted, so drop it too
    try:
        os.remove(out + "_dedup/_synced")
    except FileNotFoundError:
        pass
    manifest, _ = curate_increment(docs.filter(F.col("doc_id") % 4 == 0), out)
    assert sum(r.n_rows for r in manifest.collect()) > 0
    pmeta = json.load(open(_pindex_dir(out) + "/meta.json"))
    assert pmeta["n_docs"] == spark.read.parquet(out).count()


def test_prefix_index_compact_preserves_content(spark, sf_dir, built_index):
    idx, meta0 = built_index
    # several appends -> many small files
    docs = _docs(spark, sf_dir)
    dd.prefix_index_add(docs.filter(F.col("doc_id") % 8 == 3), idx)
    dd.prefix_index_add(docs.filter(F.col("doc_id") % 8 == 7), idx)
    before = sorted(
        map(tuple, spark.read.parquet(f"{idx}/pindex").collect())
    )
    docs_before = sorted(
        map(
            tuple,
            spark.read.parquet(f"{idx}/docs").select("id", "sz").collect(),
        )
    )
    stats = dd.prefix_index_compact(spark, idx)
    assert stats["files_after"] <= stats["files_before"]
    assert (
        sorted(map(tuple, spark.read.parquet(f"{idx}/pindex").collect()))
        == before
    )
    assert (
        sorted(
            map(
                tuple,
                spark.read.parquet(f"{idx}/docs")
                .select("id", "sz")
                .collect(),
            )
        )
        == docs_before
    )
    # header untouched by compaction
    assert json.load(open(f"{idx}/meta.json"))["k"] == meta0["k"]


def test_prefix_index_compact_heals_crash_windows(spark, built_index):
    """Recovery preamble: a .old directory left by a crash between the
    two renames (live table absent) is renamed back; a populated .old
    beside a live table is deleted."""
    idx, _ = built_index
    # window 1: died between renames — src missing, .old holds the table
    os.rename(f"{idx}/pindex", f"{idx}/pindex.old")
    stats = dd.prefix_index_compact(spark, idx)
    assert os.path.exists(f"{idx}/pindex")
    assert not os.path.exists(f"{idx}/pindex.old")
    assert stats["files_after"] >= 1
    # window 2: died before cleanup — both exist
    shutil.copytree(f"{idx}/docs", f"{idx}/docs.old")
    dd.prefix_index_compact(spark, idx)
    assert not os.path.exists(f"{idx}/docs.old")


def test_prefix_index_add_refuses_foreign_featurizer(
    spark, sf_dir, built_index
):
    idx, _ = built_index
    meta = json.load(open(f"{idx}/meta.json"))
    meta["featurizer"] = "someone-elses-v0"
    json.dump(meta, open(f"{idx}/meta.json", "w"))
    with pytest.raises(ValueError, match="featurizer"):
        dd.prefix_index_add(_docs(spark, sf_dir).limit(5), idx)


def test_exact_vs_lsh_recall_query_sane(spark, sf_dir):
    from planet_dump_ng_spark import plans

    plans.load_all()
    row = plans.QUERIES["dedup_exact_vs_lsh_recall"].spark(
        spark, sf_dir
    ).first()
    assert row["n_missed"] >= 0
    assert row["n_lsh_pairs"] + row["n_missed"] == row["n_exact_pairs"]
    if row["n_exact_pairs"] > 0:
        assert 0.0 <= row["lsh_recall"] <= 1.0
    else:  # recall is undefined, not NaN, on a pair-free corpus
        assert row["lsh_recall"] is None


# -- MP4 container parse ---------------------------------------------------------


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _mp4_fixture(w=1920, h=1080, frames=(100, 50), timescale=1000, dur=5000):
    from planet_dump_ng_spark.operators import multimodal as mm  # noqa: F401

    mvhd = _box(
        b"mvhd",
        bytes(4) + bytes(8) + struct.pack(">II", timescale, dur) + bytes(80),
    )
    tkhd = _box(
        b"tkhd", bytes(4) + bytes(72) + struct.pack(">II", w << 16, h << 16)
    )
    stts_body = bytes(4) + struct.pack(">I", len(frames))
    for n in frames:
        stts_body += struct.pack(">II", n, 512)
    stbl = _box(b"stbl", _box(b"stts", stts_body))
    trak = _box(b"trak", tkhd + _box(b"mdia", _box(b"minf", stbl)))
    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isommp42")
    return ftyp + _box(b"moov", mvhd + trak)


def test_parse_mp4_header_real_dimensions():
    from planet_dump_ng_spark.operators.multimodal import parse_mp4_header

    assert parse_mp4_header(_mp4_fixture()) == (1920, 1080, 150, 5000)
    # v1 tkhd/mvhd (64-bit times)
    tkhd1 = _box(
        b"tkhd",
        b"\x01" + bytes(3) + bytes(84) + struct.pack(">II", 640 << 16, 360 << 16),
    )
    mvhd1 = _box(
        b"mvhd",
        b"\x01" + bytes(3) + bytes(16) + struct.pack(">IQ", 600, 1200) + bytes(80),
    )
    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isom")
    payload = ftyp + _box(b"moov", mvhd1 + _box(b"trak", tkhd1))
    assert parse_mp4_header(payload) == (640, 360, 1, 2000)


def test_parse_mp4_header_rejects_non_mp4():
    from planet_dump_ng_spark.operators.multimodal import parse_mp4_header

    assert parse_mp4_header(b"not an mp4 at all, just text bytes here") is None
    assert parse_mp4_header(b"") is None
    # truncated box sizes terminate the walk instead of raising
    assert parse_mp4_header(b"\x00\x00\x00\x08ftyp\xff\xff\xff\xffmoov") is None


def test_parse_mp4_skips_audio_track():
    """A zero-dimension (audio) trak before the video trak is skipped."""
    from planet_dump_ng_spark.operators.multimodal import parse_mp4_header

    audio_tkhd = _box(b"tkhd", bytes(4) + bytes(72) + struct.pack(">II", 0, 0))
    video_tkhd = _box(
        b"tkhd", bytes(4) + bytes(72) + struct.pack(">II", 320 << 16, 240 << 16)
    )
    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isom")
    payload = ftyp + _box(
        b"moov", _box(b"trak", audio_tkhd) + _box(b"trak", video_tkhd)
    )
    assert parse_mp4_header(payload)[:2] == (320, 240)


def test_decode_image_meta_uses_real_mp4(spark):
    from planet_dump_ng_spark.operators.multimodal import decode_image_meta

    payload = _mp4_fixture(w=256, h=128, frames=(61,))
    df = spark.createDataFrame(
        [(1, bytearray(payload), {"format": "mp4", "n_bytes": len(payload)})],
        "doc_id bigint, payload binary, media_meta struct<format:string,n_bytes:int>",
    )
    row = decode_image_meta(df).first()
    assert (row["width"], row["height"], row["n_frames"]) == (256, 128, 61)


def test_parse_image_header_rejects_overflow_dims():
    from planet_dump_ng_spark.operators.multimodal import parse_image_header

    sig = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
    assert parse_image_header(sig + struct.pack(">II", 2**31, 5) + bytes(8)) is None
    assert parse_image_header(sig + struct.pack(">II", 5, 0) + bytes(8)) is None
    assert parse_image_header(
        sig + struct.pack(">II", 640, 480) + bytes(8)
    ) == ("png", 640, 480)


# -- mid-compact crash windows (review findings) ---------------------------------


def test_increment_rebuilds_buckets_after_mid_compact_crash(
    spark, sf_dir, tmp_path
):
    """A dedup_compact crash between its two bucket renames leaves
    fingerprints + _synced intact with buckets parked at buckets.old —
    the one state where the synced short-circuit used to let the append
    write a BATCH-ONLY buckets table that every later probe would trust
    as the corpus.  The increment must detect the missing table and
    rebuild from the corpus."""
    out = str(tmp_path / "midswap")
    docs = _docs(spark, sf_dir)
    curate(docs.filter(F.col("doc_id") % 4 != 0), out)  # LSH family
    art = out + "_dedup"
    base_ids = (
        spark.read.parquet(art + "/buckets").select("id").distinct().count()
    )
    os.rename(art + "/buckets", art + "/buckets.old")
    assert os.path.exists(art + "/_synced")  # the deceptive state
    manifest, _ = curate_increment(docs.filter(F.col("doc_id") % 4 == 0), out)
    appended = sum(r.n_rows for r in manifest.collect())
    after_ids = (
        spark.read.parquet(art + "/buckets").select("id").distinct().count()
    )
    # rebuilt table covers the base corpus plus the append — a
    # batch-only table would hold at most `appended` ids
    assert after_ids >= base_ids
    assert after_ids > appended
    # the parked copy must not survive for a later compact preamble to
    # "restore" over the rebuilt table
    assert not os.path.exists(art + "/buckets.old")


def test_exact_increment_rebuilds_pindex_after_mid_compact_crash(
    spark, sf_dir, tmp_path
):
    """Same window on the exact family: prefix_index_compact dying
    between renames parks pindex at .old with the header and _synced
    intact; the increment rebuilds instead of crashing on the missing
    table."""
    out = str(tmp_path / "midswap-exact")
    docs = _docs(spark, sf_dir)
    curate(docs.filter(F.col("doc_id") % 4 != 0), out, near_dedup="exact")
    pind = _pindex_dir(out)
    os.rename(pind + "/pindex", pind + "/pindex.old")
    manifest, _ = curate_increment(docs.filter(F.col("doc_id") % 4 == 0), out)
    assert sum(r.n_rows for r in manifest.collect()) > 0
    pmeta = json.load(open(pind + "/meta.json"))
    assert pmeta["n_docs"] == spark.read.parquet(out).count()


def test_mp4_n_frames_overflow_falls_back_to_one():
    """A crafted uint32 stts sample_count must not overflow the int32
    n_frames column (same guard class as the PNG dimension check)."""
    from planet_dump_ng_spark.operators.multimodal import parse_mp4_header

    payload = _mp4_fixture(w=64, h=64, frames=(0xFFFFFFFF,))
    w, h, n_frames, _dur = parse_mp4_header(payload)
    assert (w, h) == (64, 64)
    assert n_frames == 1  # implausible count ignored, not propagated


def test_prefix_index_refuses_foreign_id_col(spark, sf_dir, built_index):
    idx, _ = built_index
    docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "vec_id")
    with pytest.raises(ValueError, match="id_col"):
        dd.prefix_index_add(docs.limit(5), idx, id_col="vec_id")
    with pytest.raises(ValueError, match="id_col"):
        dd.ngram_jaccard_join(
            docs.limit(5), k=3, threshold=0.5, corpus_index=idx,
            id_col="vec_id",
        )


def test_prefix_index_multi_add_equals_fresh_build(spark, sf_dir, tmp_path):
    """Commutativity of the extend verb: a build plus several adds in
    arbitrary slice order serves exactly what one fresh build over the
    union serves — including a fully-overlapping re-add in the middle
    (pure no-op)."""
    idx = str(tmp_path / "multi")
    docs = _docs(spark, sf_dir)
    dd.write_prefix_index(
        docs.filter(F.col("doc_id") % 8 == 1), idx, k=3, threshold=0.5
    )
    for m in (5, 2, 7, 3, 6):
        dd.prefix_index_add(docs.filter(F.col("doc_id") % 8 == m), idx)
    # full redelivery of every slice added so far: a pure no-op
    dd.prefix_index_add(
        docs.filter((F.col("doc_id") % 8).isin(1, 2, 3, 5, 6, 7)), idx
    )
    batch = docs.filter(F.col("doc_id") % 8 == 0)
    served = dd.ngram_jaccard_join(batch, k=3, threshold=0.5, corpus_index=idx)
    corpus = docs.filter((F.col("doc_id") % 8).isin(1, 2, 3, 5, 6, 7))
    derived = dd.ngram_jaccard_join(batch, corpus, k=3, threshold=0.5)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, derived.collect())
    )
    # counts stayed exact through every append
    meta = json.load(open(f"{idx}/meta.json"))
    assert spark.read.parquet(f"{idx}/docs").count() == meta["n_docs"]
    assert (
        spark.read.parquet(f"{idx}/pindex").count()
        == meta["n_prefix_entries"]
    )


def test_curate_ingest_stream_exact_family(spark, sf_dir, tmp_path):
    """The streaming ingest twin under near_dedup='exact': each
    micro-batch's curate_increment INHERITS the recorded family, the
    _pindex artifact grows in lockstep (and gets compacted by the
    folded maintenance pass), and the streamed dataset equals the
    sequential-batch reference — the same exactly-once-by-idempotence
    contract the LSH twin pins in test_round6_curation."""
    from planet_dump_ng_spark.streaming import jobs

    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    cols = ["doc_id", "source", "lang", "text", "n_chars"]

    ref = str(tmp_path / "seq_ds")
    curate(base, ref, near_dedup="exact")
    curate_increment(b1.select(*cols), ref)
    curate_increment(b2.select(*cols), ref)
    want = {
        (r.doc_id, r.split)
        for r in spark.read.parquet(ref).select("doc_id", "split").collect()
    }

    out = str(tmp_path / "stream_ds")
    curate(base, out, near_dedup="exact")
    bus = str(tmp_path / "bus")
    b1.select(*cols).coalesce(1).write.mode("append").parquet(bus)
    b2.select(*cols).coalesce(1).write.mode("append").parquet(bus)
    stream = jobs.read_documents_stream(spark, bus, max_files_per_trigger=1)
    reports = jobs.curate_ingest_stream(
        stream, out, str(tmp_path / "ckpt"), compact_every=1
    )
    got = {
        (r.doc_id, r.split)
        for r in spark.read.parquet(out).select("doc_id", "split").collect()
    }
    assert got == want
    assert len(reports) >= 1
    n = spark.read.parquet(out).count()
    pmeta = json.load(open(_pindex_dir(out) + "/meta.json"))
    assert pmeta["n_docs"] == n  # artifact in lockstep through the stream
    # redelivery through a fresh stream appends nothing
    stream2 = jobs.read_documents_stream(spark, bus, max_files_per_trigger=1)
    jobs.curate_ingest_stream(stream2, out, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(out).count() == n
    assert json.load(open(_pindex_dir(out) + "/meta.json")) == pmeta


def test_pindex_cli_lifecycle(spark, sf_dir, tmp_path, capsys):
    """The standalone CLI drives the full artifact lifecycle:
    build -> add -> compact -> probe, with probe == derive."""
    from planet_dump_ng_spark import pindex_cli

    docs = _docs(spark, sf_dir)
    corpus_p = str(tmp_path / "corpus.parquet")
    batch_p = str(tmp_path / "batch.parquet")
    add_p = str(tmp_path / "add.parquet")
    docs.filter((F.col("doc_id") % 4).isin(1, 2)).write.parquet(corpus_p)
    docs.filter(F.col("doc_id") % 4 == 3).write.parquet(add_p)
    docs.filter(F.col("doc_id") % 4 == 0).write.parquet(batch_p)
    idx = str(tmp_path / "idx")
    out_p = str(tmp_path / "pairs.parquet")

    assert pindex_cli.main(
        ["build", "--input", corpus_p, "--index-dir", idx,
         "--threshold", "0.5"]
    ) == 0
    assert pindex_cli.main(
        ["add", "--input", add_p, "--index-dir", idx]
    ) == 0
    assert pindex_cli.main(["compact", "--index-dir", idx]) == 0
    assert pindex_cli.main(
        ["probe", "--input", batch_p, "--index-dir", idx, "--out", out_p]
    ) == 0
    got = sorted(
        map(tuple, spark.read.parquet(out_p).collect())
    )
    want = sorted(
        map(
            tuple,
            dd.ngram_jaccard_join(
                docs.filter(F.col("doc_id") % 4 == 0),
                docs.filter(F.col("doc_id") % 4 != 0),
                k=3,
                threshold=0.5,
            ).collect(),
        )
    )
    assert got == want
    # probing below the recorded floor refuses
    with pytest.raises(ValueError, match="threshold"):
        pindex_cli.main(
            ["probe", "--input", batch_p, "--index-dir", idx,
             "--threshold", "0.3"]
        )
