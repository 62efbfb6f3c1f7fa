"""Unit semantics for the as-of join, banded range join, and multimodal
stub plumbing."""

import hashlib

from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import multimodal as mm
from planet_dump_ng_spark.operators import temporal


def test_asof_join_union_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (1, 5, "p0"), (2, 7, "q1")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 10, 101), (1, 15, 102), (2, 9, 200)],
        "k long, t long, rid long",
    )
    out = {
        r.name: r.matched
        for r in temporal.asof_join_union(
            left, right, on="k", left_ts="t", right_ts="t",
            right_payload={"rid": "matched"},
        ).collect()
    }
    # p0@5: nothing at/before -> NULL; p1@10: tie counts (101); p2@20: 102
    assert out == {"p0": None, "p1": 101, "p2": 102, "q1": None}


def test_asof_tie_takes_greatest_payload(spark):
    left = spark.createDataFrame([(1, 10, "p")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 10, 9), (1, 10, 8)], "k long, t long, rid long"
    )
    [row] = temporal.asof_join_union(
        left, right, on="k", left_ts="t", right_ts="t",
        right_payload={"rid": "matched"},
    ).collect()
    assert row.matched == 9  # deterministic: greatest id among ties


def test_banded_range_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 95, 100, 149, 150, 151, 250])],
        "lid long, v double",
    )
    right = spark.createDataFrame(
        [(1, 90.0, 150.0), (2, 140.0, 160.0), (3, 0.0, 5.0)],
        "rid long, lo double, hi double",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in temporal.banded_range_join(
            left, right, "v", F.col("lo"), F.col("hi"), band_width=50.0
        ).collect()
    )
    naive = sorted(
        (lr.lid, rr.rid)
        for lr in left.collect()
        for rr in right.collect()
        if rr.lo <= lr.v <= rr.hi
    )
    assert got == naive


def test_multimodal_decode_matches_reference(spark):
    docs = spark.createDataFrame(
        [(0, "hello"), (1, "wörld"), (2, "x" * 100)], "doc_id long, text string"
    )
    meta = {
        r.doc_id: r
        for r in mm.decode_image_meta(mm.attach_binary_payload(docs)).collect()
    }
    for doc_id, text in [(0, "hello"), (1, "wörld"), (2, "x" * 100)]:
        payload = text.encode("utf-8")
        fmt = ("png", "jpeg", "mp4")[doc_id % 3]
        d = hashlib.sha256(payload).digest()
        r = meta[doc_id]
        assert r.n_bytes == len(payload)
        assert r.format == fmt
        assert r.width == 16 + d[0] % 240
        assert r.height == 16 + d[1] % 240
        assert r.n_frames == (1 if fmt != "mp4" else 1 + d[2] % 120)


def _tiny_png(width: int, height: int) -> bytes:
    """A complete, spec-valid RGB PNG built with stdlib only: signature,
    IHDR, one zlib-deflated IDAT of black scanlines, IEND — what a real
    file on disk looks like, byte for byte."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_jpeg(width: int, height: int) -> bytes:
    """A JPEG header stream with the marker structure every real camera
    file carries — SOI, JFIF APP0, a quantization table, then the SOF0
    frame header holding the dimensions (big-endian height first)."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof0 = (
        b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + struct.pack(">H", len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(b"\xff\xe0", app0)
        + seg(b"\xff\xdb", dqt)
        + seg(b"\xff\xc0", sof0)
        + b"\xff\xd9"
    )


def test_parse_image_header_real_bytes():
    """The header parser reads REAL dimensions from real PNG/JPEG bytes
    (pure-stdlib decode, no image libraries)."""
    assert mm.parse_image_header(_tiny_png(3, 2)) == ("png", 3, 2)
    assert mm.parse_image_header(_tiny_png(640, 480)) == ("png", 640, 480)
    assert mm.parse_image_header(_tiny_jpeg(5, 7)) == ("jpeg", 5, 7)
    assert mm.parse_image_header(_tiny_jpeg(1920, 1080)) == (
        "jpeg",
        1920,
        1080,
    )
    # non-image payloads: no parse, the stub handles them
    assert mm.parse_image_header(b"hello world") is None
    assert mm.parse_image_header(b"") is None
    assert mm.parse_image_header(b"\x89PNGxx") is None
    assert mm.parse_image_header(b"\xff\xd8\xff\xd9") is None  # SOI+EOI only


def _tiny_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """A complete, spec-valid mono PCM16 WAV: RIFF/WAVE header, fmt
    chunk, data chunk of little-endian int16 samples."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_wav_header_and_real_energies():
    """Real PCM16 WAV bytes parse to real header fields and exact
    integer per-window mean-square energies."""
    samples = [100, -100, 200, -200, 1000, -1000, 4, -4]
    wav = _tiny_wav(samples, sample_rate=16000)
    hdr = mm.parse_wav_header(wav)
    assert hdr is not None
    sr, ch, bits, off, dlen = hdr
    assert (sr, ch, bits, dlen) == (16000, 1, 16, 16)
    e = mm._wav_energies(wav, n_windows=4)
    # windows of 2: mean square = (a^2 + b^2) // 2, exact ints
    assert e == [10000, 40000, 1000000, 16]
    # non-WAV payloads: no parse, the stub handles them
    assert mm.parse_wav_header(b"not audio at all, just text") is None
    assert mm._wav_energies(b"RIFFxxxxWAVE", 4) is None


def test_audio_energy_stats_real_wav(spark):
    """audio_energy_stats decodes real WAV bytes through the same
    mapInPandas path the stub rows use: wav-format rows get exact
    integer energies, mp4-format text payloads keep the stub."""
    samples = [1000, -1000] * 8
    rows = [
        (0, _tiny_wav(samples), {"format": "wav", "n_bytes": 0}),
        (1, b"opaque video bytes", {"format": "mp4", "n_bytes": 0}),
        (2, b"a text doc, not audio", {"format": "png", "n_bytes": 0}),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "media_meta struct<format:string,n_bytes:int>",
    )
    out = {r.doc_id: r for r in mm.audio_energy_stats(df, n_windows=8).collect()}
    assert set(out) == {0, 1}  # png rows carry no audio track
    assert out[0].peak_energy == 1000000  # real: every window all +/-1000
    assert out[0].mean_energy == 1000000.0
    d = hashlib.sha256(b"opaque video bytes").digest()
    assert out[1].peak_energy == max(d[3:11])  # stub path untouched


def test_decode_image_meta_real_dimensions(spark):
    """multimodal_image_meta's decode stage reads real dimensions from
    real image bytes through the SAME mapInPandas path the registry
    query uses (text payloads keep the deterministic stub — oracle
    unchanged)."""
    rows = [
        (0, _tiny_png(3, 2), {"format": "png", "n_bytes": 0}),
        (1, _tiny_jpeg(5, 7), {"format": "jpeg", "n_bytes": 0}),
        (2, b"just text bytes", {"format": "png", "n_bytes": 0}),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "media_meta struct<format:string,n_bytes:int>",
    )
    meta = {r.doc_id: r for r in mm.decode_image_meta(df).collect()}
    assert (meta[0].width, meta[0].height, meta[0].n_frames) == (3, 2, 1)
    assert (meta[1].width, meta[1].height, meta[1].n_frames) == (5, 7, 1)
    d = hashlib.sha256(b"just text bytes").digest()
    assert (meta[2].width, meta[2].height) == (16 + d[0] % 240, 16 + d[1] % 240)


def test_frame_sample_and_resize(spark):
    docs = spark.createDataFrame(
        [(2, "some video payload"), (5, "another clip")], "doc_id long, text string"
    )
    meta = mm.decode_image_meta(mm.attach_binary_payload(docs))
    frames = mm.sample_frames(meta, every_n=10).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    metas = {r.doc_id: r for r in meta.collect()}
    for doc_id, idxs in by_doc.items():
        assert idxs == list(range(0, metas[doc_id].n_frames, 10))
    resized = mm.resize_meta(meta, max_side=32).collect()
    for r in resized:
        assert max(r.out_width, r.out_height) <= 32
        assert r.out_width >= 1 and r.out_height >= 1
        # aspect ratio approximately preserved
        if r.width >= r.height:
            assert r.out_width >= r.out_height
        else:
            assert r.out_height >= r.out_width


def test_connected_components(spark):
    from planet_dump_ng_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # components: {0,1,2,3} (chain), {4,5} , {6}, {7}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    got = {
        r.id: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}


def test_check_changesets_present(spark):
    import pytest as _pytest

    from planet_dump_ng_spark.operators.assembly import check_changesets_present

    elements = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200)], "id long, changeset_id long"
    )
    cs_ok = spark.createDataFrame([(100, 1), (200, 2)], "id long, user_id int")
    check_changesets_present(elements, cs_ok)  # no raise

    cs_missing = spark.createDataFrame([(100, 1)], "id long, user_id int")
    with _pytest.raises(ValueError, match="1 changeset"):
        check_changesets_present(elements, cs_missing)


def test_train_test_split_reproducible(spark):
    from planet_dump_ng_spark.operators.sampling import hash_sample, train_test_split

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    train, test = train_test_split(df, "k", test_fraction=0.2)
    train_ids = {r.k for r in train.collect()}
    test_ids = {r.k for r in test.collect()}
    assert train_ids.isdisjoint(test_ids)
    assert train_ids | test_ids == set(range(5000))
    assert 0.15 < len(test_ids) / 5000 < 0.25  # roughly the fraction

    # stable across repartitioning (the property df.sample lacks)
    train2, test2 = train_test_split(df.repartition(7), "k", test_fraction=0.2)
    assert {r.k for r in test2.collect()} == test_ids

    # sample of a superset preserves membership of the subset
    big = spark.range(0, 10000).withColumnRenamed("id", "k")
    s_small = {r.k for r in hash_sample(df, "k", 0.1).collect()}
    s_big = {r.k for r in hash_sample(big, "k", 0.1).collect()}
    assert s_small == {k for k in s_big if k < 5000}


def test_materialize_splits_roundtrip(spark, sf_dir, tmp_path):
    """Training-dataset sink: split-partitioned parquet with deterministic
    shard contents; splits are disjoint, cover every row, match the
    assignment fractions' bucket arithmetic, and a single-split read
    prunes to its own directory."""
    from planet_dump_ng_spark.operators.dataset import (
        materialize_splits,
        read_split,
        verify_splits,
    )
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = str(tmp_path / "ds")
    manifest = {
        r.split: (r.n_rows, r.n_ids)
        for r in materialize_splits(docs, out, "doc_id").collect()
    }
    total = docs.count()
    assert sum(v[0] for v in manifest.values()) == total
    assert set(manifest) <= {"train", "val", "test"}
    assert manifest["train"][0] > manifest["val"][0]
    verify_splits(spark, out, "doc_id")

    val = read_split(spark, out, "val")
    assert val.count() == manifest["val"][0]
    # partition pruning: the split predicate reaches the scan's
    # PartitionFilters, so only split=val directories are read
    # (inputFiles() would list the whole unfiltered relation)
    import re

    plan = val._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert pf and "= val)" in pf.group(0), pf
    # determinism: a second write produces identical per-split row sets
    out2 = str(tmp_path / "ds2")
    materialize_splits(docs, out2, "doc_id").collect()
    a = sorted(r.doc_id for r in read_split(spark, out, "val").collect())
    b = sorted(r.doc_id for r in read_split(spark, out2, "val").collect())
    assert a == b


def test_audio_energy_matches_python_reference(spark, sf_dir):
    """The mapInPandas audio path reproduces the pure-Python stub
    exactly, only for audio-format (mp4) rows."""
    import hashlib

    from planet_dump_ng_spark.operators import multimodal as mm
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(50)
    out = {
        r.doc_id: r
        for r in mm.audio_energy_stats(mm.attach_binary_payload(docs)).collect()
    }
    ref = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, text in ref.items():
        if doc_id % 3 != 2:
            assert doc_id not in out  # image rows never reach the decoder
            continue
        d = hashlib.sha256(text.encode()).digest()
        e = [d[3 + i] for i in range(8)]
        r = out[doc_id]
        assert (r.n_windows, r.peak_energy) == (8, max(e))
        assert r.mean_energy == float(sum(e)) / 8
