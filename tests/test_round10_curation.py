"""Round-10 pins.

1. The five round-9 ADVICE closures: dedup thresholds recorded +
   inherit-or-refuse (the medium finding — a silently-raised
   jaccard_threshold weakened the exact family's guarantee mid-dataset),
   lsh_mode+exact refusal, prefix_index_add batch-duplicate guard,
   stale-repair rebuilding at the index's recorded floor, and the
   leakage-free exact curation single-execution checkpoint (covered by
   the behavior tests re-running that path).
2. The LM-surprisal quality gate: frozen bigram-LM artifact lifecycle,
   curate gate + increment inheritance/refusals, and the backoff
   scorer pinned against the held-out registry oracle's semantics.
3. Winnowing substring fingerprints: the >= w+k-1 detection GUARANTEE
   at every offset (where the strided control provably misses).
4. dHash: real PNG decode pinned against an independent pixel-formula
   reference, filter/color-type coverage, corrupt-payload stub
   fallback, and the banded join's pigeonhole recall.
5. canonical_url rule-by-rule unit pins.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.llm_pipeline import (
    _dedup_artifact_dir,
    _lm_model_dir,
    _pindex_dir,
    curate,
    curate_increment,
)
from planet_dump_ng_spark.operators import dedup as dd
from planet_dump_ng_spark.operators import lm
from planet_dump_ng_spark.operators import multimodal as mm
from planet_dump_ng_spark.operators import text as tx


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _base_batch(docs):
    return (
        docs.filter(F.col("doc_id") % 4 != 0),
        docs.filter(F.col("doc_id") % 4 == 0),
    )


# -- 1. ADVICE closures --------------------------------------------------------


def test_lsh_mode_with_exact_family_refuses(docs, tmp_path):
    with pytest.raises(ValueError, match="lsh_mode"):
        curate(docs, str(tmp_path / "d"), near_dedup="exact", lsh_mode="star")
    with pytest.raises(ValueError, match="lsh_mode"):
        curate(docs, str(tmp_path / "d2"), near_dedup="exact", lsh_mode="auto")


def test_jaccard_threshold_recorded_and_inherited(docs, tmp_path):
    """The ADVICE medium finding: an exact dataset curated at t=0.5 must
    not take a default increment at t=0.8 — the increment now inherits
    the recorded 0.5, and an explicit contradiction raises."""
    base, batch = _base_batch(docs)
    out = str(tmp_path / "ds")
    curate(base, out, near_dedup="exact", jaccard_threshold=0.5)
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["jaccard_threshold"] == 0.5
    assert "split_jaccard" not in meta  # not leakage_free: inert, unrecorded
    with pytest.raises(ValueError, match="jaccard_threshold"):
        curate_increment(batch, out, jaccard_threshold=0.8)
    # defaults inherit: the probe runs at 0.5 (a 0.8 probe against the
    # 0.5-floor pindex would pass the floor check but weaken the set)
    curate_increment(batch, out)
    meta2 = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta2["jaccard_threshold"] == 0.5
    # restating the recorded value is fine
    curate_increment(batch, out, jaccard_threshold=0.5)


def test_split_jaccard_recorded_and_inherited(docs, tmp_path):
    base, batch = _base_batch(docs)
    out = str(tmp_path / "ds")
    curate(base, out, leakage_free=True, split_jaccard=0.4, min_tokens=5)
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["split_jaccard"] == 0.4
    with pytest.raises(ValueError, match="split_jaccard"):
        curate_increment(batch, out, split_jaccard=0.3)
    curate_increment(batch, out)  # inherits 0.4


def test_prefix_index_add_dedups_batch_ids(spark, tmp_path):
    rows = [(i, f"alpha beta gamma delta epsilon token{i} zeta") for i in range(8)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "pindex")
    dd.write_prefix_index(corpus, d, k=3, threshold=0.5)
    dup_rows = [(100, "wholly new document text with many fresh tokens here")]
    batch = spark.createDataFrame(dup_rows * 3, "doc_id long, text string")
    meta = dd.prefix_index_add(batch, d)
    assert meta["n_docs"] == 9  # 8 + ONE, not 8 + 3
    docs_tbl = spark.read.parquet(f"{d}/docs")
    assert docs_tbl.filter(F.col("id") == 100).count() == 1


def test_stale_repair_keeps_recorded_pindex_floor(docs, tmp_path):
    """A count-stale pindex with a readable header rebuilds at
    min(recorded floor, call threshold) — a repair must never silently
    RAISE the floor (later probes at the original threshold would
    refuse)."""
    base, batch = _base_batch(docs)
    out = str(tmp_path / "ds")
    # leakage_free records split_jaccard=0.3 -> pindex floor 0.3
    curate(base, out, near_dedup="exact", leakage_free=True, min_tokens=5)
    pind = _pindex_dir(out)
    pmeta = json.load(open(f"{pind}/meta.json"))
    assert pmeta["threshold"] == 0.3
    # simulate the crash window: dataset appended, pindex not extended
    # (n_docs out of step) and the known-clean marker gone
    pmeta["n_docs"] = pmeta["n_docs"] - 1
    json.dump(pmeta, open(f"{pind}/meta.json", "w"))
    os.remove(f"{_dedup_artifact_dir(out)}/_synced")
    curate_increment(batch, out)
    repaired = json.load(open(f"{pind}/meta.json"))
    assert repaired["threshold"] == 0.3  # floor preserved, not raised


# -- 2. LM-surprisal gate ------------------------------------------------------


def test_bigram_lm_artifact_roundtrip(docs, tmp_path):
    d = str(tmp_path / "lm")
    meta, sc = lm.bigram_lm_train_and_score(docs, d)
    assert meta["format"] == "bigram-lm-v1" and meta["n_bigrams"] > 0
    # read-back scoring of the SAME corpus is bit-identical to the
    # train-time scores (exact integer tables round-trip)
    again = lm.score_with_bigram_lm(docs, d)
    a = {r["doc_id"]: r["total_bits"] for r in sc.collect()}
    b = {r["doc_id"]: r["total_bits"] for r in again.collect()}
    assert a == b
    # self-scored corpus has no OOV bigrams by construction
    assert again.agg(F.sum("n_oov_bigrams")).first()[0] == 0
    # foreign featurizer refuses
    m = json.load(open(f"{d}/meta.json"))
    m["featurizer"] = "other-v9"
    json.dump(m, open(f"{d}/meta.json", "w"))
    with pytest.raises(ValueError, match="featurizer"):
        lm.score_with_bigram_lm(docs, d)


def test_frozen_scorer_matches_heldout_oracle_semantics(spark, docs, tmp_path):
    """score_with_bigram_lm on a held-out batch under a model trained on
    the complement == the heldout_bigram_surprisal registry plan (which
    is hash-oracled against DuckDB) — pinning all three backoff
    branches of the frozen-model serving path."""
    from planet_dump_ng_spark.plans.extras_plans import (
        heldout_bigram_surprisal,
    )

    d = str(tmp_path / "lm")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    held = docs.filter(F.col("doc_id") % 10 == 0)
    lm.write_bigram_lm(train, d)
    mine = {
        r["doc_id"]: (
            r["n_bigrams"], r["n_oov_bigrams"], r["total_bits"]
        )
        for r in lm.score_with_bigram_lm(held, d).collect()
    }
    ref = {
        r["doc_id"]: (r["n_bigrams"], r["n_oov_bigrams"], r["total_bits"])
        for r in heldout_bigram_surprisal(spark, SF_DIR).collect()
    }
    assert mine == ref and len(mine) > 0
    # the fixture's held-out slice may contain no OOV bigrams, so force
    # both backoff branches with a synthetic batch and pin their exact
    # integer costs against the persisted tables
    cnt_ctx = spark.read.parquet(f"{d}/ctx")
    some_ctx = cnt_ctx.orderBy("p").first()
    nb = json.load(open(f"{d}/meta.json"))["n_bigrams"]
    batch = spark.createDataFrame(
        [
            (900001, "zzqx wwvk yyzz"),  # wholly novel contexts
            (900002, f"{some_ctx['p']} zzqx"),  # seen ctx, novel cont.
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in lm.score_with_bigram_lm(batch, d).collect()
    }
    assert got[900001]["n_oov_bigrams"] == 2
    assert got[900001]["total_bits"] == 2 * (int(nb).bit_length() + 1)
    assert got[900002]["n_oov_bigrams"] == 1
    assert got[900002]["total_bits"] == int(some_ctx["cp"]).bit_length() + 1


def test_curate_surprisal_gate_and_increment(docs, tmp_path):
    base, batch = _base_batch(docs)
    out = str(tmp_path / "ds")
    _, report = curate(base, out, min_tokens=5, max_surprisal_bits=4.6)
    stages = dict(report.stages)
    assert "surprisal_gate" in stages
    assert os.path.exists(f"{_lm_model_dir(out)}/meta.json")
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["max_surprisal_bits"] == 4.6
    # the gate actually discriminates on this fixture
    assert 0 < stages["surprisal_gate"] < stages["quality"]
    # increment inherits the ceiling and applies the frozen model
    _, inc_report = curate_increment(batch, out, min_tokens=5)
    assert "surprisal_gate" in dict(inc_report.stages)
    # contradiction refuses; restating the record passes
    with pytest.raises(ValueError, match="max_surprisal_bits"):
        curate_increment(batch, out, min_tokens=5, max_surprisal_bits=9.9)
    curate_increment(batch, out, min_tokens=5, max_surprisal_bits=4.6)


def test_increment_surprisal_without_record_refuses(docs, tmp_path):
    base, batch = _base_batch(docs)
    out = str(tmp_path / "ds")
    curate(base, out, min_tokens=5)
    with pytest.raises(ValueError, match="records no"):
        curate_increment(batch, out, min_tokens=5, max_surprisal_bits=4.6)


# -- 3. winnowing --------------------------------------------------------------


def _dup_docs(spark, offset: int, dup_len: int = 50):
    """Two otherwise-distinct docs sharing one dup_len-char substring,
    planted at character ``offset`` in doc B."""
    import random

    rnd = random.Random(1234 + offset)
    alpha = "abcdefghijklmnopqrstuvwxyz "

    def rand_text(n, seed):
        r = random.Random(seed)
        return "".join(r.choice(alpha) for _ in range(n))

    shared = "".join(rnd.choice(alpha) for _ in range(dup_len))
    a = rand_text(120, 1) + shared + rand_text(120, 2)
    b = rand_text(offset, 3) + shared + rand_text(150, 4)
    return spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )


def test_winnow_detects_every_offset(spark):
    """The Schleimer guarantee: ANY shared substring >= w+k-1 = 50
    chars is detected regardless of alignment."""
    for offset in (0, 1, 7, 13, 29, 54, 101):
        d = _dup_docs(spark, offset)
        out = {
            r["doc_id"]: r["n_dup_fingerprints"]
            for r in dd.substring_duplication(d, mode="winnow").collect()
        }
        assert out[1] > 0 and out[2] > 0, f"missed at offset {offset}"


def test_strided_mode_misses_where_winnow_cannot(spark):
    """The measured control: stride-10 sampling misses a 50-char dup at
    SOME offset (its one-window miss bound), which the guarantee above
    proves winnowing never does."""
    missed = 0
    for offset in range(0, 20):
        d = _dup_docs(spark, offset)
        out = {
            r["doc_id"]: r["n_dup_fingerprints"]
            for r in dd.substring_duplication(d, mode="strided").collect()
        }
        if out.get(2, 0) == 0 or out.get(1, 0) == 0:
            missed += 1
    assert missed > 0


def test_winnow_no_false_positives_on_disjoint_docs(spark):
    d = spark.createDataFrame(
        [
            (1, "completely unrelated first document text " * 5),
            (2, "second body sharing nothing with the other one " * 5),
        ],
        "doc_id long, text string",
    )
    out = dd.substring_duplication(d, mode="winnow").collect()
    assert all(r["n_dup_fingerprints"] == 0 for r in out)


# -- 4. dHash ------------------------------------------------------------------


def _reference_dhash(variant: int, width: int = 24, height: int = 16) -> int:
    """Independent expected dHash from synth_png's PIXEL FORMULA —
    never touching the PNG bytes or the decoder, so a bug in either
    the encoder or the decode path cannot cancel out."""
    lum = [
        [
            (
                299 * ((16 * x + 11 * variant) % 256)
                + 587 * ((8 * y + 23 * variant) % 256)
                + 114 * ((x * y + 5 * variant) % 256)
            )
            // 1000
            for x in range(width)
        ]
        for y in range(height)
    ]
    grid = []
    for r in range(8):
        y0, y1 = r * height // 8, (r + 1) * height // 8
        row = []
        for c in range(9):
            x0, x1 = c * width // 9, (c + 1) * width // 9
            tot = sum(lum[y][x] for y in range(y0, y1) for x in range(x0, x1))
            row.append(tot // ((y1 - y0) * (x1 - x0)))
        grid.append(row)
    out = 0
    for r in range(8):
        for c in range(8):
            out = (out << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
    return out - (1 << 64) if out >= (1 << 63) else out


def test_png_dhash_matches_pixel_formula():
    for v in range(8):
        assert mm.png_dhash(mm.synth_png(v)) == _reference_dhash(v)


def test_png_decode_filters_and_color_types():
    """Hand-encode the same pixels under every filter type plus a
    grayscale variant; the decoder must reconstruct identical luma."""
    import struct
    import zlib

    width, height = 12, 10
    px = [
        [((7 * x + 3 * y) % 256, (5 * x * y) % 256, (x + 13 * y) % 256)
         for x in range(width)]
        for y in range(height)
    ]

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    def encode(ftype: int) -> bytes:
        raw = bytearray()
        prev = bytearray(width * 3)
        for y in range(height):
            line = bytearray()
            for x in range(width):
                line += bytes(px[y][x])
            raw.append(ftype)
            if ftype == 0:
                raw += line
            elif ftype == 1:  # Sub
                for i in range(len(line)):
                    a = line[i - 3] if i >= 3 else 0
                    raw.append((line[i] - a) & 0xFF)
            elif ftype == 2:  # Up
                for i in range(len(line)):
                    raw.append((line[i] - prev[i]) & 0xFF)
            elif ftype == 3:  # Average
                for i in range(len(line)):
                    a = line[i - 3] if i >= 3 else 0
                    raw.append((line[i] - ((a + prev[i]) >> 1)) & 0xFF)
            else:  # Paeth
                for i in range(len(line)):
                    a = line[i - 3] if i >= 3 else 0
                    b = prev[i]
                    c = prev[i - 3] if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else c)
                    )
                    raw.append((line[i] - pred) & 0xFF)
            prev = line
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    expected = mm._png_luma_rows(encode(0))
    assert expected is not None
    for ftype in (1, 2, 3, 4):
        got = mm._png_luma_rows(encode(ftype))
        assert got == expected, f"filter {ftype} mismatch"
    # grayscale: same luma directly
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += bytes(expected[2][y])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    gray = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    ggot = mm._png_luma_rows(gray)
    assert ggot is not None and ggot[2] == expected[2]


def test_png_dhash_corrupt_falls_back_to_stub():
    good = mm.synth_png(0)
    assert mm.png_dhash(good) is not None
    assert mm.png_dhash(b"not a png at all") is None
    assert mm.png_dhash(good[:40]) is None  # truncated
    # interlaced flag -> unsupported -> None (not a crash)
    bad = bytearray(good)
    bad[28] = 1  # IHDR interlace byte
    assert mm.png_dhash(bytes(bad)) is None
    assert isinstance(mm._fake_dhash(b"abc"), int)


def test_dhash_pairs_pigeonhole_recall(spark):
    """Every pair within Hamming 3 MUST be found (<=3 flipped bits
    leave >=1 of the 4 16-bit bands intact); a far pair must not."""
    base = 0x123456789ABCDEF0
    flips = base ^ 0b1011  # 3 bits, all in band 0
    far = base ^ ((1 << 1) | (1 << 17) | (1 << 33) | (1 << 49))  # 1/band
    to_signed = lambda u: u - (1 << 64) if u >= (1 << 63) else u  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, to_signed(base)),
            (2, to_signed(flips)),
            (3, to_signed(far)),
        ],
        "doc_id long, dhash long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.dhash_pairs(df, max_hamming=3).collect()
    }
    assert got == {(1, 2): 3}


# -- 5. canonical_url ----------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTPS://WWW.Ex.COM:443/Path/?id=1#frag", "https://www.ex.com/Path?id=1"),
        ("http://A.B:80/x", "http://a.b/x"),
        ("http://a.b:8080/x", "http://a.b:8080/x"),  # non-default port kept
        ("https://h/p?utm_source=a&id=2&gclid=z", "https://h/p?id=2"),
        ("https://h/p?utm_source=a&utm_medium=b", "https://h/p"),
        ("https://h/", "https://h"),
        ("https://h/p/?fbclid=x", "https://h/p"),
        ("https://h/P?a=1&b=2#x", "https://h/P?a=1&b=2"),
        ("no-scheme/path/?utm_source=x", "no-scheme/path"),
    ],
)
def test_canonical_url_rules(spark, raw, expected):
    got = (
        spark.range(1)
        .select(tx.canonical_url(F.lit(raw)).alias("u"))
        .first()["u"]
    )
    assert got == expected


def _url_docs(spark):
    """12 docs in 4 URL groups (doc_id % 4) whose raw urls differ only
    in case / tracking params / fragment — canonical-URL dedup must
    collapse each group to its min id; texts are all distinct so no
    other stage could do it."""
    rows = [
        (
            i,
            f"document body number {i} with enough distinct tokens to "
            f"pass the quality gate vocabulary {i * 7} marker {i * 13} "
            "and some more filler words to clear the minimum",
            "web",
            f"HTTPS://Site{i % 4}.COM:443/page?utm_source=s{i}&x=1"
            + ("#f" if i % 2 == 0 else ""),
        )
        for i in range(12)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, url string"
    )


def test_curate_url_dedup_stage(spark, tmp_path):
    d = _url_docs(spark)
    out = str(tmp_path / "ds")
    _, report = curate(d, out, min_tokens=5, url_col="url")
    stages = dict(report.stages)
    assert stages["url_dedup"] == 4  # one survivor per canonical URL
    kept = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert kept == {0, 1, 2, 3}  # min id per group
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["url_col"] == "url"
    assert os.path.exists(f"{_dedup_artifact_dir(out)}/urls")


def test_increment_url_dedup_inherits_and_probes(spark, tmp_path):
    d = _url_docs(spark)
    out = str(tmp_path / "ds")
    curate(d.filter(F.col("doc_id") < 8), out, min_tokens=5, url_col="url")
    # batch: ids 8..11 re-crawl the same 4 canonical URLs -> all drop
    manifest, report = curate_increment(
        d.filter(F.col("doc_id") >= 8), out, min_tokens=5
    )
    stages = dict(report.stages)
    assert stages["url_dedup"] == 0
    assert sum(r.n_rows for r in manifest.collect()) == 0
    # a batch with a genuinely NEW canonical URL appends
    new = spark.createDataFrame(
        [
            (
                50,
                "entirely new page content with plenty of distinct "
                "words to pass every configured quality gate here now",
                "web",
                "https://site9.com/fresh?x=2",
            )
        ],
        "doc_id long, text string, source string, url string",
    )
    manifest2, _ = curate_increment(new, out, min_tokens=5)
    assert sum(r.n_rows for r in manifest2.collect()) == 1
    # contradiction / unrecorded enablement refuse
    with pytest.raises(ValueError, match="url_col"):
        curate_increment(new, out, min_tokens=5, url_col="other")
    out2 = str(tmp_path / "ds2")
    curate(d.filter(F.col("doc_id") < 8), out2, min_tokens=5)
    with pytest.raises(ValueError, match="url_col"):
        curate_increment(new, out2, min_tokens=5, url_col="url")


def test_url_dedup_null_urls_pass_through(spark, tmp_path):
    """NULL urls carry no URL evidence: they must pass the stage
    untouched in BOTH paths (grouping them would collapse every
    url-less doc to one survivor; and xxhash64(NULL) is the seed
    constant, so a stored null row would anti-join away every future
    null-url batch doc)."""
    d = _url_docs(spark)
    nulls = spark.createDataFrame(
        [
            (
                100 + j,
                f"unique url-less body {j} with plenty of distinct words "
                f"to clear every quality gate marker {j * 11} end now",
                "feed",
                None,
            )
            for j in range(3)
        ],
        "doc_id long, text string, source string, url string",
    )
    out = str(tmp_path / "ds")
    _, report = curate(
        d.unionByName(nulls), out, min_tokens=5, url_col="url"
    )
    # 4 url survivors + ALL 3 null-url docs
    assert dict(report.stages)["url_dedup"] == 7
    # the urls artifact holds only the 4 non-null hashes
    urls = spark.read.parquet(f"{_dedup_artifact_dir(out)}/urls")
    assert urls.count() == 4
    # increment: null-url batch docs are not anti-joined away
    more_nulls = spark.createDataFrame(
        [
            (
                200,
                "another wholly distinct url-less document body with many "
                "fresh words beyond any prior text marker omega final",
                "feed",
                None,
            )
        ],
        "doc_id long, text string, source string, url string",
    )
    manifest, inc_report = curate_increment(more_nulls, out, min_tokens=5)
    assert dict(inc_report.stages)["url_dedup"] == 1
    assert sum(r.n_rows for r in manifest.collect()) == 1


def test_increment_lsh_mode_on_exact_dataset_refuses(docs, tmp_path):
    base, batch = _base_batch(docs)
    out = str(tmp_path / "ds")
    curate(base, out, near_dedup="exact")
    with pytest.raises(ValueError, match="lsh_mode"):
        curate_increment(batch, out, lsh_mode="star")


def test_increment_inert_split_jaccard_not_recorded(docs, tmp_path):
    """An explicit split_jaccard on a non-leakage-free pre-header
    dataset is inert — the backfill must not enshrine it (a later
    equally-inert restatement would become refusable for no reason)."""
    base, batch = _base_batch(docs)
    out = str(tmp_path / "ds")
    curate(base, out, write_dedup_artifact=False)
    curate_increment(batch, out, split_jaccard=0.5)
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert "split_jaccard" not in meta
    curate_increment(batch, out, split_jaccard=0.3)  # no spurious refusal


def test_curate_ingest_stream_inherits_surprisal_gate(spark, docs, tmp_path):
    """The streaming ingest twin under the surprisal gate: each
    micro-batch's curate_increment inherits the recorded ceiling and
    scores under the FROZEN bigram LM, and the streamed dataset equals
    the sequential-batch reference (the round-9 exact-family pin's
    shape, for the round-10 policy)."""
    from planet_dump_ng_spark.streaming import jobs

    base = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    cols = ["doc_id", "source", "lang", "text", "n_chars"]

    ref = str(tmp_path / "seq_ds")
    curate(base, ref, min_tokens=5, max_surprisal_bits=4.7)
    curate_increment(b1.select(*cols), ref, min_tokens=5)
    curate_increment(b2.select(*cols), ref, min_tokens=5)
    want = {
        (r.doc_id, r.split)
        for r in spark.read.parquet(ref).select("doc_id", "split").collect()
    }

    out = str(tmp_path / "stream_ds")
    curate(base, out, min_tokens=5, max_surprisal_bits=4.7)
    bus = str(tmp_path / "bus")
    b1.select(*cols).coalesce(1).write.mode("append").parquet(bus)
    b2.select(*cols).coalesce(1).write.mode("append").parquet(bus)
    stream = jobs.read_documents_stream(spark, bus, max_files_per_trigger=1)
    reports = jobs.curate_ingest_stream(
        stream, out, str(tmp_path / "ckpt"), min_tokens=5
    )
    got = {
        (r.doc_id, r.split)
        for r in spark.read.parquet(out).select("doc_id", "split").collect()
    }
    assert got == want
    # every micro-batch actually ran the gate
    assert all(
        "surprisal_gate" in dict(rep.stages) for _bid, rep in reports
    )


def test_curate_exact_leakage_free_still_green(docs, tmp_path):
    """Behavior pin for the single-execution checkpoint cleanup: the
    exact+leakage-free curation still produces a split-consistent
    dataset, a floored pindex, and a synced artifact."""
    out = str(tmp_path / "ds")
    manifest, _ = curate(
        docs, out, near_dedup="exact", leakage_free=True, min_tokens=5
    )
    assert manifest.count() > 0
    assert os.path.exists(f"{_pindex_dir(out)}/meta.json")
    assert os.path.exists(f"{_dedup_artifact_dir(out)}/_synced")
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["near_dedup"] == "exact" and meta["split_jaccard"] == 0.3


# -- lm_cli --------------------------------------------------------------------


def test_lm_cli_train_score_gate(spark, docs, tmp_path, capsys):
    """The standalone lifecycle CLI over the bigram-LM artifact:
    train persists the count tables + header, score serves the frozen
    model, gate keeps exactly the docs the curation stage would."""
    from planet_dump_ng_spark import lm_cli

    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    d = str(tmp_path / "lm")
    assert lm_cli.main(["train", "--input", src, "--model-dir", d]) == 0
    assert os.path.exists(f"{d}/meta.json")
    out = str(tmp_path / "scores.parquet")
    assert lm_cli.main(
        ["score", "--input", src, "--model-dir", d, "--out", out]
    ) == 0
    scored = spark.read.parquet(out)
    assert scored.count() > 0 and "mean_bits" in scored.columns
    kept_out = str(tmp_path / "kept.parquet")
    assert lm_cli.main(
        ["gate", "--input", src, "--model-dir", d,
         "--max-bits", "4.6", "--out", kept_out]
    ) == 0
    kept = spark.read.parquet(kept_out)
    want = {
        r["doc_id"]
        for r in lm.score_with_bigram_lm(docs, d)
        .filter(F.col("mean_bits") <= 4.6)
        .select("doc_id")
        .collect()
    }
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == want
    assert 0 < len(want) < docs.count()  # the ceiling discriminates


def test_policies_compose_exact_surprisal_url(spark, tmp_path):
    """All three round-10 policies on one exact-family dataset: the
    header records every knob, a default increment inherits them all
    (url anti-join + frozen-LM gate + pindex probe in one run), and
    the crash-window check covers the full probe-table set (urls AND
    pindex AND fingerprints must be live for _synced to short-circuit)."""
    d = _url_docs(spark)
    out = str(tmp_path / "ds")
    curate(
        d.filter(F.col("doc_id") < 8), out, min_tokens=5,
        near_dedup="exact", max_surprisal_bits=9.0, url_col="url",
    )
    meta = json.load(open(f"{_dedup_artifact_dir(out)}/meta.json"))
    assert meta["near_dedup"] == "exact"
    assert meta["max_surprisal_bits"] == 9.0
    assert meta["url_col"] == "url"
    assert os.path.exists(f"{_dedup_artifact_dir(out)}/urls")
    assert os.path.exists(f"{_pindex_dir(out)}/meta.json")
    # new canonical URL + fresh text + fluent enough -> appends through
    # every inherited gate
    new = spark.createDataFrame(
        [
            (
                50,
                "an entirely fresh page about completely different topics "
                "carrying plenty of distinct tokens to pass the quality "
                "gate with common transitions and the usual filler words",
                "web",
                "https://brandnew.example/page?x=9",
            )
        ],
        "doc_id long, text string, source string, url string",
    )
    manifest, report = curate_increment(new, out, min_tokens=5)
    stages = dict(report.stages)
    assert "url_dedup" in stages and "surprisal_gate" in stages
    assert sum(r.n_rows for r in manifest.collect()) == 1
    # a re-crawl of a standing URL drops at the url stage even though
    # its text is fresh (the gate order: URL first, cheapest)
    recrawl = new.withColumn(
        "url", F.lit("HTTPS://Site0.COM:443/page?utm_source=s0&x=1")
    ).withColumn("doc_id", F.lit(51).cast("long")).withColumn(
        "text", F.lit(
            "wholly different fresh text body with many novel distinct "
            "words beyond anything stored so only the url can match it"
        )
    )
    m2, r2 = curate_increment(recrawl, out, min_tokens=5)
    assert dict(r2.stages)["url_dedup"] == 0
    assert sum(r.n_rows for r in m2.collect()) == 0
