"""DSIR importance-resampling selection (operators/dsir.py).

Pins: the Q20 integer Mitchell log2 against a pure-Python reference and
against true log2 (error bound, monotonicity, zero-at-equal); the gram
builder's short-document edges (Spark's sequence() counts DOWN where
DuckDB's range() is empty — the round-7 hazard the guard exists for);
weight semantics (target-looking docs outscore off-target ones); and
the frozen-scores serving path (train once, apply to a new batch)
bit-equal to inline training.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import dsir as ds


def _ilog2_q20_py(n: int, d: int) -> int:
    """Pure-Python twin of operators.dsir.ilog2_q20."""
    rq = max((n << 20) // d, 1)
    e = rq.bit_length() - 1
    return (e - 20) * (1 << 20) + ((rq - (1 << e)) << 20) // (1 << e)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=2**33 - 1),
    st.integers(min_value=1, max_value=2**33 - 1),
)
def test_ilog2_q20_mitchell_bound(n, d):
    """Python reference obeys the Mitchell bound over the whole domain:
    0.08608 linearization error + log2(1 + 1/rq) for the rq truncation
    (material only near the 2^-20 clamp floor, where rq is small)."""
    if n > d:
        n, d = d, n
    v = _ilog2_q20_py(n, d) / (1 << 20)
    true = math.log2(n / d)
    assert v <= 0
    rq = max((n << 20) // d, 1)
    assert (true <= -20 and v == -20.0) or (
        abs(v - true) <= 0.08608 + math.log2(1 + 1 / rq) + 2**-20
    )


def test_ilog2_q20_spark_equals_python(spark):
    """Spark == pure Python across the domain's edge structure, in ONE
    job: powers of two (exact), +/-1 neighbours (mantissa extremes),
    the 2^33-1 ceiling, and the sub-2^-20 clamp."""
    pairs = []
    for e in (0, 1, 2, 5, 19, 20, 21, 32):
        p = 1 << e
        for n in (1, p - 1, p, p + 1):
            for d in (p, p + 1, 2 * p - 1, 2**33 - 1):
                if 1 <= n <= d:
                    pairs.append((n, d))
    df = spark.createDataFrame(pairs, "n long, d long")
    got = df.select(
        "n", "d", ds.ilog2_q20(F.col("n"), F.col("d")).alias("v")
    ).collect()
    assert len(got) == len(pairs)
    for r in got:
        assert r.v == _ilog2_q20_py(r.n, r.d), (r.n, r.d)


@pytest.mark.parametrize(
    "n,d",
    [(1, 1), (1, 2), (1, 3), (3, 4), (7, 8), (1, 4096), (4095, 4096),
     (1, 2**33 - 1), (2**32, 2**33 - 1)],
)
def test_ilog2_q20_accuracy(n, d):
    """Mitchell bound: |ilog2/2^20 - log2(n/d)| <= 0.0862; exact 0 at n==d;
    clamp floor at -20 bits for ratios under 2^-20."""
    v = _ilog2_q20_py(n, d) / (1 << 20)
    if n == d:
        assert v == 0.0
    true = math.log2(n / d)
    if true <= -20:
        assert v == pytest.approx(-20.0, abs=1e-6)
    else:
        assert abs(v - true) <= 0.0862


def test_ilog2_q20_monotone():
    vals = [_ilog2_q20_py(n, 10_000) for n in range(1, 10_001, 37)]
    assert vals == sorted(vals)


def test_gram_array_short_docs(spark):
    """0/1/2-token docs: unigrams always, bigrams only from 2 tokens —
    and NEVER a descending-sequence artifact."""
    df = spark.createDataFrame(
        [Row(t=""), Row(t="  "), Row(t="one"), Row(t="a b"), Row(t="a b c")]
    )
    rows = df.select(ds.gram_array("t").alias("g")).collect()
    assert rows[0].g == []
    assert rows[1].g == []
    assert rows[2].g == ["one"]
    assert rows[3].g == ["a", "b", "a b"]
    assert rows[4].g == ["a", "b", "c", "a b", "b c"]


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    """Two sublanguages: target docs speak {alpha beta gamma}, raw-only
    docs speak {zig zag zog}; one doc straddles."""
    rows = [
        Row(doc_id=0, text="alpha beta gamma alpha beta", is_t=True),
        Row(doc_id=1, text="beta gamma alpha gamma", is_t=True),
        Row(doc_id=2, text="alpha beta alpha beta gamma", is_t=True),
        Row(doc_id=3, text="zig zag zog zig zag", is_t=False),
        Row(doc_id=4, text="zog zig zag zog", is_t=False),
        Row(doc_id=5, text="alpha zig beta zag", is_t=False),
    ]
    return spark.createDataFrame(rows)


def test_weights_separate_target_lookalikes(tiny_corpus):
    w = ds.dsir_importance_weights(
        tiny_corpus, F.col("is_t"), n_buckets=256
    ).collect()
    by_id = {r.doc_id: r for r in w}
    assert set(by_id) == {0, 1, 2, 3, 4, 5}
    # every pure-target-vocabulary doc outscores every pure-raw one,
    # and the straddler lands strictly between the two groups
    t_scores = [by_id[i].logw_bits for i in (0, 1, 2)]
    r_scores = [by_id[i].logw_bits for i in (3, 4)]
    assert min(t_scores) > by_id[5].logw_bits > max(r_scores)
    # logw_bits is exactly logw_q20 / 2^20 (no float drift)
    for r in w:
        assert r.logw_bits == r.logw_q20 / (1 << 20)


def test_frozen_scores_serving_path(tiny_corpus, spark):
    """Scoring a NEW batch under a pre-trained score dim is bit-equal to
    what inline training over the same corpus produces for those docs."""
    scores = ds.dsir_bucket_scores(
        tiny_corpus, F.col("is_t"), n_buckets=256
    ).persist()
    inline = {
        r.doc_id: (r.n_feats, r.logw_q20)
        for r in ds.dsir_importance_weights(
            tiny_corpus, F.col("is_t"), n_buckets=256
        ).collect()
    }
    batch = tiny_corpus.filter(F.col("doc_id") >= 3)
    served = ds.dsir_importance_weights(
        batch, F.lit(False), n_buckets=256, scores=scores
    ).collect()
    scores.unpersist()
    assert {r.doc_id: (r.n_feats, r.logw_q20) for r in served} == {
        i: inline[i] for i in (3, 4, 5)
    }


def test_topk_deterministic_and_ordered(tiny_corpus):
    top = ds.dsir_topk_select(
        tiny_corpus, F.col("is_t"), k=3, n_buckets=256
    ).collect()
    assert [r.doc_id for r in top][:3] == sorted(
        [r.doc_id for r in top][:3],
        key=lambda i: next(-t.mean_logw_bits for t in top if t.doc_id == i),
    )
    # the 3 kept docs are exactly the target-vocabulary ones
    assert {r.doc_id for r in top} == {0, 1, 2}
    again = ds.dsir_topk_select(
        tiny_corpus, F.col("is_t"), k=3, n_buckets=256
    ).collect()
    assert [(r.doc_id, r.logw_q20) for r in again] == [
        (r.doc_id, r.logw_q20) for r in top
    ]


def test_empty_text_docs_absent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta", is_t=True),
         Row(doc_id=1, text="", is_t=False)]
    )
    w = ds.dsir_importance_weights(df, F.col("is_t"), n_buckets=64).collect()
    assert {r.doc_id for r in w} == {0}


def test_model_artifact_roundtrip_and_guards(tiny_corpus, spark, tmp_path):
    """write/read round-trip is bit-perfect (integer scores); a
    half-written artifact (no meta) reads as no artifact; foreign
    format/featurizer refuse loudly."""
    import json
    import os

    d = str(tmp_path / "dsir_model")
    meta = ds.write_dsir_model(
        tiny_corpus, F.col("is_t"), d, n_buckets=256,
        target_desc="is_t flag",
    )
    assert meta["format"] == ds.FORMAT
    assert meta["n_buckets"] == 256
    assert meta["n_feats_raw"] > meta["n_feats_target"] > 0
    scores, meta2 = ds.read_dsir_model(spark, d)
    assert meta2 == meta
    direct = {
        r.bucket: (r.target_count, r.raw_count, r.delta_q20)
        for r in ds.dsir_bucket_scores(
            tiny_corpus, F.col("is_t"), n_buckets=256
        ).collect()
    }
    loaded = {
        r.bucket: (r.target_count, r.raw_count, r.delta_q20)
        for r in scores.collect()
    }
    assert loaded == direct
    # crash window: header missing -> not a model
    os.remove(f"{d}/meta.json")
    with pytest.raises(ValueError, match="no meta.json"):
        ds.read_dsir_model(spark, d)
    # foreign format / featurizer -> loud refusal
    json.dump({"format": "other"}, open(f"{d}/meta.json", "w"))
    with pytest.raises(ValueError, match="format"):
        ds.read_dsir_model(spark, d)
    json.dump(
        {"format": ds.FORMAT, "featurizer": "chars-v0"},
        open(f"{d}/meta.json", "w"),
    )
    with pytest.raises(ValueError, match="featurizer"):
        ds.read_dsir_model(spark, d)


def test_retrain_deletes_stale_header_first(tiny_corpus, spark, tmp_path):
    """A retrain deletes the old header before writing tables — the
    mid-write crash window can never leave the old meta validating new
    half-written scores."""
    import os

    d = str(tmp_path / "dsir_retrain")
    ds.write_dsir_model(tiny_corpus, F.col("is_t"), d, n_buckets=256)
    # simulate the crash window: a retrain that dies right after the
    # header delete must leave an UNREADABLE artifact, not a stale one
    os.remove(f"{d}/meta.json")
    with pytest.raises(ValueError):
        ds.read_dsir_model(spark, d)
    # and a completed retrain restores it
    meta = ds.write_dsir_model(tiny_corpus, F.col("is_t"), d, n_buckets=256)
    assert meta["n_buckets"] == 256


def test_score_with_model_matches_inline(tiny_corpus, spark, tmp_path):
    d = str(tmp_path / "dsir_serve")
    ds.write_dsir_model(tiny_corpus, F.col("is_t"), d, n_buckets=256)
    served = {
        r.doc_id: (r.n_feats, r.logw_q20, r.logw_bits)
        for r in ds.dsir_score_with_model(tiny_corpus, d).collect()
    }
    inline = {
        r.doc_id: (r.n_feats, r.logw_q20, r.logw_bits)
        for r in ds.dsir_importance_weights(
            tiny_corpus, F.col("is_t"), n_buckets=256
        ).collect()
    }
    assert served == inline


def test_dsir_score_stream_matches_batch(tiny_corpus, spark, tmp_path):
    """Streaming scoring under the frozen model == batch serving over
    the same files (stateless map + lookup fold, append mode)."""
    from planet_dump_ng_spark.streaming import jobs

    d = str(tmp_path / "dsir_stream_model")
    ds.write_dsir_model(tiny_corpus, F.col("is_t"), d, n_buckets=256)

    bus = str(tmp_path / "bus")
    cols = ["doc_id", "text"]
    full = tiny_corpus.select(
        "doc_id", "text",
        F.lit("s").alias("source"), F.lit("en").alias("lang"),
        F.length("text").cast("long").alias("n_chars"),
    )
    bus_cols = ["doc_id", "source", "lang", "text", "n_chars"]
    full.filter(F.col("doc_id") < 3).select(*bus_cols).coalesce(1).write.mode(
        "append"
    ).parquet(bus)
    full.filter(F.col("doc_id") >= 3).select(*bus_cols).coalesce(1).write.mode(
        "append"
    ).parquet(bus)

    # a null-text and an empty-text row ride the bus too: batch serving
    # drops them (explode of null/empty emits no features) and the
    # stream must agree instead of crashing the fold
    spark.createDataFrame(
        [(100, "s", "en", None, 0), (101, "s", "en", "", 0)],
        "doc_id long, source string, lang string, text string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(bus)

    stream = jobs.read_documents_stream(spark, bus, max_files_per_trigger=1)
    out = jobs.dsir_score_stream(stream, d)
    jobs.run_to_memory(out, "dsir_stream_tbl", output_mode="append")
    got = {
        r.doc_id: (r.n_feats, r.logw_q20, r.logw_bits)
        for r in spark.table("dsir_stream_tbl").collect()
    }
    want = {
        r.doc_id: (r.n_feats, r.logw_q20, r.logw_bits)
        for r in ds.dsir_score_with_model(
            spark.read.parquet(bus).select(*cols), d
        ).collect()
    }
    assert got == want


def test_dsir_cli_lifecycle(tiny_corpus, spark, tmp_path, capsys):
    """train -> score -> select through the CLI: the artifact header
    records the target expression, scoring equals the operator path,
    selection keeps the target-vocabulary docs."""
    import json as _json

    from planet_dump_ng_spark import dsir_cli

    inp = str(tmp_path / "cli_docs.parquet")
    tiny_corpus.write.parquet(inp)
    model = str(tmp_path / "cli_model")

    assert dsir_cli.main(
        ["train", "--input", inp, "--model-dir", model,
         "--target", "is_t", "--n-buckets", "256"]
    ) == 0
    hdr = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hdr["target_desc"] == "is_t"
    assert hdr["n_buckets"] == 256

    wout = str(tmp_path / "cli_weights.parquet")
    assert dsir_cli.main(
        ["score", "--input", inp, "--model-dir", model, "--out", wout]
    ) == 0
    got = {
        r.doc_id: (r.n_feats, r.logw_q20)
        for r in spark.read.parquet(wout).collect()
    }
    want = {
        r.doc_id: (r.n_feats, r.logw_q20)
        for r in ds.dsir_score_with_model(tiny_corpus, model).collect()
    }
    assert got == want

    kout = str(tmp_path / "cli_kept.parquet")
    assert dsir_cli.main(
        ["select", "--input", inp, "--model-dir", model,
         "--k", "3", "--out", kout]
    ) == 0
    kept = {r.doc_id for r in spark.read.parquet(kout).collect()}
    assert kept == {0, 1, 2}


@pytest.fixture(scope="module")
def domain_corpus(spark):
    """A crawl-ish corpus: target-language docs (en, {alpha..}-vocab,
    long enough to pass the quality bands) plus off-domain docs with a
    disjoint vocabulary — what the DSIR gate exists to separate."""
    on_vocab = ("alpha beta gamma delta epsilon corpus training mixture "
                "language model quality sample data target tokens").split()
    off_vocab = ("zig zag zog quux blorp frobnicate wibble wobble flumox "
                 "grindle snark boojum mimsy borogove rath").split()

    def doc(vocab, i):
        # interleave doc-unique markers between shared-vocab words:
        # every 3-shingle contains a marker, so shingle sets are
        # DISJOINT (no near-dup collapse) while the hashed unigram
        # mass stays dominated by the shared vocabulary
        words = []
        for j, w in enumerate(vocab * 2):
            words.append(w)
            if j % 2 == 1:
                words.append(f"m{i}x{j}")
        return " ".join(words)

    rows = [
        (i, doc(on_vocab, i), "en", "feedA", 1) for i in range(12)
    ] + [
        (100 + j, doc(off_vocab, 100 + j), "xx", "feedB", 1)
        for j in range(12)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_curate_dsir_gate_and_frozen_increment(domain_corpus, spark, tmp_path):
    """curate(dsir_target=...) trains + persists the model, gates
    off-domain docs, records the policy; an increment applies the
    FROZEN model (no retrain) and drops off-domain batch docs."""
    import json as _json

    from planet_dump_ng_spark import llm_pipeline as lp

    base = domain_corpus.filter((F.col("doc_id") % 3 != 0))
    batch = domain_corpus.filter((F.col("doc_id") % 3 == 0))
    out = str(tmp_path / "dsir_ds")
    _, report = lp.curate(
        base, out, min_tokens=5, dsir_target="lang = 'en'"
    )
    stages = dict(report.stages)
    assert "dsir_gate" in stages
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept and all(i < 100 for i in kept)  # off-domain gone
    # policy recorded; model persisted with provenance
    meta = _json.load(
        open(f"{lp._dedup_artifact_dir(out)}/meta.json")
    )
    assert meta["dsir_min_bits"] == 0.0
    assert meta["dsir_target_desc"] == "lang = 'en'"
    model_meta = _json.load(open(f"{lp._dsir_model_dir(out)}/meta.json"))
    assert model_meta["target_desc"] == "lang = 'en'"

    # increment: inherits the gate, scores under the frozen model
    _, inc_report = lp.curate_increment(batch, out, min_tokens=5)
    assert "dsir_gate" in dict(inc_report.stages)
    grown = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert grown > kept  # on-domain batch docs appended
    assert all(i < 100 for i in grown)  # still no off-domain
    # the model was NOT retrained by the increment
    model_meta2 = _json.load(open(f"{lp._dsir_model_dir(out)}/meta.json"))
    assert model_meta2 == model_meta


def test_increment_dsir_contradiction_and_absence(
    domain_corpus, spark, tmp_path
):
    from planet_dump_ng_spark import llm_pipeline as lp

    base = domain_corpus.filter(F.col("doc_id") % 3 != 0)
    batch = domain_corpus.filter(F.col("doc_id") % 3 == 0)

    # contradicting a recorded threshold refuses
    out = str(tmp_path / "dsir_ds2")
    # threshold must sit inside the achievable band: add-one smoothing
    # with B=4096 buckets shrinks per-feature deltas toward 0 on a
    # tiny corpus, so on-domain means land around +0.2 bits here
    lp.curate(base, out, min_tokens=5, dsir_target="lang = 'en'",
              dsir_min_bits=0.05)
    assert spark.read.parquet(out).count() > 0
    with pytest.raises(ValueError, match="dsir_min_bits"):
        lp.curate_increment(batch, out, min_tokens=5, dsir_min_bits=0.25)
    # restating the recorded value passes
    lp.curate_increment(batch, out, min_tokens=5, dsir_min_bits=0.05)

    # a gate on a dataset that never trained a model refuses
    out2 = str(tmp_path / "plain_ds")
    lp.curate(base, out2, min_tokens=5)
    with pytest.raises(ValueError, match="records no DSIR gate"):
        lp.curate_increment(batch, out2, min_tokens=5, dsir_min_bits=0.0)


def test_empty_target_model_refuses(tiny_corpus, spark, tmp_path):
    """A target predicate matching nothing must refuse BEFORE the
    header lands: the half-built artifact reads as no model."""
    d = str(tmp_path / "empty_target")
    with pytest.raises(ValueError, match="matched no feature"):
        ds.write_dsir_model(tiny_corpus, F.lit(False), d, n_buckets=64)
    with pytest.raises(ValueError, match="no meta.json"):
        ds.read_dsir_model(spark, d)


def test_train_and_score_matches_two_pass(domain_corpus, spark, tmp_path):
    """The one-scan train+score path produces exactly the two-pass
    result (model written, then score under it)."""
    d1 = str(tmp_path / "onescan")
    d2 = str(tmp_path / "twopass")
    tgt = F.col("lang") == "en"
    meta1, w = ds.dsir_train_and_score(domain_corpus, tgt, d1)
    got = {r.doc_id: (r.n_feats, r.logw_q20) for r in w.collect()}
    meta2 = ds.write_dsir_model(domain_corpus, tgt, d2)
    want = {
        r.doc_id: (r.n_feats, r.logw_q20)
        for r in ds.dsir_score_with_model(domain_corpus, d2).collect()
    }
    assert got == want
    assert meta1 == meta2


def test_rebuild_preserves_dsir_policy(domain_corpus, spark, tmp_path):
    """The stale-artifact rebuild (crash between dataset append and
    artifact append) must preserve the recorded DSIR gate — losing it
    would silently un-gate a domain-gated dataset."""
    import json as _json
    import os
    import shutil

    from planet_dump_ng_spark import llm_pipeline as lp

    base = domain_corpus.filter(F.col("doc_id") % 3 != 0)
    batch = domain_corpus.filter(F.col("doc_id") % 3 == 0)
    out = str(tmp_path / "rebuild_ds")
    lp.curate(base, out, min_tokens=5, dsir_target="lang = 'en'")
    art = lp._dedup_artifact_dir(out)
    # forge the crash window: marker gone, fingerprints unreadable
    os.remove(f"{art}/_synced")
    shutil.rmtree(f"{art}/fingerprints")
    _, report = lp.curate_increment(batch, out, min_tokens=5)
    # the rebuild ran AND the gate still applied to the batch
    assert "dsir_gate" in dict(report.stages)
    meta = _json.load(open(f"{art}/meta.json"))
    assert meta["dsir_min_bits"] == 0.0
    assert meta["dsir_target_desc"] == "lang = 'en'"
    grown = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert all(i < 100 for i in grown)
    # and the NEXT increment still sees the recorded gate
    with pytest.raises(ValueError, match="dsir_min_bits"):
        lp.curate_increment(batch, out, min_tokens=5, dsir_min_bits=9.9)


def test_recurate_clears_stale_synced_marker(domain_corpus, spark, tmp_path):
    """Re-curating into an existing out_dir drops the prior run's
    known-clean marker: with write_dedup_artifact=False the old _dedup
    tables no longer describe the dataset, and a surviving marker
    would let the next increment skip the count check."""
    import os

    from planet_dump_ng_spark import llm_pipeline as lp

    base = domain_corpus.filter(F.col("doc_id") % 3 != 0)
    out = str(tmp_path / "recurate_ds")
    lp.curate(base, out, min_tokens=5)
    marker = f"{lp._dedup_artifact_dir(out)}/_synced"
    assert os.path.exists(marker)
    lp.curate(
        domain_corpus, out, min_tokens=5, write_dedup_artifact=False
    )
    assert not os.path.exists(marker)


def test_cli_dsir_min_bits_without_target_refuses(tmp_path, spark, domain_corpus):
    from planet_dump_ng_spark import llm_pipeline as lp

    inp = str(tmp_path / "cli_in.parquet")
    domain_corpus.write.parquet(inp)
    out = str(tmp_path / "cli_out")
    with pytest.raises(SystemExit, match="dsir-target"):
        lp.main(
            ["--input", inp, "--output", out, "--dsir-min-bits", "0.5"]
        )


def test_curate_dsir_min_bits_without_target_refuses(
    tmp_path, domain_corpus
):
    """The same half-specification refused at the API layer: a
    programmatic caller who sets a threshold but no target believes
    they configured a gate — silently running none is wrong."""
    from planet_dump_ng_spark import llm_pipeline as lp

    out = str(tmp_path / "api_halfspec")
    with pytest.raises(ValueError, match="dsir_min_bits without"):
        lp.curate(domain_corpus, out, min_tokens=5, dsir_min_bits=0.7)


def test_inline_scores_enforce_exact_window(tiny_corpus, monkeypatch):
    """The ilog2_q20 exact-integer bound fails LOUDLY on the inline
    training paths too (write_dsir_model already refuses) — shrink the
    window so the tiny corpus overflows it and expect the evaluated
    plan to raise instead of silently rounding."""
    monkeypatch.setattr(ds, "EXACT_LOG_WINDOW", 16)
    with pytest.raises(Exception, match="exact-integer log window"):
        ds.dsir_bucket_scores(
            tiny_corpus, F.col("is_t"), n_buckets=8
        ).collect()


def test_cli_score_custom_id_col(tiny_corpus, spark, tmp_path):
    """--id-col threads through score/select; a missing column refuses
    with the column inventory instead of an unresolved-attribute
    stacktrace."""
    from planet_dump_ng_spark import dsir_cli

    renamed = tiny_corpus.withColumnRenamed("doc_id", "item_id")
    inp = str(tmp_path / "idcol_docs.parquet")
    renamed.write.parquet(inp)
    model = str(tmp_path / "idcol_model")
    assert dsir_cli.main(
        ["train", "--input", inp, "--model-dir", model,
         "--target", "is_t", "--n-buckets", "256"]
    ) == 0
    kout = str(tmp_path / "idcol_kept.parquet")
    assert dsir_cli.main(
        ["select", "--input", inp, "--model-dir", model,
         "--id-col", "item_id", "--k", "3", "--out", kout]
    ) == 0
    kept = {r.item_id for r in spark.read.parquet(kout).collect()}
    assert kept == {0, 1, 2}
    with pytest.raises(SystemExit, match="not a column"):
        dsir_cli.main(
            ["score", "--input", inp, "--model-dir", model,
             "--id-col", "doc_id"]
        )
