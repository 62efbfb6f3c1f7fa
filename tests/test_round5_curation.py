"""Round-5 curation extras: C4-style span dedup, quality-weighted
sampling, and the exact re-rank stage over the IVFPQ shortlist."""

import hashlib

import pyspark.sql.functions as F
import pytest

from planet_dump_ng_spark.operators.dedup import span_dedup, span_occurrences
from planet_dump_ng_spark.operators.sampling import quality_weighted_sample
from planet_dump_ng_spark.operators.similarity import cosine_topk, rerank_exact


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_span_occurrences_windows_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(7))), (2, ""), (3, "solo")],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.span_idx): (r.span_text, r.n_span_tokens)
        for r in span_occurrences(docs, span_tokens=3).collect()
    }
    # doc 1: 7 tokens -> spans of 3, 3, 1; doc 2 empty -> none; doc 3 -> 1
    assert rows == {
        (1, 0): ("w0 w1 w2", 3),
        (1, 1): ("w3 w4 w5", 3),
        (1, 2): ("w6", 1),
        (3, 0): ("solo", 1),
    }


def test_span_dedup_hand_fixture(spark):
    # span unit = 2 tokens.  doc 1 owns "a b" and "c d"; doc 2 repeats
    # "a b" (removed) then adds "e f"; doc 3 is entirely doc 1 (all
    # removed); doc 4 repeats its OWN first span in-document.
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b e f"),
            (3, "a b c d"),
            (4, "x y x y"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in span_dedup(docs, span_tokens=2).collect()}
    assert out[1].n_spans == 2 and out[1].n_removed_spans == 0
    assert out[1].n_kept_tokens == 4
    assert out[1].retained_md5 == _md5("a b c d")
    assert out[2].n_removed_spans == 1 and out[2].n_kept_tokens == 2
    assert out[2].retained_md5 == _md5("e f")
    assert out[3].n_removed_spans == 2 and out[3].n_kept_tokens == 0
    assert out[3].retained_md5 == _md5("")
    # within-doc repeat collapses to the first occurrence
    assert out[4].n_removed_spans == 1
    assert out[4].retained_md5 == _md5("x y")


def test_span_dedup_token_mass_conserved(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = span_dedup(docs, span_tokens=10)
    # kept + removed spans account for every span; kept tokens never
    # exceed the doc's token count
    bad = out.filter(
        (F.col("n_removed_spans") > F.col("n_spans"))
        | (F.col("n_kept_tokens") < 0)
    )
    assert bad.count() == 0
    assert out.filter(F.col("n_removed_spans") > 0).count() > 0


def test_quality_weighted_sample_gate(spark):
    rows = [(i, i % 97) for i in range(400)]  # scores 0..96
    df = spark.createDataFrame(rows, ["k", "score"])
    kept = quality_weighted_sample(df, "score", "k").collect()
    assert 0 < len(kept) < 400
    quota = {0: 2500, 1: 5000, 2: 7500, 3: 10000}
    for r in kept:
        assert r.keep_threshold == quota[r.tier]
        assert r.bucket < r.keep_threshold
    # top tier keeps everything under its 100% quota; keep RATE rises
    # with tier on the full assignment (check via thresholds alone)
    tiers = {r.tier for r in kept}
    assert tiers == {0, 1, 2, 3}


def test_quality_weighted_sample_superset_stable(spark):
    df = spark.createDataFrame([(i, i) for i in range(300)], ["k", "score"])
    base = {r.k for r in quality_weighted_sample(df, "score", "k").collect()}
    wider = {
        r.k
        for r in quality_weighted_sample(
            df, "score", "k", quotas=(0.5, 0.75, 1.0, 1.0)
        ).collect()
    }
    assert base <= wider  # raising quotas only ever ADDS rows


def test_rerank_exact_restores_exact_order(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(emb, queries, k=5)
    # re-ranking the exact top-25 must reproduce the exact top-5 rows
    cand = cosine_topk(emb, queries, k=25).select("query_id", "neighbor_id")
    rr = rerank_exact(cand, emb, queries, k=5)
    a = {(r.query_id, r.neighbor_id, r.rank) for r in exact.collect()}
    b = {(r.query_id, r.neighbor_id, r.rank) for r in rr.collect()}
    assert a == b and len(a) > 0


def test_rerank_subset_of_candidates(spark, sf_dir):
    from planet_dump_ng_spark.operators.ivf import ivfpq_adc_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    cand = ivfpq_adc_topk(emb, queries, dim=64, k=25)
    rr = rerank_exact(cand, emb, queries, k=5)
    cset = {(r.query_id, r.neighbor_id) for r in cand.collect()}
    rset = {(r.query_id, r.neighbor_id) for r in rr.collect()}
    assert rset <= cset and len(rset) > 0


@pytest.mark.parametrize(
    "name",
    [
        "span_dedup_c4",
        "quality_weighted_sample",
        "ann_ivfpq_rerank_topk",
        "ann_ivfpq_rerank_recall",
    ],
)
def test_new_queries_run(spark, sf_dir, name):
    from planet_dump_ng_spark import plans

    plans.load_all()
    df = plans.QUERIES[name].spark(spark, sf_dir)
    assert df.count() >= 0


def test_span_dedup_rewrite_fixture(spark):
    from planet_dump_ng_spark.operators.dedup import span_dedup_rewrite

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en"),
            (2, "a b e f", "en"),
            (3, "a b c d", "zh"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r.doc_id: r for r in span_dedup_rewrite(docs, span_tokens=2).collect()}
    assert out[1].text == "a b c d" and out[1].lang == "en"
    assert out[2].text == "e f"
    assert 3 not in out  # fully-duplicated doc drops
    assert set(out[1].asDict()) == {"doc_id", "text", "lang"}


def test_curate_span_dedup_stage(spark, sf_dir, tmp_path):
    from planet_dump_ng_spark.llm_pipeline import curate
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "curated_span")
    manifest, report = curate(docs, out, span_dedup_tokens=10)
    stages = dict(report.stages)
    assert "span_dedup" in stages
    assert stages["span_dedup"] <= stages["exact_dedup"]
    written = spark.read.parquet(out)
    assert written.count() == stages[report.stages[-1][0]]


def test_token_budget_select_greedy_exact(spark, sf_dir):
    from planet_dump_ng_spark import plans

    plans.load_all()
    out = plans.QUERIES["token_budget_select"].spark(spark, sf_dir)
    rows = sorted(out.collect(), key=lambda r: (-r.qbin, r.doc_id))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from planet_dump_ng_spark.operators.text import linear_quality_score, token_count

    scored = linear_quality_score(docs).select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.floor(F.col("quality_margin") * 100).cast("int").alias("qbin"),
    )
    ref = sorted(scored.collect(), key=lambda r: (-r.qbin, r.doc_id))
    budget = sum(r.n_tokens for r in ref) // 2
    # driver-side replay of the greedy: prefix of the (qbin desc, id)
    # order whose cumulative mass fits the budget
    cum, expect = 0, []
    for r in ref:
        if cum + r.n_tokens > budget:
            break
        cum += r.n_tokens
        expect.append(r.doc_id)
    assert [r.doc_id for r in rows] == expect
    assert rows and rows[-1].cum_tokens <= budget


def test_bloom_screen_no_false_negatives(spark, sf_dir):
    from planet_dump_ng_spark import plans
    from planet_dump_ng_spark.operators.dedup import containment_pairs

    plans.load_all()
    out = plans.QUERIES["contamination_bloom_screen"].spark(spark, sf_dir)
    flagged = {r.doc_id for r in out.collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    probe = docs.filter(F.col("doc_id") % 20 != 0)
    # every doc sharing ANY shingle with the bench set must be flagged
    truly = {
        r.train_id
        for r in containment_pairs(
            probe, bench, k=3, threshold=1e-9
        ).collect()
    }
    assert truly <= flagged


def test_span_novelty_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streamed novel-span set equals the batch anti-join for the
    same new-batch/corpus split, under any micro-batch slicing."""
    from planet_dump_ng_spark.operators.dedup import span_occurrences
    from planet_dump_ng_spark.streaming import jobs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    spans = jobs.corpus_span_hashes(corpus).persist()
    spans.count()

    docs_dir = str(tmp_path / "span_docs_stream")
    docs.repartition(4).write.mode("overwrite").parquet(docs_dir)
    stream = jobs.read_documents_stream(spark, docs_dir, max_files_per_trigger=2)
    jobs.run_to_memory(
        jobs.span_novelty_stream(
            stream.filter(F.col("doc_id") % 10 == 0), spans
        ),
        "spannovel_mem",
        output_mode="append",
    )
    got = {
        (r.doc_id, r.span_idx)
        for r in spark.table("spannovel_mem").collect()
    }
    expected = {
        (r.doc_id, r.span_idx)
        for r in span_occurrences(new)
        .join(spans, "h", "left_anti")
        .collect()
    }
    assert got == expected and expected
    # novel mass is a strict subset of the batch's span mass
    assert len(expected) < span_occurrences(new).count()
    spans.unpersist()


def test_curate_quality_temper_and_token_budget(spark, sf_dir, tmp_path):
    from planet_dump_ng_spark.llm_pipeline import curate
    from planet_dump_ng_spark.operators.text import token_count
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "curated_budget")
    budget = 5000
    manifest, report = curate(
        docs, out,
        quality_temper=(0.25, 0.5, 0.75, 1.0),
        token_budget=budget,
    )
    stages = dict(report.stages)
    assert "quality_tempered" in stages and "token_budget" in stages
    toks = dict(report.tokens)
    # the budget stage's token mass respects the cap, and the parallel
    # token audit recorded it
    assert toks["token_budget"] <= budget
    written = spark.read.parquet(out)
    assert written.count() == stages["token_budget"]
    got = written.agg(F.sum(token_count("text"))).first()[0]
    assert got == toks["token_budget"]
    # attrition columns stay monotone
    assert stages["token_budget"] <= stages["quality_tempered"]


def _py_span_dedup(texts, span_tokens):
    """Pure-Python reference of operators.dedup.span_dedup (same election,
    Python dict instead of Spark aggregation) — hash collisions are not
    modeled, which is fine for tiny fixtures."""
    out = {}
    first = {}
    for doc_id in sorted(texts):
        toks = [t for t in texts[doc_id].split() if t]
        spans = [
            " ".join(toks[i : i + span_tokens])
            for i in range(0, len(toks), span_tokens)
        ]
        kept_texts, removed, kept_tok = [], 0, 0
        for idx, s in enumerate(spans):
            if s in first:
                removed += 1
            else:
                first[s] = (doc_id, idx)
                kept_texts.append(s)
                kept_tok += len(s.split())
        if spans:
            out[doc_id] = (
                len(spans),
                removed,
                kept_tok,
                hashlib.md5(" ".join(kept_texts).encode()).hexdigest(),
            )
    return out


def test_span_dedup_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c", "dd", "ee"])
    doc = st.lists(word, max_size=23).map(" ".join)

    @given(st.lists(doc, min_size=1, max_size=12), st.integers(2, 5))
    @settings(max_examples=15, deadline=None)
    def check(texts, span_tokens):
        data = {i: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(
            [(i, t) for i, t in data.items()], ["doc_id", "text"]
        )
        got = {
            r.doc_id: (
                r.n_spans,
                r.n_removed_spans,
                r.n_kept_tokens,
                r.retained_md5,
            )
            for r in span_dedup(df, span_tokens=span_tokens).collect()
        }
        assert got == _py_span_dedup(data, span_tokens)

    check()


def test_curate_increment_end_to_end(spark, sf_dir, tmp_path):
    """Incremental curation: idempotent append, no cross-batch near-dups
    above threshold, split-consistency with the content-stable gate."""
    from planet_dump_ng_spark.llm_pipeline import curate, curate_increment
    from planet_dump_ng_spark.operators.dedup import (
        minhash_lsh_join,
        ngram_jaccard_pairs,
    )
    from planet_dump_ng_spark.operators.sampling import xxhash_split
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "inc_dataset")
    curate(base, out)
    before = spark.read.parquet(out)
    n_before = before.count()

    manifest, report = curate_increment(batch, out)
    stages = dict(report.stages)
    after = spark.read.parquet(out)
    n_inc = sum(r.n_rows for r in manifest.collect())
    assert after.count() == n_before + n_inc
    assert n_inc == stages["quality"] > 0
    # ids are disjoint (idempotence base case)
    assert after.select("doc_id").distinct().count() == after.count()

    # no appended doc near-dups the pre-existing dataset above threshold
    appended = after.join(before.select("doc_id"), "doc_id", "left_anti")
    cands = minhash_lsh_join(appended, before)
    both = appended.select("doc_id", "text").unionByName(
        before.select("doc_id", "text")
    )
    assert (
        ngram_jaccard_pairs(both, k=3, threshold=0.8, candidates=cands).count()
        == 0
    )

    # splits match what the content hash dictates (consistency with a
    # from-scratch run)
    expect = {
        r.doc_id: r.split
        for r in xxhash_split(
            appended.select("doc_id"), "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    got = {r.doc_id: r.split for r in appended.select("doc_id", "split").collect()}
    assert got == expect

    # re-delivering the same batch appends nothing
    manifest2, report2 = curate_increment(batch, out)
    assert sum(r.n_rows for r in manifest2.collect()) == 0
    assert spark.read.parquet(out).count() == n_before + n_inc


def test_curate_increment_cli(spark, sf_dir, tmp_path, capsys):
    from planet_dump_ng_spark import llm_pipeline
    from planet_dump_ng_spark.llm_pipeline import curate
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    base_path = str(tmp_path / "base.parquet")
    batch_path = str(tmp_path / "batch.parquet")
    docs.filter(F.col("doc_id") % 4 != 0).write.parquet(base_path)
    docs.filter(F.col("doc_id") % 4 == 0).write.parquet(batch_path)
    out = str(tmp_path / "cli_inc_dataset")
    curate(spark.read.parquet(base_path), out)
    n_before = spark.read.parquet(out).count()
    rc = llm_pipeline.main([
        "--input", batch_path, "--output", out, "--increment",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "appended=" in text and "quality" in text
    assert spark.read.parquet(out).count() > n_before


def test_dedup_artifact_tracks_dataset(spark, sf_dir, tmp_path):
    """curate() writes the _dedup probe artifact; increments extend it to
    stay row-for-row with the dataset, and a second increment uses it
    (equal results with or without the artifact)."""
    from planet_dump_ng_spark.llm_pipeline import (
        _dedup_artifact_dir,
        curate,
        curate_increment,
    )
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "art_dataset")
    curate(docs.filter(F.col("doc_id") % 3 == 0), out)
    art = _dedup_artifact_dir(out)
    fp = spark.read.parquet(f"{art}/fingerprints")
    assert fp.count() == spark.read.parquet(out).count()

    curate_increment(docs.filter(F.col("doc_id") % 3 == 1), out)
    n_after = spark.read.parquet(out).count()
    assert spark.read.parquet(f"{art}/fingerprints").count() == n_after
    # bucket table covers exactly the dataset ids
    bucket_ids = (
        spark.read.parquet(f"{art}/buckets").select("id").distinct().count()
    )
    assert bucket_ids == n_after

    # a pre-artifact dataset gets backfilled on first increment
    import shutil

    shutil.rmtree(art)
    curate_increment(docs.filter(F.col("doc_id") % 3 == 2), out)
    n_final = spark.read.parquet(out).count()
    assert spark.read.parquet(f"{art}/fingerprints").count() == n_final


def test_curate_increment_leakage_free(spark, sf_dir, tmp_path):
    """Incrementing a leakage-free dataset keeps the guarantee: no
    near-dup pair at or above split_jaccard straddles splits in the
    grown dataset (appended docs inherit their partner's split)."""
    from planet_dump_ng_spark.llm_pipeline import curate, curate_increment
    from planet_dump_ng_spark.operators.dedup import (
        minhash_lsh_join,
        ngram_jaccard_pairs,
    )
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = str(tmp_path / "lf_inc_dataset")
    curate(base, out, leakage_free=True, split_jaccard=0.3)
    # snapshot ids driver-side: a cached 'before' frame would be
    # recached-by-path after the append and silently become 'after'
    before_ids = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }

    manifest, report = curate_increment(
        batch, out, leakage_free=True, split_jaccard=0.3
    )
    stages = dict(report.stages)
    assert "split_guard" in stages
    after = spark.read.parquet(out)
    appended = after.filter(~F.col("doc_id").isin(list(before_ids))).persist()
    assert appended.count() > 0

    # invariant: no >= split_jaccard pair between an appended doc and ANY
    # dataset doc crosses splits
    cands = minhash_lsh_join(appended, after)
    pairs = ngram_jaccard_pairs(
        after.select("doc_id", "text"), k=3, threshold=0.3, candidates=cands
    )
    sp = after.select("doc_id", "split")
    crossed = (
        pairs.join(sp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
        .join(sp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    assert crossed.count() == 0
    appended.unpersist()


def test_increment_split_inheritance_fixture(spark, tmp_path):
    """Controlled fixture for the leakage-free increment mechanics:
    a batch doc near a train doc inherits 'train', a doc bridging a
    train doc and a test doc is dropped, a novel doc hash-splits."""
    from planet_dump_ng_spark.llm_pipeline import curate_increment
    from planet_dump_ng_spark.operators.dedup import minhash_lsh_join

    # token spellings chosen so the deterministic MinHash draw collides
    # for exactly the intended pairs: 10-3 (inherit), 12-1 and 12-2
    # (bridge), and NOT between the batch docs themselves (10 must not
    # join 12's component or it would share 12's correct bridge-drop)
    X = " ".join(f"x{i}" for i in range(70))
    Y = " ".join(f"w{i}" for i in range(70))
    Z = " ".join(f"g{i}" for i in range(70))
    out = str(tmp_path / "fixture_ds")
    spark.createDataFrame(
        [(1, X, "train"), (2, Y, "test"), (3, Z, "train")],
        ["doc_id", "text", "split"],
    ).write.partitionBy("split").parquet(out)

    near_z = Z + " " + " ".join(f"q{i}" for i in range(20))  # J~0.74 vs Z
    bridge = X + " " + Y  # J~0.49 vs each of X and Y
    novel = " ".join(f"z{i}" for i in range(40))
    batch = spark.createDataFrame(
        [(10, near_z), (12, bridge), (11, novel)], ["doc_id", "text"]
    )
    corpus = spark.read.parquet(out)
    hits = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_join(batch, corpus).collect()
    }
    assert (10, 3) in hits and (12, 1) in hits and (12, 2) in hits

    manifest, report = curate_increment(
        batch, out, leakage_free=True, split_jaccard=0.3,
        min_tokens=20, scrub_pii=False,
    )
    rows = {r.doc_id: r.split for r in spark.read.parquet(out).collect()}
    assert rows[10] == "train"  # inherited from partner doc 1
    assert 12 not in rows  # bridge between train and test content drops
    assert 11 in rows  # novel doc lands via the hash gate
    stages = dict(report.stages)
    assert stages["quality"] - stages["split_guard"] == 1
