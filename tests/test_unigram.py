"""Unigram-LM tokenizer artifact pins (operators/unigram.py): Viterbi
determinism properties, artifact round-trip, frozen-model serving, and
the coverage/unknown-char fallbacks the oracle can't see."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import unigram as ug


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_viterbi_pieces_concatenate_and_are_deterministic():
    vocab = {"a": 3, "b": 3, "ab": 4, "ba": 4, "abab": 9, "c": 3}
    for w in ("ababab", "abc", "cab", "aaaa", "abba"):
        pieces = ug._viterbi(w, vocab, 4)
        assert "".join(pieces) == w
        assert pieces == ug._viterbi(w, vocab, 4)  # stable
    # cost dominates: "abab" (9) loses to "ab"+"ab" (8)
    assert ug._viterbi("abab", vocab, 4) == ["ab", "ab"]
    # tie on bits -> fewer pieces wins: make "abab"=8 == ab+ab
    vocab2 = {**vocab, "abab": 8}
    assert ug._viterbi("abab", vocab2, 4) == ["abab"]


def test_viterbi_unknown_char_fallback():
    vocab = {"a": 2}
    assert ug._viterbi("aza", vocab, 4) == ["a", "z", "a"]


def test_unigram_vocab_properties(spark, docs):
    out = ug.unigram_vocab(docs).collect()
    assert len(out) > 0
    by_piece = {r["piece"]: r for r in out}
    # every single training char survives (coverage guarantee)
    words = [r["w"] for r in ug.word_freqs(docs).collect()]
    for ch in {c for w in words for c in w}:
        assert ch in by_piece, f"char {ch!r} pruned"
    # multi-char pieces only survive with usage
    for r in out:
        if len(r["piece"]) > 1:
            assert r["used_count"] > 0
    # used mass equals the total segmented piece mass: every word's
    # pieces concatenate to it, so sum(used * len(piece)) == total chars
    char_mass = sum(
        r["f"] * len(r["w"]) for r in ug.word_freqs(docs).collect()
    )
    assert (
        sum(r["used_count"] * len(r["piece"]) for r in out) == char_mass
    )


def test_artifact_roundtrip_and_serving(spark, docs, tmp_path):
    d = str(tmp_path / "ug")
    meta = ug.write_unigram_tokenizer(docs, d)
    assert meta["format"] == "unigram-tokenizer-v1"
    vocab, rmeta = ug.read_unigram_tokenizer(spark, d)
    assert rmeta["n_vocab"] == vocab.count() == meta["n_vocab"]
    # persisted table is bit-identical to inline training (exact ints)
    inline = {
        r["piece"]: (r["used_count"], r["em_bits"])
        for r in ug.unigram_vocab(docs).collect()
    }
    stored = {
        r["piece"]: (r["used_count"], r["em_bits"])
        for r in vocab.collect()
    }
    assert inline == stored
    # frozen-model encode: deterministic across two servings, and the
    # per-doc piece counts are plausible (>= word count: a word is >= 1
    # piece)
    s1 = {r["doc_id"]: r for r in ug.unigram_encode_stats(docs, d).collect()}
    s2 = {r["doc_id"]: r for r in ug.unigram_encode_stats(docs, d).collect()}
    assert {k: (v["n_words"], v["n_pieces"]) for k, v in s1.items()} == {
        k: (v["n_words"], v["n_pieces"]) for k, v in s2.items()
    }
    assert all(v["n_pieces"] >= v["n_words"] for v in s1.values())
    # foreign header refuses
    m = json.load(open(f"{d}/meta.json"))
    m["pretokenizer"] = "char-v9"
    json.dump(m, open(f"{d}/meta.json", "w"))
    with pytest.raises(ValueError, match="pre-tokenizer"):
        ug.read_unigram_tokenizer(spark, d)


def test_half_written_artifact_reads_as_no_artifact(spark, docs, tmp_path):
    d = str(tmp_path / "ug")
    ug.write_unigram_tokenizer(docs, d)
    os.remove(f"{d}/meta.json")  # the crash window: header absent
    with pytest.raises(ValueError, match="meta.json"):
        ug.read_unigram_tokenizer(spark, d)
