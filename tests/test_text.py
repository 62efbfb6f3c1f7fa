"""Text-analysis operator semantics."""

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog", "en"),
        (2, "der Hund und die Katze ist nicht da", "de"),
        (3, "el perro y la casa es un lugar", "es"),
        (4, "", "en"),
        (5, "   ", "en"),
        (6, "one-token", "en"),
        (7, "Hello, world! 42 times...", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_count(docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", tx.token_count("text").alias("n")).collect()}
    # doc 7 "Hello, world! 42 times..." -> Hello, world! 42 times... = 4
    assert got == {1: 5, 2: 8, 3: 8, 4: 0, 5: 0, 6: 1, 7: 4}


def test_bpe_ish_token_count(docs):
    got = {
        r.doc_id: r.n
        for r in docs.select("doc_id", tx.bpe_ish_token_count("text").alias("n")).collect()
    }
    # "Hello, world! 42 times..." -> Hello , world ! 42 times . . . = 9
    assert got[7] == 9
    assert got[4] == 0


def test_language_id(spark, docs):
    got = {r.doc_id: r.lang_pred for r in tx.language_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "es"
    # empty text: zero hits everywhere -> deterministic lexicographic first
    assert got[4] == "de"


def test_quality_features_ranges(docs):
    rows = tx.quality_features(docs).collect()
    for r in rows:
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0


def test_rule_quality_features_matches_composition(spark):
    """The fused extractor is bit-identical (names, order, values) to
    repetition_features(quality_features(df)) — the curation rule gate
    swapped to it for one tokenizer pass per row, so any divergence here
    is a curation-semantics change, not a speedup."""
    rows = [
        (1, "the the the the the the the the the the the the"),  # repetitive
        (2, "a genuinely varied sentence with many distinct tokens here"),
        (3, ""),
        (4, "x"),
        (5, "one two one two one two one two one two one two"),  # bigram dups
        (6, "Hello, world! 42 times... with punct&digits 987"),
        (7, "short text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fused = tx.rule_quality_features(df)
    composed = tx.repetition_features(tx.quality_features(df))
    assert fused.columns == composed.columns
    a = {r.doc_id: r.asDict() for r in fused.collect()}
    b = {r.doc_id: r.asDict() for r in composed.collect()}
    assert a == b


def test_linear_quality_score_bound_columns(spark):
    """The let-bound rewrite keeps the exact output column set and order
    (oracled queries hash the schema too)."""
    df = spark.createDataFrame([(1, "the quick brown fox")], "doc_id long, text string")
    out = tx.linear_quality_score(df)
    assert out.columns == [
        "doc_id", "text", "stop_ratio", "punct_ratio", "digit_ratio",
        "len_feat", "quality_margin", "keep",
    ]


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "id long, text string",
    )
    fps = [r.fp for r in df.select(tx.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]
