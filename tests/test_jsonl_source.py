"""JSONL connector: clean/quarantine split, round-trip, and the
no-silent-loss invariant (every input line lands on exactly one side)."""

from pyspark.sql import functions as F

from planet_dump_ng_spark.sources import (
    read_documents_jsonl,
    write_documents_jsonl,
)


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    _write_lines(
        p,
        [
            '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}',
            'this is not json at all',
            '{"doc_id": 2, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}',
            '{"text": "no id", "lang": "en", "source": "s", "n_chars": 5}',
            '{"doc_id": "NaNo", "text": "bad id type"}',
        ],
    )
    good, bad = read_documents_jsonl(spark, str(p))
    g = {r.doc_id: r for r in good.collect()}
    assert set(g) == {1, 2}
    assert g[1].text == "hello world"
    assert "_corrupt" not in good.columns
    b = bad.collect()
    # no silent loss: every line is on exactly one side
    assert len(b) == 3
    assert good.count() + len(b) == 5
    assert all(r.input_file.endswith("docs.jsonl") for r in b)
    raws = " ".join(r.raw_line for r in b)
    assert "not json" in raws and "no id" in raws


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    from planet_dump_ng_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents").limit(100)
    out = str(tmp_path / "export")
    write_documents_jsonl(docs, out)
    good, bad = read_documents_jsonl(spark, out)
    assert bad.count() == 0
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in good.collect()}
    assert a == b
