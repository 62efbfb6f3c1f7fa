"""IndexRefineFlat-shaped IVFPQ artifact: stored flat vectors beside the
codes, exact re-rank at serve time, adds and compaction keeping the
vector table in sync."""

import json

import pyspark.sql.functions as F
import pytest

from planet_dump_ng_spark.operators.ivf import (
    ivfpq_add_to_dir,
    ivfpq_build,
    ivfpq_compact,
    ivfpq_query,
    ivfpq_query_rerank,
    read_ivfpq_index,
    read_ivfpq_meta,
    read_ivfpq_vectors,
    write_ivfpq_index,
)
from planet_dump_ng_spark.operators.similarity import rerank_exact


@pytest.fixture(scope="module")
def refine_idx(spark, sf_dir, tmp_path_factory):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path_factory.mktemp("idx") / "refine_idx")
    coarse, books, codes = ivfpq_build(emb, dim=64)
    write_ivfpq_index(coarse, books, codes, d, vectors=emb)
    return d, emb


def test_refine_artifact_layout(spark, refine_idx):
    d, emb = refine_idx
    meta = read_ivfpq_meta(d)
    assert meta["has_vectors"] is True
    vec = read_ivfpq_vectors(spark, d)
    assert vec.count() == emb.count()
    assert set(vec.columns) >= {"cell", "vec_id", "embedding"}


def test_served_rerank_equals_inmemory_composition(spark, refine_idx):
    d, emb = refine_idx
    queries = emb.filter(F.col("vec_id") % 37 == 0).limit(6)
    coarse, books, codes = read_ivfpq_index(spark, d)
    served = ivfpq_query_rerank(
        coarse, books, codes, read_ivfpq_vectors(spark, d), queries,
        dim=64, k=5, k_cand=25,
    )
    # the same shortlist re-ranked through the generic in-memory stage
    short = ivfpq_query(coarse, books, codes, queries, dim=64, k=25)
    ref = rerank_exact(short, emb, queries, k=5)
    a = {(r.query_id, r.neighbor_id, r.rank) for r in served.collect()}
    b = {(r.query_id, r.neighbor_id, r.rank) for r in ref.collect()}
    assert a == b and len(a) > 0


def test_rerank_requires_stored_vectors(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path / "codes_only_idx")
    coarse, books, codes = ivfpq_build(emb, dim=64)
    write_ivfpq_index(coarse, books, codes, d)  # no vectors
    assert read_ivfpq_meta(d)["has_vectors"] is False
    with pytest.raises(ValueError, match="no flat vectors"):
        read_ivfpq_vectors(spark, d)


def test_add_keeps_vectors_in_sync(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "grow_idx")
    coarse, books, codes = ivfpq_build(base, dim=64)
    write_ivfpq_index(coarse, books, codes, d, vectors=base)
    n = ivfpq_add_to_dir(spark, d, batch)
    assert n == batch.count()
    # vectors table mirrors the codes table exactly, and a redelivered
    # batch appends nothing to either
    codes_now = spark.read.parquet(f"{d}/codes")
    vecs_now = read_ivfpq_vectors(spark, d)
    assert vecs_now.count() == codes_now.count() == emb.count()
    assert ivfpq_add_to_dir(spark, d, batch) == 0
    assert read_ivfpq_vectors(spark, d).count() == emb.count()
    # rerank now sees the added vectors
    queries = batch.limit(3)
    coarse, books, codes = read_ivfpq_index(spark, d)
    out = ivfpq_query_rerank(
        coarse, books, codes, read_ivfpq_vectors(spark, d), queries,
        dim=64, k=5, k_cand=25,
    )
    assert out.count() > 0


def test_compact_covers_vectors(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = str(tmp_path / "compact_refine_idx")
    coarse, books, codes = ivfpq_build(emb.filter(F.col("vec_id") % 3 == 0), dim=64)
    write_ivfpq_index(
        coarse, books, codes, d, vectors=emb.filter(F.col("vec_id") % 3 == 0)
    )
    for m in (1, 2):
        ivfpq_add_to_dir(spark, d, emb.filter(F.col("vec_id") % 3 == m))
    queries = emb.filter(F.col("vec_id") % 41 == 0).limit(5)

    def _topk():
        c, b, k = read_ivfpq_index(spark, d)
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivfpq_query_rerank(
                c, b, k, read_ivfpq_vectors(spark, d), queries,
                dim=64, k=5, k_cand=25,
            ).collect()
        }

    before = _topk()
    stats = ivfpq_compact(spark, d)
    assert stats["files_after"] < stats["files_before"]
    assert _topk() == before and len(before) > 0


def test_cli_rerank_roundtrip(spark, sf_dir, tmp_path, capsys):
    from planet_dump_ng_spark import ann_cli

    emb_path = f"{sf_dir}/embeddings.parquet"
    d = str(tmp_path / "cli_refine_idx")
    q_path = str(tmp_path / "queries.parquet")
    out_path = str(tmp_path / "rerank_out.parquet")
    spark.read.parquet(emb_path).filter(
        F.col("vec_id") % 29 == 0
    ).limit(4).write.parquet(q_path)
    assert ann_cli.main([
        "build", "--embeddings", emb_path, "--index-dir", d,
        "--store-vectors",
    ]) == 0
    assert json.loads(capsys.readouterr().out)["store_vectors"] is True
    assert ann_cli.main([
        "query", "--index-dir", d, "--queries", q_path,
        "--rerank", "25", "--out", out_path,
    ]) == 0
    served = spark.read.parquet(out_path)
    assert set(served.columns) == {"query_id", "neighbor_id", "rank", "cosine"}
    # CLI equals library on the same artifact
    queries = spark.read.parquet(q_path)
    coarse, books, codes = read_ivfpq_index(spark, d)
    lib = ivfpq_query_rerank(
        coarse, books, codes, read_ivfpq_vectors(spark, d), queries,
        dim=64, k=5, k_cand=25,
    )
    assert {tuple(r) for r in served.collect()} == {
        tuple(r) for r in lib.collect()
    }


def test_cli_rerank_without_vectors_errors(spark, sf_dir, tmp_path, capsys):
    from planet_dump_ng_spark import ann_cli

    emb_path = f"{sf_dir}/embeddings.parquet"
    d = str(tmp_path / "cli_novec_idx")
    q_path = str(tmp_path / "q2.parquet")
    spark.read.parquet(emb_path).limit(2).write.parquet(q_path)
    assert ann_cli.main(
        ["build", "--embeddings", emb_path, "--index-dir", d]
    ) == 0
    rc = ann_cli.main([
        "query", "--index-dir", d, "--queries", q_path,
        "--rerank", "25", "--out", str(tmp_path / "nope.parquet"),
    ])
    assert rc == 2
    assert "no flat vectors" in capsys.readouterr().err
