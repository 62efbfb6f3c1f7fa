"""End-to-end curation pipeline: stage attrition, survivor correctness,
and materialized output integrity on the real sf documents table."""

from pyspark.sql import functions as F

from planet_dump_ng_spark.llm_pipeline import curate
from planet_dump_ng_spark.operators import dedup as dd
from planet_dump_ng_spark.plans.registry import table


def test_curate_end_to_end(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    out = str(tmp_path / "curated")

    manifest, report = curate(docs, out, bench=bench)
    stages = dict(report.stages)

    # attrition is monotone and every stage ran
    order = ["raw", "exact_dedup", "near_dedup", "decontaminated", "quality"]
    counts = [stages[s] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] == docs.count()
    # exact dedup must have removed the known duplicate mass
    assert stages["exact_dedup"] == dd.dedup_keep_first(docs).count()

    # the materialized dataset holds exactly the quality survivors
    written = spark.read.parquet(out)
    assert written.count() == stages["quality"]
    assert written.select("doc_id").distinct().count() == stages["quality"]
    # manifest agrees with what landed on disk
    m = {r.split: r.n_rows for r in manifest.collect()}
    on_disk = {
        r.split: r.n for r in written.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert m == on_disk

    # no surviving doc contains >=50% of any benchmark item's shingles
    survivors = written.select("doc_id", "text")
    dirty = dd.containment_pairs(survivors, bench, k=3, threshold=0.5).count()
    assert dirty == 0
