"""Dataset-card generation: the release-documentation artifact that
accompanies a curated training dataset (the standard practice popularized
by 'Datasheets for Datasets', Gebru et al.).

    python -m planet_dump_ng_spark.dataset_card \\
        --dataset ./curated --out CARD.md

Reads a materialized split-partitioned dataset (llm_pipeline.curate
output) and writes a markdown card: per-split/source/language
composition, token volume, length distribution, duplicate mass, PII hit
counts, and quality-gate pass rates — every number computed by the
engine's own (oracle-verified) operator expressions in a handful of
one-pass aggregations over the dataset.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, functions as F


def card_stats(docs: DataFrame) -> dict:
    """All card numbers in three aggregation passes over the dataset."""
    from planet_dump_ng_spark.operators import text as tx

    n_tok = tx.token_count("text")
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    pii = tx.pii_hits("text")
    scored = tx.linear_quality_score(docs)

    overall = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        F.min(n_tok).alias("min_tokens"),
        F.expr(
            "percentile_approx("
            "size(filter(split(text, '\\\\s+'), t -> t != '')), "
            "array(0.5, 0.9), 10000)"
        ).alias("tok_pcts"),
        F.max(n_tok).alias("max_tokens"),
        *[F.sum(c).cast("bigint").alias(k) for k, c in pii.items()],
    ).collect()[0]
    keep_rate = scored.agg(
        F.avg(F.col("keep").cast("double")).alias("keep_rate")
    ).collect()[0]["keep_rate"]
    bpe_tok = tx.bpe_ish_token_count("text")
    by = {}
    for dim in ("split", "source", "lang"):
        if dim not in docs.columns:
            continue
        aggs = [
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).cast("bigint").alias("tokens"),
        ]
        if dim == "lang":
            # tokenizer fertility (subwords per word): the per-language
            # compute-cost multiplier — the tokenizer_fertility_by_lang
            # diagnostic folded into the release docs
            ws = F.sum(n_tok).cast("bigint")
            bpe = F.sum(bpe_tok).cast("bigint")
            aggs += [
                bpe.alias("bpe_tokens"),
                F.when(ws > 0, bpe.cast("double") / ws).alias("fertility"),
            ]
        by[dim] = [
            r.asDict()
            for r in docs.groupBy(dim).agg(*aggs).orderBy(dim).collect()
        ]
    return {"overall": overall.asDict(), "keep_rate": keep_rate, "by": by}


def dsir_stats(docs: DataFrame, dataset_path: str) -> dict | None:
    """DSIR governance numbers when the dataset carries a frozen model
    artifact (`<dataset>_dsir`, written by llm_pipeline.curate's domain
    gate): every doc scored under the FROZEN model (the exact scores
    increments are gated by — not a retrain), pooled per source as
    total Q20 mass over total features (the exact-integer shape of the
    oracle-verified dsir_mean_weight_by_source query).  A source whose
    pooled mean sits below the recorded gate threshold is anti-target
    on average — the number a curation owner reads when setting
    mix_weights.  Returns None when no model artifact is present."""
    import json
    import os

    from planet_dump_ng_spark.llm_pipeline import (
        _dedup_artifact_dir,
        _dsir_model_dir,
    )
    from planet_dump_ng_spark.operators import dsir as ds

    model_dir = _dsir_model_dir(dataset_path)
    if not os.path.exists(os.path.join(model_dir, "meta.json")):
        return None
    w = ds.dsir_score_with_model(docs, model_dir)
    dim = "source" if "source" in docs.columns else None
    keys = [dim] if dim else []
    grouped = (
        w.join(docs.select("doc_id", *keys), "doc_id")
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_feats").cast("bigint").alias("total_feats"),
            F.sum("logw_q20").cast("bigint").alias("total_logw_q20"),
        )
        .orderBy(*keys)
    )
    rows = []
    for r in grouped.collect():
        d = r.asDict()
        d["pooled_mean_bits"] = (
            d["total_logw_q20"] / d["total_feats"] / 1048576.0
            if d["total_feats"]
            else None
        )
        rows.append(d)
    out: dict = {"rows": rows, "dim": dim, "model_dir": model_dir}
    meta_path = os.path.join(_dedup_artifact_dir(dataset_path), "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        out["min_bits"] = meta.get("dsir_min_bits")
        out["target_desc"] = meta.get("dsir_target_desc")
    with open(os.path.join(model_dir, "meta.json")) as fh:
        out["model_meta"] = json.load(fh)
    return out


def render_card(stats: dict, dataset_path: str) -> str:
    o = stats["overall"]
    dup = o["n_docs"] - o["n_unique"]
    p50, p90 = (stats["overall"]["tok_pcts"] or [None, None])[:2]
    lines = [
        f"# Dataset card — `{dataset_path}`",
        "",
        "Generated by `planet_dump_ng_spark.dataset_card` (all numbers from "
        "the engine's oracle-verified operator expressions).",
        "",
        "## Overview",
        "",
        f"- documents: **{o['n_docs']:,}** ({dup:,} exact-duplicate bodies"
        f" beyond the {o['n_unique']:,} unique)",
        f"- tokens (whitespace): **{o['total_tokens']:,}**",
        f"- tokens per doc: min {o['min_tokens']}, p50 {p50}, p90 {p90},"
        f" max {o['max_tokens']}",
        f"- linear quality gate pass rate: {stats['keep_rate']:.1%}",
        f"- PII pattern hits: email {o['n_email']:,}, ipv4 {o['n_ipv4']:,},"
        f" long-number {o['n_longnum']:,}, phone {o['n_phone']:,}",
        "",
    ]
    titles = {"split": "Splits", "source": "Sources", "lang": "Languages"}
    for dim, rows in stats["by"].items():
        if dim == "lang":
            lines += [
                f"## {titles[dim]}",
                "",
                "| lang | docs | tokens | BPE-ish tokens | fertility |",
                "|---|---|---|---|---|",
            ]
            lines += [
                f"| {r[dim]} | {r['n_docs']:,} | {r['tokens']:,} |"
                f" {r['bpe_tokens']:,} |"
                f" {r['fertility']:.3f} |"
                if r["fertility"] is not None
                else f"| {r[dim]} | {r['n_docs']:,} | {r['tokens']:,} |"
                f" {r['bpe_tokens']:,} | — |"
                for r in rows
            ]
        else:
            lines += [
                f"## {titles[dim]}",
                "",
                f"| {dim} | docs | tokens |",
                "|---|---|---|",
            ]
            lines += [
                f"| {r[dim]} | {r['n_docs']:,} | {r['tokens']:,} |"
                for r in rows
            ]
        lines.append("")
    dsir = stats.get("dsir")
    if dsir:
        lines += ["## DSIR domain match", ""]
        mm = dsir.get("model_meta", {})
        tgt = dsir.get("target_desc") or mm.get("target_desc") or "?"
        lines.append(
            f"Scored under the dataset's frozen DSIR model "
            f"(`{dsir['model_dir']}`, target `{tgt}`, "
            f"{mm.get('n_buckets', '?')} buckets)."
        )
        if dsir.get("min_bits") is not None:
            lines.append(
                f"Recorded gate: mean per-feature weight >= "
                f"{dsir['min_bits']} bits (increments inherit it)."
            )
        dim = dsir["dim"]
        if dim:
            lines += [
                "",
                f"| {dim} | docs | pooled mean bits |",
                "|---|---|---|",
            ]
            for r in dsir["rows"]:
                pm = r["pooled_mean_bits"]
                lines.append(
                    f"| {r[dim]} | {r['n_docs']:,} |"
                    f" {pm:+.4f} |" if pm is not None
                    else f"| {r[dim]} | {r['n_docs']:,} | — |"
                )
            lines.append(
                "\nA source pooled below the gate threshold is "
                "anti-target on average — downweight it in "
                "`curate(mix_weights=...)` before per-doc gating."
            )
        elif dsir["rows"]:
            r = dsir["rows"][0]
            pm = r["pooled_mean_bits"]
            lines.append(
                f"Corpus pooled mean: "
                f"{pm:+.4f} bits over {r['n_docs']:,} docs."
                if pm is not None
                else f"Corpus pooled mean: — ({r['n_docs']:,} docs)."
            )
        lines.append("")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    from planet_dump_ng_spark.session import get_spark

    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-card")
    p.add_argument("--dataset", required=True, help="materialized dataset dir")
    p.add_argument("--out", required=True, help="markdown output path")
    args = p.parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-card")
    docs = spark.read.parquet(args.dataset)
    stats = card_stats(docs)
    stats["dsir"] = dsir_stats(docs, args.dataset)
    card = render_card(stats, args.dataset)
    with open(args.out, "w", encoding="utf-8") as fh:
        fh.write(card)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
