"""ANN index lifecycle CLI — build, incrementally extend, and query the
persisted IVFPQ artifact (operators.ivf):

    python -m planet_dump_ng_spark.ann_cli build \\
        --embeddings emb.parquet --index-dir ./idx
    python -m planet_dump_ng_spark.ann_cli add \\
        --embeddings new_batch.parquet --index-dir ./idx
    python -m planet_dump_ng_spark.ann_cli query \\
        --index-dir ./idx --queries q.parquet --k 5 --out topk.parquet

The index is three parquet tables (coarse centroids, stacked residual
codebooks, code table) — build once, serve many; ``add`` encodes new
vectors against the FROZEN quantizers (per-batch cost, no retrain) and
appends their code rows.  ``query`` reads only the artifact: n_sub
bytes per corpus vector ever touch the scan.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="planet-dump-ng-spark-ann")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, with_n_sub: bool = False):
        sp.add_argument("--index-dir", required=True)
        sp.add_argument("--id-col", default="vec_id")
        sp.add_argument("--vec-col", default="embedding")
        # add/query derive n_sub from the artifact's meta.json header;
        # the flag only exists for build (and as a pre-header fallback)
        sp.add_argument(
            "--n-sub", type=int, default=4 if with_n_sub else None
        )

    b = sub.add_parser("build", help="train the index from a corpus")
    b.add_argument("--embeddings", required=True)
    common(b, with_n_sub=True)
    # default None => derived from the corpus row count
    # (operators.ivf.derive_n_cells), so the coarse cell count scales
    # with the corpus instead of being a hand-tuned knob
    b.add_argument("--n-cells", type=int, default=None)
    b.add_argument("--coarse-rounds", type=int, default=2)
    b.add_argument("--pq-cells", type=int, default=8)
    b.add_argument("--pq-rounds", type=int, default=2)
    b.add_argument(
        "--store-vectors",
        action="store_true",
        help="also persist the raw vectors cell-partitioned beside the "
        "codes (FAISS IndexRefineFlat shape) so `query --rerank` can "
        "exact-re-score its shortlist; adds keep the table in sync",
    )

    a = sub.add_parser("add", help="encode a new batch against the frozen index")
    a.add_argument("--embeddings", required=True)
    common(a)

    c = sub.add_parser(
        "compact",
        help="rewrite the codes table at full width (merge the small "
        "files left by incremental adds; content and query results "
        "unchanged)",
    )
    c.add_argument("--index-dir", required=True)

    q = sub.add_parser("query", help="top-k from the persisted index")
    common(q)
    q.add_argument("--queries", required=True, help="parquet of query vectors")
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--n-probe", type=int, default=2)
    q.add_argument(
        "--rerank",
        type=int,
        metavar="K_CAND",
        help="exact-re-rank an ADC shortlist of this width (needs an "
        "index built with --store-vectors); output scores become "
        "exact cosine instead of approximate ADC distance",
    )
    q.add_argument("--out", required=True, help="output parquet path")
    return p


def _dim_of(df, vec_col: str) -> int:
    head = df.select(vec_col).first()
    assert head is not None, "empty embeddings input"
    return len(head[0])


def main(argv: list[str] | None = None) -> int:
    from planet_dump_ng_spark.operators.ivf import (
        ivfpq_add_to_dir,
        ivfpq_build,
        ivfpq_compact,
        ivfpq_query,
        read_ivfpq_index,
        write_ivfpq_index,
    )
    from planet_dump_ng_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("planet-dump-ng-spark-ann")

    if args.cmd == "build":
        from planet_dump_ng_spark.operators.ivf import derive_n_cells

        emb = spark.read.parquet(args.embeddings)
        dim = _dim_of(emb, args.vec_col)
        n_cells = (
            args.n_cells
            if args.n_cells is not None
            else derive_n_cells(emb.count())
        )
        coarse, books, codes = ivfpq_build(
            emb, dim, n_cells=n_cells, coarse_rounds=args.coarse_rounds,
            n_sub=args.n_sub, pq_cells=args.pq_cells,
            pq_rounds=args.pq_rounds, id_col=args.id_col,
            vec_col=args.vec_col,
        )
        write_ivfpq_index(
            coarse, books, codes, args.index_dir,
            vectors=emb.select(
                F.col(args.id_col).alias("vec_id"),
                F.col(args.vec_col).alias("embedding"),
            ) if args.store_vectors else None,
        )
        n = codes.count()
        codes.unpersist()
        print(json.dumps({"built": args.index_dir, "n_vectors": n,
                          "dim": dim, "n_sub": args.n_sub,
                          "n_cells": n_cells,
                          "store_vectors": bool(args.store_vectors)}))
        return 0

    if args.cmd == "add":
        from planet_dump_ng_spark.operators.ivf import read_ivfpq_meta

        emb = spark.read.parquet(args.embeddings)
        dim = _dim_of(emb, args.vec_col)
        meta = read_ivfpq_meta(args.index_dir)
        if meta is not None and dim != meta["dim"]:
            print(
                f"batch dim {dim} != index dim {meta['dim']}",
                file=sys.stderr,
            )
            return 2
        # the shared ingest kernel (idempotent anti-join on vec_id,
        # frozen-quantizer encode, cell-partitioned append) — the same
        # code path the streaming tail runs
        n_batch = emb.count()
        n_added = ivfpq_add_to_dir(
            spark, args.index_dir, emb,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        print(json.dumps({
            "added": n_added,
            "skipped_existing": n_batch - n_added,
            "index": args.index_dir,
        }))
        return 0

    if args.cmd == "compact":
        stats = ivfpq_compact(spark, args.index_dir)
        print(json.dumps({"compacted": args.index_dir, **stats}))
        return 0

    # query
    queries = spark.read.parquet(args.queries)
    dim = _dim_of(queries, args.vec_col)
    coarse, books, codes = read_ivfpq_index(
        spark, args.index_dir, n_sub=args.n_sub
    )
    if args.rerank:
        from planet_dump_ng_spark.operators.ivf import (
            ivfpq_query_rerank,
            read_ivfpq_vectors,
        )

        try:
            vectors = read_ivfpq_vectors(spark, args.index_dir)
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 2
        out = ivfpq_query_rerank(
            coarse, books, codes, vectors, queries, dim, k=args.k,
            k_cand=args.rerank, n_sub=len(books), n_probe=args.n_probe,
            id_col=args.id_col, vec_col=args.vec_col,
        )
    else:
        out = ivfpq_query(
            coarse, books, codes, queries, dim, k=args.k, n_sub=len(books),
            n_probe=args.n_probe, id_col=args.id_col, vec_col=args.vec_col,
        )
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({
        "queried": queries.count(), "k": args.k,
        "result_rows": spark.read.parquet(args.out).count(),
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
