"""Round-5 additions: parallel per-table extraction parity, the exact-fold
numpy kernels' bit-identity to the sequential fold, and the scaled
(hierarchical, sample-trained) semantic-dedup path."""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference/test"
DMP = f"{REF}/liechtenstein-2013-08-03.dmp"


@pytest.mark.skipif(
    shutil.which("pg_restore") is None or not os.path.exists(DMP),
    reason="needs pg_restore + reference fixture dump",
)
def test_extract_tables_parallel_matches_split(tmp_path):
    """The concurrent per-table pg_restore fan-out must produce byte-identical
    per-table COPY files to the monolithic extract + sequential split."""
    from planet_dump_ng_spark.pipeline import ELEMENT_TABLES
    from planet_dump_ng_spark.sources import (
        extract_tables_parallel,
        split_dump_file,
    )

    sql = tmp_path / "x.sql"
    subprocess.run(["pg_restore", "-f", str(sql), "-a", DMP], check=True)
    old = split_dump_file(str(sql), str(tmp_path / "old"), list(ELEMENT_TABLES))
    new = extract_tables_parallel(
        DMP, str(tmp_path / "new"), list(ELEMENT_TABLES)
    )
    assert sorted(old) == sorted(new)
    for t in old:
        with open(old[t], "rb") as a, open(new[t], "rb") as b:
            assert a.read() == b.read(), t


def _fold_ref(vals):
    """Reference strict left-to-right fold with a +0.0 seed — the exact
    semantics of similarity._dot_exact / DuckDB list_reduce."""
    acc = 0.0
    for v in vals:
        acc = acc + v
    return acc


def test_numpy_fold_kernels_bit_identical_to_sequential_fold():
    """_dist2_fold / _fold_self_dot must reproduce the per-element
    sequential float64 fold EXACTLY (same IEEE op sequence), else the
    DuckDB oracle's last-ulp hash parity breaks."""
    from planet_dump_ng_spark.operators.ivf import _dist2_fold, _fold_self_dot

    rng = np.random.default_rng(7)
    V = rng.standard_normal((13, 64)).astype(np.float32).astype(np.float64)
    C = rng.standard_normal((5, 64)).astype(np.float64)
    D = _dist2_fold(V, C)
    N = _fold_self_dot(V)
    for i in range(V.shape[0]):
        ref_n = _fold_ref([float(x) * float(x) for x in V[i]])
        assert N[i] == ref_n  # bitwise: == on identical doubles
        for k in range(C.shape[0]):
            ref = _fold_ref(
                [
                    (float(a) - float(b)) * (float(a) - float(b))
                    for a, b in zip(V[i], C[k])
                ]
            )
            assert D[i, k] == ref


def test_derive_n_cells_scaling():
    from planet_dump_ng_spark.operators.ivf import (
        derive_n_cells,
        derive_super_cells,
    )

    assert derive_n_cells(5) == 1  # tiny corpus: one brute-force cell
    assert derive_n_cells(100) == 3  # capped at n // 32
    assert derive_n_cells(500) == 8  # gate scale stays on the floor
    assert derive_n_cells(2000) == 8
    assert derive_n_cells(20_000) == 80  # 10x stress derives, no knob
    assert derive_n_cells(2_000_000) == 8000
    assert derive_super_cells(8) == 3
    assert derive_super_cells(80) == 9


def test_semantic_dedup_auto_path_keeps_lowest_id(spark):
    """The scaled path (derived cells, sampled training, hierarchical
    assignment) must still elect the lowest id of each near-dup group."""
    from planet_dump_ng_spark.operators.ivf import semantic_dedup

    base = [float(i % 7) for i in range(8)]
    rows = [
        (1, [x + 0.001 for x in base]),
        (4, [x + 0.002 for x in base]),  # near-dup of 1
        (9, [x + 0.003 for x in base]),  # near-dup of 1 and 4
        (2, [float((i * 3) % 5) - 2.0 for i in range(8)]),  # far away
        (3, [0.0] * 8),  # zero vector: never pairs, stays kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(df, dim=8, threshold=0.95).collect()
    }
    assert out[1] is True
    assert out[4] is False and out[9] is False
    assert out[2] is True and out[3] is True


def test_ivfpq_codes_scan_dynamic_partition_pruning(spark, tmp_path):
    """The persisted codes table is partitioned by coarse cell, and the
    ADC query's first join (broadcast LUT keyed by probed cells) must
    plan a dynamic-partition-pruning subquery on that scan — the IVF
    'scan n_probe/n_cells of the index' promise at the storage layer."""
    from pyspark.sql import functions as F

    from planet_dump_ng_spark.operators.ivf import (
        ivfpq_build,
        ivfpq_query,
        read_ivfpq_index,
        write_ivfpq_index,
    )
    from planet_dump_ng_spark.plans.registry import table

    emb = table(spark, "/root/testdata/sf0.01", "embeddings")
    coarse, books, codes = ivfpq_build(emb, dim=64)
    idx = str(tmp_path / "idx")
    write_ivfpq_index(coarse, books, codes, idx)
    codes.unpersist()
    c2, b2, k2 = read_ivfpq_index(spark, idx)
    q = emb.filter(F.col("vec_id") % 100 == 0)
    plan = (
        ivfpq_query(c2, b2, k2, q, dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower()


def test_vectorized_leb128_bit_identical_to_scalar():
    """The numpy LEB128/zigzag/delta fast paths must be byte-identical to
    the scalar encoders on adversarial inputs (sign boundaries, 64-bit
    extremes) — the PBF sink's output bytes depend on it."""
    import random

    from planet_dump_ng_spark.functions import protowire as pw

    rng = random.Random(7)
    extremes = [0, -1, 1, 127, 128, -128, 2**63 - 1, -(2**63), 2**31, -(2**31)]
    for _ in range(50):
        n = rng.choice([64, 65, 100, 1000])
        vals = [
            rng.choice(extremes + [rng.randint(-(2**62), 2**62)])
            for _ in range(n)
        ]
        assert pw._varints_np(vals) == b"".join(pw.varint(v) for v in vals)
        assert pw._varints_np(pw._zigzag_np(vals)) == b"".join(
            pw.varint(pw.zigzag(v)) for v in vals
        )
        # delta contract: pairwise differences must fit in int64 (the
        # wire sint64) — test within that envelope
        dvals = [rng.randint(-(2**31), 2**31) for _ in range(n)]
        d = pw.delta_encode(dvals)
        prev, ref = 0, []
        for v in dvals:
            ref.append(v - prev)
            prev = v
        assert d == ref


def test_arrow_dense_encoder_bytes_equal_row_encoder(spark, tmp_path, monkeypatch):
    """The columnar mapInArrow dense-nodes encoder must produce
    byte-identical part files to the row-at-a-time encoder on the same
    arranged stream — across block boundaries, invisible rows, null
    uids, tag string-table ordering, and both anonymize settings."""
    import datetime as dt

    from planet_dump_ng_spark.sinks import pbf_sink

    monkeypatch.setitem(pbf_sink.BLOCK_LIMITS, "nodes", 16)
    rows = []
    for i in range(1, 51):
        visible = i % 7 != 0
        rows.append(
            (
                i,
                1 + (i % 3),
                100 + i,
                visible,
                dt.datetime(2013, 8, 3, 12, 0, i % 60),
                None,
                int(47e7 + i) if visible else 0,
                int(9e7 + i),
                (
                    [{"k": "name", "v": f"n{i % 5}"}, {"k": "amenity", "v": "x"}]
                    if visible and i % 3 == 0
                    else []
                ),
                (i % 11) if i % 5 != 0 else None,  # some null uids
                f"user{i % 4}" if i % 5 != 0 else None,
            )
        )
    df = spark.createDataFrame(
        rows,
        "id long, version long, changeset_id long, visible boolean, "
        "timestamp timestamp, redaction_id long, latitude int, "
        "longitude int, tags array<struct<k:string,v:string>>, "
        "uid int, user string",
    ).repartitionByRange(2, "id", "version").sortWithinPartitions("id", "version")

    import os

    for history in (False, True):
        for anonymize in (False, True):
            d_row = str(tmp_path / f"row-{history}-{anonymize}")
            d_arrow = str(tmp_path / f"arrow-{history}-{anonymize}")
            os.makedirs(d_row), os.makedirs(d_arrow)
            row_paths = sorted(
                df.rdd.mapPartitionsWithIndex(
                    pbf_sink._partition_encoder(
                        "nodes", history, anonymize, d_row
                    )
                ).collect()
            )
            arrow_paths = sorted(
                r["path"]
                for r in df.mapInArrow(
                    pbf_sink._dense_arrow_encoder(history, anonymize, d_arrow),
                    schema="path string",
                ).collect()
            )
            assert [os.path.basename(p) for p in row_paths] == [
                os.path.basename(p) for p in arrow_paths
            ]
            for rp, ap in zip(row_paths, arrow_paths):
                with open(rp, "rb") as a, open(ap, "rb") as b:
                    assert a.read() == b.read(), (history, anonymize, rp)
