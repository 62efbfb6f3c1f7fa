"""CLI flag mapping + staging/resume behavior."""

import os
import shutil

import pytest

from planet_dump_ng_spark import staging
from planet_dump_ng_spark.cli import build_parser, outputs_from_args

REF = "/root/reference/test"


def test_cli_output_flags_map_to_specs():
    args = build_parser().parse_args(
        [
            "--dump-file", "d.sql",
            "--xml", "p.osm.bz2",
            "--history-pbf", "h.osm.pbf",
            "--changesets-no-userinfo", "c.osm",
        ]
    )
    outs = {(o.kind, o.anonymize): o.path for o in outputs_from_args(args)}
    assert outs == {
        ("planet", False): "p.osm.bz2",
        ("pbf-history", False): "h.osm.pbf",
        ("changesets", True): "c.osm",
    }


def test_cli_requires_an_output():
    args = build_parser().parse_args(["--dump-file", "d.sql"])
    assert outputs_from_args(args) == []


def test_stage_roundtrip_and_resume(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "x")
    stage_dir = str(tmp_path / "stage")
    out1 = staging.stage_table(spark, df, stage_dir, "t1")
    assert sorted(r.x for r in out1.collect()) == [0, 1, 2, 3, 4]
    assert staging.is_staged(stage_dir, "t1")

    # resume: the stale frame is NOT recomputed when the marker exists
    df2 = spark.range(3).withColumnRenamed("id", "x")
    out2 = staging.stage_table(spark, df2, stage_dir, "t1", resume=True)
    assert sorted(r.x for r in out2.collect()) == [0, 1, 2, 3, 4]

    # without resume: rebuilt
    out3 = staging.stage_table(spark, df2, stage_dir, "t1", resume=False)
    assert sorted(r.x for r in out3.collect()) == [0, 1, 2]


@pytest.mark.skipif(
    shutil.which("pg_restore") is None or not os.path.isdir(REF),
    reason="needs pg_restore + reference fixtures",
)
def test_cli_end_to_end(spark, tmp_path):
    import subprocess

    from planet_dump_ng_spark.cli import main

    sql = tmp_path / "bad.sql"
    subprocess.run(
        ["pg_restore", "-f", str(sql), "-a", f"{REF}/bad-character.dmp"], check=True
    )
    out = tmp_path / "cs.osm"
    rc = main(
        [
            "--dump-file", str(sql),
            "--changesets", str(out),
            "--generator", "planet-dump-ng test X.Y.Z",
            "--work-dir", str(tmp_path / "w"),
        ]
    )
    assert rc == 0
    import bz2

    with open(f"{REF}/changesets-badchar.xml.case/changesets.osm.bz2", "rb") as fh:
        golden = bz2.decompress(fh.read())
    assert out.read_bytes() == golden

    # resume run hits the staged tables and produces identical output
    out2 = tmp_path / "cs2.osm"
    rc = main(
        [
            "--dump-file", str(sql),
            "--changesets", str(out2),
            "--generator", "planet-dump-ng test X.Y.Z",
            "--work-dir", str(tmp_path / "w"),
            "--resume",
        ]
    )
    assert rc == 0 and out2.read_bytes() == golden


def test_meta_overrides_change_header():
    from datetime import datetime

    from planet_dump_ng_spark.sinks.xml_sink import format_osm_header

    default = format_osm_header("gen", datetime(2020, 1, 2, 3, 4, 5))
    assert 'license="http://opendatacommons.org/licenses/odbl/1-0/"' in default
    assert 'origin="http://www.openstreetmap.org/api/0.6"' in default
    assert 'timestamp="2020-01-02T03:04:05Z"' in default

    over = format_osm_header(
        "gen",
        None,
        meta={
            "license": "CC0",
            "copyright": "me",
            "attribution": "none",
            "source": "http://example.org/api",
        },
    )
    assert 'license="CC0"' in over and 'copyright="me"' in over
    assert 'attribution="none"' in over
    assert 'origin="http://example.org/api"' in over
    assert 'timestamp=""' in over


def test_cli_meta_flags_parse():
    from planet_dump_ng_spark.cli import build_parser, meta_from_args

    args = build_parser().parse_args(
        ["--dump-file", "d.sql", "--xml", "p.osm",
         "--meta-copyleft", "CC0", "--meta-source", "http://example.org"]
    )
    assert meta_from_args(args) == {"license": "CC0", "source": "http://example.org"}


@pytest.mark.skipif(
    shutil.which("pg_restore") is None or not os.path.isdir(REF),
    reason="needs pg_restore + reference fixtures",
)
def test_cli_meta_file_precedence_end_to_end(spark, tmp_path):
    """CLI flags beat --meta-file entries (reference planet-dump.cpp:105-114:
    boost po::store keeps the first-stored value, and the command line is
    stored before the config file) — checked through the real CLI on a real
    dump, not just meta_from_args."""
    import subprocess

    from planet_dump_ng_spark.cli import main

    sql = tmp_path / "bad.sql"
    subprocess.run(
        ["pg_restore", "-f", str(sql), "-a", f"{REF}/bad-character.dmp"], check=True
    )
    meta_file = tmp_path / "meta.conf"
    meta_file.write_text(
        "# planet metainfo\n"
        "meta-copyleft = FILE-LICENSE\n"
        "meta-attribution = file-attribution\n"
    )
    out = tmp_path / "cs.osm"
    rc = main(
        [
            "--dump-file", str(sql),
            "--changesets", str(out),
            "--work-dir", str(tmp_path / "w"),
            "--meta-file", str(meta_file),
            "--meta-copyleft", "FLAG-LICENSE",  # conflicts with the file
        ]
    )
    assert rc == 0
    header = out.read_bytes().split(b">", 2)[1].decode()  # the <osm ...> tag
    assert 'license="FLAG-LICENSE"' in header  # flag wins the conflict
    assert 'attribution="file-attribution"' in header  # file fills the rest
