"""Golden-file parity: byte-identical XML output vs the reference's own
test suite (test/test-case-runner.sh semantics: decompress + cmp).

Covers every XML case in the reference's Makefile.am TESTS list:
planet / planet-no-userinfo / history / history-no-userinfo / changesets /
changesets-no-userinfo / discussions / discussions-no-userinfo on the
Liechtenstein fixture, plus the bad-character, empty, and
long-changeset-comment edge dumps.
"""

import bz2
import os
import shutil
import subprocess

import pytest

from planet_dump_ng_spark import pipeline

REF = "/root/reference/test"

pytestmark = pytest.mark.skipif(
    shutil.which("pg_restore") is None or not os.path.isdir(REF),
    reason="needs pg_restore + reference test fixtures",
)


def _golden(case: str, name: str) -> bytes:
    with open(f"{REF}/{case}/{name}", "rb") as fh:
        return bz2.decompress(fh.read())


@pytest.fixture(scope="module")
def work(tmp_path_factory):
    return tmp_path_factory.mktemp("golden")


def _extract(work, dump: str) -> str:
    sql = work / f"{dump}.sql"
    if not sql.exists():
        subprocess.run(
            ["pg_restore", "-f", str(sql), "-a", f"{REF}/{dump}.dmp"], check=True
        )
    return str(sql)


GENERATOR = "planet-dump-ng test X.Y.Z"


def test_liechtenstein_all_variants(spark, work):
    sql = _extract(work, "liechtenstein-2013-08-03")
    outs = [
        ("planet.osm", "planet", False, "planet.xml.case/planet.osm.bz2"),
        ("planet-nui.osm", "planet", True, "planet.xml.case/planet-no-userinfo.osm.bz2"),
        ("history.osm", "history", False, "history.xml.case/history.osm.bz2"),
        ("history-nui.osm", "history", True, "history.xml.case/history-no-userinfo.osm.bz2"),
        ("cs.osm", "changesets", False, "changesets.xml.case/changesets.osm.bz2"),
        ("cs-nui.osm", "changesets", True, "changesets.xml.case/changesets-no-userinfo.osm.bz2"),
        ("disc.osm", "discussions", False, "discussions.xml.case/discussions.osm.bz2"),
        ("disc-nui.osm", "discussions", True, "discussions.xml.case/discussions-no-userinfo.osm.bz2"),
    ]
    pipeline.run_dump(
        spark,
        sql,
        [
            pipeline.OutputSpec(str(work / name), kind, anonymize=anon)
            for name, kind, anon, _ in outs
        ],
        str(work / "w-li"),
        generator=GENERATOR,
    )
    for name, _, _, golden in outs:
        with open(work / name, "rb") as fh:
            assert fh.read() == _golden(*golden.split("/")), name


@pytest.mark.parametrize(
    "dump,kind,golden_case,golden_name",
    [
        ("bad-character", "changesets", "changesets-badchar.xml.case", "changesets.osm.bz2"),
        ("bad-character", "discussions", "discussions-badchar.xml.case", "discussions.osm.bz2"),
        ("empty", "changesets", "changesets-empty.xml.case", "changesets.osm.bz2"),
        ("long-changeset-comment", "discussions", "discussions-long-comment.xml.case", "discussions.osm.bz2"),
    ],
)
def test_edge_dumps(spark, work, dump, kind, golden_case, golden_name):
    sql = _extract(work, dump)
    out = work / f"{dump}-{kind}.osm"
    pipeline.run_dump(
        spark,
        sql,
        [pipeline.OutputSpec(str(out), kind)],
        str(work / f"w-{dump}-{kind}"),
        generator=GENERATOR,
    )
    with open(out, "rb") as fh:
        assert fh.read() == _golden(golden_case, golden_name)


def test_bz2_output_roundtrip(spark, work):
    """.bz2 outputs are valid multistream bzip2 decompressing to the same
    bytes (per-partition parallel compression, xml_sink docstring)."""
    sql = _extract(work, "bad-character")
    out = work / "cs.osm.bz2"
    pipeline.run_dump(
        spark,
        sql,
        [pipeline.OutputSpec(str(out), "changesets")],
        str(work / "w-bz2"),
        generator=GENERATOR,
    )
    dec = subprocess.run(["bzcat", str(out)], capture_output=True, check=True)
    assert dec.stdout == _golden("changesets-badchar.xml.case", "changesets.osm.bz2")


def test_gz_output_roundtrip(spark, work):
    """.gz outputs are valid multi-member gzip (RFC 1952 concatenation,
    the reference's ``--compress-command gzip`` target) decompressing to
    the same golden bytes as the bz2/plain variants."""
    import gzip

    sql = _extract(work, "bad-character")
    out = work / "cs.osm.gz"
    pipeline.run_dump(
        spark,
        sql,
        [pipeline.OutputSpec(str(out), "changesets")],
        str(work / "w-gz"),
        generator=GENERATOR,
    )
    with gzip.open(out, "rb") as fh:
        assert fh.read() == _golden("changesets-badchar.xml.case", "changesets.osm.bz2")
    # zcat agrees (the file is standard gzip, not just python-readable)
    dec = subprocess.run(["zcat", str(out)], capture_output=True, check=True)
    assert dec.stdout == _golden("changesets-badchar.xml.case", "changesets.osm.bz2")


def test_arbitrary_compress_command_pipe(spark, work):
    """An UNRECOGNIZED --compress-command falls back to the reference's
    popen behavior (xml_writer.cpp:58-79): plain fragments piped through
    the user's command driver-side.  Spelled as an arbitrary shell
    command ('sh -c ...' is not a recognized compressor program), the
    changesets case must still decompress to the golden bytes, and the
    file must be a single well-formed bzip2 stream from that one
    subprocess."""
    sql = _extract(work, "bad-character")
    out = work / "cs-ext.osm.bz2"
    pipeline.run_dump(
        spark,
        sql,
        [pipeline.OutputSpec(str(out), "changesets")],
        str(work / "w-ext"),
        generator=GENERATOR,
        compress_command="sh -c 'exec bzip2 -c'",
    )
    with open(out, "rb") as fh:
        assert bz2.decompress(fh.read()) == _golden(
            "changesets-badchar.xml.case", "changesets.osm.bz2"
        )


def test_compress_command_failure_is_loud(spark, work):
    """A failing external compressor must raise, not leave a silently
    truncated output behind."""
    import pytest

    sql = _extract(work, "bad-character")
    out = work / "cs-fail.osm"
    with pytest.raises(RuntimeError, match="compress-command"):
        pipeline.run_dump(
            spark,
            sql,
            [pipeline.OutputSpec(str(out), "changesets")],
            str(work / "w-fail"),
            generator=GENERATOR,
            compress_command="sh -c 'exit 3'",
        )


def test_empty_dump_all_five_outputs(spark, work):
    """Zero elements of every type through ALL five output variants: the
    headers, <bound> line, PBF header blob and inter-type emit order must
    hold on a dump whose element tables are all empty (the reference's
    empty.dmp fixture covers only changesets in its own suite)."""
    from planet_dump_ng_spark.sinks import pbf_sink

    sql = _extract(work, "empty")
    outs = [
        pipeline.OutputSpec(str(work / "e-planet.osm"), "planet"),
        pipeline.OutputSpec(str(work / "e-history.osm"), "history"),
        pipeline.OutputSpec(str(work / "e-cs.osm"), "changesets"),
        pipeline.OutputSpec(str(work / "e-planet.osm.pbf"), "pbf"),
        pipeline.OutputSpec(str(work / "e-history.osm.pbf"), "pbf-history"),
    ]
    pipeline.run_dump(spark, sql, outs, str(work / "w-empty5"),
                      generator=GENERATOR)

    for name in ("e-planet.osm", "e-history.osm"):
        xml = (work / name).read_text()
        assert xml.startswith('<?xml version="1.0" encoding="UTF-8"?>\n<osm ')
        assert ' <bound box="-90,-180,90,180"' in xml
        assert f'generator="{GENERATOR}"' in xml
        assert "<node" not in xml and "<way" not in xml
        assert "<relation" not in xml and "<changeset" not in xml
        assert xml.rstrip().endswith("</osm>")
    cs = (work / "e-cs.osm").read_text()
    assert "<changeset" not in cs and cs.rstrip().endswith("</osm>")

    for name in ("e-planet.osm.pbf", "e-history.osm.pbf"):
        got = pbf_sink.read_pbf(str(work / name))
        assert got["nodes"] == [] and got["ways"] == []
        assert got["relations"] == []
