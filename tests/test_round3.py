"""Round-3 additions: non-dense PBF nodes, --meta-file, exact COPY framing
filter + arity assert, discussion-comment author skip, PBF strict
changeset check."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from planet_dump_ng_spark.cli import build_parser, meta_from_args, parse_meta_file
from planet_dump_ng_spark.operators import assembly
from planet_dump_ng_spark.schemas import CHANGESET_COMMENTS, CHANGESET_TAGS, CHANGESETS, USERS
from planet_dump_ng_spark.sinks import pbf_sink, xml_sink

TS = dt.datetime(2013, 8, 1, 12, 0, 0)

NODE_SCHEMA = (
    "id long, version long, visible boolean, timestamp timestamp, "
    "changeset_id long, uid long, user string, latitude int, longitude int, "
    "tags array<struct<k:string,v:string>>"
)
WAY_SCHEMA = (
    "id long, version long, visible boolean, timestamp timestamp, "
    "changeset_id long, uid long, user string, "
    "tags array<struct<k:string,v:string>>, nds array<bigint>"
)
REL_SCHEMA = (
    "id long, version long, visible boolean, timestamp timestamp, "
    "changeset_id long, uid long, user string, "
    "tags array<struct<k:string,v:string>>, "
    "members array<struct<member_type:string,member_id:bigint,member_role:string>>"
)


@pytest.fixture(scope="module")
def node_frames(spark):
    nodes = spark.createDataFrame(
        [
            (1, 1, True, TS, 10, 7, "alice", 471234567, 95551234,
             [{"k": "amenity", "v": "pub"}]),
            (1, 2, False, TS, 11, 7, "alice", 471234567, 95551234, []),
            (2, 1, True, TS, 10, None, None, -900000000, 1800000000, []),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame([], WAY_SCHEMA)
    rels = spark.createDataFrame([], REL_SCHEMA)
    return nodes, ways, rels


def test_non_dense_pbf_matches_dense(node_frames, tmp_path):
    """--dense-nodes=false emits plain Node messages (pbf_writer.cpp:
    334-353) that parse back to the same canonical stream as DenseNodes;
    the DenseNodes required feature disappears from the header
    (pbf_writer.cpp:163-165)."""
    nodes, ways, rels = node_frames
    dense_path, plain_path = str(tmp_path / "d.pbf"), str(tmp_path / "p.pbf")
    for path, dense in ((dense_path, True), (plain_path, False)):
        pbf_sink.write_pbf_file(
            nodes, ways, rels, path, history=True, max_ts=TS, dense_nodes=dense
        )
    d, p = pbf_sink.read_pbf(dense_path), pbf_sink.read_pbf(plain_path)
    assert sorted(d["nodes"]) == sorted(p["nodes"])
    assert len(p["nodes"]) == 3
    assert "DenseNodes" in d["header"]["required_features"]
    assert "DenseNodes" not in p["header"]["required_features"]
    # invisible node carries lat=lon=0 and no tags in both encodings
    hidden = [n for n in p["nodes"] if not n[2]]
    assert hidden and hidden[0][7] == 0 and hidden[0][8] == 0 and hidden[0][9] == ()
    # anonymous node has uid=user=None in both encodings
    anon = [n for n in p["nodes"] if n[0] == 2]
    assert anon[0][5] is None and anon[0][6] is None


def test_meta_file_parsing_and_precedence(tmp_path):
    """--meta-file parses key=value config (planet-dump.cpp:105-114);
    explicit CLI flags win over file entries (boost po::store keeps the
    first-stored value)."""
    cfg = tmp_path / "meta.cfg"
    cfg.write_text(
        "# metainfo\n"
        "meta-author = File Author\n"
        "meta-source= http://file.example/api  # trailing comment\n"
        "meta-copyleft =FileLicense\n"
    )
    assert parse_meta_file(str(cfg)) == {
        "copyright": "File Author",
        "source": "http://file.example/api",
        "license": "FileLicense",
    }
    args = build_parser().parse_args(
        ["--dump-file", "d.sql", "--xml", "p.osm",
         "-M", str(cfg), "--meta-copyleft", "CliLicense"]
    )
    assert meta_from_args(args) == {
        "copyright": "File Author",
        "source": "http://file.example/api",
        "license": "CliLicense",  # CLI beats file
    }
    bad = tmp_path / "bad.cfg"
    bad.write_text("meta-banana = yes\n")
    with pytest.raises(ValueError, match="unknown metainfo key"):
        parse_meta_file(str(bad))


def test_dense_nodes_flag_parses():
    p = build_parser()
    assert p.parse_args(["-f", "d", "--xml", "x"]).dense_nodes is True
    for spelling, want in (("false", False), ("0", False), ("true", True),
                           ("yes", True), ("off", False)):
        got = p.parse_args(["-f", "d", "--xml", "x", "-d", spelling]).dense_nodes
        assert got is want, spelling


def test_copy_framing_preserves_sql_shaped_rows(spark, tmp_path):
    """A data row whose first string field looks like SQL must survive
    (the old shape-based noise filter silently dropped it)."""
    from planet_dump_ng_spark.sources import read_copy_table

    p = str(tmp_path / "users.copy")
    with open(p, "w") as fh:
        fh.write(
            "COPY public.users (id, display_name, data_public) FROM stdin;\n"
            "1\tSET ROLE admin\tt\n"
            "2\t-- not a comment\tf\n"
            "3\tCREATE TABLE fan\tt\n"
            "\\.\n"
        )
    rows = {r.id: r.display_name for r in read_copy_table(spark, p, "users").collect()}
    assert rows == {1: "SET ROLE admin", 2: "-- not a comment", 3: "CREATE TABLE fan"}


def test_copy_arity_mismatch_raises(spark, tmp_path):
    from planet_dump_ng_spark.sources import read_copy_table

    p = str(tmp_path / "users.copy")
    with open(p, "w") as fh:
        fh.write(
            "COPY public.users (id, display_name, data_public) FROM stdin;\n"
            "1\tok\tt\n"
            "2\tmissing-field\n"
            "\\.\n"
        )
    with pytest.raises(Exception, match="malformed COPY row"):
        read_copy_table(spark, p, "users").collect()


@pytest.fixture(scope="module")
def changesets_with_nonpublic_comment(spark):
    users = spark.createDataFrame(
        [(7, "alice", True), (8, "bob", False)], USERS
    )
    changesets = spark.createDataFrame(
        [(10, 7, TS, None, None, None, None, TS, 2)], CHANGESETS
    )
    tags = spark.createDataFrame([], CHANGESET_TAGS)
    comments = spark.createDataFrame(
        [
            (10, TS, 7, "public author", True),
            (10, dt.datetime(2013, 8, 2), 8, "NON-PUBLIC author", True),
        ],
        CHANGESET_COMMENTS,
    )
    return assembly.assemble_changesets(changesets, tags, comments, users)


@pytest.mark.parametrize("anonymize", [False, True])
def test_discussion_skips_nonpublic_comment_author(
    changesets_with_nonpublic_comment, anonymize
):
    """A visible comment by a data_public=false user is dropped from the
    rendered <discussion> ("Ignoring", xml_writer.cpp:513-519) in BOTH
    userinfo modes, but still counts in comments_count."""
    rendered = xml_sink.render_changesets(
        changesets_with_nonpublic_comment, TS, anonymize=anonymize,
        discussions=True,
    ).collect()
    xml = rendered[0]["xml"]
    assert 'comments_count="2"' in xml
    assert xml.count("<comment") == 1
    assert "NON-PUBLIC author" not in xml
    assert "public author" in xml
    if anonymize:
        assert 'uid="' not in xml
    else:
        assert 'uid="7"' in xml


def test_pbf_strict_changeset_check(spark, node_frames, tmp_path):
    """PBF outputs with full user info must error when an element
    references a missing changeset (pbf_writer.cpp:312-318); the
    no-userinfo variant skips the lookup and stays silent."""
    from planet_dump_ng_spark import pipeline

    nodes, ways, rels = node_frames  # reference changesets 10 and 11
    changesets = spark.createDataFrame(
        [(10, TS, 0, [], 0, None, None)],
        "id long, created_at timestamp, num_changes int, "
        "tags array<struct<k:string,v:string>>, comments_count int, "
        "uid long, user string",
    ).withColumns(
        {
            "min_lat": F.lit(None).cast("int"),
            "max_lat": F.lit(None).cast("int"),
            "min_lon": F.lit(None).cast("int"),
            "max_lon": F.lit(None).cast("int"),
            "closed_at": F.col("created_at"),
            "comments": F.lit(None).cast(
                "array<struct<created_at:timestamp,author_id:bigint,"
                "author_name:string,body:string>>"
            ),
        }
    )
    frames = pipeline.PlanetFrames(changesets, nodes, ways, rels, TS)
    with pytest.raises(ValueError, match="changeset id"):
        pipeline.write_outputs(
            frames, [pipeline.OutputSpec(str(tmp_path / "s.pbf"), "pbf")]
        )
    # anonymize: no changeset->user lookup, so no strictness (writes fine)
    pipeline.write_outputs(
        frames,
        [pipeline.OutputSpec(str(tmp_path / "a.pbf"), "pbf", anonymize=True)],
    )
    got = pbf_sink.read_pbf(str(tmp_path / "a.pbf"))
    # current view: node 1's latest version is a delete -> only node 2 remains
    assert [n[0] for n in got["nodes"]] == [2]
    # XML stays the silent-anonymous path (xml_writer.cpp:376-386): the
    # SAME frames write fine and the missing-changeset element renders
    # with no uid/user attribution — the one place the reference's two
    # sinks deliberately diverge (the strict check guards PBF only)
    pipeline.write_outputs(
        frames, [pipeline.OutputSpec(str(tmp_path / "x.osm"), "history")]
    )
    xml = open(tmp_path / "x.osm").read()
    assert 'changeset="11"' in xml  # the offending element still renders


def test_attribute_elements_missing_changeset_goes_anonymous(spark):
    """The assembly-side half of the XML/PBF divergence: attribution of
    an element whose changeset is absent yields NULL uid/user (the XML
    writer then omits the attributes) instead of erroring — strictness
    is check_changesets_present, applied by write_outputs to PBF kinds
    only (pbf_writer.cpp:312-318 vs xml_writer.cpp:376-386)."""
    from planet_dump_ng_spark.operators.assembly import attribute_elements

    elements = spark.createDataFrame(
        [(1, 10), (2, 11)], "id long, changeset_id long"
    )
    changesets = spark.createDataFrame(
        [(10, 7)], "id long, user_id int"
    )
    users = spark.createDataFrame(
        [(7, "alice", True)], "id long, display_name string, data_public boolean"
    )
    got = {
        r.id: (r.uid, r.user)
        for r in attribute_elements(elements, changesets, users).collect()
    }
    assert got[1] == (7, "alice")      # present changeset, public user
    assert got[2] == (None, None)      # missing changeset -> anonymous


def test_compress_command_families_and_suffix_crosscheck():
    """--compress-command drop-in surface: bzip2/gzip families pass (and
    run cluster-parallel when they match the suffix); arbitrary commands
    pass too (piped driver-side, the reference's popen behavior); a
    RECOGNIZED family contradicting an output suffix is rejected loudly
    instead of silently mis-encoding; empty commands are rejected."""
    import pytest

    from planet_dump_ng_spark.cli import build_parser, check_compress_command

    assert build_parser().parse_args(
        ["--dump-file", "x.sql", "--xml", "o.bz2"]
    ).compress_command == "bzip2 -c"
    for ok in ("bzip2 -c", "pbzip2", "/usr/bin/lbzip2 -9 -c",
               "gzip -c", "pigz -p8", "xz", "zstd -T0", "cat"):
        check_compress_command(ok, ["planet.osm.bz2"] if "z2" in ok else [])
    # arbitrary filters are fine against any suffix (user's bytes)
    check_compress_command("cat", ["planet.osm.bz2", "cs.osm"])
    with pytest.raises(SystemExit):
        check_compress_command("")
    with pytest.raises(SystemExit):  # gzip bytes under a bzip2 name
        check_compress_command("gzip -c", ["planet.osm.bz2"])
    with pytest.raises(SystemExit):  # bzip2 bytes under a gz name
        check_compress_command("bzip2 -c", ["cs.osm", "planet.osm.gz"])
