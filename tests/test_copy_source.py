"""COPY text decode semantics (unescape_copy_row.hpp parity)."""

import pytest

from planet_dump_ng_spark.sources.copy_source import (
    parse_copy_header,
    read_copy_table,
    unescape_copy_text,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        (r"plain", "plain"),
        (r"a\tb", "a\tb"),
        (r"a\nb", "a\nb"),
        (r"back\\slash", "back\\slash"),
        (r"\x41\x42", "AB"),
        (r"\101\102", "AB"),  # octal
        (r"\x9", "\t"),  # 1-digit hex
        (r"\7", "\x07"),  # 1-digit octal
        (r"\q", "q"),  # unknown escape: backslash dropped
        (r"\b\f\r\v", "\b\f\r\v"),
    ],
)
def test_unescape(raw, expected):
    assert unescape_copy_text(raw) == expected


def test_parse_copy_header():
    assert parse_copy_header('COPY nodes (node_id, "timestamp") FROM stdin;') == (
        "nodes",
        ["node_id", "timestamp"],
    )
    assert parse_copy_header('COPY public.users (id) FROM stdin;') == ("users", ["id"])
    assert parse_copy_header("not a header") is None


def test_read_copy_table_reorders_and_casts(spark, tmp_path):
    p = tmp_path / "users.copy"
    p.write_text(
        "COPY users (display_name, id, data_public, email) FROM stdin;\n"
        "Alice\t1\tt\ta@example.com\n"
        "Bo\\tb\t2\tf\t\\N\n"
        "\\N\t3\tt\tx\n"
        "\\.\n"
    )
    rows = {
        r.id: r
        for r in read_copy_table(spark, str(p), "users").collect()
    }
    assert rows[1].display_name == "Alice" and rows[1].data_public is True
    assert rows[2].display_name == "Bo\tb" and rows[2].data_public is False
    assert rows[3].display_name is None


def test_read_copy_table_missing_column_raises(spark, tmp_path):
    p = tmp_path / "users.copy"
    p.write_text("COPY users (id, data_public) FROM stdin;\n1\tt\n\\.\n")
    with pytest.raises(ValueError, match="display_name"):
        read_copy_table(spark, str(p), "users")


def test_timestamp_truncates_fractional_seconds(spark, tmp_path):
    p = tmp_path / "changesets.copy"
    p.write_text(
        "COPY changesets (id, user_id, created_at, min_lat, max_lat, min_lon, "
        "max_lon, closed_at, num_changes) FROM stdin;\n"
        "7\t1\t2013-08-03 12:34:56.789\t\\N\t\\N\t\\N\t\\N\t2013-08-03 13:00:00\t5\n"
        "\\.\n"
    )
    row = read_copy_table(spark, str(p), "changesets").collect()[0]
    assert row.created_at.microsecond == 0
    assert row.created_at.second == 56
    assert row.min_lat is None
