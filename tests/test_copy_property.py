"""Property-based round-trip: Postgres COPY escape -> unescape is identity."""

from hypothesis import given, settings, strategies as st

from planet_dump_ng_spark.sources.copy_source import unescape_copy_text


def pg_copy_escape(s: str) -> str:
    """Reference escaper emitting what Postgres COPY TO text format writes
    (backslash, tab, newline, CR and control chars escaped)."""
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\b":
            out.append("\\b")
        elif ch == "\f":
            out.append("\\f")
        elif ch == "\v":
            out.append("\\v")
        else:
            out.append(ch)
    return "".join(out)


@given(st.text(max_size=200))
@settings(max_examples=500, deadline=None)
def test_escape_roundtrip(s):
    assert unescape_copy_text(pg_copy_escape(s)) == s


@given(st.binary(min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_hex_escapes_decode(data):
    """\\xHH sequences decode to the raw byte values."""
    encoded = "".join(f"\\x{b:02x}" for b in data)
    assert unescape_copy_text(encoded) == "".join(chr(b) for b in data)
