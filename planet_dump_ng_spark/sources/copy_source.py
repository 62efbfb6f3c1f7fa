"""PostgreSQL COPY-text source (reference operators S1-S4).

The reference spawns ``pg_restore -a -t <table>`` per table and parses the
COPY text protocol from the pipe (src/dump_reader.cpp:656-663), reorders
columns by name against a canonical schema (include/unescape_copy_row.hpp:
340-367, src/types.cpp:5-14), and unescapes/casts each field
(unescape_copy_row.hpp:85-335).

Spark-first restatement:
- one text stream PER TABLE (the same shape pg_restore emits).  A
  custom-format archive fans out through CONCURRENT per-table
  ``pg_restore -a -t`` subprocesses (:func:`extract_tables_parallel` —
  the reference's 12-pass strategy, planet-dump.cpp:127-140); an
  already-plain ``pg_dump --format=plain`` file is split once by
  :func:`split_dump_file`.  After that everything is distributed:
  ``spark.read.text`` splits each per-table file by HDFS block, so a
  100 TB dump parses with full scan parallelism.
- COPY framing lines (``COPY ... FROM stdin;``, ``\\.``, empty) are
  identified by EXACT shape, so the filter is order-free and safe under
  Spark's split-anywhere reads; any other non-data line fails a per-row
  field-count assert instead of being silently dropped.
- column reorder happens by parsing the COPY header's column list
  (driver-side peek at the file head) and ``select``-ing fields by name —
  Catalyst prunes unparsed columns.  A ``*`` canonical name means
  "positional": take the column at the same index
  (unescape_copy_row.hpp:350, used for the tag tables' id column).
- unescape: fields never containing escapes (numerics, bools,
  timestamps) cast directly JVM-side; string fields go through an
  Arrow-batched pandas UDF ONLY for rows that actually contain a
  backslash (``F.when(contains) . otherwise(identity)``), keeping the
  Python path off the hot loop.

Semantics matched from unescape_copy_row.hpp:
- ``\\N``       -> NULL (:152-163)
- ``t``/``f``   -> bool (:85-97)
- timestamps parse positionally, fractional seconds DROPPED (:129-150)
- escapes ``\\b \\f \\n \\r \\t \\v``, ``\\xHH``, ``\\OOO``, ``\\\\``, and
  "backslash before any other char is dropped" (:254-335)
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from planet_dump_ng_spark.schemas import TABLES

#: canonical columns declared positional ('*') in src/types.cpp:7-8 — the
#: tag tables' id column, whose dump-side name varies (node_id/way_id/...).
#: Only these may resolve by index; any other missing column is an error
#: (unescape_copy_row.hpp:361-366).
POSITIONAL_COLUMNS = {
    ("changeset_tags", "changeset_id"),
    ("node_tags", "element_id"),
    ("way_tags", "element_id"),
    ("relation_tags", "element_id"),
}

#: COPY section header, e.g. ``COPY public.nodes (node_id, version) FROM stdin;``
COPY_HEADER_RE = re.compile(
    r'^COPY\s+(?:"?[\w$]+"?\.)?"?(?P<table>[\w$]+)"?\s*\((?P<cols>[^)]*)\)\s+FROM\s+stdin;'
)

#: EXACT COPY framing lines only — the section header, the ``\\.``
#: terminator, and empty lines.  Deliberately NOT SQL-keyword shapes: the
#: per-table streams read_copy_table consumes contain no SQL noise (it is
#: stripped by split_dump_file), and a shape filter would silently drop a
#: data row whose first field happens to look like SQL (e.g. an email or a
#: tag value starting with 'SET ').  Any non-framing line that is not a
#: valid data row fails the arity assert below instead of vanishing.
_FRAMING_RE = (
    r'^(COPY\s+(?:"?[\w$]+"?\.)?"?[\w$]+"?\s*\([^)]*\)\s+FROM\s+stdin;[ \r]*'
    r"|\\\.|\r?)$"
)

_ESCAPE_RE = re.compile(r"\\(x[0-9A-Fa-f]{1,2}|[0-7]{1,3}|.)", re.DOTALL)

_SIMPLE = {
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\v",
    "\\": "\\",
}


def unescape_copy_text(s: str) -> str:
    """Decode one COPY text field (plain Python; used inside the pandas UDF
    and directly in tests).  Mirrors unescape_copy_row.hpp:254-335: simple
    C escapes, ``\\xHH`` hex, ``\\OOO`` octal, and a lone backslash before
    any other character is dropped (the char stands for itself)."""

    def repl(m: re.Match) -> str:
        e = m.group(1)
        if e[0] == "x" and len(e) > 1:
            return chr(int(e[1:], 16))
        if e[0] in "01234567":
            return chr(int(e, 8) & 0xFF)
        return _SIMPLE.get(e, e)

    return _ESCAPE_RE.sub(repl, s)


@pandas_udf(T.StringType())
def _unescape_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: unescape_copy_text(v) if v is not None else None)


def _null_if_n(c: Column) -> Column:
    """COPY renders SQL NULL as the 2-char sequence ``\\N``."""
    return F.when(c == "\\N", F.lit(None)).otherwise(c)


def _cast_field(c: Column, dtype: T.DataType) -> Column:
    c = _null_if_n(c)
    if isinstance(dtype, T.BooleanType):
        return c == "t"
    if isinstance(dtype, T.TimestampType):
        # positional parse, fractional seconds dropped (hpp:145-147)
        return F.to_timestamp(F.substring(c, 1, 19), "yyyy-MM-dd HH:mm:ss")
    if isinstance(dtype, T.StringType):
        # Python unescape only where a backslash is actually present
        return F.when(c.contains("\\"), _unescape_udf(c)).otherwise(c)
    return c.cast(dtype)


def parse_copy_header(line: str) -> tuple[str, list[str]] | None:
    m = COPY_HEADER_RE.match(line)
    if not m:
        return None
    cols = [c.strip().strip('"') for c in m.group("cols").split(",") if c.strip()]
    return m.group("table"), cols


def _peek_header(path: str, table: str) -> list[str]:
    """Driver-side peek for the COPY header's column list.  For a directory
    (e.g. a staged split), peek the first data file inside."""
    if os.path.isdir(path):
        names = sorted(
            n for n in os.listdir(path) if not n.startswith(("_", "."))
        )
        if not names:
            raise FileNotFoundError(f"no files in {path}")
        path = os.path.join(path, names[0])
    with open(path, encoding="utf-8", errors="replace") as fh:
        for _ in range(1000):
            line = fh.readline()
            if not line:
                break
            parsed = parse_copy_header(line)
            if parsed and (parsed[0] == table or table == "*"):
                return parsed[1]
    raise ValueError(f"no COPY header for table {table!r} found in {path}")


def read_copy_table(
    spark: SparkSession,
    path: str,
    table: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Parse one table's COPY text stream into its canonical typed DataFrame.

    ``columns`` overrides the header peek (pass when the stream has no
    header line, e.g. raw ``COPY TO`` output).  Missing canonical columns
    raise, matching unescape_copy_row.hpp:361-366; ``*`` canonical names
    resolve positionally (:350).
    """
    schema, _ = TABLES[table]
    actual = columns or _peek_header(path, table)

    lines = spark.read.text(path).filter(~F.col("value").rlike(_FRAMING_RE))
    # split on real tabs only: escaped tabs ride as the 2-char '\t' sequence
    # -- and fail LOUDLY on arity mismatch (a row with the wrong field
    # count means corrupt framing, not something to drop silently).
    n_fields = len(actual)
    parts = lines.select(
        F.split("value", "\t", -1).alias("p"), F.col("value")
    ).select(
        F.when(F.size("p") == n_fields, F.col("p"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"malformed COPY row for table {table!r} "
                        f"(expected {n_fields} fields): "
                    ),
                    F.col("value"),
                )
            )
        )
        .alias("p")
    )

    out_cols: list[Column] = []
    for i, field in enumerate(schema.fields):
        if field.name in actual:
            idx = actual.index(field.name)
        elif (table, field.name) in POSITIONAL_COLUMNS and i < len(actual):
            idx = i  # '*' canonical name: take column at same index
        else:
            raise ValueError(
                f"column {field.name!r} missing from COPY header {actual} "
                f"for table {table!r}"
            )
        out_cols.append(
            _cast_field(F.col("p").getItem(idx), field.dataType).alias(field.name)
        )
    return parts.select(*out_cols)


def extract_custom_dump(dump_path: str, out_sql: str) -> str:
    """S1 single-pass variant: pg_dump CUSTOM-format archive -> one
    monolithic plain COPY text file via ``pg_restore`` (kept for callers
    that want the intermediate .sql on disk); the pipeline itself uses
    the concurrent per-table :func:`extract_tables_parallel` fan-out.

    Returns ``out_sql``.  Raises FileNotFoundError when pg_restore is not
    installed."""
    import shutil as _shutil
    import subprocess

    if _shutil.which("pg_restore") is None:
        raise FileNotFoundError("pg_restore not found on PATH")
    subprocess.run(
        ["pg_restore", "-f", out_sql, "-a", dump_path], check=True
    )
    return out_sql


def extract_tables_parallel(
    dump_path: str,
    out_dir: str,
    tables: list[str] | None = None,
    max_workers: int = 12,
) -> dict[str, str]:
    """S1 at full width: one ``pg_restore -a -t <table>`` subprocess PER
    TABLE, all concurrent — exactly the reference's extraction strategy
    (12 parallel per-table passes, src/planet-dump.cpp:127-140 +
    src/dump_reader.cpp:656-663).  Replaces the monolithic
    extract_custom_dump + sequential :func:`split_dump_file` pair for
    custom-format archives: no intermediate whole-dump .sql file, no
    single-core split pass over it, and wall-clock is the SLOWEST table
    instead of the sum.

    Each pg_restore's output is piped through ``sed -n
    '/^COPY /,/^\\\\.$/p'`` (C-speed, streaming) so only the COPY
    section — header line, data rows, ``\\.`` terminator — reaches the
    per-table file; pg_restore's SET/comment preamble never lands on
    disk, keeping :func:`read_copy_table`'s strict framing contract
    (exact-match framing filter, loud arity failure on anything else).

    Returns {table: path} for the tables pg_restore actually produced
    rows for (an empty output file means the archive has no such table
    — it is dropped from the result, matching split_dump_file's
    behavior of only emitting sections it saw).
    """
    import shutil as _shutil
    import subprocess
    from concurrent.futures import ThreadPoolExecutor

    if _shutil.which("pg_restore") is None:
        raise FileNotFoundError("pg_restore not found on PATH")
    wanted = list(tables or TABLES)
    os.makedirs(out_dir, exist_ok=True)

    def one(table: str) -> tuple[str, str | None]:
        out_path = os.path.join(out_dir, f"{table}.copy")
        with open(out_path, "wb") as out:
            pg = subprocess.Popen(
                ["pg_restore", "-a", "-t", table, "-f", "-", dump_path],
                stdout=subprocess.PIPE,
            )
            sed = subprocess.Popen(
                ["sed", "-n", r"/^COPY /,/^\\.$/p"],
                stdin=pg.stdout,
                stdout=out,
            )
            pg.stdout.close()  # sed owns the pipe; let pg see EPIPE
            sed_rc = sed.wait()
            pg_rc = pg.wait()
        if pg_rc != 0 or sed_rc != 0:
            raise RuntimeError(
                f"pg_restore -t {table} failed (pg_restore rc={pg_rc}, "
                f"sed rc={sed_rc})"
            )
        if os.path.getsize(out_path) == 0:
            os.unlink(out_path)
            return table, None
        return table, out_path

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = list(pool.map(one, wanted))
    return {t: p for t, p in results if p is not None}


def split_dump_file(
    dump_path: str, out_dir: str, tables: list[str] | None = None
) -> dict[str, str]:
    """Split a monolithic plain-format pg_dump into one text file per table
    (sequential, IO-bound — the analog of the reference's 12 pg_restore
    subprocess passes, src/planet-dump.cpp:127-140).  Each output file keeps
    its COPY header so :func:`read_copy_table` can reorder by name.

    Returns {table: path}.  Used for inputs that are ALREADY plain text
    (no archive to fan out on); custom-format archives take the
    concurrent :func:`extract_tables_parallel` path instead, which has
    no single-core whole-dump pass at all.
    """
    wanted = set(tables or TABLES)
    os.makedirs(out_dir, exist_ok=True)
    out_paths: dict[str, str] = {}
    current = None
    fh = None
    try:
        with open(dump_path, encoding="utf-8", errors="replace") as src:
            for line in src:
                if current is None:
                    parsed = parse_copy_header(line)
                    if parsed and parsed[0] in wanted:
                        current = parsed[0]
                        out_paths[current] = os.path.join(out_dir, f"{current}.copy")
                        fh = open(out_paths[current], "w", encoding="utf-8")
                        fh.write(line)
                elif line.rstrip("\n") == "\\.":
                    fh.write(line)
                    fh.close()
                    fh = None
                    current = None
                else:
                    fh.write(line)
    finally:
        if fh is not None:
            fh.close()
    return out_paths
