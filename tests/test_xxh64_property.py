"""Property tests for the DuckDB replicas that underpin the hash-driven
oracles: xxhash64 (string + long paths) and the shingle/token SQL must
equal their Spark counterparts on randomized inputs, not just the fixed
dev vectors."""

import random
import string

import duckdb
from pyspark.sql import functions as F

from planet_dump_ng_spark.plans.duck_xxh64 import xxh64_inline, xxh64_long_inline


def _random_strings(n=200, seed=7):
    rnd = random.Random(seed)
    pool = (
        string.ascii_letters
        + string.digits
        + " \t,.;:!?'\"-_()[]"
        + "äöüßéèêçñ中文日本語한국어πΩµ€☃"
    )
    out = [""]
    for _ in range(n - 1):
        k = rnd.choice([1, 2, 3, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 100])
        out.append("".join(rnd.choice(pool) for _ in range(k)))
    return out


def test_xxh64_string_replica_matches_spark(spark):
    vals = _random_strings()
    got_spark = [
        r.h
        for r in spark.createDataFrame([(v,) for v in vals], "s string")
        .select(F.xxhash64("s").alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join("(?)" for _ in vals) + ") v(s)", vals)
    got_duck = [
        r[0] for r in con.execute(
            f"SELECT {xxh64_inline('s')} AS h FROM t ORDER BY rowid"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_xxh64_long_replica_matches_spark(spark):
    rnd = random.Random(11)
    vals = [0, 1, -1, 2**63 - 1, -(2**63)] + [
        rnd.randrange(-(2**63), 2**63) for _ in range(100)
    ]
    got_spark = [
        r.h
        for r in spark.createDataFrame([(v,) for v in vals], "x long")
        .select(F.xxhash64("x").alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join("(CAST(? AS BIGINT))" for _ in vals) + ") v(x)", vals)
    got_duck = [
        r[0] for r in con.execute(
            f"SELECT {xxh64_long_inline('x')} AS h FROM t ORDER BY rowid"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_shingle_sql_replica_matches_spark(spark):
    """The DuckDB _SHINGLES/_TOKS expressions (used by every jaccard/LSH/
    contamination oracle) must produce the same shingle SETS as
    operators.dedup.shingles on adversarial token shapes."""
    from planet_dump_ng_spark.operators.dedup import shingles
    from planet_dump_ng_spark.plans.dedup_plans import _SHINGLES

    rnd = random.Random(3)
    words = ["a", "bb", "ccc", "the", "spark", "x1", "längé", "中文"]
    texts = ["", " ", "one", "one two", "one two three", "  padded  edges  "]
    for _ in range(60):
        n = rnd.randrange(0, 12)
        sep = rnd.choice([" ", "  ", "\t", " \t "])
        texts.append(sep.join(rnd.choice(words) for _ in range(n)))

    got_spark = [
        sorted(r.sh)
        for r in spark.createDataFrame([(t,) for t in texts], "text string")
        .select(shingles("text", 3).alias("sh"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                ", ".join("(?)" for _ in texts) + ") v(text)", texts)
    got_duck = [
        sorted(r[0]) for r in con.execute(
            f"SELECT {_SHINGLES} AS sh FROM documents ORDER BY rowid"
        ).fetchall()
    ]
    assert got_spark == got_duck
