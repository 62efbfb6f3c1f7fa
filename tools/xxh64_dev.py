"""Dev harness: verify the DuckDB xxhash64 macro against Spark's xxhash64.

Spark's XXH64 (common/unsafe XXH64.java) deviates from reference xxHash:
it hashes the 8-byte-aligned prefix first (adding only the ALIGNED length
into the hash), then folds the remaining 4-byte word and tail bytes.
The macro below replicates that exactly, over the UTF-8 bytes of a string,
seed 42, so DuckDB oracles can reproduce Spark shingle/band hashes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdef",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "hello world",
    "the quick brown fox",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 63,
    "x" * 64,
    "x" * 65,
    "the quick brown fox jumps over the lazy dog",
    "café über 中文",
    "a b c,d",
    "123456789,123456789,123456789,123456789",
]


def spark_vectors() -> dict[str, int]:
    code = (
        "from planet_dump_ng_spark.session import get_spark\n"
        "from pyspark.sql import functions as F\n"
        "import json, sys\n"
        "spark = get_spark()\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "tests = json.load(open(sys.argv[1]))\n"
        "df = spark.createDataFrame([(t,) for t in tests], 's string')\n"
        "rows = df.select('s', F.xxhash64('s').alias('h')).collect()\n"
        "json.dump({r['s']: r['h'] for r in rows}, open(sys.argv[2], 'w'))\n"
    )
    json.dump(TESTS, open("/tmp/xxh_tests.json", "w"))
    subprocess.run(
        [sys.executable, "-c", code, "/tmp/xxh_tests.json", "/tmp/xxh_spark.json"],
        check=True,
        capture_output=True,
    )
    return json.load(open("/tmp/xxh_spark.json"))


def main() -> int:
    from planet_dump_ng_spark.plans.duck_xxh64 import XXH64_MACROS

    expected = spark_vectors()
    con = duckdb.connect()
    con.execute(XXH64_MACROS)
    bad = 0
    for s in TESTS:
        got = con.execute("select xxh64_spark(?)", [s]).fetchone()[0]
        want = expected[s]
        mark = "ok " if got == want else "BAD"
        if got != want:
            bad += 1
        print(f"{mark} len={len(s.encode('utf-8')):3d} got={got} want={want} {s[:30]!r}")
    print("PASS" if bad == 0 else f"FAIL ({bad})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
