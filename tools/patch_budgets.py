"""Re-pin exchange budgets for NAMED queries only — a targeted
QUERIES.md patcher for optimization work.

Usage: python tools/patch_budgets.py <query> [query ...]

Full regeneration (tools/gen_query_inventory.py) captures all 200+
plans three times each (~30 min); after touching a handful of
operators only their queries' budgets can have moved, so this captures
just the named ones with the SAME session shape, cache hygiene, and
3-way determinism rule as the generator and rewrites their rows in
place.  Rows are matched by the leading ``| `name` |`` cell; the shuf/
bcast cells are columns 4 and 5.  Anything else in the file is left
byte-identical, so a full regen stays reproducible.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_dump_ng_spark import plans  # noqa: E402
from tools.gen_query_inventory import MEASURED_UNPINNABLE  # noqa: E402


def capture(names: list[str], sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from planet_dump_ng_spark.session import get_spark

    spark = get_spark(
        "patch-budgets", master="local[4]", shuffle_partitions=4
    )

    def _one(spec) -> tuple[int, int]:
        spark.catalog.clearCache()
        df = spec.spark(spark, sf_dir)
        phys = df._jdf.queryExecution().executedPlan().toString()
        bcast = len(re.findall(r"BroadcastExchange", phys))
        shuf = len(
            re.findall(r"\bExchange (?:hash|range|Single|RoundRobin)", phys)
        )
        return (shuf, bcast)

    out = {}
    for name in names:
        if name in MEASURED_UNPINNABLE:
            out[name] = (-1, -1)
            continue
        spec = plans.QUERIES[name]
        caps = {_one(spec) for _ in range(3)}
        out[name] = caps.pop() if len(caps) == 1 else (-1, -1)
    spark.catalog.clearCache()
    return out


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print(__doc__)
        return 2
    plans.load_all()
    unknown = [n for n in names if n not in plans.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    budgets = capture(names)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "QUERIES.md")
    with open(path, encoding="utf-8") as fh:
        lines = fh.readlines()
    patched = 0
    for i, line in enumerate(lines):
        m = re.match(r"^\| `([a-z0-9_]+)` \|", line)
        if not m or m.group(1) not in budgets:
            continue
        cells = line.split(" | ")
        sh, bc = budgets[m.group(1)]
        old = (cells[3], cells[4])
        cells[3], cells[4] = str(sh), str(bc)
        lines[i] = " | ".join(cells)
        print(f"{m.group(1)}: shuf {old[0]}->{sh}, bcast {old[1]}->{bc}")
        patched += 1
    missing = set(budgets) - {
        m.group(1)
        for line in lines
        if (m := re.match(r"^\| `([a-z0-9_]+)` \|", line))
    }
    if missing:
        print(f"not found in QUERIES.md (regenerate fully): {missing}")
        return 1
    with open(path, "w", encoding="utf-8") as fh:
        fh.writelines(lines)
    print(f"patched {patched}/{len(names)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
