#!/usr/bin/env python
"""Plan auditor: print `explain(formatted)` for registry queries and flag
anti-patterns (missing pushed filters, cartesian products, row-at-a-time
Python UDFs in hot paths).

    python tools/explain_plans.py [sf_dir] [query ...]

With no query names, audits every bench-tagged query and prints a one-line
verdict each; pass names for full formatted plans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_dump_ng_spark import plans  # noqa: E402
from planet_dump_ng_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(text: str) -> list[str]:
    flags = []
    if "CartesianProduct" in text:
        flags.append("CARTESIAN")
    if "BatchEvalPython" in text:
        flags.append("ROW_PYTHON_UDF")  # row-at-a-time: should be Arrow
    if "PushedFilters: []" in text and "Filter" in text:
        flags.append("NO_PUSHDOWN")
    # NOTE: no WholeStageCodegen check — under AQE the pre-execution
    # formatted plan shows AdaptiveSparkPlan without codegen spans, so the
    # marker's absence here is not a signal.
    return flags


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)]
    plans.load_all()
    spark = get_spark("explain", master="local[4]", shuffle_partitions=4)
    targets = names or [
        n for n, s in plans.QUERIES.items() if "bench" in s.tags
    ]
    for name in targets:
        spec = plans.QUERIES[name]
        text = plan_text(spec.spark(spark, sf_dir))
        flags = audit(text)
        if names:
            print(f"===== {name} =====")
            print(text)
        bcasts = text.count("BroadcastHashJoin")
        smj = text.count("SortMergeJoin")
        shuffles = text.count("Exchange")
        print(
            f"{name}: broadcast={bcasts} smj={smj} exchange={shuffles} "
            f"{'FLAGS:' + ','.join(flags) if flags else 'ok'}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
