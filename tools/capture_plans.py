"""Capture .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters — before and after each
optimization).

Usage: python tools/capture_plans.py <tag> <suffix> <query> [query ...]
  e.g. python tools/capture_plans.py r16 before q297_hits q305_encoding_advisor
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from maston_spark.queries import all_queries
    from maston_spark.session import build_session

    qs = all_queries()
    spark = build_session("maston-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
