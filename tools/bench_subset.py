"""Subset bench: times the NAMED queries with bench.py's exact
methodology (noop sink, untimed warmup, min-of-N) so before/after
deltas of a single optimization can be measured without re-running
the full 70-query headline.

Usage: python tools/bench_subset.py q297_hits q306_dbscan ...
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS, BENCH_RUNS (default 4)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("BENCH_RUNS", "4"))

    from maston_spark.queries import all_queries
    from maston_spark.session import build_session

    qs = all_queries()
    spark = build_session("maston-spark-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def calib() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(500_000_000).selectExpr(
                "sum(id * 2654435761 % 1000000007) AS s"
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    c0 = calib()
    print(json.dumps({"calibration_start": c0}), flush=True)

    # whole-set warmup pass FIRST: in bench.py every query runs inside
    # a session already warmed by dozens of prior queries, so a subset
    # probe that times its first query on a cold JIT systematically
    # inflates it (measured: the fixed-work calibration loop itself
    # reads ~2-3x slower at session start than after ~20 queries)
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()

    timings = {}
    for name in names:
        spark.catalog.clearCache()
        gc.collect()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
        }
        print(json.dumps({name: timings[name]}), flush=True)
    c1 = calib()
    print(json.dumps({"subset": timings, "calibration": [c0, c1]}))


if __name__ == "__main__":
    main()
