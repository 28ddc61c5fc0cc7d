"""Three-point scale curves for the documented-superlinear and
fit-dominated heavy hitters (round-14 verdict task 5).

Two points cannot distinguish "fixed overhead dominates" from genuine
sublinearity; three can: with min-of-3 times t1,t2,t3 at data scales
1x,10x,100x, the per-decade growth ratios r12 = t2/t1 and r23 = t3/t2
expose the asymptote — r23 <= 10 on 10x more data is at-most-linear
scaling in the measured decade, r23 >> r12 bending upward is the
superlinear signature, r23 ~ r12 ~ small is overhead-dominated.

The curvature column reported is log10(r23)/log10(10) = the exponent
of t ~ n^e fitted on the LAST decade (e < 1 sublinear, ~1 linear,
> 1 superlinear) — the decade that matters for the 100 TB question.

Usage: python tools/scale_curve.py [--reps N] [query ...]
Dirs: /root/testdata/sf0.1, ./_scale_data/sf1 (10x),
      ./_scale_data/sf10 (100x) — generate first via make_scale_data.
Writes ./_scale_curve.json; prints one JSON line.
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the verdict-named heavy hitters: documented output-superlinear
# members and fit-dominated ANN members (q203 runs by default too —
# its 100x point is output-bound BY CONTRACT; the curve records it
# rather than hiding it)
DEFAULT = [
    "q293_voptimal_histogram",
    "q158_ivfpq_residual",
    "q153_ivf_pq",
    "q265_kendall_tau",
    "q172_dup_transitivity",
    "q55_dup_clusters",
    "q291_leakage_safe_split",
    "q274_theil_sen",
    "q203_exact_simjoin",
]

DIRS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "./_scale_data/sf1"),
    ("100x", "./_scale_data/sf10"),
]


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    dirs = list(DIRS)
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        elif args[0] == "--two":
            # two-scale mode for per-addition min-of-3 entries (the
            # 100x tier is reserved for the documented heavy hitters)
            dirs = list(DIRS[:2])
            args = args[1:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args or DEFAULT

    from maston_spark.queries import all_queries
    from maston_spark.session import build_session

    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    qs = all_queries()
    spark = build_session("maston-spark-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: executor + Arrow worker spin-up
    qs["q01_pricing_summary"](spark, DIRS[0][1]).write.format("noop").mode(
        "overwrite"
    ).save()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, "_scale_curve.json")
    out: dict[str, dict] = {}
    if os.path.exists(out_path):  # merge with prior partial runs
        try:
            with open(out_path) as f:
                out = json.load(f).get("queries", {})
        except Exception:
            out = {}
    for name in names:
        row: dict[str, float] = {}
        for label, d in dirs:
            if not os.path.isdir(d.lstrip("./")) and not os.path.isdir(d):
                print(f"# missing dir {d}; skipping {label}", file=sys.stderr)
                continue
            best = float("inf")
            for _ in range(reps):
                spark.catalog.clearCache()
                gc.collect()
                t0 = time.perf_counter()
                qs[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 3)
            print(f"# {name} {label}: {row[label]}s", file=sys.stderr)
        if "1x" in row and "10x" in row:
            row["r12"] = round(row["10x"] / row["1x"], 2)
        if "10x" in row and "100x" in row:
            row["r23"] = round(row["100x"] / row["10x"], 2)
            # exponent of t ~ n^e over the last decade
            row["last_decade_exponent"] = round(
                math.log10(max(row["r23"], 1e-9)), 2
            )
        out[name] = row
        # incremental dump: a killed run keeps every finished query
        record = {
            "metric": "scale_curve_min_of_%d" % reps,
            "loadavg_start": load,
            "queries": out,
        }
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
