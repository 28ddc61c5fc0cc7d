"""Compare two bench.py records: per-query delta sorted by absolute
saving, plus totals and calibration context.

Usage: python tools/bench_diff.py BEFORE.json AFTER.json [min_abs=0.15]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    before_path, after_path = sys.argv[1], sys.argv[2]
    min_abs = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    b = json.load(open(before_path))
    a = json.load(open(after_path))
    bq, aq = b["queries"], a["queries"]
    common = sorted(set(bq) & set(aq))
    rows = [(bq[n] - aq[n], bq[n], aq[n], n) for n in common]
    rows.sort(reverse=True)
    print(
        f"total: {b['value']:.2f} -> {a['value']:.2f} s on common "
        f"{sum(bq[n] for n in common):.2f} -> {sum(aq[n] for n in common):.2f}"
    )
    print(
        f"calibration: {b['calibration']['sec']} -> {a['calibration']['sec']}"
        f"  valid: {b.get('valid')} -> {a.get('valid')}"
    )
    print(f"{'delta':>8} {'before':>8} {'after':>8}  query")
    for d, bv, av, n in rows:
        if abs(d) >= min_abs:
            print(f"{d:8.3f} {bv:8.3f} {av:8.3f}  {n}")


if __name__ == "__main__":
    main()
