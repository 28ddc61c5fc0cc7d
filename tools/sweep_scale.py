"""Two-scale full-catalog sweep: time EVERY registered query once at
two SF directories and flag superlinear outliers.

The graded window and the headline bench can both miss a quadratic
candidate generator hiding in the tail — this sweep is what caught
q53/q54's unbounded prefix buckets in round 8 (77 s at sf0.1, 823 s
at 10x, fixed to ~1 s each). Run it whenever an operator family
changes shape.

Usage: python tools/sweep_scale.py [SF_DIR_A] [SF_DIR_B] [OUT_JSON]
Defaults: /root/testdata/sf0.1  ./_scale_data/sf1  ./_sweep.json
(generate the scale dir first: python tools/make_scale_data.py)

Single-shot timings (no warmup, no min-of-4): noisy for absolute
numbers, reliable for the 10x-blowup signal the sweep exists for.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Queries whose >5x time at 10x data is the OUTPUT's intrinsic
# growth, adjudicated with min-of-3 evidence in SCALE.md — never a
# hidden plan defect. The scale generator REPLICATES documents, so
# every near-dup clique grows 10x and complete PAIR outputs grow
# ~100x per clique (q203: 256 pairs at sf0.1 -> 250,600 at 10x).
# Printed loudly when they trip the gate; everything else still
# fails the sweep.
JUSTIFIED = {
    "q203_exact_simjoin": (
        "COMPLETE pair output by contract: 256 pairs at sf0.1 -> 250,600 "
        "at 10x under replica cliques; cost tracks Sigma df^2 + output, "
        "the exact-intersection lower bound (SCALE.md round 11)"
    ),
    "q190_neardup_evidence": (
        "evidence-pair output grows with planted-dup cliques (SCALE.md "
        "round 10: the ~4x data ratio is the duplication profile; round "
        "11 re-adjudicated 2.07 -> 11.3 s min-of-3 on untouched code)"
    ),
    "q111_exact_substring_dedup": (
        "work is bounded by k*tokens and scales with the DUPLICATED-gram "
        "occurrence mass; the replica generator saturates it 10% -> 100% "
        "(measured), so the covered-position side grows ~100x while time "
        "grows 5.3x min-of-3 (1.03 -> 5.43 s, SCALE.md round 13) -- the "
        "intrinsic input-property jump, not superlinearity in corpus size"
    ),
    "q274_theil_sen": (
        "the pairwise-slope table is Sigma n_g^2 by contract; the 10x dir "
        "adds 10x users at CONSTANT per-user density (measured: 1,500 -> "
        "15,000 users, max 99 events each), so pairs grow exactly 10x and "
        "time grew 3.5x min-of-3 (5.7 -> 20.1 s, SCALE.md round 13) -- "
        "sublinear per pair, linear overall"
    ),
    "q291_leakage_safe_split": (
        "composes q55's cluster pipeline verbatim (q55 adjudicated "
        "1.5 -> 4.2 s = 2.8x round 13: replica cliques grow the "
        "verified-edge mass superlinearly by the duplication profile); "
        "min-of-3 3.27 -> 8.77 s = 2.68x (SCALE.md round 14) -- the "
        "split close on top is edges-bounded"
    ),
    "q306_dbscan": (
        "epsilon-density pair-mass contract: the scale generator grows "
        "point count 10x on a FIXED 2^18 plane, so per-cell density and "
        "the grid-radius candidate mass grow ~100x (n^2 r^2/area) while "
        "time grew 11.4x min-of-3 (4.38 -> 49.8 s, SCALE.md round 15) -- "
        "sublinear in the pair mass; real deployments pick epsilon for "
        "the data's density (the sim-join threshold discipline)"
    ),
    "q155_keep_first_substring": (
        "same gram-table bound as q111 (k*tokens) plus one co-partitioned "
        "keep-first agg; dup saturation 10% -> 100% under replicas; "
        "min-of-3 1.63 -> 7.79 s = 4.8x (SCALE.md round 13)"
    ),
    "q311_k_core": (
        "fixed-round peeling contract: 6 rounds x O(|E|) degree+filter "
        "passes, so absolute cost is 6 full-graph sweeps by design while "
        "GROWTH is sublinear (round-16 sweep: 3.2 -> 10.7 s = 3.3x at "
        "10x data; after fusing the per-round edge/vertex counts into "
        "one agg, 17.7 -> 12.1 s same-phase min-of-3 at 10x) -- the "
        "multi-second absolute level is rounds x |E|, not a plan defect"
    ),
    "q234_bootstrap_ci": (
        "b/4 md5 digests PER ROW are the graded Monte-Carlo construction "
        "(the oracle replays every digest), so work is exactly linear in "
        "rows; round-17 idle min-of-3: 2.79 -> 8.69 s = 3.1x at 10x data "
        "(sublinear; r12 recorded 5.04 s at 10x on a faster host -- the "
        "8 s absolute arm trips on host speed, not on growth; the sf0.1 "
        "bare-digest floor measures 1.93 of the 2.11 s total)"
    ),
    "q305_encoding_advisor": (
        "two exact passes linear in n x |columns| by the declared cost "
        "model (range-partitioned run count under the caller's order + "
        "the distinct-set pass); round-17 idle min-of-3: 3.52 -> 9.77 s "
        "= 2.8x at 10x data -- sublinear, the 8 s arm trips on host "
        "speed (round-16 rebuilt this plan and measured the alternatives "
        "out: single-partition window 8.4x, Arrow kernel 2.6x slower)"
    ),
}


def ratio_flags(ok: dict) -> dict:
    """Superlinear candidates: 10x data costing >5x time AND a
    meaningful absolute cost — sub-second queries ratio-flag on pure
    noise/startup (q115 measured 0.52 -> 2.64 single-shot but
    0.61 -> 2.1 min-of-4: sublinear for 10x rows, not a hazard).
    Past 8 s absolute on the 10x side the gate tightens to 2.5x:
    a multi-second 2-3x mover (round 12's q164 5.0 -> 16.4 s,
    q166 5.8 -> 13.5 s) costs enough that it deserves the same
    min-of-3 adjudication the 5x movers get, even when plausibly
    intrinsic."""
    return {k: v for k, v in ok.items() if _ratio_bad(v["a"], v["b"])}


def _ratio_bad(a: float, b: float) -> bool:
    return (b > max(5 * a, a + 2) and b > 5) or (
        b > 8 and b > max(2.5 * a, a + 2)
    )


def abs_flags(
    ok: dict,
    medians: dict,
    factor: float = 3.0,
    prev_ratios: "dict | None" = None,
) -> dict:
    """ABSOLUTE anomalies the ratio gate can't see: a single-shot
    time on EITHER side that exceeds ``factor``x the query's headline
    bench median (where one exists) is suspicious even when the a/b
    ratio looks fine — round 11's q118 recorded 67.5 s at sf0.1
    (headline median ~23 s) and produced a 'good' 0.35x ratio that
    was never re-measured. The b-side check is the mirror image: a
    10x-side single-shot past ``factor`` x (median x the query's
    LAST-ADJUDICATED a->b ratio, from the previous sweep's min-of-3
    where present) means 10x-side noise is inflating this sweep's
    ratio unflagged. Flagged queries get the same min-of-3
    adjudication as ratio candidates."""
    prev_ratios = prev_ratios or {}
    flags = {}
    for k, v in ok.items():
        med = medians.get(k)
        if med and med > 0 and v["a"] > factor * med and v["a"] > 5:
            flags[k] = {"side": "a", "single_shot": v["a"], "headline_median": med}
        elif v["a"] > 2.5 * v["b"] and v["a"] > 5:
            # inverse-ratio anomaly, no median needed: 10x MORE data
            # running 2.5x FASTER means the small side's number is an
            # artifact (q118's exact shape: 67.5 s at sf0.1, 23.5 s
            # at 10x — a 'good' 0.35x ratio hiding a bad measurement)
            flags[k] = {"side": "a", "single_shot": v["a"], "b_side": v["b"]}
        elif (
            med
            and med > 0
            and prev_ratios.get(k)
            and v["b"] > factor * med * prev_ratios[k]
            and v["b"] > 5
        ):
            flags[k] = {
                "side": "b",
                "single_shot": v["b"],
                "headline_median": med,
                "last_adjudicated_ratio": round(prev_ratios[k], 3),
            }
    return flags


def load_prev_ratios(out_path: str) -> dict:
    """Per-query a->b ratios from the PREVIOUS sweep artifact (the
    b-side absolute gate's reference): min-of-3 numbers where that
    sweep adjudicated, raw single-shots otherwise. Empty when no
    prior sweep exists — the b-side gate stays quiet on first run."""
    if not os.path.exists(out_path):
        return {}
    try:
        prev = json.load(open(out_path))
    except Exception:  # noqa: BLE001
        return {}
    out = {}
    for k, v in prev.items():
        best = v.get("min_of_3") if isinstance(v, dict) else None
        src = best if isinstance(best, dict) else v
        a, b = src.get("a"), src.get("b")
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a > 0:
            out[k] = b / a
    return out


def load_headline_medians(repo_dir: str) -> dict:
    """Per-query sf0.1 medians (the sweep's a-side reference):
    prefer bench.py's full local record (_bench_latest.json); fall
    back to regex-scavenging the newest driver BENCH_r*.json, whose
    stdout tail is TRUNCATED and may start mid-JSON. Empty dict when
    neither exists — the absolute gate simply stays quiet."""
    import glob
    import re

    local = os.path.join(repo_dir, "_bench_latest.json")
    if os.path.exists(local):
        try:
            data = json.load(open(local))
            return {
                k: d.get("median")
                for k, d in (data.get("dispersion") or {}).items()
            }
        except Exception:  # noqa: BLE001
            pass
    benches = sorted(
        glob.glob(os.path.join(repo_dir, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    if not benches:
        return {}
    try:
        data = json.load(open(benches[-1]))
    except Exception:  # noqa: BLE001
        return {}
    parsed = data.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("dispersion"), dict):
        return {k: d.get("median") for k, d in parsed["dispersion"].items()}
    # dispersion entries are the only {"min": .., "median": ..} shapes
    # in the (possibly mid-JSON-truncated) stdout tail
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r'"(q\w+)":\s*\{"min":\s*[\d.]+,\s*"median":\s*([\d.]+)',
            str(data.get("tail", "")),
        )
    }


def main() -> None:
    a_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    b_dir = sys.argv[2] if len(sys.argv) > 2 else "./_scale_data/sf1"
    out = sys.argv[3] if len(sys.argv) > 3 else "./_sweep.json"

    from maston_spark.queries import all_queries
    from maston_spark.session import build_session

    prev_ratios = load_prev_ratios(out)
    qs = all_queries()
    spark = build_session("sweep-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    res: dict[str, dict[str, object]] = {}
    for sf_dir, tag in ((a_dir, "a"), (b_dir, "b")):
        for name in qs:
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt: object = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001 — a sweep must finish
                dt = f"ERR:{type(e).__name__}"
            res.setdefault(name, {})[tag] = dt
            print(f"{name}@{tag}: {dt}", flush=True)

    json.dump(res, open(out, "w"), indent=1)
    ok = {
        k: v
        for k, v in res.items()
        if isinstance(v.get("a"), float) and isinstance(v.get("b"), float)
    }
    tot_a = round(sum(v["a"] for v in ok.values()), 1)
    tot_b = round(sum(v["b"] for v in ok.values()), 1)
    print(f"TOTAL {a_dir}: {tot_a}s  {b_dir}: {tot_b}s")
    flagged = ratio_flags(ok)
    medians = load_headline_medians(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    anomalies = abs_flags(ok, medians, prev_ratios=prev_ratios)
    for k, info in anomalies.items():
        print(f"ABS-ANOMALY {k}: {json.dumps(info)}")
        flagged.setdefault(k, ok[k])
    # Single-shot flags are CANDIDATES, not verdicts: iterative /
    # multi-stage queries pay per-iteration codegen on their first
    # run at a new data size (round 11: q123 flagged 1.54->11.75
    # single-shot, measured 1.71->1.84 min-of-3 — flat). Re-measure
    # every flagged query min-of-3 before declaring it an outlier.
    bad = {}
    adjudicated = {}
    for k in flagged:
        adj = {}
        for sf_dir, tag in ((a_dir, "a"), (b_dir, "b")):
            qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
            adj[tag] = round(
                min(
                    (
                        lambda t0: (
                            qs[k](spark, sf_dir)
                            .write.format("noop")
                            .mode("overwrite")
                            .save(),
                            time.perf_counter() - t0,
                        )[1]
                    )(time.perf_counter())
                    for _ in range(3)
                ),
                3,
            )
        print(f"ADJUDICATE {k}: single-shot {flagged[k]} -> min-of-3 {adj}")
        adjudicated[k] = adj
        if _ratio_bad(adj["a"], adj["b"]):
            if k in JUSTIFIED:
                print(f"JUSTIFIED {k}: {JUSTIFIED[k]} ({adj})")
            else:
                bad[k] = adj
    # persist adjudications next to the raw single-shots so the
    # recorded artifact carries the corrected numbers, not just the
    # noisy flags
    for k, adj in adjudicated.items():
        res[k]["min_of_3"] = adj
    json.dump(res, open(out, "w"), indent=1)
    print("OUTLIERS:", json.dumps(bad))
    errs = {k: v for k, v in res.items() if k not in ok}
    print("ERRORS:", json.dumps(errs))
    if bad or errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
