"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line.

Execution is materialized through the no-op sink so timings measure
distributed compute, not driver-side row collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",   # scan + hash agg
    "q03_join_inner",        # broadcast join + agg
    "q11_join_range",        # equi+range join
    "q12_asof_join",         # as-of via single-shuffle window
    "q20_window_rank",       # ranking windows
    "q41_dedup_minhash_lsh", # MinHash-LSH fuzzy dedup
    "q43_cosine_topk",       # embedding similarity
    "q45_text_stats",        # text analysis
    "q48_embedding_neardup", # adaptive-LSH embedding near-dup (heavy ANN path)
    "q55_dup_clusters",      # connected components (iterative)
    "q63_delta_expr",        # maston delta operator (expr path)
    "q79_market_share",      # 6-way join (heaviest relational plan)
    # round-8 additions: the new heavy flagships
    "q90_winnow_fingerprints",  # winnowing (sharded windows, chunk-level repartition)
    "q94_semantic_dedup",       # SemDeDup (blockwise keep-one)
    "q100_dsir_weights",        # DSIR hashed bag-of-words importance weights
    "q104_embedding_covariance",# exact d x d covariance (pair generator)
    # round-8 closers
    "q15_agg_percentile",       # distributed order statistics (exact_percentiles)
    "q123_bm25_rank",           # BM25 lexical retrieval (filter-before-explode)
    "q127_budget_select",       # global token-budget cut (two-phase prefix sum)
    "q140_waiting_supplier",    # TPC-H Q21 shape (fact semi+anti join chain)
    # round-9 additions: the new flagships
    "q153_ivf_pq",              # composed IVF-PQ ANN (cells + codes + ADC)
    "q157_hybrid_rrf",          # hybrid retrieval (BM25 x QL rank fusion)
    "q158_ivfpq_residual",      # residual-encoded IVF-PQ (faiss layout)
    "q168_kmv_set_ops",         # KMV sketch set-op estimation (bounded memory)
    "q172_dup_transitivity",    # degree-oriented triangle census (dup graph)
    "q174_pareto_frontier",     # skyline selection (local-prune + confirm)
    "q178_ks_drift",            # KS drift (integer-scaled, bounded grid)
    # round-10 additions: the most expensive catalog member (fused),
    # the counter/moment sketch family, and the quantile sketches
    "q181_join_planning",       # fused multi-key sketch profile (1 pass/table)
    "q173_mg_heavy_hitters",    # Misra-Gries frequent items (2-pass exact)
    "q176_ams_f2",              # AMS F2 moment sketch (single-md5 lanes)
    "q191_quantile_sketch",     # bottom-k hash-sample quantiles (bit-exact)
    "q192_kll_quantiles",       # genuine KLL (partials + per-group merge)
    "q193_funnel_attribution",  # funnel drop attribution (shared window)
    "q194_binned_tvd_drift",    # PSI-shape drift (exact L1 over decile bins)
    "q195_incremental_neardup", # batch twin of streaming near-dup state
    # round-11 additions: the fused table profile, weighted order
    # statistics, and the sketch-SOLO rows (q191/q192 minus their
    # exact-order-statistics oracle garnish — these carry the
    # operators' true data ratios; the graded twins' ratios are
    # dominated by the per-group sort that exists only for grading)
    "q196_table_sketch_profile",  # single-scan per-table sketch pre-flight
    "q197_weighted_percentiles",  # token-weighted order statistics
    "q198_quantile_sketch_solo",  # bottom-k sample sketch, no garnish
    "q199_kll_sketch_solo",       # KLL folds + weight check, no garnish
    # round-12 additions: the newly graded round-11 physics
    "q206_scd2_history",          # SCD2 gaps-and-islands construction
    "q207_salted_join",           # skew-salted join (identity-graded)
    "q208_ts_pattern_search",     # pattern correlation top-k
    "q212_group_auc",             # exact rank-form AUC (midranks)
    "q217_join_size_estimate",    # AMS join-size prediction
    # round-12 second half: the newly graded round-12 physics
    "q226_trimmed_mean",          # value-histogram trimmed/winsorized stats
    "q230_hll_cube",              # HLL rollup cube (register-max mergeability)
    "q234_bootstrap_ci",          # deterministic Poisson bootstrap (b/4-block md5)
    "q241_jackknife_ratio",       # leave-one-bucket-out ratio CI
    "q244_bloom_pruned_join",     # runtime-filter semi-join reduction
    "q246_kaplan_meier",          # product-limit survival curve
    # round-13 additions: the newly graded round-12 physics and the
    # round's own flagships
    "q254_conformal_interval",    # finite-sample order-statistic bound
    "q227_ipf_raking",            # fixed-point IPF margin replay
    "q264_bh_fdr",                # BH step-up over the two-phase rank
    "q265_kendall_tau",           # bounded all-pairs tau-b
    "q268_quantile_normalize",    # pooled order-statistic normalization
    "q269_spatial_grid_join",     # grid-blocked spatial radius join
    "q272_cusum_prefix",          # CUSUM monitor fold twin
    # round-14 additions: the newly graded round-13 physics and the
    # round's own flagships
    "q274_theil_sen",             # bounded all-pairs robust slope (Σn_g²)
    "q284_davies_bouldin",        # cluster-quality audit (Lloyd fit + k close)
    "q286_isotonic_calibration",  # integer-nano PAV minimax
    "q291_leakage_safe_split",    # cluster-split certification (q55 pipeline)
    "q293_voptimal_histogram",    # exact-integer interval DP
    # round-15 additions: the round's own flagships
    "q297_hits",                  # HITS iteration replay (graph pair to q118)
    "q298_selectivity_audit",     # true-vs-estimated optimizer statistics
    "q300_ewma_trend",            # nano-lane truncated EWMA fast/slow
    "q302_ips_offpolicy",         # IPS/SNIPS off-policy value + ESS
    "q303_contamination_prefix",  # tenth-topology contamination fold twin
    "q304_wasserstein_drift",     # earth-mover drift over the CDF grid
    "q305_encoding_advisor",      # plain/dict/RLE storage cost model
    "q306_dbscan",                # grid-blocked density clustering
]

# Fixed-work calibration (data-independent): a pure JVM codegen loop
# whose cost depends only on host speed. Cross-round bench deltas on
# untouched code have twice been adjudicated as host drift
# (VERDICT r10); this row lets any round normalize recorded numbers
# by host speed instead of re-measuring per query.
_CALIBRATION_N = 2_000_000_000  # ~0.5 s on the round-11 host: big
# enough to resolve host-speed drift, small enough to not tax the run

# 1-min loadavg ABOVE this at bench start marks the record invalid
# for cross-round comparison: an idle host reads ~0-0.5; anything
# past ~2 means a concurrent workload owned whole cores for a
# meaningful slice of the last minute (the r13/r14 contended records
# started at 11-19)
_LOADAVG_VALID_MAX = 2.0


def bench_valid(load_start) -> bool:
    """True when a record's pre-run loadavg marks an idle-enough host
    for its raw seconds to be quotable cross-round (see BASELINE.md:
    cross-round comparison = raw min-of-N on valid records only)."""
    return load_start is None or load_start[0] <= _LOADAVG_VALID_MAX


def _calibration_sec(spark) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(_CALIBRATION_N).selectExpr(
            "sum(id * 2654435761 % 1000000007) AS s"
        ).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    from maston_spark.queries import all_queries
    from maston_spark.session import build_session

    # pre-run loadavg: captured BEFORE the bench's own threads ramp
    # up, so it reflects pre-existing host activity (the bench itself
    # drives the 1-min average toward the core count as it runs)
    try:
        load_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_start = None

    qs = all_queries()
    spark = build_session("maston-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin up executors/codegen so q1 isn't charged JVM start,
    # and the Arrow Python workers so the first pandas-UDF query isn't
    # charged worker-pool start
    qs["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    import gc

    timings: dict[str, float] = {}
    dispersion: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        # isolate queries from each other: q55's localCheckpoint
        # lineage cuts and any cached batches stay live until the
        # driver GC drops their references, inflating whatever runs
        # next (measured: q63 0.31s isolated vs 1.08s right after
        # q55). Clearing between queries measures steady-state cost
        # of THIS query, not the previous query's residue.
        spark.catalog.clearCache()
        gc.collect()
        # per-query untimed warmup: the first execution of a plan is
        # charged its own codegen/JIT compilation (measured ~2x on the
        # window/delta family — q63 1.36s first run vs 0.56s steady
        # state), which is startup cost, not query cost
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs: list[float] = []
        for _ in range(4):  # 4 timed runs: steady-state, robust to host noise
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        # dispersion per query so round-over-round deltas can be
        # attributed: a shifted MIN with a stable spread is a real
        # regression; min+median both drifting with a wide spread is
        # host noise (see SCALE.md bench-variance note)
        dispersion[name] = {
            "min": round(runs[0], 3),
            "median": round((runs[1] + runs[2]) / 2, 3),
            "spread": round(runs[-1] - runs[0], 3),
        }

    total = round(sum(timings.values()), 3)
    calib = _calibration_sec(spark)
    # host-contention fingerprint: the round-13 bench recorded 4-8x
    # inflated heavy rows because ANOTHER process shared the cores
    # (SCALE.md round-14 adjudication). A pre-run 1-min loadavg well
    # above ~0 (idle) — or an end loadavg well above the bench's own
    # core count — marks the run contended, so the per-query numbers
    # are NOT the quotable ones (SCALE.md min-of-3 is)
    try:
        load_end = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_end = None
    # calibration-normalized medians: each query's median divided by
    # the fixed-work calibration time, so cross-round comparisons are
    # host-independent by construction (a host 20% slower inflates
    # both numerator and denominator; the ratio is invariant)
    queries_norm = {
        n: round(dispersion[n]["median"] / calib, 3) for n in timings
    }
    # machine-checked validity (round-14 verdict): a pre-run 1-min
    # loadavg above ~2 means another process shared the cores while
    # this record was taken — its per-query seconds must not feed
    # cross-round comparison (r13's contended calibration divisor
    # inverted the r13→r14 normalized trend while raw idle seconds
    # improved on every query). Cross-round comparison uses raw
    # min-of-N seconds from records with valid=true only (BASELINE.md).
    valid = bench_valid(load_start)
    record = {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "dispersion": dispersion,
                "calibration": {
                    "key": "range_mulmod_sum_2e9",
                    "n": _CALIBRATION_N,
                    "sec": calib,
                },
                "queries_norm_by_calibration": queries_norm,
                "value_norm_by_calibration": round(total / calib, 3),
                "loadavg": {"start": load_start, "end": load_end},
                "valid": valid,
                "sf": sf,
            }
    # full local copy: the driver's BENCH_r*.json keeps only a
    # truncated stdout tail; the sweep's absolute-anomaly flagger
    # reads per-query medians from here
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "_bench_latest.json"),
            "w",
        ) as f:
            json.dump(record, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout is still the contract
    # round-17 (VERDICT r16 "what's wrong" #2): the driver's r15
    # record line failed to parse (prev_sec: null for every query in
    # PERF_r16), so guarantee the record is the LAST stdout line and
    # is flushed: stop the session first (log4j writes to stderr, but
    # a JVM teardown racing a buffered stdout write is the one thing
    # that can corrupt the line), then print exactly one JSON line.
    try:
        spark.stop()
    except Exception:
        pass
    sys.stdout.flush()
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
