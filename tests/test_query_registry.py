"""Query-registry integrity guards (restored after the file was
repurposed for the Schema Registry client).

A single dangling import or phantom _PRIORITY entry in the query
registry takes down EVERY official gate at once (the driver imports
the registry before grading anything), so these checks run first and
fast: no Spark session, no data, just the contract between
__spark_entry__ and the registry.
"""

from __future__ import annotations


def test_registry_imports_and_is_nonempty():
    from maston_spark.queries import all_oracles, all_queries

    qs, osql = all_queries(), all_oracles()
    assert len(qs) >= 70
    assert set(osql) <= set(qs)


def test_priority_list_has_no_phantom_entries():
    """Every name in _PRIORITY must be REGISTERED — a priority entry
    for a query that doesn't exist means a planned module was never
    written (or an import silently vanished)."""
    from maston_spark.queries import _PRIORITY, REGISTRY, load_all_query_modules

    load_all_query_modules()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"_PRIORITY names with no registered query: {missing}"


def test_priority_list_covers_entire_registry():
    """Declared order drives grading, so the declared list must cover
    the WHOLE registry (no query graded only by accident of Python
    import order) and contain no duplicates — the graded window is a
    strict prefix of _PRIORITY by construction."""
    from maston_spark.queries import _PRIORITY, REGISTRY, load_all_query_modules

    load_all_query_modules()
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate _PRIORITY entries"
    unlisted = sorted(set(REGISTRY) - set(_PRIORITY))
    assert not unlisted, f"registered queries missing from _PRIORITY: {unlisted}"
    assert len(_PRIORITY) == len(REGISTRY)


def test_entry_module_contract():
    import __spark_entry__ as m

    assert callable(m.entry)
    qs = m.queries()
    osql = m.oracle_sql()
    assert len(qs) >= 70
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # every callable has the (spark, sf_dir) arity
    import inspect

    for name, fn in qs.items():
        assert len(inspect.signature(fn).parameters) == 2, name


def test_oracles_are_parseable_sql():
    """Cheap static sanity on every oracle: DuckDB can PREPARE it
    against empty views with the right names (catches typos/synax
    without running Spark)."""
    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    # minimal column surface used by the oracles
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet') LIMIT 0")
    bad = {}
    for name, sql in m.oracle_sql().items():
        try:
            con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e)[:120]
    assert not bad, f"oracles that fail to parse/bind: {bad}"


def test_graded_window_covers_unique_capabilities():
    """The driver grades the FIRST 50 registered queries. Pin that
    every unique capability sits inside that window — schema
    evolution (q87), produce-side framing round-trip (q92), domain
    quotas (q88), winnowing (q90), semantic dedup (q94) — and that
    only within-family siblings of already-graded flagships sit
    outside it."""
    from maston_spark.queries import all_queries

    window = list(all_queries())[:50]
    for must in (
        "q87_avro_evolution",
        "q139_gapfill", "q141_data_quality",
        # round-9 promotions: the novel round-8 operators plus the
        # composed IVF-PQ flagship are driver-graded; (round-16:
        # q143's slot rotated to q311 — the latest-row apply stays
        # graded via q206's SCD2 construction)
        "q152_dedup_report",
        # round-10 promotions: round-9's novel physics — keep-first
        # substring removal, hybrid rank fusion, residual IVF-PQ
        "q155_keep_first_substring",
        "q158_ivfpq_residual",
        # round-10 promotions: dup-graph transitivity; (round-16:
        # KS drift's slot rotated to q310 — the shared CDF census
        # stays graded via q304's Wasserstein fold)
        "q172_dup_transitivity",
        # round-10 promotions still graded: the XOR-fold table
        # fingerprint and token-weighted water-fill allocation
        "q185_table_fingerprint",
        "q189_token_water_fill",
        # round-11 promotions: round-10's ungraded novel physics —
        # KLL rank-error-contract grading, incremental near-dup (the
        # batch twin of the streaming curation state), binned-TVD
        # drift, the single-scan table sketch profile (now with
        # operator-owned float canonicalization), and token-weighted
        # order statistics
        "q192_kll_quantiles",
        # round-11 in-round promotions: the round's own novel physics
        # graded immediately rather than waiting a round — HLL (third
        # distinct-count physics), the brute-force-ground-truth-graded
        # complete similarity join, and submodular greedy coverage
        "q203_exact_simjoin", "q204_greedy_coverage",
        # round-12 in-round promotion: covariate-adjusted experiment
        # readout (pooled-regression grading physics)
        "q221_cuped",
        # round-12 promotions: round-11's ungraded novel physics —
        # SCD2 history construction, the salted-join identity claim,
        # fixed-IEEE-sequence pattern correlation, integer-midrank
        # AUC, and AMS join-size prediction
        "q206_scd2_history",
        "q208_ts_pattern_search", "q212_group_auc",
        "q217_join_size_estimate",
        # (round-16: q226's second-wave slot rotated to q305 — the
        # rank-math family stays via q192+q274)
        # round-12 third wave: jackknife ratio CI (correlated-ratio
        # variance); (round-16: KM's slot rotated to q309 — the
        # product-limit replay stays graded inside its prefix)
        "q241_jackknife_ratio",
        # round-13 promotions: round-12's ungraded novel physics —
        # the Bloom-pruned runtime-filter join's bit-equality identity
        # claim, the split-conformal finite-sample order statistic,
        # NDCG/MRR's mirrored-literal log discounts, IPF raking's
        # fixed-point IEEE+round replay, and the streaming-SRM prefix
        # twin that completes the topology-twin matrix
        "q244_bloom_pruned_join", "q254_conformal_interval",
        "q227_ipf_raking",
        # round-13 in-round promotions: the round's own novel physics
        # graded immediately — the BH step-up multiple-testing
        # boundary (integer-domain compares over the two-phase global
        # rank), the grid-blocked spatial radius join (a candidate-
        # generation physics the catalog had nowhere else), and the
        # CUSUM monitor's additive-fold twin (seventh topology row)
        # (round-16: q272's slot rotated to q314 — the additive fold
        # identity stays graded via q303/q231)
        "q264_bh_fdr", "q269_spatial_grid_join",
        # round-14 promotions: round-13's ungraded novel physics plus
        # the round-12 carryover pair — survivorship golden-record
        # repair provenance, the rolling-HLL incremental-equals-one-
        # shot topology claim, the one-histogram Mann-Whitney rank
        # sum (property-tied to group_auc), Theil-Sen's integer-
        # rational determinism discipline, and the brute-force-
        # certified Apriori downward-closure prune
        "q251_golden_record", "q231_hll_rolling_prefix",
        # (round-16: q259's slot rotated to q313 — the U statistic
        # is q212's midrank AUC by identity)
        "q274_theil_sen",
        "q276_frequent_triples",
        # round-14 in-round promotions: the round's own novel physics
        # graded immediately — the Davies-Bouldin cell audit
        # (centroid-based cluster-quality, the gate in front of
        # graded q94's deletions) and isotonic calibration's
        # integer-nano interval minimax
        "q284_davies_bouldin", "q286_isotonic_calibration",
        # round-15 promotions (round-14 verdict task 3): round-14's
        # ungraded novel physics — the exact-integer interval DP
        # (optimizer statistics), the third causal lens (threshold
        # RD), the ninth topology's fold-identity twin (grades both
        # the k/l audit math and the additive cell-count state
        # discipline), the Qini uplift curve, and the min/max-agg
        # existential precedence census
        # (round-16: the q292/q296/q288 slots rotated to
        # q308/q304/q306, and q293's to q312 — families held per
        # the sibling map below)
        "q294_qini_uplift",
        # round-15 in-round promotions: the round's own novel physics
        # graded immediately — Selinger-lite join-order enumeration
        # (the optimizer-trilogy member the statistics exist for),
        # HITS's two-vector iteration replay, and the TENTH
        # topology's contamination-gate fold identity
        # (round-16: q307's slot rotated to q298 — the optimizer
        # trilogy keeps the containment arithmetic graded)
        "q297_hits",
        "q303_contamination_prefix",
        # round-16 promotions (round-15 verdict task 1): round-15's
        # never-driver-graded novel physics — the histogram
        # selectivity audit (estimated-vs-true row error), the
        # Wasserstein-1 mass×distance drift geometry, the encoding
        # advisor's exact byte-cost model under the pinned two-phase
        # run count, grid-blocked DBSCAN with the first-class noise
        # row, and Nelson-Aalen's additive cumulative hazard
        "q298_selectivity_audit", "q304_wasserstein_drift",
        "q305_encoding_advisor", "q306_dbscan",
        "q308_nelson_aalen",
        # round-16 in-round promotion: the round's own novel physics
        # graded immediately — Aalen-Johansen competing-risks
        # cumulative incidence (the product×hazard fold partitioning
        # 1−S(t) across causes; KM's ln-lane replay runs verbatim
        # inside its survival prefix)
        "q309_aalen_johansen",
        # round-16 in-round promotion: Shapley channel attribution —
        # exact-rational factorial-weighted coalition credit, the
        # principled split beside q193's last-touch
        "q310_shapley_attribution",
        # round-16 in-round promotion: the k-core peeling census
        "q311_k_core",
        # round-16 in-round promotion: the zone-map skipping audit
        "q312_zone_map_audit",
        # round-16 in-round promotion: Fellegi-Sunter linkage weights
        "q313_fs_linkage",
        # round-16 in-round promotion: the AMS join-size fold twin
        # (ELEVENTH topology)
        "q314_ams_prefix",
    ):
        assert must in window, must
    # demoted siblings: each has a same-family flagship in the window
    siblings = {
        "q36_drop_duplicates": "q63_delta_expr",
        "q46_lang_id": "q155_keep_first_substring",
        "q62_safe_serialize": "q87_avro_evolution",
        # q45's length/punct/regexp text family is graded via the
        # gopher rule battery, which computes the same statistics;
        # q73's registry-dispatch decode is graded via q87+q92
        "q45_text_stats": "q155_keep_first_substring",
        "q73_safe_avro": "q87_avro_evolution",
        "q167_kmv_distinct": "q231_hll_rolling_prefix",
        # q61's topology-1 pipeline runs the same safe_from_json
        # parse; q152 composes q41's minhash pipeline verbatim; q48's
        # exact-confirm stage grades normalized-dot cosine physics
        "q60_safe_json": "q61_process_errors",
        "q41_dedup_minhash_lsh": "q152_dedup_report",
        "q43_cosine_topk": "q158_ivfpq_residual",
        # q48's bucketed-candidates + exact-confirm physics stays
        # graded four ways (q153/q158/q152/q94); its slot grades the
        # quantile sketch
        "q48_embedding_neardup": "q158_ivfpq_residual",
        "q175_cusum_changepoint": "q304_wasserstein_drift",
        "q99_chunk_overlap": "q189_token_water_fill",
        "q57_ivf_ann": "q158_ivfpq_residual",
        "q22_window_frames": "q212_group_auc",
        "q67_exists_subquery": "q07_join_semi",
        "q71_in_subquery": "q07_join_semi",
        "q101_lexical_diversity": "q155_keep_first_substring",
        "q59_source_mix": "q189_token_water_fill",
        "q58_hash_split": "q189_token_water_fill",
        "q64_delta_fold": "q63_delta_expr",
        "q70_customer_distribution": "q03_join_inner",
        "q72_uncorrelated_scalar": "q264_bh_fdr",
        "q34_sliding_window": "q63_delta_expr",
        "q35_session_window": "q63_delta_expr",
        "q42_dedup_simhash": "q152_dedup_report",
        "q44_lsh_ann": "q158_ivfpq_residual",
        # round-10 demotions: each family stays graded via the
        # composition that subsumes it
        "q40_dedup_exact": "q152_dedup_report",
        "q150_pq_codes": "q158_ivfpq_residual",
        "q151_pq_adc": "q158_ivfpq_residual",
        "q156_query_likelihood": "q155_keep_first_substring",
        "q47_fingerprint": "q152_dedup_report",
        "q23_topk_per_group": "q212_group_auc",
        "q51_quality_score": "q155_keep_first_substring",
        # round-10 demotions: scalar string/json fns are exercised by
        # the regexp/substring-heavy graded gopher battery + keep-
        # first removal; the TPC-H multi-join-agg family stays graded
        # via q01/q03/q07/q19; multimodal Arrow-batch plumbing shares
        # physics with q94/q119's pandas kernels; edit-distance
        # near-dup confirm is graded via q152's pipeline; DSIR's
        # n-gram-LM scoring is graded via q96+q123
        "q26_string_fns": "q155_keep_first_substring",
        "q31_json_fns": "q155_keep_first_substring",
        "q65_shipping_priority": "q03_join_inner",
        "q66_local_supplier_volume": "q03_join_inner",
        "q49_media_features": "q284_davies_bouldin",
        "q50_frame_sample": "q284_davies_bouldin",
        "q53_levenshtein_neardup": "q152_dedup_report",
        "q54_chargram_jaccard": "q152_dedup_report",
        "q100_dsir_weights": "q155_keep_first_substring",
        # round-11 demotions: the percentile family stays graded via
        # q15 + the promoted q197; the n-gram-LM scoring family via
        # q123/q157; the moment-sum family via q176 + promoted q196;
        # the anti-join rewrite is the mirror of q07's semi-join
        # physics; the allocation family via q189's water-fill
        "q128_robust_outliers": "q274_theil_sen",
        "q96_bigram_perplexity": "q155_keep_first_substring",
        "q104_embedding_covariance": "q217_join_size_estimate",
        "q68_not_exists_antijoin": "q07_join_semi",
        "q88_domain_cap": "q189_token_water_fill",
        # round-11 in-round swaps: the span-dedup gram-table family
        # stays graded via the keep-first policy member; incremental
        # dedup-vs-corpus via the richer band-state near-dup twin;
        # Lloyd iterations inside the graded IVF-PQ end-to-end
        "q95_exact_substring": "q155_keep_first_substring",
        "q98_bloom_incremental": "q152_dedup_report",
        "q119_kmeans": "q158_ivfpq_residual",
        # round-12 demotions: as-of join's latest-row-before-timestamp
        # physics stays graded via the CDC apply; tumbling via the
        # durable delta topology; scalar subquery via the two-phase
        # global-threshold planners; KMV set ops via HLL; winnowing
        # via the gram-table substring family
        "q12_asof_join": "q206_scd2_history",
        "q33_tumbling_window": "q63_delta_expr",
        "q69_scalar_subquery": "q264_bh_fdr",
        "q168_kmv_set_ops": "q231_hll_rolling_prefix",
        "q90_winnow_fingerprints": "q155_keep_first_substring",
        # round-12 in-round swap: q153's composed IVF-PQ stages all
        # run inside the graded residual variant
        "q153_ivf_pq": "q158_ivfpq_residual",
        # round-12 second-wave demotions: token-weighted order stats
        # stay graded via the value-histogram trimmed/winsorized
        # member (same cumulative-multiplicity rank math, harder
        # policy); the bit-exact quantile sketch via the KLL
        # rank-contract member; LSH-pair attribution via the cluster/
        # transitivity/report trio; skyline selection via the budget
        # planners; rank fusion via BM25 scoring + global midranks
        "q197_weighted_percentiles": "q192_kll_quantiles",
        "q191_quantile_sketch": "q192_kll_quantiles",
        "q171_source_dup_matrix": "q172_dup_transitivity",
        "q174_pareto_frontier": "q204_greedy_coverage",
        "q157_hybrid_rrf": "q212_group_auc",
        # round-12 third-wave demotions: rank-window physics exercised
        # inside four graded members; the AMS F2 sketch composed
        # verbatim inside the graded join-size forecast
        "q20_window_rank": "q212_group_auc",
        "q176_ams_f2": "q217_join_size_estimate",
        # round-13 demotions: the Gopher rule battery's scalar text
        # statistics stay graded via the gram-table substring member
        # (regexp/word/length physics); Misra-Gries via the count-min
        # broadcast-probe member; the fused profile via the HLL
        # estimator it embeds; transition lift and Chao1 are one-agg
        # integer families kept by the graded inference folds
        # round-13 in-round demotions
        "q25_set_ops": "q07_join_semi",
        "q127_budget_select": "q264_bh_fdr",
        "q202_hll_distinct": "q231_hll_rolling_prefix",
        "q148_gopher_gate": "q155_keep_first_substring",
        "q173_mg_heavy_hitters": "q231_hll_rolling_prefix",
        "q196_table_sketch_profile": "q231_hll_rolling_prefix",
        "q235_transition_lift": "q241_jackknife_ratio",
        "q237_chao1_vocab": "q241_jackknife_ratio",
        # round-14 demotions: q01's scan+hash-agg pipeline is the
        # most-replicated physics in the window (every relational
        # flagship runs it); q15's exact order statistics stay graded
        # via the value-histogram trimmed member; q194's binned-L1
        # drift via the KS sup-norm member; q169's mergeable-sketch
        # algebra via the HLL register cube (+ q217's AMS folds);
        # q92's Confluent wire framing via the evolution round-trip
        # that composes the same encode/decode dispatch
        "q01_pricing_summary": "q19_grouping_sets",
        "q15_agg_percentile": "q192_kll_quantiles",
        "q194_binned_tvd_drift": "q304_wasserstein_drift",
        "q169_cms_heavy_hitters": "q231_hll_rolling_prefix",
        "q92_avro_roundtrip": "q87_avro_evolution",
        # round-14 in-round demotions: q207's rewrite-certified-
        # bit-identical grading shape stays via q244's Bloom-pruned
        # identity claim; q195's streaming-equals-batch fold-twin
        # discipline via the rolling-HLL prefix twin (with q250/q272
        # as further graded members) and its dedup physics via q152
        "q207_salted_join": "q244_bloom_pruned_join",
        "q195_incremental_neardup": "q231_hll_rolling_prefix",
        # the silhouette half of the round-14 cluster audit stays
        # graded through the Davies-Bouldin member's shared fit
        "q285_silhouette": "q284_davies_bouldin",
        # round-15 demotions (round-14 verdict task 3): each family's
        # in-window flagship — rank metrics via the midrank AUC,
        # retrieval tf scoring via the gram-table text battery,
        # register-max sketch algebra via the rolling-HLL twin,
        # resampling inference via the jackknife ratio, and the
        # fold-identity family via the CUSUM prefix twin
        "q242_ndcg_mrr": "q212_group_auc",
        "q123_bm25_rank": "q155_keep_first_substring",
        "q230_hll_cube": "q231_hll_rolling_prefix",
        "q234_bootstrap_ci": "q241_jackknife_ratio",
        "q250_srm_prefix": "q303_contamination_prefix",
        # round-15 in-round demotions: q02's scan/filter predicate
        # battery runs inside every graded join composite; q118's
        # iteration-replay discipline runs verbatim (richer) in
        # q297; q94's Lloyd fit is graded via q284's shared-CTE
        # audit and its deletion physics via q152
        "q02_filter_predicates": "q03_join_inner",
        "q118_pagerank": "q297_hits",
        "q94_semantic_dedup": "q284_davies_bouldin",
        # round-16 demotions (round-15 verdict task 1): q307's
        # containment pricing is replayed by q298's audit + q217's
        # sketch forecast; q288's per-entity ordered-event census via
        # q208's pattern windows; q226's cumulative-multiplicity rank
        # math via q192's KLL contract (robust family via q274);
        # q296's additive fold identity via q272 + the q303 twin;
        # q292's causal threshold lens via q294 + q221
        "q307_join_order_plan": "q298_selectivity_audit",
        "q288_precedence_census": "q208_ts_pattern_search",
        "q226_trimmed_mean": "q192_kll_quantiles",
        "q296_k_anonymity_prefix": "q303_contamination_prefix",
        "q292_regression_discontinuity": "q294_qini_uplift",
        # round-16 in-round demotion: q246's product-limit ln/exp
        # replay runs verbatim inside q309's S(t−) prefix, and the
        # shared risk-set census is graded by q308's hazard lanes
        "q246_kaplan_meier": "q309_aalen_johansen",
        # round-16 in-round demotion: the KS sup-norm reads off the
        # same merged-grid CDF census q304's Wasserstein fold grades
        "q178_ks_drift": "q304_wasserstein_drift",
        # round-16 in-round demotion: the CDC apply's latest-row
        # physics runs inside the SCD2 history construction
        "q143_cdc_upsert": "q206_scd2_history",
        # round-16 in-round demotion: the v-optimal DP runs verbatim
        # inside the selectivity audit's statistics branch
        "q293_voptimal_histogram": "q298_selectivity_audit",
        # round-16 in-round demotion: U = AUC·n₀n₁ — the rank-sum
        # physics is the graded midrank AUC by identity
        "q259_mann_whitney": "q212_group_auc",
        # round-16 in-round demotion: the additive-counter fold
        # discipline stays graded via the contamination twin (and
        # q231's register fold); the new q314 grades it for AMS
        "q272_cusum_prefix": "q303_contamination_prefix",
    }
    for demoted, flagship in siblings.items():
        assert demoted not in window, demoted
        assert flagship in window, flagship
