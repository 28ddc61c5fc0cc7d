

def test_fd_and_information_gain_reject_empty_input_lists(spark):
    """pairs=[] / feature_cols=[] is a caller bug: fail loud with
    ValueError instead of a bare IndexError from outs[0]
    (round-14 ADVICE fix)."""
    import pytest

    from maston_spark.profiling import fd_violations, information_gain

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="at least one"):
        fd_violations(df, [])
    with pytest.raises(ValueError, match="at least one"):
        information_gain(df, "a", [])


def test_information_gain_ranks_the_leaky_feature_first(spark):
    """A feature that restates the label has nmi 1 and tops the mi
    ranking; an independent feature sits near 0."""
    from maston_spark.profiling import information_gain

    rows = []
    for i in range(400):
        label = "pos" if i % 4 == 0 else "neg"
        # (i % 8) // 4 is exactly independent of (i % 4 == 0)
        rows.append((label, label.upper(), "c" + str((i % 8) // 4)))
    df = spark.createDataFrame(rows, "y string, leak string, coin string")
    out = {r.feature: r for r in information_gain(df, "y", ["leak", "coin"]).collect()}
    assert out["leak"].nmi == 1.0
    assert out["leak"].mi > out["coin"].mi
    assert abs(out["coin"].mi) < 1e-6


def test_k_anonymity_audit_hand_case(spark):
    """Hand-built classes: sizes {1, 2, 3} with sensitive diversity
    {1, 1, 2}: k_min=1, l_min=1, unique share 1/6, below-k2 share
    1/6, below-k5 share 1 (all classes < 5), l1 share (1+2)/6."""
    import pytest

    from maston_spark.profiling import k_anonymity_audit

    rows = [
        ("a", 1, 100),                      # class A: k=1, l=1
        ("b", 1, 200), ("b", 1, 200),       # class B: k=2, l=1
        ("c", 2, 300), ("c", 2, 400), ("c", 2, 300),  # class C: k=3, l=2
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 int, sv int")
    [r] = k_anonymity_audit(df, ["q1", "q2"], "sv").collect()
    assert (r.n_rows, r.n_classes, r.k_min, r.l_min) == (6, 3, 1, 1)
    assert r.rows_unique_share == 0.166667
    assert r.rows_below_k2_share == 0.166667
    assert r.rows_below_k5_share == 1.0
    assert r.rows_below_k10_share == 1.0
    assert r.rows_l1_share == 0.5
    with pytest.raises(ValueError, match="at least one"):
        k_anonymity_audit(df, [], "sv")


def test_voptimal_histogram_matches_bruteforce_dp(spark):
    """4-bucket DP on a spiky weighted grid equals the brute-force
    enumeration of all boundary triples (exact integer SSE, floor
    grid), and an isolated heavy spike gets its own bucket."""
    from itertools import combinations

    from maston_spark.profiling import voptimal_histogram

    vals = [(1, 5), (2, 5), (3, 5), (50, 20), (51, 20), (90, 3), (91, 3), (200, 1)]
    rows = [(v,) for v, w in vals for _ in range(w)]
    df = spark.createDataFrame(rows, "v long")
    out = voptimal_histogram(df, "v", n_buckets=4).collect()
    assert [r.bucket for r in out] == [1, 2, 3, 4]

    def sse(seg):
        n = sum(w for _, w in seg)
        s = sum(v * w for v, w in seg)
        s2 = sum(v * v * w for v, w in seg)
        return (n * s2 - s * s) // n

    m = len(vals)
    best = None
    for cuts in combinations(range(1, m), 3):
        e = [0, *cuts, m]
        tot = sum(sse(vals[a:b]) for a, b in zip(e, e[1:]))
        key = (tot, cuts)
        if best is None or key < best:
            best = key
    tot, cuts = best
    e = [0, *cuts, m]
    want = []
    for bi, (a, b) in enumerate(zip(e, e[1:]), start=1):
        seg = vals[a:b]
        want.append(
            (bi, seg[0][0], seg[-1][0], sum(w for _, w in seg), float(sse(seg)))
        )
    got = [(r.bucket, r.v_lo, r.v_hi, r.n_rows, r.sse) for r in out]
    assert got == want, (got, want)
    assert sum(r.sse for r in out) == float(tot)
    # the lone far-out value (200) sits in the last bucket with the
    # light 90/91 pair rather than widening the heavy 50/51 bucket
    assert out[2].v_lo >= 50


def test_bounded_value_histogram_raises_past_contract(spark, monkeypatch):
    """round-17 (VERDICT r16 #1 of "what's wrong"): a column whose
    distinct-value count exceeds the pre-grid contract bound must
    RAISE with a diagnosis, never collect unbounded driver metadata.
    The bound is monkeypatched down so the test stays tiny."""
    import pytest

    import maston_spark.profiling as prof

    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    monkeypatch.setattr(prof, "_HIST_DISTINCT_MAX", 4)
    with pytest.raises(ValueError, match="pre-grid contract bound"):
        prof.voptimal_histogram(df, "v", n_buckets=2)
    with pytest.raises(ValueError, match="pre-grid contract bound"):
        prof.selectivity_audit(df, "v")
    # within the bound: unchanged behavior
    monkeypatch.setattr(prof, "_HIST_DISTINCT_MAX", 4096)
    out = prof.voptimal_histogram(df, "v", n_buckets=2).collect()
    assert sum(r.n_rows for r in out) == 10


def test_voptimal_histogram_degenerate_fewer_values_than_buckets(spark):
    """m < n_buckets (round-14 ADVICE): the DP has no level-m split,
    so the engine emits the natural answer — one zero-SSE bucket per
    distinct value — instead of one bucket spanning everything."""
    from maston_spark.profiling import voptimal_histogram

    df = spark.createDataFrame([(7,), (7,), (9,)], "v long")
    out = voptimal_histogram(df, "v", n_buckets=4).collect()
    got = [(r.bucket, r.v_lo, r.v_hi, r.n_rows, r.sse) for r in out]
    assert got == [(1, 7, 7, 2, 0.0), (2, 9, 9, 1, 0.0)]


def test_selectivity_audit_voptimal_beats_equiwidth_on_spike(spark):
    """A heavy spike at 100 inside a wide flat tail: the v-optimal
    histogram isolates the spike in its own bucket, so predicates
    over the tail stop inheriting the spike's mass — its error is
    <= equi-width's on every predicate and strictly better on at
    least one; estimates are exact uniform-within-bucket rationals."""
    from maston_spark.profiling import selectivity_audit

    rows = [(100,)] * 500 + [(v,) for v in range(0, 1000, 10)]
    df = spark.createDataFrame(rows, "v long")
    out = selectivity_audit(df, "v", n_buckets=4, n_preds=6).collect()
    assert len(out) == 6
    # v-optimal minimizes SSE, not per-predicate error — the audit's
    # claim is AGGREGATE: lower total estimation error on this shape
    assert sum(r.err_voptimal for r in out) < sum(
        r.err_equiwidth for r in out
    )
    # the estimates bracket sanity: never negative, never wildly
    # beyond the corpus size
    n = len(rows)
    for r in out:
        assert 0 <= r.est_equiwidth <= n + 1
        assert 0 <= r.est_voptimal <= n + 1


def test_disproportionality_signals_hand_case(spark):
    """Planted signal: source S carries flag X in 8/10 docs while
    the background rate is 2/20 — PRR = (8/10)/(2/20) = 8.0 exactly
    on the micro grid; cells below min_count are suppressed."""
    from maston_spark.profiling import disproportionality_signals

    rows = (
        [("S", "X")] * 8 + [("S", "Y")] * 2
        + [("B", "X")] * 2 + [("B", "Y")] * 18
    )
    df = spark.createDataFrame(rows, "item string, event string")
    out = {(r.item, r.event): r for r in
           disproportionality_signals(df, "item", "event",
                                      min_count=3, top_k=10).collect()}
    assert ("B", "X") not in out  # a=2 < min_count
    sx = out[("S", "X")]
    assert (sx.n_item_event, sx.n_item, sx.n_event, sx.n_total) == (8, 10, 10, 30)
    assert sx.prr == 8.0
    # ROR = ad/bc = (8*18)/(2*2) = 36
    assert sx.ror == 36.0


def test_wasserstein_drift_hand_case_shift_vs_ks(spark):
    """Group A = {0..9}, group B = A + 100 (pure location shift,
    one of each): W1(A vs B) = 100 exactly (all mass moves 100),
    which is the geometry KS compresses to its max crossing. Also
    the degenerate same-distribution case reads 0."""
    from maston_spark.profiling import wasserstein_drift

    rows = [("A", v) for v in range(10)] + [("B", v + 100) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.group: r for r in wasserstein_drift(df, "g", "v").collect()}
    assert out["A"].n_group == 10 and out["A"].n_rest == 10
    assert out["A"].w1 == 100.0 and out["B"].w1 == 100.0
    same = spark.createDataFrame(
        [("A", v) for v in range(5)] + [("B", v) for v in range(5)],
        "g string, v long",
    )
    out2 = {r.group: r.w1 for r in wasserstein_drift(same, "g", "v").collect()}
    assert out2 == {"A": 0.0, "B": 0.0}


def test_encoding_advisor_hand_case(spark):
    """Three planted shapes under id order: a constant column wins
    RLE (1 run), a low-cardinality alternating column wins DICT
    (runs = rows, but 1-byte codes beat 6-char plain), and a unique
    long-string column stays PLAIN (dict pays the dictionary AND the
    codes). Costs are exact integers from the documented model."""
    from maston_spark.profiling import encoding_advisor

    rows = [
        (i, "same", "optA" if i % 2 == 0 else "optBBB", f"unique-value-{i:04d}")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, c_const string, c_alt string, c_uniq string")
    out = {r.column: r for r in
           encoding_advisor(df, ["c_const", "c_alt", "c_uniq"], ["id"]).collect()}
    const = out["c_const"]
    assert (const.n_rows, const.n_distinct, const.n_runs) == (100, 1, 1)
    assert const.plain_bytes == 400 + 100  # 100x'same' + terminators
    assert const.rle_bytes == 4 + 5 * 1
    assert const.best_encoding == "rle"
    alt = out["c_alt"]
    assert alt.n_distinct == 2
    # dict: (4+6 chars + 2 entries) + 100 x 1-byte codes = 112
    assert alt.dict_bytes == 10 + 2 + 100
    assert alt.best_encoding == "dict"
    uniq = out["c_uniq"]
    assert uniq.n_distinct == 100 and uniq.n_runs == 100
    assert uniq.best_encoding == "plain"


def test_wasserstein_drift_single_group_degrades_to_null(spark):
    """One group only: n_rest = 0 — the close must degrade to NULL
    w1 (the ks_drift NaN discipline) instead of raising a decimal
    division-by-zero under ANSI (r15 ADVICE)."""
    from maston_spark.profiling import wasserstein_drift

    df = spark.createDataFrame(
        [("A", v) for v in range(5)], "g string, v long"
    )
    out = wasserstein_drift(df, "g", "v").collect()
    assert len(out) == 1
    assert out[0].n_group == 5 and out[0].n_rest == 0
    assert out[0].w1 is None


def test_zone_map_audit_hand_case(spark):
    """8 rows, 4-row zones, anti-correlated b = 100 − a: sorted by
    a, zone 0 holds b ∈ [97,100] and zone 1 b ∈ [93,96], so the
    predicate b ∈ [93,94] reads exactly one zone (skipped 0.5) while
    a ∈ [1,2] also reads one — and sorted by b the SAME a-predicate
    still reads one zone (anti-correlation clusters both). An
    all-NULL pred column zone is never read (the parquet row-group
    rule)."""
    from maston_spark.profiling import zone_map_audit

    rows = [(i, 100 - i, i) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "a long, b long, id long")
    out = {
        (r.order_col, r.pred_col): r
        for r in zone_map_audit(
            df,
            order_candidates=["a", "b"],
            tiebreak_cols=["id"],
            predicates=[("b", 93, 94), ("a", 1, 2)],
            block_rows=4,
        ).collect()
    }
    r = out[("a", "b")]
    assert (r.n_blocks, r.n_read, r.skipped_frac) == (2, 1, 0.5)
    r = out[("a", "a")]
    assert (r.n_blocks, r.n_read) == (2, 1)
    r = out[("b", "a")]
    assert (r.n_blocks, r.n_read) == (2, 1)
    r = out[("b", "b")]
    assert (r.n_blocks, r.n_read) == (2, 1)


def test_zone_map_audit_null_zone_not_read(spark):
    """Zones whose predicate column is entirely NULL have NULL
    min/max and must count as skipped, not read."""
    from maston_spark.profiling import zone_map_audit

    rows = [(1, 10, 1), (2, 20, 2), (3, None, 3), (4, None, 4)]
    df = spark.createDataFrame(rows, "a long, b long, id long")
    out = zone_map_audit(
        df,
        order_candidates=["a"],
        tiebreak_cols=["id"],
        predicates=[("b", 0, 100)],
        block_rows=2,
    ).collect()
    assert (out[0].n_blocks, out[0].n_read) == (2, 1)
    assert out[0].skipped_frac == 0.5
