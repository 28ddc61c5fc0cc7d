"""In-engine MODEL-EVALUATION metrics over scored, labeled rows —
the half of a curation pipeline that decides whether the quality
classifier/scorer is trustworthy before its scores gate a 100 TB
corpus. Every metric here is an EXACT rational of integer
rank/count sums with one closing IEEE division, so the DuckDB
oracle replays it bit-for-bit (no libm, no summation-order
hazards) — the same determinism discipline as the sketch library.

Parity anchor: the reference has no evaluation surface (it is a
Kafka Streams plumbing library); this extends the engine the way
its NB classifier (llm/text.py, q165) already implied — train,
apply, AND evaluate without leaving the DataFrame algebra.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def group_auc(
    df: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC-AUC per group from the Mann-Whitney rank form:
    ``AUC = (Σ_{positives} midrank − n₊(n₊+1)/2) / (n₊·n₋)`` —
    ``(group, n_pos, n_neg, auc)``. Ties get MIDRANKS (the standard
    tie correction), computed exactly: positions of a tied score run
    are rank..rank+cnt−1, so ``2·midrank = 2·rank + cnt − 1`` is an
    INTEGER — the whole numerator stays in int64 and only the final
    quotient is IEEE (both engines agree to the bit; round(…, 6)
    output). Groups with no positives or no negatives emit NULL auc
    (undefined, not 0).

    Scale shape: one hash shuffle on the group for the rank window,
    one combiner-reduced aggregation — AUC over a trillion rows
    costs one sort per group partition, never a pairwise
    positive×negative comparison (the naive definition is n₊·n₋
    pairs).

    Null convention: rows with a NULL label or NULL score are
    DROPPED before ranking (the library's COUNT(col) null-drop
    convention — join_key_profile, table_sketch_profile); counting
    a NULL label as a negative would silently skew every midrank."""
    w = Window.partitionBy(group_col).orderBy(score_col)
    wt = Window.partitionBy(group_col, score_col)
    lab = F.col(label_col).cast("int")
    df = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    )
    ranked = df.select(
        F.col(group_col),
        lab.alias("__y"),
        (
            F.lit(2) * F.rank().over(w) + F.count(F.lit(1)).over(wt) - F.lit(1)
        ).alias("__mid2"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.sum("__y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("__y")).cast("long").alias("n_neg"),
        F.sum(F.col("__y") * F.col("__mid2")).cast("long").alias("__pos_mid2"),
    )
    num = F.col("__pos_mid2") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = F.lit(2) * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        group_col,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic scorer:
    ``(bin, n_rows, mean_score, pos_rate)`` over equal-WIDTH score
    bins on [0, 1] — a calibrated scorer has mean_score ≈ pos_rate
    per bin; the systematic gap IS the calibration error the popular
    ECE summarizes. Equal-width (not equal-frequency) bins keep the
    whole statistic exact-rational: bin = floor(score·n_bins)
    clamped to n_bins−1, pos_rate = exact int ratio, mean_score =
    round(sum)/count with the sum rounded first (the engine's
    fixed avg discipline). One combiner-reduced aggregation."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    lab = F.col(label_col).cast("int")
    return (
        df.filter(s.isNotNull() & (s >= 0) & (s <= 1))
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.round(F.sum(s), 6) / F.count(F.lit(1)), 6
            ).alias("mean_score"),
            F.round(
                F.sum(lab).cast("double") / F.count(F.lit(1)), 6
            ).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def group_gini(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Gini concentration coefficient of a non-negative integer
    quantity per group — ``(group, n_rows, total, gini)`` with
    ``G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`` over values sorted
    ascending (ties broken by the sort's stable rank — the formula
    is tie-invariant because tied values commute). The
    "does one domain own the corpus" number a mixture planner reads
    next to the water-fill allocation: G=0 is uniform, →1 is
    winner-take-all. Exact int64 cross-products (decimal(38,0) for
    the rank-weighted sum), one closing IEEE quotient, round 6.
    One rank window + one combiner agg per group."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    v = F.col(value_col).cast("long")
    ranked = df.select(
        F.col(group_col),
        v.alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    dec = "decimal(38,0)"
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("__x").cast("long").alias("total"),
        F.sum(F.col("__i").cast(dec) * F.col("__x").cast(dec)).alias("__iw"),
    )
    num = (
        F.lit(2).cast(dec) * F.col("__iw")
        - (F.col("n_rows") + 1).cast(dec) * F.col("total").cast(dec)
    )
    den = F.col("n_rows").cast(dec) * F.col("total").cast(dec)
    return agg.select(
        group_col,
        "n_rows",
        "total",
        F.when(
            F.col("total") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("gini"),
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical raters (Cohen 1960): one row
    ``(n_rows, po, pe, kappa)``. The labeling-pipeline gate: raw
    agreement ``po`` flatters any pair of raters that both say
    "keep" 95% of the time; kappa subtracts the agreement their
    marginals would produce by chance. Exact-rational form:
    ``kappa = (N·Σ n_kk − Σ row_k·col_k) / (N² − Σ row_k·col_k)`` —
    integer (decimal(38,0)) numerator and denominator, one closing
    IEEE division, round 6; ``po`` and ``pe`` are exact int ratios.
    Degenerate marginals (pe = 1: both raters constant and equal)
    emit NULL kappa.

    Scale shape: one combiner-reduced (a, b) contingency aggregation
    (≤ |A|·|B| cells), marginals derived from the cells — the corpus
    is scanned once and never re-shuffled."""
    cells = (
        df.select(
            F.col(a_col).cast("string").alias("__a"),
            F.col(b_col).cast("string").alias("__b"),
        )
        .filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    rows = cells.groupBy("__a").agg(F.sum("__n").alias("__ra"))
    colsum = cells.groupBy("__b").agg(F.sum("__n").alias("__cb"))
    dec = "decimal(38,0)"
    s = (
        rows.join(colsum, rows["__a"] == colsum["__b"])
        .agg(
            F.sum(F.col("__ra").cast(dec) * F.col("__cb").cast(dec)).alias(
                "__s"
            )
        )
        .select(F.coalesce("__s", F.lit(0).cast(dec)).alias("__s"))
    )
    tot = cells.agg(
        F.sum("__n").cast("long").alias("__N"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(0))
        .cast("long")
        .alias("__d"),
    )
    j = tot.crossJoin(s)
    num = F.col("__N").cast(dec) * F.col("__d").cast(dec) - F.col("__s")
    den = F.col("__N").cast(dec) * F.col("__N").cast(dec) - F.col("__s")
    return j.select(
        F.col("__N").alias("n_rows"),
        F.round(F.col("__d").cast("double") / F.col("__N"), 6).alias("po"),
        F.round(
            F.col("__s").cast("double")
            / (F.col("__N").cast("double") * F.col("__N")),
            6,
        ).alias("pe"),
        F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 6)
        ).alias("kappa"),
    )


def spearman_corr(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Exact Spearman rank correlation per group —
    ``(group, n_rows, rho)`` — the MONOTONE-association check between
    two signals (do two quality scores order documents the same way),
    robust where Pearson on raw values is leverage-dominated. Ties
    get midranks (the standard correction), and the whole statistic
    is Pearson on DOUBLED midranks ``2·mid = 2·rank + cnt − 1``
    (integers!): every sum is exact decimal(38,0), the two sqrt are
    correctly-rounded IEEE, one closing division, round 6 — the
    oracle replays it bit-for-bit. Constant columns (zero rank
    variance) emit NULL.

    Scale shape: two rank windows on the SAME group partitioning
    (one hash shuffle, sorts reused) + one combiner-reduced moment
    aggregation — never an n² pair comparison (Kendall's tau is the
    pairwise member; Spearman is the one with a distributed
    rank-sum form)."""
    wx = Window.partitionBy(group_col).orderBy(x_col)
    wxt = Window.partitionBy(group_col, x_col)
    wy = Window.partitionBy(group_col).orderBy(y_col)
    wyt = Window.partitionBy(group_col, y_col)
    ranked = df.select(
        F.col(group_col),
        (
            F.lit(2) * F.rank().over(wx)
            + F.count(F.lit(1)).over(wxt)
            - F.lit(1)
        ).alias("__x2"),
        (
            F.lit(2) * F.rank().over(wy)
            + F.count(F.lit(1)).over(wyt)
            - F.lit(1)
        ).alias("__y2"),
    )
    dec = "decimal(38,0)"
    x2 = F.col("__x2").cast(dec)
    y2 = F.col("__y2").cast(dec)
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(x2).alias("__sx"),
        F.sum(y2).alias("__sy"),
        F.sum(x2 * y2).alias("__sxy"),
        F.sum(x2 * x2).alias("__sxx"),
        F.sum(y2 * y2).alias("__syy"),
    )
    n = F.col("n_rows").cast(dec)
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        group_col,
        "n_rows",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                6,
            ),
        ).alias("rho"),
    )


def wilson_interval(
    df: DataFrame,
    group_col: str,
    flag_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Wilson score interval per group for a binary rate —
    ``(group, n_rows, n_pos, rate, lo, hi)`` — the error bar a
    keep-rate / defect-rate dashboard should carry instead of the
    raw proportion (the normal approximation collapses at small n
    or extreme rates; Wilson 1927 stays inside [0,1] and behaves at
    n_pos = 0). Deterministic cross-engine: inputs are exact integer
    counts, ``z`` is an embedded literal (default: the double
    nearest the 97.5% normal quantile), and the formula is a fixed
    IEEE expression tree both engines evaluate identically (sqrt is
    correctly rounded); outputs round to 6. One combiner-reduced
    aggregation."""
    lab = F.col(flag_col).cast("int")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(lab).cast("long").alias("n_pos"),
    )
    n = F.col("n_rows").cast("double")
    p = F.col("n_pos").cast("double") / n
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / n
    center = p + z2 / (F.lit(2.0) * n)
    margin = F.lit(z) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    return agg.select(
        group_col,
        "n_rows",
        "n_pos",
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("lo"),
        F.round((center + margin) / denom, 6).alias("hi"),
    )


def cuped_adjusted_means(
    units: DataFrame,
    variant_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker, WSDM 2013): per experiment variant —
    ``(variant, n_units, mean_y, mean_y_cuped, theta)`` — where the
    adjusted metric is ``y − θ·(x − x̄)`` with ``x`` a PRE-experiment
    covariate (same unit's pre-period metric), ``θ = cov(x,y)/var(x)``
    pooled across variants, and ``x̄`` the pooled covariate mean.
    Because the covariate predates assignment, the adjustment shifts
    no variant's TRUE mean, but removes the covariate-explained
    variance — the industry-standard way to cut experiment runtimes
    ~30-50%. Input is at UNIT grain (one row per experimental unit:
    variant, metric y, covariate x).

    Determinism discipline: per-variant means need no per-row
    adjustment — ``mean(y − θ(x − x̄)) = mean(y) − θ·(mean_x_v − x̄)``
    — so everything reduces to DECIMAL-exact sums (callers supply
    x/y already rounded to the library's 9-decimal grid; the sums,
    cross-products and squares stay exact in decimal), one IEEE
    quotient for θ (the q117 regression-slope shape), and a fixed
    closing expression tree both engines evaluate identically;
    outputs round to 6.

    Scale shape: one combiner-reduced aggregation per grouping —
    the corpus never shuffles more than once; |variants| rows reach
    the driver-side math (which is itself pure column algebra on a
    broadcast 1-row pooled frame)."""
    x = F.col(covariate_col).cast("decimal(18,9)")
    y = F.col(metric_col).cast("decimal(18,9)")
    pooled = units.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
    )
    per_v = units.groupBy(variant_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(x).alias("__svx"),
        F.sum(y).alias("__svy"),
    )
    j = per_v.join(F.broadcast(pooled))
    n = F.col("__n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, sxy = F.col("__sxx").cast("double"), F.col("__sxy").cast("double")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    nv = F.col("n_units").cast("double")
    mean_y = F.col("__svy").cast("double") / nv
    mean_x = F.col("__svx").cast("double") / nv
    return j.select(
        variant_col,
        "n_units",
        F.round(mean_y, 6).alias("mean_y"),
        F.round(mean_y - theta * (mean_x - xbar), 6).alias("mean_y_cuped"),
        F.round(theta, 6).alias("theta"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table for a scorer — per score-ordered
    decile: ``(bucket, n_rows, n_pos, cum_capture, lift)`` where
    ``cum_capture`` is the fraction of ALL positives captured by the
    top buckets so far and ``lift`` the bucket-cumulative positive
    rate over the base rate — the marketing/classifier-triage chart
    ("the top 20% of scores hold 64% of the positives") that
    complements :func:`group_auc`'s single number.

    Scale shape: the score ordering uses the TWO-PHASE
    :func:`maston_spark.relational.global_rank` (range partition +
    per-partition offsets + Arrow numbering) — a naive
    ``ntile() OVER (ORDER BY score)`` is a partition-less window
    that pulls the whole corpus through one task. Bucket assignment
    is the exact integer ``((rank−1)·n_buckets) div n``; everything
    after runs on the |buckets|-row table. Null scores/labels drop
    (the library convention); ties break by ``tiebreak_col`` so the
    table is engine-independent."""
    from maston_spark.relational import global_rank

    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
        F.col(tiebreak_col).alias("__t"),
    )
    ranked = global_rank(
        base, [F.col("__s").desc(), F.col("__t").asc()], rank_col="__rn"
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__np"),
    )
    b = ranked.join(F.broadcast(tot)).select(
        F.expr(f"((__rn - 1) * {int(n_buckets)}) div __n").cast("int").alias("bucket"),
        "__y",
        "__n",
        "__np",
    )
    per = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.max("__n").alias("__n"),
        F.max("__np").alias("__np"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # |buckets|-row frame — bounded by n_buckets, never the corpus
    cum_rows = F.sum("n_rows").over(w)
    cum_pos = F.sum("n_pos").over(w)
    capture = cum_pos.cast("double") / F.col("__np").cast("double")
    rate = cum_pos.cast("double") / cum_rows.cast("double")
    base_rate = F.col("__np").cast("double") / F.col("__n").cast("double")
    return per.select(
        "bucket",
        "n_rows",
        "n_pos",
        F.round(capture, 6).alias("cum_capture"),
        F.round(rate / base_rate, 6).alias("lift"),
    ).orderBy("bucket")


# Poisson(1) CDF thresholds scaled to the 32-bit hash-lane domain
# (floor(cdf_k * 2^32), python-precomputed) — weights come from EXACT
# integer compares of the md5 lane against these literals, so the
# "random" resample is a pure deterministic function of (salt,
# replicate, id) both engines replay bit-for-bit. Tail capped at 7
# (P ≈ 1e-5 of the cap binding per draw).
_POISSON1_THRESHOLDS = [
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777,
]


def _estimate_scan_splits(df: DataFrame, slots: int) -> "int | None":
    """Metadata-only estimate of a file-backed scan's split count (no
    RDD conversion of the analyzed plan): Spark packs files into
    partitions of ``maxPartitionBytes``, so splits ≈ Σ ceil(size /
    maxPartitionBytes) over the scan's files. Returns None for
    non-file upstreams, non-local URIs, and failed ``os.stat`` —
    which the caller treats as UNKNOWN-assume-parallel, a deliberate
    tradeoff: an already-shuffled input does arrive in
    shuffle-partition-count splits, but an in-memory / coalesced /
    unstat-able upstream that is genuinely narrow will NOT be
    rebalanced by this probe (a perf miss, never a correctness one) —
    callers that know their split count pass ``input_splits`` to
    decide the guard directly. Stats at most ``slots`` files: once
    the file count alone reaches the slot count the answer can't be
    'underparallel'."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) >= slots:
        return len(files)
    try:
        mpb = int(
            df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
            ).rstrip("b")
        )
    except Exception:
        mpb = 128 * 1024 * 1024
    import os

    splits = 0
    for uri in files:
        if not uri.startswith("file:"):
            return None
        path = uri[len("file:") :]
        while path.startswith("//"):
            path = path[1:]
        try:
            size = os.stat(path).st_size
        except OSError:
            return None
        splits += max(1, -(-size // mpb))
    return splits


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    b: int = 32,
    salt: str = "bs",
    input_splits: "int | None" = None,
) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% confidence interval for a
    column mean — one row ``(n_replicates, est_mean, ci_lo, ci_hi)``.
    The classic distributed bootstrap (each row enters replicate r
    with an independent Poisson(1) multiplicity — Chamandy et al.,
    Google 2012 "Estimating Uncertainty for Massive Data Streams")
    made REPRODUCIBLE: replicate r's multiplicity is an exact
    integer-compare of a 32-bit md5 lane against precomputed
    Poisson-CDF thresholds, so the same rows, ids and salt produce
    the same interval on any engine, partitioning, or rerun — and
    the DuckDB oracle replays the whole Monte-Carlo construction
    bit-for-bit (resampling inference as a GRADED computation, not a
    trusted one). One 128-bit digest of ``(salt, r div 4, id)``
    carries FOUR independent lanes (hex chars 8j+1..8j+8 for
    j = r mod 4), so b replicates cost b/4 hashes per row — the md5
    is the hot loop's whole cost.

    Scale shape: each row emits ``b`` (replicate, weight, w·x) triples
    inline (a b/4-block explode, then a 4-struct lane explode — no
    data movement, no resampled copies of the corpus) that
    combiner-reduce immediately; the shuffle carries ≤ b rows per
    task, the replicate means are a b-row frame, and the percentile
    pick is an exact order statistic over those b rows (indices
    round(0.025·(b−1)) / round(0.975·(b−1)) — the standard
    percentile bootstrap). Because the explode multiplies
    per-partition work ×b, an underparallel scan (fewer splits than
    cluster slots) is rebalanced first — a 2-column shuffle, applied
    only when the scan's file count (a metadata-only probe — no RDD
    conversion of the plan) is below the cluster's slot count; a
    non-file upstream is assumed already parallel, and callers that
    know their split count can pass ``input_splits`` to decide the
    guard directly. Values fold as INTEGER 1e9-grid lanes: x lands
    on the 9-grid, ``xi = x·1e9`` is extracted exactly through
    decimal, each replicate's Σ w·xi sums int64 products into
    decimal(38,0) — exact in any partitioning/merge order, without
    per-row decimal multiplies in the hot fold — and the one IEEE
    step per replicate is the closing ``Σw·xi / (Σw · 1e9)``
    division (round 6). Any ``b ≥ 8`` is accepted: lanes are
    generated in blocks of 4 per md5 and replicates ≥ b are dropped,
    so a non-multiple-of-4 request costs one partial block."""
    if b < 8:
        raise ValueError("need at least 8 replicates for a percentile CI")
    n_blocks = (b + 3) // 4

    def weight(lane):
        w = F.lit(len(_POISSON1_THRESHOLDS))
        for k in range(len(_POISSON1_THRESHOLDS) - 1, -1, -1):
            w = F.when(lane < F.lit(_POISSON1_THRESHOLDS[k]), F.lit(k)).otherwise(w)
        return w

    # integer 1e9-grid values: x lands on the 9-grid and xi = x·1e9 is
    # extracted EXACTLY through one decimal multiply per row (decimal,
    # not double — a corpus-scale x up to 1e9 would put xi past 2^53
    # where the double grid is coarser than 1). The per-replicate fold
    # then runs int64 products summed into decimal(38,0): exact in any
    # partitioning/merge order, no per-row decimal multiply in the hot
    # loop (the q258 Brier lane pattern)
    x = F.col(value_col).cast("decimal(18,9)")
    xi = (x * F.lit(1000000000)).cast("long")
    base = df.filter(x.isNotNull()).select(F.col(id_col), xi.alias("__xi"))
    # the b-fold inline explode multiplies per-partition work by b; a
    # scan that arrived in fewer splits than the cluster has slots
    # (small files, coalesced inputs) would serialize it — rebalance
    # FIRST (cheap: 2 columns), and only when actually underparallel,
    # so a corpus that already has thousands of splits never pays a
    # full-data shuffle for it
    slots = df.sparkSession.sparkContext.defaultParallelism
    if input_splits is None:
        input_splits = _estimate_scan_splits(df, slots)
    if input_splits is not None and input_splits < slots:
        base = base.repartition(slots)
    # one md5 per (row, 4-replicate block): the 128-bit digest carries
    # four independent 32-bit lanes, so b replicates cost ceil(b/4)
    # hashes
    blocks = base.select(
        F.col(id_col),
        "__xi",
        F.explode(F.array(*[F.lit(blk) for blk in range(n_blocks)])).alias("__blk"),
    ).select(
        "__xi",
        "__blk",
        F.md5(
            F.concat(
                F.lit(salt + ":"),
                F.col("__blk").cast("string"),
                F.lit(":"),
                F.col(id_col).cast("string"),
            )
        ).alias("__h"),
    )
    # staged projections, NOT one inlined expression tree: each conv
    # and each when-cascade materializes once per row (CollapseProject
    # keeps non-cheap multi-use aliases; a generator input gets no
    # subexpression elimination, so inlining the cascades into the
    # explode re-evaluated conv ~64x per row — measured 3x slower)
    lanes = blocks.select(
        "__xi",
        "__blk",
        *[
            F.conv(F.substring(F.col("__h"), 1 + 8 * j, 8), 16, 10)
            .cast("long")
            .alias(f"__lane{j}")
            for j in range(4)
        ],
    )
    weights = lanes.select(
        "__xi",
        "__blk",
        *[weight(F.col(f"__lane{j}")).alias(f"__w{j}") for j in range(4)],
    )
    # w ≤ 7 and |xi| < 1e18, so the per-row long product stays inside
    # int64; the decimal(38,0) cast happens once per emitted row so
    # the SUM (not the multiply) carries the overflow headroom
    exploded = weights.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("__blk") * 4 + j).alias("__rep"),
                        F.col(f"__w{j}").alias("__w"),
                        (F.col(f"__w{j}").cast("long") * F.col("__xi"))
                        .cast("decimal(38,0)")
                        .alias("__wxi"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("__l")
    ).select("__l.__rep", "__l.__w", "__l.__wxi")
    if b != 4 * n_blocks:
        exploded = exploded.filter(F.col("__rep") < F.lit(b))
    reps = exploded.groupBy("__rep").agg(
        F.sum("__w").cast("long").alias("__sw"),
        F.sum("__wxi").alias("__swxi"),  # decimal(38,0): exact any order
    )
    mean_r = F.round(
        F.col("__swxi").cast("double")
        / (F.col("__sw").cast("double") * F.lit(1e9)),
        6,
    )
    # exact order statistics over the b-row replicate frame (bounded
    # partition-less window — b rows by construction)
    wd = Window.orderBy("__m", "__rep")
    lo_i = round(0.025 * (b - 1)) + 1
    hi_i = round(0.975 * (b - 1)) + 1
    ranked = reps.select(mean_r.alias("__m"), "__rep").select(
        "__m", F.row_number().over(wd).alias("__rn")
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.round(F.sum("__m") / F.count(F.lit(1)), 6).alias("est_mean"),
        F.min(F.when(F.col("__rn") == lo_i, F.col("__m"))).alias("ci_lo"),
        F.min(F.when(F.col("__rn") == hi_i, F.col("__m"))).alias("ci_hi"),
    )


def diff_in_diff(
    units: DataFrame,
    treat_col: str,
    period_col: str,
    metric_col: str,
) -> DataFrame:
    """Difference-in-differences point estimate from a 2×2 design —
    one row ``(n_rows, m_ctrl_pre, m_ctrl_post, m_treat_pre,
    m_treat_post, did)`` with
    ``did = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)``
    — the parallel-trends estimator (Card & Krueger 1994 canon) for
    rollouts where randomization wasn't possible and the control's
    pre→post drift stands in for the counterfactual. ``treat_col``
    and ``period_col`` are 0/1 ints.

    One combiner-reduced aggregation (conditional decimal sums per
    cell off one scan — no 4-way self-join); each cell mean is
    sum/count off the 9-grid with the closing subtraction a fixed
    IEEE tree both engines replay."""
    t = F.col(treat_col).cast("int")
    p = F.col(period_col).cast("int")
    y = F.col(metric_col).cast("decimal(18,9)")

    def cell(ti, pi):
        cond = (t == ti) & (p == pi)
        return (
            F.sum(F.when(cond, y)).alias(f"__s{ti}{pi}"),
            F.sum(F.when(cond, F.lit(1))).cast("long").alias(f"__n{ti}{pi}"),
        )

    aggs = []
    for ti in (0, 1):
        for pi in (0, 1):
            aggs += list(cell(ti, pi))
    agg = units.filter(y.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"), *aggs
    )

    def mean(ti, pi):
        return F.col(f"__s{ti}{pi}").cast("double") / F.col(
            f"__n{ti}{pi}"
        ).cast("double")

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    return agg.select(
        "n_rows",
        F.round(mean(0, 0), 6).alias("m_ctrl_pre"),
        F.round(mean(0, 1), 6).alias("m_ctrl_post"),
        F.round(mean(1, 0), 6).alias("m_treat_pre"),
        F.round(mean(1, 1), 6).alias("m_treat_post"),
        F.round(did, 6).alias("did"),
    )


def mde_power(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    z_alpha: float = 1.959963984540054,
    z_beta: float = 0.8416212335729143,
) -> DataFrame:
    """Minimum detectable effect per group at 95% confidence / 80%
    power for a two-sample mean comparison —
    ``(group, n, mean, sd, mde_abs, mde_rel)`` with
    ``MDE = (z_α/2 + z_β) · sqrt(2σ²/n)`` — the pre-experiment
    sizing number that says whether a planned test CAN see the
    effect you care about (run it before q221's readout, not after).
    z quantiles are embedded double literals; σ comes from
    decimal-exact moment sums with one correctly-rounded sqrt; the
    closing products are a fixed IEEE tree. One combiner-reduced
    aggregation."""
    x = F.col(metric_col).cast("decimal(18,9)")
    agg = df.filter(x.isNotNull()).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    var = (sxx - sx * sx / nd) / nd
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    mean = sx / nd
    mde = F.lit(z_alpha + z_beta) * F.sqrt(
        F.lit(2.0) * F.greatest(var, F.lit(0.0)) / nd
    )
    return agg.select(
        group_col,
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(sd, 6).alias("sd"),
        F.round(mde, 6).alias("mde_abs"),
        F.when(mean != 0, F.round(mde / mean, 6)).alias("mde_rel"),
    ).orderBy(group_col)


def fleiss_kappa(
    df: DataFrame,
    count_cols: "list[str]",
    n_raters: int,
) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement among m ≥ 2 raters
    assigning items to categories (Fleiss 1971), the multi-rater
    generalization of :func:`cohens_kappa`: one row
    ``(n_items, p_bar, p_bar_e, kappa)``. Input is at ITEM grain:
    one column per category holding how many of the ``n_raters``
    raters chose it (each row's counts must sum to ``n_raters``).

    Exact-rational form: per-item agreement
    ``P_i = (Σ_j n_ij² − m) / (m(m−1))`` needs only integer squares;
    ``P̄`` folds Σ_i Σ_j n_ij² exactly (decimal(38,0));
    ``P̄_e = Σ_j p_j²`` comes from the exact category totals; the one
    IEEE step is the closing ``(P̄ − P̄e)/(1 − P̄e)`` quotient
    (round 6). Perfect chance agreement (P̄e = 1: every rater one
    category) emits NULL kappa. One combiner-reduced aggregation —
    the corpus is scanned once."""
    m = int(n_raters)
    if m < 2:
        raise ValueError("need at least 2 raters")
    dec = "decimal(38,0)"
    sq = None
    for c in count_cols:
        t = (F.col(c).cast(dec) * F.col(c).cast(dec))
        sq = t if sq is None else sq + t
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(sq).alias("__ss"),
    ]
    for c in count_cols:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"__t_{c}"))
    agg = df.agg(*aggs)
    n = F.col("n_items").cast("double")
    total = n * F.lit(float(m))
    pbar = (
        F.col("__ss").cast("double") - n * F.lit(float(m))
    ) / (n * F.lit(float(m * (m - 1))))
    pe = None
    for c in count_cols:
        pj = F.col(f"__t_{c}").cast("double") / total
        t = pj * pj
        pe = t if pe is None else pe + t
    return agg.select(
        "n_items",
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_bar_e"),
        F.when(
            pe < 1.0, F.round((pbar - pe) / (F.lit(1.0) - pe), 6)
        ).alias("kappa"),
    )


def srm_check(
    df: DataFrame,
    variant_col: str,
    expected: "dict[object, float]",
    chi2_critical: float = 10.827566170662733,
) -> DataFrame:
    """Sample-ratio-mismatch guard for experiment assignment — the
    chi-square goodness-of-fit of observed arm counts against the
    DESIGNED split, the first sanity gate any experiment readout
    must pass (a 50.5/49.5 drift at scale almost always means a
    broken assignment or logging path, and every downstream metric
    — q221's CUPED, q236's DiD — is silently biased if it fires).
    One row per arm: ``(variant, n_obs, expected_share, n_exp,
    chi2, srm_detected)`` with ``chi2`` / ``srm_detected`` repeated
    on each row (the statistic is global). The default critical
    value is chi-square(df=1) at α = 0.001 — the conventional SRM
    alarm threshold (Fabijan et al. 2019); pass the df-appropriate
    literal for >2 arms so the flag is an exact compare against an
    embedded constant rather than an in-engine CDF.

    Exact shape: arm counts are integers off one combiner-reduced
    aggregation; each arm's ``(o − e)²/e`` term is rounded to the
    9-grid before the |arms|-term sum (bounded by the design, never
    the corpus) rounds at 6. Missing designed
    arms chi-square against a zero observed count (the worst SRM of
    all); an OBSERVED arm missing from ``expected`` raises, because
    a rogue arm is an assignment bug, not a ratio question."""
    spark = df.sparkSession
    obs = (
        df.filter(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).alias("variant"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    return srm_from_counts(obs, expected, chi2_critical)


def srm_from_counts(
    obs: DataFrame,
    expected: "dict[object, float]",
    chi2_critical: float = 10.827566170662733,
) -> DataFrame:
    """The SRM closing math over a PRE-AGGREGATED ``(variant, n_obs)``
    frame — shared by :func:`srm_check` (one batch scan) and the
    streaming assignment monitor (:func:`maston_spark.streaming.
    topology.srm_monitor_topology`, whose durable state IS such a
    counts frame folded additively across micro-batches), so the two
    paths cannot diverge on the statistic. Same output contract and
    exactness shape as :func:`srm_check` — including the fail-loud
    rogue-arm contract: an observed variant absent from ``expected``
    raises here (an assignment bug, not a ratio question), so a
    DIRECT caller cannot silently understate the chi-square by
    having the design left-join drop the rogue arm's count from the
    total."""
    shares = {k: float(v) for k, v in expected.items()}
    if not shares or abs(sum(shares.values()) - 1.0) > 1e-9:
        raise ValueError("expected shares must sum to 1")
    spark = obs.sparkSession
    design = spark.createDataFrame(
        [(k, v) for k, v in sorted(shares.items(), key=lambda kv: str(kv[0]))],
        f"variant {obs.schema['variant'].dataType.simpleString()},"
        " expected_share double",
    )
    # one bounded job (|observed arms| rows at most, capped for the
    # pathological everything-is-rogue feed) on the tiny counts frame
    bad = [
        r.variant
        for r in obs.join(
            F.broadcast(design.select("variant")), "variant", "left_anti"
        )
        .limit(20)
        .collect()
    ]
    if bad:
        raise ValueError(f"observed arms not in the design: {bad}")
    arms = design.join(obs, "variant", "left").select(
        "variant",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
        "expected_share",
    )
    tot = arms.agg(F.sum("n_obs").cast("long").alias("__n"))
    a = arms.join(F.broadcast(tot))
    n_exp = F.col("expected_share") * F.col("__n").cast("double")
    contrib = (F.col("n_obs").cast("double") - n_exp) * (
        F.col("n_obs").cast("double") - n_exp
    ) / n_exp
    per = a.select(
        "variant",
        "n_obs",
        "expected_share",
        F.round(n_exp, 6).alias("n_exp"),
        F.round(contrib, 9).alias("__c"),
    )
    chi = per.agg(F.round(F.sum("__c"), 6).alias("chi2"))
    return (
        per.join(F.broadcast(chi))
        .select(
            "variant",
            "n_obs",
            "expected_share",
            "n_exp",
            "chi2",
            (F.col("chi2") > F.lit(float(chi2_critical))).alias("srm_detected"),
        )
        .orderBy("variant")
    )


def jackknife_ratio_ci(
    df: DataFrame,
    num_col: str,
    den_col: str,
    id_col: str,
    n_buckets: int = 32,
    salt: str = "jk",
    z: float = 1.959963984540054,
) -> DataFrame:
    """Leave-one-bucket-out jackknife 95% CI for a RATIO metric
    (revenue per order, tokens per document, clicks per view) — the
    estimator whose variance the naive per-row formula gets wrong
    because numerator and denominator are correlated (the delta
    method's empirical twin; the bucketed form is Google's standard
    for massive data, Chamandy et al. 2012). One row:
    ``(n_rows, n_buckets, ratio, se_jack, ci_lo, ci_hi)``.

    Deterministic and one-pass: rows hash to ``n_buckets`` buckets
    by an md5 lane of ``(salt, id)`` (engine-replayable, no RNG);
    per-bucket decimal sums reduce map-side; each leave-one-out
    ratio is ALGEBRAIC — ``r_b = (S_num − s_b)/(S_den − d_b)`` off
    the bucket row joined to the broadcast grand totals — so the
    corpus is scanned once, never B times. The jackknife variance
    ``(B−1)/B · Σ(r_b − r̄)²`` folds over the B-row bucket table.
    Rounding: sums land on the 9-grid before any division."""
    if n_buckets < 8:
        raise ValueError("need at least 8 buckets for a stable jackknife")
    lane = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    num = F.col(num_col).cast("decimal(18,9)")
    den = F.col(den_col).cast("decimal(18,9)")
    b = (
        df.filter(num.isNotNull() & den.isNotNull())
        .select((lane % n_buckets).alias("__b"), num.alias("__n"), den.alias("__d"))
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum("__n").alias("__sn"),
            F.sum("__d").alias("__sd"),
        )
    )
    tot = b.agg(
        F.sum("__cnt").cast("long").alias("__rows"),
        F.count(F.lit(1)).cast("long").alias("__nb"),
        F.sum("__sn").alias("__tn"),
        F.sum("__sd").alias("__td"),
    )
    j = b.join(F.broadcast(tot))
    loo = F.round(
        (F.col("__tn") - F.col("__sn")).cast("double")
        / (F.col("__td") - F.col("__sd")).cast("double"),
        9,
    )
    reps = j.select(
        "__rows", "__nb", "__tn", "__td", loo.alias("__r")
    )
    out = reps.groupBy("__rows", "__nb", "__tn", "__td").agg(
        F.round(F.sum("__r"), 9).alias("__sr"),
        F.round(F.sum(F.col("__r") * F.col("__r")), 9).alias("__srr"),
    )
    nb = F.col("__nb").cast("double")
    var = (nb - 1.0) / nb * (F.col("__srr") - F.col("__sr") * F.col("__sr") / nb)
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    ratio = F.col("__tn").cast("double") / F.col("__td").cast("double")
    return out.select(
        F.col("__rows").alias("n_rows"),
        F.col("__nb").cast("int").alias("n_buckets"),
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se_jack"),
        F.round(ratio - F.lit(float(z)) * se, 6).alias("ci_lo"),
        F.round(ratio + F.lit(float(z)) * se, 6).alias("ci_hi"),
    )


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rel_col: str,
    tiebreak_col: str,
    k: int = 10,
) -> DataFrame:
    """NDCG@k + MRR per query group — the graded-relevance ranking
    metrics (Järvelin & Kekäläinen 2002) that judge a retrieval or
    curation scorer by WHERE it puts the good documents, not just
    how many it keeps: one row per group ``(group, n_docs, dcg_at_k,
    idcg_at_k, ndcg_at_k, mrr)``. Ranks come from partitioned
    windows (per-group, never a global sort); ties break by
    ``tiebreak_col`` so the ranking is engine-independent.

    Float discipline: the log2 discounts ``1/log2(r+1)`` for
    r = 1..k are PRECOMPUTED python literals embedded in the plan
    (and mirrored as a VALUES table in the oracle), so no in-engine
    libm call can diverge; each ``rel·discount`` term rounds to the
    9-grid before the ≤k-term per-group sum, and NDCG's closing
    DCG/IDCG quotient rounds at 6. IDCG ranks by relevance
    descending — equal-relevance order can't change the sum. Groups
    with IDCG = 0 (nothing relevant) emit NULL ndcg; MRR is
    1/first-relevant-rank, 0.0 when nothing relevant is in view."""
    if k < 1:
        raise ValueError("k must be positive")
    disc = [1.0 / math.log2(r + 1) for r in range(1, k + 1)]
    darr = F.array(*[F.lit(d) for d in disc])
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    wi = Window.partitionBy(group_col).orderBy(
        F.col(rel_col).desc(), F.col(tiebreak_col).asc()
    )
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(rel_col).isNotNull()
    ).select(
        F.col(group_col).alias("group"),
        F.col(rel_col).cast("double").alias("__rel"),
        F.row_number().over(w).alias("__r"),
        F.row_number().over(wi).alias("__ri"),
    )
    # F.get (not element_at): past-k ranks index off the end of the
    # weight array and must yield NULL, not an ANSI error
    term = F.round(F.col("__rel") * F.get(darr, F.col("__r") - 1), 9)
    iterm = F.round(F.col("__rel") * F.get(darr, F.col("__ri") - 1), 9)
    per = base.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum(F.when(F.col("__r") <= k, term)), 9).alias("__dcg"),
        F.round(F.sum(F.when(F.col("__ri") <= k, iterm)), 9).alias("__idcg"),
        F.min(
            F.when((F.col("__r") <= k) & (F.col("__rel") > 0), F.col("__r"))
        ).alias("__fr"),
    )
    return per.select(
        "group",
        "n_docs",
        F.coalesce(F.col("__dcg"), F.lit(0.0)).alias("dcg_at_k"),
        F.coalesce(F.col("__idcg"), F.lit(0.0)).alias("idcg_at_k"),
        F.when(
            F.col("__idcg") > 0, F.round(F.col("__dcg") / F.col("__idcg"), 6)
        ).alias("ndcg_at_k"),
        F.coalesce(
            F.round(F.lit(1.0) / F.col("__fr").cast("double"), 6), F.lit(0.0)
        ).alias("mrr"),
    ).orderBy("group")


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    max_raters: int,
) -> DataFrame:
    """Krippendorff's alpha (nominal level) — chance-corrected
    agreement that, unlike :func:`fleiss_kappa`, tolerates MISSING
    ratings: units rated by any 2..``max_raters`` raters all
    contribute, weighted by how many pairable values they carry
    (Krippendorff 2004, the content-analysis standard). Input is
    LONG format — one row per (unit, rating value); one output row
    ``(n_units, n_pairable, d_o, d_e, alpha)``.

    Exact-rational form: with n_uc the count of value c in unit u
    and m_u = Σ_c n_uc, observed disagreement needs
    Σ_u Σ_c n_uc(m_u − n_uc)/(m_u − 1) — a sum of rationals whose
    denominators all divide L = lcm(1..max_raters−1), so
    ``X = Σ n_uc(m_u − n_uc) · (L div (m_u − 1))`` folds as EXACT
    integers (decimal(38,0)); expected disagreement's
    Σ_c N_c(N − N_c) is integer off the value totals; and
    ``alpha = 1 − X(N−1) / (L · Σ_c N_c(N−N_c))`` is one closing
    IEEE quotient (round 6). Single-rater units drop (no pairable
    values — the Krippendorff rule, not an approximation); zero
    expected disagreement (all kept ratings one value) emits NULL.
    Two combiner-reduced aggregations — (unit, value) counts, then
    the fold; the corpus never collects."""
    if max_raters < 2:
        raise ValueError("need at least 2 raters")
    L = 1
    for d in range(1, max_raters):
        L = L * d // math.gcd(L, d)
    dec = "decimal(38,0)"
    uc = (
        df.filter(F.col(unit_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            F.col(unit_col).alias("__u"), F.col(value_col).alias("__c")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    wu = Window.partitionBy("__u")
    kept = uc.withColumn("__m", F.sum("__n").over(wu)).filter(F.col("__m") >= 2)
    # contract guard: a unit with more ratings than max_raters breaks
    # the lcm trick (L DIV (m-1) would silently truncate, understating
    # disagreement) — fail loudly, per the library's srm_check
    # convention, instead of corrupting alpha
    kept = kept.withColumn(
        "__m",
        F.when(F.col("__m") <= max_raters, F.col("__m")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"krippendorff_alpha: unit with more than {max_raters}"
                        " ratings (duplicate ingest?): unit "
                    ),
                    F.col("__u").cast("string"),
                )
            )
        ),
    )
    x_term = (
        F.col("__n").cast(dec)
        * (F.col("__m") - F.col("__n")).cast(dec)
        * F.expr(f"CAST({L} DIV (__m - 1) AS {dec})")
    )
    # value totals over kept units only (pairable values)
    per_c = kept.groupBy("__c").agg(
        F.sum(F.col("__n").cast(dec)).alias("__nc"),
        F.sum(x_term).alias("__x"),
    )
    units = kept.select("__u").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_units")
    )
    tot = per_c.agg(
        F.sum("__nc").alias("__tot_n"),
        F.sum("__x").alias("__tot_x"),
    )
    de_num = per_c.join(F.broadcast(tot)).agg(
        F.sum(F.col("__nc") * (F.col("__tot_n") - F.col("__nc"))).alias("__de"),
        F.max("__tot_n").alias("__tot_n"),
        F.max("__tot_x").alias("__tot_x"),
    )
    nn = F.col("__tot_n").cast("double")
    d_o = F.col("__tot_x").cast("double") / (F.lit(float(L)) * nn)
    d_e = F.col("__de").cast("double") / (nn * (nn - 1.0))
    alpha = F.lit(1.0) - (
        F.col("__tot_x").cast("double") * (nn - 1.0)
    ) / (F.lit(float(L)) * F.col("__de").cast("double"))
    return de_num.join(F.broadcast(units)).select(
        "n_units",
        F.col("__tot_n").cast("long").alias("n_pairable"),
        F.round(d_o, 6).alias("d_o"),
        F.round(d_e, 6).alias("d_e"),
        F.when(F.col("__de") > 0, F.round(alpha, 6)).alias("alpha"),
    )


def eb_shrunk_rates(
    df: DataFrame,
    group_col: str,
    y_col: str,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-group rates —
    the fix for the small-sample pathology in any per-domain /
    per-source keep-rate or CTR table, where a 2-document source
    with 2 keeps outranks a 10,000-document source at 95%: fit a
    beta prior to the OBSERVED spread of group rates by method of
    moments (Robbins 1956 lineage), then report each group's
    posterior mean ``(k + μM)/(n + M)``. One row per group:
    ``(group, n, k, rate_raw, rate_shrunk, prior_strength)``.

    Deterministic shape: per-group (n, k) are integer sums; the
    prior needs only the G-row group table's moments (μ̂ from the
    POOLED rate — exact integer ratio; s² from Σp, Σp² with each
    group rate pre-rounded to the 9-grid), so the corpus is scanned
    once and the fit never touches it again. When the observed
    spread is no wider than binomial noise (M ≤ 0 or s² = 0) the
    prior is undefined — ``prior_strength`` and ``rate_shrunk`` go
    NULL rather than fabricating infinite confidence. G (number of
    groups) is assumed bounded (domains/sources), as the per-group
    output already implies."""
    g = (
        df.filter(F.col(y_col).isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(y_col).cast("int")).cast("long").alias("k"),
        )
    )
    p = F.round(F.col("k").cast("double") / F.col("n").cast("double"), 9)
    gg = g.select("group", "n", "k", p.alias("__p"))
    prior = gg.agg(
        F.count(F.lit(1)).cast("long").alias("__G"),
        F.sum("k").cast("long").alias("__tk"),
        F.sum("n").cast("long").alias("__tn"),
        F.round(F.sum("__p"), 9).alias("__sp"),
        F.round(F.sum(F.col("__p") * F.col("__p")), 9).alias("__spp"),
    )
    j = gg.join(F.broadcast(prior))
    gd = F.col("__G").cast("double")
    mu = F.col("__tk").cast("double") / F.col("__tn").cast("double")
    # greatest(G-1, 1): at G=1 this yields s2 = 0, which the guard
    # below already rejects — ANSI mode would otherwise raise on the
    # /(G-1) inside the guard's own condition
    s2 = (F.col("__spp") - F.col("__sp") * F.col("__sp") / gd) / F.greatest(
        gd - 1.0, F.lit(1.0)
    )
    m_raw = mu * (F.lit(1.0) - mu) / F.greatest(s2, F.lit(1e-300)) - F.lit(1.0)
    m = F.when((F.col("__G") > 1) & (s2 > 0) & (m_raw > 0), F.round(m_raw, 9))
    shrunk = F.round(
        (F.col("k").cast("double") + mu * m) / (F.col("n").cast("double") + m), 6
    )
    return j.select(
        "group",
        "n",
        "k",
        F.round(F.col("__p"), 6).alias("rate_raw"),
        shrunk.alias("rate_shrunk"),
        F.round(m, 6).alias("prior_strength"),
    ).orderBy("group")


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate with right
    censoring (Kaplan & Meier 1958) — one row per distinct event
    time ``(t, n_risk, n_events, n_censored, survival)``. The
    churn/lifetime curve a naive "mean lifetime of users who left"
    gets wrong: censored subjects (still alive at the observation
    cut) leave the risk set WITHOUT counting as deaths, which is
    exactly what conditioning the hazard on the at-risk count does.

    Shape: one ``groupBy(t)`` combiner aggregation (events +
    censored per time), then cumulative windows over the
    TIME-DISTINCT table — bounded by the duration domain (days/
    buckets in practice; pre-bucket a continuous duration, the same
    precondition as exact_percentiles' value histogram), never the
    subject count. ``S(t) = Π(1 − d/n)`` folds as
    ``exp(Σ ln(1 − d/n))`` with each log term rounded to the 9-grid
    so the cumulative sum is an order-fixed sequence both engines
    replay (the q125 ln discipline); a time where every at-risk
    subject dies closes the curve at exactly 0.0. Rows with NULL
    duration/event drop, and so do NEGATIVE durations (clock skew /
    bad upstream datediff — they would silently corrupt every
    at-risk count after them)."""
    d = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & (F.col(duration_col) >= 0)
    ).select(
        F.col(duration_col).cast("long").alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
    )
    per = d.groupBy("__t").agg(
        F.sum("__e").cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum("__e")).cast("long").alias("n_censored"),
    )
    tot = per.agg(
        F.sum(F.col("n_events") + F.col("n_censored")).cast("long").alias("__n")
    )
    # cumulative windows over the |distinct t| table (bounded domain)
    w_prior = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_incl = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    left_before = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_prior), F.lit(0)
    )
    j = per.join(F.broadcast(tot))
    risk = (F.col("__n") - left_before).alias("n_risk")
    staged = j.select(
        "__t", "n_events", "n_censored", risk
    )
    # ln(1 - d/n) rounded per step; a d = n step sends the log to
    # -inf conceptually — emit exact 0.0 from there on instead
    frac = F.col("n_events").cast("double") / F.col("n_risk").cast("double")
    term = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.round(F.log(F.lit(1.0) - frac), 9),
    )
    with_term = staged.select(
        "__t", "n_risk", "n_events", "n_censored", term.alias("__lg")
    )
    dead = F.max(F.when(F.col("__lg").isNull(), 1).otherwise(0)).over(w_incl)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum("__lg").over(w_incl)), 6)
    )
    return with_term.select(
        F.col("__t").alias("t"),
        "n_risk",
        "n_events",
        "n_censored",
        surv.alias("survival"),
    ).orderBy("t")


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    split_col: str,
    y_col: str,
    z_95: float = 1.959963984540054,
    z_999: float = 3.2905267314919255,
) -> DataFrame:
    """Pooled two-proportion z-test per group between the two sides
    of a binary split — ``(group, n_0, k_0, n_1, k_1, p_0, p_1, z,
    significant_95, significant_999)``: did this source's keep rate
    / this event type's conversion REALLY move between periods, or
    is the delta inside binomial noise? The per-group significance
    battery next to q220's Wilson intervals (an interval per side)
    and q240's SRM (one global ratio): this is the DIFFERENCE test,
    ``z = (p₁ − p₀) / √(p̂(1−p̂)(1/n₀ + 1/n₁))`` with the pooled p̂.
    Normal quantiles are embedded literals (no in-engine CDF);
    groups missing a side, or with a degenerate pooled rate
    (p̂ ∈ {0, 1}), emit NULL z.

    One combiner-reduced conditional aggregation — four integer sums
    per group off one scan, a fixed IEEE closing tree with one
    correctly-rounded sqrt, round 6."""
    s = F.col(split_col).cast("int")
    y = F.col(y_col).cast("int")
    agg = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.sum(F.when(s == 0, 1).otherwise(0)).cast("long").alias("n_0"),
            F.sum(F.when(s == 0, y).otherwise(0)).cast("long").alias("k_0"),
            F.sum(F.when(s == 1, 1).otherwise(0)).cast("long").alias("n_1"),
            F.sum(F.when(s == 1, y).otherwise(0)).cast("long").alias("k_1"),
        )
    )
    n0 = F.col("n_0").cast("double")
    n1 = F.col("n_1").cast("double")
    p0 = F.col("k_0").cast("double") / n0
    p1 = F.col("k_1").cast("double") / n1
    pp = (F.col("k_0") + F.col("k_1")).cast("double") / (n0 + n1)
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
    z = F.when(
        (F.col("n_0") > 0) & (F.col("n_1") > 0) & (pp > 0) & (pp < 1),
        F.round((p1 - p0) / se, 6),
    )
    return agg.select(
        "group",
        "n_0",
        "k_0",
        "n_1",
        "k_1",
        F.when(F.col("n_0") > 0, F.round(p0, 6)).alias("p_0"),
        F.when(F.col("n_1") > 0, F.round(p1, 6)).alias("p_1"),
        z.alias("z"),
        # an undefined test is "not shown significant", not NULL —
        # boolean NULLs also hash differently across engines
        F.coalesce(F.abs(z) > F.lit(float(z_95)), F.lit(False)).alias(
            "significant_95"
        ),
        F.coalesce(F.abs(z) > F.lit(float(z_999)), F.lit(False)).alias(
            "significant_999"
        ),
    ).orderBy("group")


def rbo_at_k(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    group_col: str,
    item_col: str,
    rank_col: str,
    k: int = 20,
    p: float = 0.9,
) -> DataFrame:
    """Truncated Rank-Biased Overlap between two top-k rankings per
    group (Webber, Moffat & Zobel 2010) — ``(group, overlap_at_k,
    rbo_at_k)``: how much do two retrieval configs / scorer versions
    actually AGREE, weighted toward the top where users look, which
    plain set overlap and Spearman (defined only on a shared
    support) both miss. Inputs are two (group, item, rank) frames
    with ranks 1..k (ties pre-broken by the ranker).

    Shape: one inner join on (group, item) restricted to both top-k
    lists (≤ k rows per group survive); a doc seen at ranks
    (rᴬ, rivy) is inside both prefixes from depth max(rᴬ, rᴮ) on, so
    the agreement-at-depth curve A_d is a cumulative count over the
    ≤k-row per-group table, and
    ``RBO@k = (1−p)/(1−p^k)·Σ_d p^(d−1)·A_d/d`` folds with the
    ``p^(d−1)`` weights embedded as python literals (normalized to
    sum to 1 over the k evaluated depths — the truncated-RBO
    convention; no in-engine pow). Every A_d/d term rounds to the
    9-grid before the k-term sum."""
    if k < 1 or not (0 < p < 1):
        raise ValueError("need k >= 1 and 0 < p < 1")
    wsum = sum(p ** (d - 1) for d in range(1, k + 1))
    weights = [p ** (d - 1) / wsum for d in range(1, k + 1)]
    a = ranks_a.select(
        F.col(group_col).alias("group"),
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("int").alias("__ra"),
    ).filter(F.col("__ra") <= k)
    b = ranks_b.select(
        F.col(group_col).alias("group"),
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("int").alias("__rb"),
    ).filter(F.col("__rb") <= k)
    both = a.join(b, ["group", "item"]).select(
        "group", F.greatest("__ra", "__rb").alias("__m")
    )
    # A_d = |{items: max rank <= d}| — count per max-depth, then the
    # per-depth contribution sums the weights of depths d >= m
    tailw = [sum(weights[d - 1] / d for d in range(m, k + 1)) for m in range(1, k + 2)]
    # contribution of an item entering at depth m: sum_{d>=m} w_d / d
    contrib = F.element_at(
        F.array(*[F.lit(t) for t in tailw[:-1]]), F.col("__m")
    )
    per = both.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("overlap_at_k"),
        F.round(F.sum(F.round(contrib, 9)), 6).alias("rbo_at_k"),
    )
    # groups present in either ranking but with ZERO shared items
    # must emit 0, not vanish
    gs = a.select("group").union(b.select("group")).distinct()
    return (
        gs.join(per, "group", "left")
        .select(
            "group",
            F.coalesce("overlap_at_k", F.lit(0)).cast("long").alias("overlap_at_k"),
            F.coalesce("rbo_at_k", F.lit(0.0)).alias("rbo_at_k"),
        )
        .orderBy("group")
    )


def split_conformal_interval(
    cal: DataFrame,
    eval_df: DataFrame,
    truth_col: str,
    pred_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal prediction bound (Vovk et al.; Lei et al.
    2018): the residual quantile q̂ from a CALIBRATION split such
    that ``pred ± q̂`` covers a fresh point with probability
    ≥ 1 − α, DISTRIBUTION-FREE — the finite-sample guarantee a
    plain percentile lacks. One row: ``(n_cal, q_index, qhat,
    guarantee, n_eval, empirical_coverage)``.

    The conformal index is the finite-sample-corrected order
    statistic ``⌈(n+1)(1−α)⌉`` — NOT an interpolated percentile
    (interpolation forfeits the coverage proof); when the index
    exceeds n (calibration set too small for the requested α) q̂ is
    NULL — "no finite bound certifiable", never a fabricated one.
    Empirical coverage on the held-out eval split is the exact
    fraction of |truth − pred| ≤ q̂.

    Scale shape: the order statistic comes from the two-phase
    :func:`maston_spark.relational.global_rank` (range exchange +
    per-partition offsets — continuous residuals make a value
    histogram degenerate, and a partition-less window would
    single-task the corpus); coverage is one broadcast-join
    aggregation over the eval split."""
    from maston_spark.relational import global_rank

    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    res = F.abs(
        F.col(truth_col).cast("double") - F.col(pred_col).cast("double")
    )
    c = cal.filter(
        F.col(truth_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(F.round(res, 9).alias("__r"))
    # round-17 (the q264 discipline, guide §1.2): n_cal is known from
    # global_rank's phase-2 counts action — the old separate
    # c.agg(count) re-executed the WHOLE calibration subtree
    # (upstream predictor join included); the conformal index is then
    # driver arithmetic replaying the same IEEE (n+1)·(1−α) product
    # and ceil. The 1-row head is persisted: both the coverage agg
    # and the final projection consume it, and each execution
    # otherwise re-runs the rank-kernel filter.
    import math

    from maston_spark.caching import scoped_persist

    ranked, total = global_rank(
        c, [F.col("__r").asc()], rank_col="__rk", return_total=True
    )
    q_idx = int(math.ceil((total + 1) * (1.0 - alpha)))
    spark = cal.sparkSession
    base = spark.createDataFrame(
        [(int(total), q_idx)], "n_cal long, q_index long"
    )
    picked = ranked.filter(F.col("__rk") == F.lit(q_idx)).select(
        F.lit(int(total)).cast("long").alias("n_cal"),
        F.col("__r").alias("qhat"),
    )
    # q_index > n: no certifiable bound — emit the row with NULL qhat
    head = scoped_persist(
        base.join(F.broadcast(picked), "n_cal", "left")
    )
    e = eval_df.filter(
        F.col(truth_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(F.round(res, 9).alias("__r"))
    cov = e.join(F.broadcast(head)).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.when(
            F.max("qhat").isNotNull(),
            F.round(
                F.sum(
                    F.when(F.col("__r") <= F.col("qhat"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ),
        ).alias("empirical_coverage"),
    )
    return head.join(F.broadcast(cov)).select(
        "n_cal",
        "q_index",
        "qhat",
        F.round(
            F.col("q_index").cast("double")
            / (F.col("n_cal") + 1).cast("double"),
            6,
        ).alias("guarantee"),
        "n_eval",
        "empirical_coverage",
    )


def logrank_test(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
    chi2_95: float = 3.841458820694124,
    chi2_999: float = 10.827566170662733,
) -> DataFrame:
    """Log-rank test (Mantel 1966) between TWO survival curves with
    right censoring — one row ``(n_0, n_1, o_1, e_1, v,
    chi2, significant_95, significant_999)``: did cohort 1's
    time-to-churn really differ from cohort 0's, accounting for
    censoring, which a t-test on observed lifetimes gets wrong in
    exactly the censored tail. ``group_col`` is 0/1.

    At each distinct event time t: observed events in group 1
    (``o``), expected under the null ``e = d_t·n1_t/n_t``, and the
    hypergeometric variance
    ``v_t = d_t·(n1_t/n_t)·(1−n1_t/n_t)·(n_t−d_t)/(n_t−1)``;
    ``chi2 = (O₁−E₁)²/V`` compares against embedded chi-square(1)
    critical values. Counts and at-risk sets are exact integers off
    one (group, t) aggregation + cumulative windows over the bounded
    distinct-time table (the :func:`kaplan_meier` precondition);
    each e/v term rounds to the 9-grid before the time-bounded
    decimal sum; times where n_t = 1 contribute zero variance
    legitimately (the factor (n_t−d_t)/(n_t−1) is guarded). Zero
    total variance (no comparable event times) emits NULL chi2."""
    d = df.filter(
        F.col(group_col).isNotNull()
        & F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & (F.col(duration_col) >= 0)  # the kaplan_meier convention
    ).select(
        F.col(group_col).cast("int").alias("__g"),
        F.col(duration_col).cast("long").alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
    )
    per = d.groupBy("__t").agg(
        F.sum(F.when(F.col("__g") == 1, 1).otherwise(0)).cast("long").alias("__a1"),
        F.sum(F.when(F.col("__g") == 0, 1).otherwise(0)).cast("long").alias("__a0"),
        F.sum(F.when(F.col("__g") == 1, F.col("__e")).otherwise(0))
        .cast("long")
        .alias("__d1"),
        F.sum(F.when(F.col("__g") == 0, F.col("__e")).otherwise(0))
        .cast("long")
        .alias("__d0"),
    )
    w_prior = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    tot = per.agg(
        F.sum("__a1").cast("long").alias("__N1"),
        F.sum("__a0").cast("long").alias("__N0"),
    )
    j = per.join(F.broadcast(tot))
    n1 = F.col("__N1") - F.coalesce(F.sum("__a1").over(w_prior), F.lit(0))
    n0 = F.col("__N0") - F.coalesce(F.sum("__a0").over(w_prior), F.lit(0))
    staged = j.select(
        "__t",
        "__d1",
        "__d0",
        "__N1",
        "__N0",
        n1.alias("__r1"),
        n0.alias("__r0"),
    )
    nt = (F.col("__r1") + F.col("__r0")).cast("double")
    dt = (F.col("__d1") + F.col("__d0")).cast("double")
    p1 = F.col("__r1").cast("double") / nt
    e_term = F.round(dt * p1, 9)
    v_term = F.round(
        F.when(
            F.col("__r1") + F.col("__r0") > 1,
            dt
            * p1
            * (F.lit(1.0) - p1)
            * (nt - dt)
            / (nt - F.lit(1.0)),
        ).otherwise(F.lit(0.0)),
        9,
    )
    dec = "decimal(28,9)"
    # cohort sizes come from the UNFILTERED totals: an all-censored
    # input has no event times, but n_0/n_1 are still known and the
    # observed event count is exactly 0, not NULL
    core = staged.filter(F.col("__d1") + F.col("__d0") > 0).agg(
        F.sum("__d1").cast("long").alias("__o1s"),
        F.round(F.sum(e_term.cast(dec)).cast("double"), 6).alias("e_1"),
        F.round(F.sum(v_term.cast(dec)).cast("double"), 6).alias("v"),
    )
    agg = core.join(F.broadcast(tot)).select(
        F.col("__N1").alias("n_1"),
        F.col("__N0").alias("n_0"),
        F.coalesce(F.col("__o1s"), F.lit(0)).cast("long").alias("o_1"),
        F.coalesce(F.col("e_1"), F.lit(0.0)).alias("e_1"),
        F.coalesce(F.col("v"), F.lit(0.0)).alias("v"),
    )
    diff = F.col("o_1").cast("double") - F.col("e_1")
    chi2 = F.when(F.col("v") > 0, F.round(diff * diff / F.col("v"), 6))
    return agg.select(
        "n_0",
        "n_1",
        "o_1",
        "e_1",
        "v",
        chi2.alias("chi2"),
        F.coalesce(chi2 > F.lit(float(chi2_95)), F.lit(False)).alias(
            "significant_95"
        ),
        F.coalesce(chi2 > F.lit(float(chi2_999)), F.lit(False)).alias(
            "significant_999"
        ),
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Brier score with the Murphy (1973) decomposition over
    equal-width score bins — one row ``(n_rows, brier, reliability,
    resolution, uncertainty, brier_decomposed)``: REL − RES + UNC
    re-assembles the Brier score of the BINNED forecast
    (``brier_decomposed``), so reliability says how far the scorer's
    probabilities are from honest, resolution says how much it
    actually separates outcomes, and uncertainty is the base-rate
    floor no scorer can beat. The gap ``brier − brier_decomposed``
    is the within-bin score variance — small when the bins are fine
    enough. The summary numbers behind :func:`calibration_bins`'
    per-bin diagram.

    Exact shape: scores land on the 9-grid; ``Σ(s−y)²`` folds as
    decimal(38,18) (exact in any merge order — a corpus-scale double
    sum would be order-dependent); the per-bin REL/RES terms round
    to the 9-grid before the n_bins-bounded decimal sum; base rates
    are exact integer ratios. One combiner-reduced bin aggregation —
    the corpus is scanned once. Scores outside [0, 1] drop (same
    contract as calibration_bins)."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    s_raw = F.col(score_col).cast("double")
    base = df.filter(
        s_raw.isNotNull()
        & (s_raw >= 0)
        & (s_raw <= 1)
        & F.col(label_col).isNotNull()
    ).select(
        F.round(s_raw, 9).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
        F.least(
            F.floor(s_raw * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
        ).alias("__b"),
    )
    # the (s−y)² fold as INTEGER lanes: d = (s−y)·1e9 is integral on
    # the 9-grid (|d| ≤ 1e9, d² ≤ 1e18 fits int64) and Σ d² in
    # decimal(38,0) is exact in any merge order in BOTH engines —
    # a decimal(38,18) square overflows DuckDB's 38-digit space
    d_int = F.round((F.col("__s") - F.col("__y")) * F.lit(1e9), 0).cast("long")
    per = base.groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__nk"),
        F.sum("__y").cast("long").alias("__syk"),
        F.sum(F.col("__s").cast("decimal(19,9)")).alias("__ssk"),
        F.sum((d_int * d_int).cast("decimal(38,0)")).alias("__sqk"),
    )
    tot = per.agg(
        F.sum("__nk").cast("long").alias("__n"),
        F.sum("__syk").cast("long").alias("__sy"),
        F.sum("__sqk").alias("__sq"),
    )
    j = per.join(F.broadcast(tot))
    nd = F.col("__n").cast("double")
    obar = F.col("__sy").cast("double") / nd
    ok = F.col("__syk").cast("double") / F.col("__nk").cast("double")
    sk = F.col("__ssk").cast("double") / F.col("__nk").cast("double")
    rel_t = F.round(F.col("__nk").cast("double") * (sk - ok) * (sk - ok), 9)
    res_t = F.round(F.col("__nk").cast("double") * (ok - obar) * (ok - obar), 9)
    dec = "decimal(28,9)"
    agg = j.groupBy("__n", "__sy", "__sq").agg(
        F.sum(rel_t.cast(dec)).alias("__rel"),
        F.sum(res_t.cast(dec)).alias("__res"),
    )
    nd2 = F.col("__n").cast("double")
    ob = F.col("__sy").cast("double") / nd2
    rel = F.col("__rel").cast("double") / nd2
    res = F.col("__res").cast("double") / nd2
    unc = ob * (F.lit(1.0) - ob)
    return agg.select(
        F.col("__n").alias("n_rows"),
        F.round(
            F.col("__sq").cast("double") / (nd2 * F.lit(1e18)), 6
        ).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(rel - res + unc, 6).alias("brier_decomposed"),
    )


def mann_whitney_u(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) two-sample test with
    the standard midrank tie correction — one row ``(n_0, n_1, u_1,
    auc_1, z)``: the NONPARAMETRIC two-sample location test (does the
    treatment arm's metric distribution stochastically dominate?),
    the rank-based companion to :func:`welch_ttest`'s moment form.
    ``u_1`` is group 1's U statistic, ``auc_1 = U₁/(n₀·n₁)`` is the
    probability-of-superiority effect size (exactly q212's rank-form
    AUC of the group label), and ``z`` is the tie-corrected normal
    approximation ``(U₁ − n₀n₁/2) / σ`` with
    ``σ² = n₀n₁/12 · ((n+1) − Σ(t³−t)/(n(n−1)))``.

    Exact shape (the value-histogram pattern of q15/q226): ONE
    combiner-reduced aggregation collapses the corpus to its distinct
    6-grid values with per-group counts; midranks come from a
    cumulative window over that BOUNDED frame (bounded-domain
    precondition: distinct metric values, not rows), and ``2·R₁ =
    Σ c₁·(2·C_prev + c + 1)`` stays INTEGER (decimal(38,0)) — no
    per-row rank window, no n₊·n₋ pair comparison. The only IEEE
    steps are the closing divisions and one correctly-rounded sqrt,
    replayed identically by the oracle. Groups must be coded 0/1;
    NULL values drop."""
    g = F.col(group_col).cast("int")
    vi = F.round(F.col(value_col).cast("double"), 6) * F.lit(1000000)
    base = df.filter(
        F.col(value_col).isNotNull() & g.isin(0, 1)
    ).select(
        F.round(vi, 0).cast("long").alias("__v"), g.alias("__g")
    )
    hist = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum("__g").cast("long").alias("__c1"),
    )
    # cumulative count of strictly-smaller values: a window over the
    # bounded distinct-value frame (value histogram), never the corpus
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    dec = "decimal(38,0)"
    stepped = hist.select(
        "__c",
        "__c1",
        F.coalesce(F.sum("__c").over(w), F.lit(0)).cast("long").alias("__cp"),
    )
    agg = stepped.agg(
        F.sum("__c").cast("long").alias("__n"),
        F.sum("__c1").cast("long").alias("__n1"),
        # 2*R1 = sum over values of c1 * (2*C_prev + c + 1)  (integer)
        F.sum(
            (
                F.col("__c1").cast(dec)
                * (F.lit(2) * F.col("__cp") + F.col("__c") + F.lit(1)).cast(dec)
            )
        ).alias("__r2"),
        # tie correction sum(t^3 - t) over tied runs
        F.sum(
            (
                F.col("__c").cast(dec) * F.col("__c").cast(dec) * F.col("__c").cast(dec)
                - F.col("__c").cast(dec)
            )
        ).alias("__tt"),
    )
    n = F.col("__n").cast("double")
    n1 = F.col("__n1").cast("double")
    n0 = (F.col("__n") - F.col("__n1")).cast("double")
    # 2*U1 = 2*R1 - n1*(n1+1)  (integer, exact)
    u2 = F.col("__r2").cast("double") - n1 * (n1 + F.lit(1.0))
    var = (
        n0
        * n1
        / F.lit(12.0)
        * (
            (n + F.lit(1.0))
            - F.col("__tt").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    z = (u2 - n0 * n1) / (F.lit(2.0) * F.sqrt(var))
    return agg.select(
        (F.col("__n") - F.col("__n1")).alias("n_0"),
        F.col("__n1").alias("n_1"),
        F.round(u2 / F.lit(2.0), 6).alias("u_1"),
        F.round(u2 / (F.lit(2.0) * n0 * n1), 6).alias("auc_1"),
        F.when(var > 0, F.round(z, 6)).alias("z"),
    )


def welch_ttest(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Welch's unequal-variance two-sample t test — one row ``(n_0,
    n_1, mean_0, mean_1, t_stat, df_welch)``: the moment-form
    location test next to :func:`mann_whitney_u`'s rank form, with
    the Satterthwaite effective degrees of freedom (the safe default
    when arm variances differ — Welch 1947).

    Exact shape: values land on the 6-grid and fold as INTEGER 1e6
    lanes — per-group Σxᵢ and Σxᵢ² in decimal(38,0), exact in any
    merge order (per-row square in int64: precondition |x| ≤ ~3e3 at
    the 6-grid, the same bound family as q258's 1e9 lanes; widen the
    grid for larger domains). The closing means/variances/t/df are a
    fixed IEEE sequence both engines replay. Groups coded 0/1; NULL
    values drop; the t and df are NULL when either arm has < 2 rows
    or both sample variances are 0."""
    g = F.col(group_col).cast("int")
    xi = F.round(
        F.round(F.col(value_col).cast("double"), 6) * F.lit(1000000), 0
    ).cast("long")
    dec = "decimal(38,0)"
    base = df.filter(F.col(value_col).isNotNull() & g.isin(0, 1)).select(
        g.alias("__g"), xi.alias("__x")
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__x").cast(dec)).alias("__s"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec)).alias("__ss"),
    )
    # two bounded rows -> one row via conditional sums
    a = per.agg(
        F.sum(F.when(F.col("__g") == 0, F.col("__n"))).cast("long").alias("n_0"),
        F.sum(F.when(F.col("__g") == 1, F.col("__n"))).cast("long").alias("n_1"),
        F.sum(F.when(F.col("__g") == 0, F.col("__s"))).alias("__s0"),
        F.sum(F.when(F.col("__g") == 1, F.col("__s"))).alias("__s1"),
        F.sum(F.when(F.col("__g") == 0, F.col("__ss"))).alias("__ss0"),
        F.sum(F.when(F.col("__g") == 1, F.col("__ss"))).alias("__ss1"),
    )
    n0 = F.col("n_0").cast("double")
    n1 = F.col("n_1").cast("double")
    s0 = F.col("__s0").cast("double")
    s1 = F.col("__s1").cast("double")
    ss0 = F.col("__ss0").cast("double")
    ss1 = F.col("__ss1").cast("double")
    m0 = s0 / n0 / F.lit(1e6)
    m1 = s1 / n1 / F.lit(1e6)
    v0 = (n0 * ss0 - s0 * s0) / (n0 * (n0 - F.lit(1.0))) / F.lit(1e12)
    v1 = (n1 * ss1 - s1 * s1) / (n1 * (n1 - F.lit(1.0))) / F.lit(1e12)
    se2 = v0 / n0 + v1 / n1
    t = (m1 - m0) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (v0 / n0) * (v0 / n0) / (n0 - F.lit(1.0))
        + (v1 / n1) * (v1 / n1) / (n1 - F.lit(1.0))
    )
    ok = (F.col("n_0") >= 2) & (F.col("n_1") >= 2)
    return a.select(
        "n_0",
        "n_1",
        F.round(m0, 6).alias("mean_0"),
        F.round(m1, 6).alias("mean_1"),
        F.when(ok & (se2 > 0), F.round(t, 6)).alias("t_stat"),
        F.when(ok & (se2 > 0), F.round(dfw, 6)).alias("df_welch"),
    )


def anova_oneway(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way ANOVA F statistic across k groups — one row
    ``(k_groups, n_rows, ss_between, ss_within, f_stat)``: does ANY
    group mean differ (the k-arm generalization of the two-sample
    tests; run it before pairwise readouts to bound the multiple-
    comparison surface).

    Exact shape: one combiner-reduced aggregation folds per-group
    (n, Σxᵢ, Σxᵢ²) as integer 1e6 lanes in decimal(38,0) (same
    precondition as :func:`welch_ttest`); each group's
    ``Sx²/n`` term rounds to the 9-grid before the |groups|-bounded
    decimal(28,9) sum (the bounded-frame fold pattern), and the
    F ratio is one fixed IEEE close. NULL values and NULL groups
    drop; f_stat is NULL when k < 2, n ≤ k, or SSW is 0."""
    xi = F.round(
        F.round(F.col(value_col).cast("double"), 6) * F.lit(1000000), 0
    ).cast("long")
    dec = "decimal(38,0)"
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), xi.alias("__x"))
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__x").cast(dec)).alias("__s"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec)).alias("__ss"),
    )
    gterm = F.round(
        F.col("__s").cast("double")
        * F.col("__s").cast("double")
        / F.col("__n").cast("double")
        / F.lit(1e12),
        9,
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.sum(F.col("__s")).alias("__st"),
        F.sum(F.col("__ss")).alias("__sst"),
        F.sum(gterm.cast("decimal(28,9)")).alias("__gsum"),
    )
    nd = F.col("n_rows").cast("double")
    ssb = F.col("__gsum").cast("double") - (
        F.col("__st").cast("double") * F.col("__st").cast("double")
    ) / nd / F.lit(1e12)
    ssw = F.col("__sst").cast("double") / F.lit(1e12) - F.col(
        "__gsum"
    ).cast("double")
    k = F.col("k_groups").cast("double")
    fstat = (ssb / (k - F.lit(1.0))) / (ssw / (nd - k))
    ok = (
        (F.col("k_groups") >= 2)
        & (F.col("n_rows") > F.col("k_groups"))
        & (ssw > 0)
    )
    return agg.select(
        "k_groups",
        "n_rows",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.when(ok, F.round(fstat, 6)).alias("f_stat"),
    )


def mantel_haenszel(
    df: DataFrame,
    stratum_col: str,
    group_col: str,
    outcome_col: str,
) -> DataFrame:
    """Mantel-Haenszel stratified 2×2 analysis — one row
    ``(n_strata, n_rows, or_mh, chi2_cmh, significant_95)``: the
    common odds ratio and Cochran-Mantel-Haenszel chi-square across
    strata (Mantel & Haenszel 1959), the confounder-adjusted readout
    for a binary exposure/outcome when a stratifier (country,
    surface, date bucket) would otherwise Simpson-flip the pooled
    table. ``or_mh = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ)``; the CMH statistic
    compares Σaᵢ to its conditional expectation with the
    hypergeometric variance, against chi-square(1) at 0.05
    (3.841458820694124 embedded as a literal, never an in-engine
    CDF).

    Exact shape: ONE combiner-reduced aggregation collapses the
    corpus to |strata| integer 2×2 tables; every per-stratum term
    (ad/n, bc/n, E[a], V[a]) rounds to the 9-grid before the
    bounded decimal(28,9) stratum sum, and the two closing
    quotients are fixed IEEE. Strata where any margin is 0
    contribute their exact (possibly 0) terms; groups/outcomes
    coded 0/1; NULL in any of the three columns drops the row."""
    g = F.col(group_col).cast("int")
    y = F.col(outcome_col).cast("int")
    base = df.filter(
        F.col(stratum_col).isNotNull() & g.isin(0, 1) & y.isin(0, 1)
    ).select(F.col(stratum_col).alias("__s"), g.alias("__g"), y.alias("__y"))
    per = base.groupBy("__s").agg(
        F.sum(((F.col("__g") == 1) & (F.col("__y") == 1)).cast("long")).alias("__a"),
        F.sum(((F.col("__g") == 1) & (F.col("__y") == 0)).cast("long")).alias("__b"),
        F.sum(((F.col("__g") == 0) & (F.col("__y") == 1)).cast("long")).alias("__c"),
        F.sum(((F.col("__g") == 0) & (F.col("__y") == 0)).cast("long")).alias("__d"),
    )
    nd = (F.col("__a") + F.col("__b") + F.col("__c") + F.col("__d")).cast(
        "double"
    )
    a = F.col("__a").cast("double")
    b = F.col("__b").cast("double")
    c = F.col("__c").cast("double")
    d = F.col("__d").cast("double")
    r1 = a + b
    r0 = c + d
    c1 = a + c
    c0 = b + d
    dec = "decimal(28,9)"
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        (F.sum(F.col("__a") + F.col("__b") + F.col("__c") + F.col("__d")))
        .cast("long")
        .alias("n_rows"),
        F.sum(F.col("__a")).cast("long").alias("__sa"),
        F.sum(F.round(a * d / nd, 9).cast(dec)).alias("__ad"),
        F.sum(F.round(b * c / nd, 9).cast(dec)).alias("__bc"),
        F.sum(F.round(r1 * c1 / nd, 9).cast(dec)).alias("__e"),
        F.sum(
            F.round(
                r1 * r0 * c1 * c0 / (nd * nd * (nd - F.lit(1.0))), 9
            ).cast(dec)
        ).alias("__v"),
    )
    num = F.col("__sa").cast("double") - F.col("__e").cast("double")
    chi2 = F.round(num * num / F.col("__v").cast("double"), 6)
    or_mh = F.when(
        F.col("__bc").cast("double") > 0,
        F.round(F.col("__ad").cast("double") / F.col("__bc").cast("double"), 6),
    )
    return agg.select(
        "n_strata",
        "n_rows",
        or_mh.alias("or_mh"),
        F.when(F.col("__v").cast("double") > 0, chi2).alias("chi2_cmh"),
        F.coalesce(
            F.when(
                F.col("__v").cast("double") > 0,
                chi2 > F.lit(3.841458820694124),
            ),
            F.lit(False),
        ).alias("significant_95"),
    )


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran-Armitage trend test — one row ``(n_rows, n_pos,
    n_levels, z_trend, chi2_trend)``: is a binary outcome's rate
    MONOTONE in an ordered exposure (dose level, priority tier,
    quality bucket)? The chi-square-for-trend that a flat k-level
    independence test (q130's shape) cannot see: it weights levels
    by their integer scores (Cochran 1954, Armitage 1955).

    Exact shape: one aggregation collapses the corpus to |levels|
    integer (n_i, a_i) rows; the statistic is assembled ENTIRELY in
    the integer domain via cross-multiplication —
    ``z² = N·(N·Σs·a − A·Σs·n)² / (A·(N−A)·(N·Σn·s² − (Σn·s)²))``
    with every product held in decimal(38,0) — so the only IEEE
    steps are the closing division and one correctly-rounded sqrt.
    ``z_trend`` carries the sign of the raw trend (positive = rate
    rising with score). Scores must be integers; NULLs drop;
    degenerate margins (A = 0, A = N, or zero score variance) emit
    NULL statistics."""
    s = F.col(score_col).cast("long")
    y = F.col(outcome_col).cast("int")
    base = df.filter(s.isNotNull() & y.isin(0, 1)).select(
        s.alias("__s"), y.alias("__y")
    )
    per = base.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__a"),
    )
    dec = "decimal(38,0)"
    agg = per.agg(
        F.sum("__n").cast("long").alias("__nn"),
        F.sum("__a").cast("long").alias("__aa"),
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.sum((F.col("__s") * F.col("__a")).cast(dec)).alias("__sa"),
        F.sum((F.col("__s") * F.col("__n")).cast(dec)).alias("__sn"),
        F.sum((F.col("__s") * F.col("__s") * F.col("__n")).cast(dec)).alias(
            "__ssn"
        ),
    )
    nn = F.col("__nn").cast(dec)
    aa = F.col("__aa").cast(dec)
    num_i = nn * F.col("__sa") - aa * F.col("__sn")  # decimal, exact
    # the denominator splits into two exact decimal factors (each
    # ≤ ~1e22, safely inside 38 digits — their single product could
    # not be) multiplied as doubles at the close
    den_a = aa * (nn - aa)
    den_b = nn * F.col("__ssn") - F.col("__sn") * F.col("__sn")
    chi2 = (
        F.col("__nn").cast("double")
        * num_i.cast("double")
        * num_i.cast("double")
        / (den_a.cast("double") * den_b.cast("double"))
    )
    z = F.sqrt(chi2)
    ok = (den_a.cast("double") > 0) & (den_b.cast("double") > 0)
    return agg.select(
        F.col("__nn").alias("n_rows"),
        F.col("__aa").alias("n_pos"),
        "n_levels",
        F.when(
            ok,
            F.round(
                F.when(num_i < 0, -z).otherwise(z),
                6,
            ),
        ).alias("z_trend"),
        F.when(ok, F.round(chi2, 6)).alias("chi2_trend"),
    )


def bh_fdr(
    df: DataFrame,
    id_col: str,
    lane_col: str,
    alpha_num: int = 1,
    alpha_den: int = 20,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a battery of
    hypotheses — per hypothesis ``(id, p_value, rank, bh_threshold,
    rejected)``: the multiple-testing gate every per-segment metric
    sweep needs before acting on its 'significant' cells (Benjamini
    & Hochberg 1995). Rejects all hypotheses ranked ≤ k* where
    ``k* = max{k : p₍ₖ₎ ≤ k·α/m}``.

    p-values arrive as 32-bit integer LANES (``p = lane / 2³²`` —
    the engine's md5-lane convention, e.g. a permutation-test rank
    or an upstream test's discretized p), and α as the rational
    ``alpha_num/alpha_den``, so the BH compare runs ENTIRELY in the
    integer domain: ``lane·alpha_den·m ≤ rank·alpha_num·2³²`` in
    decimal(38,0) — no float compare can flip a boundary case in
    either engine. The ranking is the two-phase
    :func:`maston_spark.relational.global_rank` (no partition-less
    window at m = 10⁹ hypotheses); k* is one aggregate, broadcast
    back. Ties on the lane break by id (total order)."""
    from maston_spark.relational import global_rank

    base = df.filter(F.col(lane_col).isNotNull()).select(
        F.col(id_col), F.col(lane_col).cast("long").alias("__lane")
    )
    # round-17 (guide §1.2 — don't compute things twice): m is known
    # from global_rank's phase-2 counts action, so the old
    # ranked.agg(count) subtree (a full re-execution of the rank
    # kernel) and its broadcast join disappear; the ranked frame is
    # persisted because BOTH the k* aggregate and the final projection
    # consume it (guide §5: tiny frame, expensive recompute).
    from maston_spark.caching import scoped_persist

    ranked, total = global_rank(
        base, [F.col("__lane"), F.col(id_col)], rank_col="__rk",
        return_total=True,
    )
    dec = "decimal(38,0)"
    m_lit = F.lit(int(total)).cast("long")
    passes = (
        F.col("__lane").cast(dec) * F.lit(alpha_den).cast(dec) * m_lit.cast(dec)
        <= F.col("__rk").cast(dec) * F.lit(alpha_num).cast(dec) * F.lit(4294967296).cast(dec)
    )
    flagged = scoped_persist(
        ranked.select(
            F.col(id_col), "__lane", "__rk", m_lit.alias("__m"),
            passes.alias("__ok"),
        )
    )
    kstar = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("__ok"), F.col("__rk"))), F.lit(0)
        ).alias("__k")
    )
    return (
        flagged.join(F.broadcast(kstar))
        .select(
            F.col(id_col),
            F.round(F.col("__lane") / F.lit(4294967296.0), 9).alias("p_value"),
            F.col("__rk").alias("rank"),
            F.round(
                F.col("__rk").cast("double")
                * F.lit(float(alpha_num))
                / F.lit(float(alpha_den))
                / F.col("__m").cast("double"),
                9,
            ).alias("bh_threshold"),
            (F.col("__rk") <= F.col("__k")).alias("rejected"),
        )
        .orderBy("rank")
    )


def kendall_tau(
    df: DataFrame,
    group_col: str,
    id_col: str,
    x_col: str,
    y_col: str,
    min_rows: int = 5,
) -> DataFrame:
    """Kendall's tau-b per group — ``(group, n_rows, n_concordant,
    n_discordant, tau_b)``: the PAIRWISE rank-association member
    (Spearman's :func:`spearman_corr` is the rank-sum member), with
    the tau-b tie normalization ``(C − D) / sqrt((n₀−T_x)(n₀−T_y))``
    (Kendall 1945). Groups with fewer than ``min_rows`` rows drop;
    zero tie-adjusted variance emits NULL.

    Scale contract (the q203 family): this is an EXACT all-pairs
    operator — Σ n_g·(n_g−1)/2 pairs, so cost is Σn_g²-bounded BY
    DESIGN and the caller owns the per-group size bound (per-user
    event sequences, per-session actions — bounded-entity groups,
    never the corpus as one group).

    Round-16 optimization (guide §1.2 step 1 — fix the algorithm
    before the per-task work): the pair CLASSIFICATION now runs as a
    grouped-map numpy kernel instead of a within-group self-join.
    The join materialized Σn_g² seven-column JVM rows through a
    shuffle just to feed four integer counts per group; the grouped
    map ships each group's n_g rows across the Arrow boundary ONCE
    and counts concordant/discordant/tied pairs with O(n_g²) int64
    sign compares inside one matrix kernel — the same exact integers
    (6-grid lanes < 2⁶² ensure the int64 differences are exact), so
    the counts and the closing tau_b arithmetic (kept in Spark,
    HALF_UP rounding) are bit-identical. Pair mass still Σn_g² by
    contract; what changed is n_g² FLOPS in one task vs n_g² shuffled
    rows."""
    xi = F.round(
        F.round(F.col(x_col).cast("double"), 6) * F.lit(1000000), 0
    ).cast("long")
    yi = F.round(
        F.round(F.col(y_col).cast("double"), 6) * F.lit(1000000), 0
    ).cast("long")
    base = (
        df.filter(
            F.col(x_col).isNotNull()
            & F.col(y_col).isNotNull()
            & F.col(group_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("__g"),
            F.col(id_col).alias("__i"),
            xi.alias("__x"),
            yi.alias("__y"),
        )
    )
    counts = base.groupBy("__g").agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    big = counts.filter(F.col("n_rows") >= min_rows)
    kept = base.join(F.broadcast(big.select("__g")), "__g")

    def _pair_counts(batches):
        # groups arrive hash-partitioned and sorted, so they are
        # contiguous; the only cross-batch state is the CURRENT
        # group's rows (the semantic_dedup streaming-group pattern —
        # per-group applyInPandas paid ~1 ms of pandas slicing per
        # group, which dominated at |groups| ≫ group size)
        import numpy as np
        import pandas as pd

        def close(g, ids, x, y):
            n = len(x)
            # strict upper triangle = each unordered pair once, and
            # pairs with EQUAL ids are dropped — the former join's
            # __i1 < __i2 filter exactly (round-17 ADVICE: positional
            # pairing silently counted duplicate-id pairs). Exact
            # int64 lanes; counts are integer sums, so the row-BLOCK
            # chunking below (round-17 ADVICE: one np.triu_indices
            # call allocated O(n²) in one shot — a contract-violating
            # giant group hard-OOMed the worker instead of degrading)
            # accumulates the identical totals with O(blk·n)
            # temporaries.
            nc = nd = tx = ty = npairs = 0
            blk = max(1, (1 << 22) // max(1, n))
            for i0 in range(0, max(0, n - 1), blk):
                i1 = min(i0 + blk, n - 1)
                cnt = n - 1 - np.arange(i0, i1)
                iu = np.repeat(np.arange(i0, i1), cnt)
                csum = np.concatenate(([0], np.cumsum(cnt)))
                ju = np.arange(csum[-1]) - np.repeat(csum[:-1], cnt) + iu + 1
                keep = ids[iu] != ids[ju]
                if not keep.all():
                    iu, ju = iu[keep], ju[keep]
                sx = np.sign(x[ju] - x[iu])
                sy = np.sign(y[ju] - y[iu])
                prod = sx * sy
                nc += int((prod == 1).sum())
                nd += int((prod == -1).sum())
                tx += int((sx == 0).sum())
                ty += int((sy == 0).sum())
                npairs += len(prod)
            return (g, nc, nd, tx, ty, npairs)

        cols = ["__g", "n_concordant", "n_discordant", "__tx", "__ty", "__np"]
        cur_g, cur_i, cur_x, cur_y = None, [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            g_np = pdf["__g"].to_numpy()
            i_np = pdf["__i"].to_numpy()
            x_np = pdf["__x"].to_numpy(dtype=np.int64)
            y_np = pdf["__y"].to_numpy(dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, g_np[1:] != g_np[:-1]])
            out = []
            for s, e in zip(starts, np.r_[starts[1:], len(pdf)]):
                g = g_np[s]
                if cur_g is not None and g != cur_g:
                    out.append(
                        close(
                            cur_g,
                            np.concatenate(cur_i),
                            np.concatenate(cur_x),
                            np.concatenate(cur_y),
                        )
                    )
                    cur_i, cur_x, cur_y = [], [], []
                cur_g = g
                cur_i.append(i_np[s:e])
                cur_x.append(x_np[s:e])
                cur_y.append(y_np[s:e])
            if out:
                yield pd.DataFrame(out, columns=cols)
        if cur_g is not None:
            yield pd.DataFrame(
                [
                    close(
                        cur_g,
                        np.concatenate(cur_i),
                        np.concatenate(cur_x),
                        np.concatenate(cur_y),
                    )
                ],
                columns=cols,
            )

    g_type = dict(kept.dtypes)["__g"]
    per = (
        kept.repartition("__g")
        .sortWithinPartitions("__g")
        .mapInPandas(
            _pair_counts,
            f"__g {g_type}, n_concordant long, n_discordant long,"
            " __tx long, __ty long, __np long",
        )
    )
    c = F.col("n_concordant").cast("double")
    d = F.col("n_discordant").cast("double")
    vx = (F.col("__np") - F.col("__tx")).cast("double")
    vy = (F.col("__np") - F.col("__ty")).cast("double")
    return (
        # __np == 0 (a group with no strict-id pairs, reachable only
        # with min_rows < 2 or all-duplicate ids) replays the former
        # self-join exactly: no pair rows → the inner agg dropped the
        # group (round-17 ADVICE)
        per.filter(F.col("__np") > 0)
        .join(big, "__g")
        .select(
            F.col("__g").alias("group"),
            "n_rows",
            "n_concordant",
            "n_discordant",
            F.when(
                (vx > 0) & (vy > 0),
                F.round((c - d) / F.sqrt(vx * vy), 6),
            ).alias("tau_b"),
        )
        .orderBy("group")
    )


def dispersion_index(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Count-data overdispersion check per group — ``(group, n_rows,
    mean, variance, dispersion, overdispersed_95)``: the
    variance-to-mean ratio (Fisher's index of dispersion; 1 under
    Poisson) with the chi-square dispersion test statistic
    ``(n−1)·s²/x̄`` compared against the normal approximation of its
    95% upper bound ``(n−1) + 1.96·sqrt(2(n−1))`` — the 'is a
    Poisson rate model even admissible' gate run before any
    rate-based alarm or negative-binomial fit.

    Exact shape: integer value folds (Σx, Σx² in decimal(38,0)) off
    one combiner-reduced aggregation; the closes are a fixed IEEE
    sequence with one correctly-rounded sqrt (round 6). Groups with
    < 2 rows or zero mean emit NULLs."""
    x = F.col(value_col).cast("long")
    dec = "decimal(38,0)"
    base = df.filter(
        x.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), x.alias("__x"))
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("__x").cast(dec)).alias("__s"),
        F.sum(F.col("__x").cast(dec) * F.col("__x").cast(dec)).alias("__ss"),
    )
    n = F.col("n_rows").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    mean = s / n
    var = (n * ss - s * s) / (n * (n - F.lit(1.0)))
    disp = var / mean
    stat = (n - F.lit(1.0)) * disp
    bound = (n - F.lit(1.0)) + F.lit(1.959963984540054) * F.sqrt(
        F.lit(2.0) * (n - F.lit(1.0))
    )
    ok = (F.col("n_rows") >= 2) & (s > 0)
    return agg.select(
        F.col("__g").alias("group"),
        "n_rows",
        F.round(mean, 6).alias("mean"),
        F.when(F.col("n_rows") >= 2, F.round(var, 6)).alias("variance"),
        F.when(ok, F.round(disp, 6)).alias("dispersion"),
        F.coalesce(F.when(ok, stat > bound), F.lit(False)).alias(
            "overdispersed_95"
        ),
    ).orderBy("group")


def capture_recapture(
    df: DataFrame,
    id_col: str,
    mark_col: str,
) -> DataFrame:
    """Chapman capture-recapture population estimate — one row
    ``(n_first, n_second, n_both, n_observed, n_est, ci_lo, ci_hi)``:
    treat two overlapping observation passes (two crawls, two log
    pipelines, two dedup snapshots) as capture samples and estimate
    the UNSEEN population ``N̂ = (n₁+1)(n₂+1)/(m+1) − 1``
    (Chapman 1951, the bias-corrected Lincoln-Petersen) with the
    standard normal CI from its variance — "how many documents does
    the true universe hold that neither crawl saw?", the coverage
    planner beside q237's Chao1 (which asks the same of vocabulary
    from ONE sample's abundance profile).

    ``mark_col`` must be 1 (first pass), 2 (second pass) or 3
    (both). One integer aggregation; N̂ is an exact rational of
    integer counts (one IEEE division), the CI one fixed sqrt
    sequence (round 2 — sub-unit precision on a population count is
    noise). Zero overlap emits NULL estimates (the estimator is
    undefined, not infinite)."""
    m = F.col(mark_col).cast("int")
    agg = df.filter(m.isin(1, 2, 3)).agg(
        F.sum(m.isin(1, 3).cast("long")).alias("n_first"),
        F.sum(m.isin(2, 3).cast("long")).alias("n_second"),
        F.sum((m == 3).cast("long")).alias("n_both"),
        F.count(F.lit(1)).cast("long").alias("n_observed"),
    )
    n1 = F.col("n_first").cast("double")
    n2 = F.col("n_second").cast("double")
    mm = F.col("n_both").cast("double")
    est = (n1 + F.lit(1.0)) * (n2 + F.lit(1.0)) / (mm + F.lit(1.0)) - F.lit(
        1.0
    )
    var = (
        (n1 + F.lit(1.0))
        * (n2 + F.lit(1.0))
        * (n1 - mm)
        * (n2 - mm)
        / ((mm + F.lit(1.0)) * (mm + F.lit(1.0)) * (mm + F.lit(2.0)))
    )
    se = F.sqrt(var)
    ok = F.col("n_both") > 0
    z = F.lit(1.959963984540054)
    return agg.select(
        "n_first",
        "n_second",
        "n_both",
        "n_observed",
        F.when(ok, F.round(est, 2)).alias("n_est"),
        F.when(ok, F.round(est - z * se, 2)).alias("ci_lo"),
        F.when(ok, F.round(est + z * se, 2)).alias("ci_hi"),
    )


def isotonic_calibration(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Isotonic (PAV) calibration curve per group — per (group,
    score-bin) ``(group, bin, n_rows, n_pos, raw_rate, fitted_rate)``:
    the monotone-nondecreasing fit of the empirical positive rate
    over fixed-width score bins — the calibration MAP one actually
    deploys (Zadrozny & Elkan 2002), next to q258's Murphy
    decomposition (which only scores the miscalibration) and q213's
    reliability bins (which only display it). ``fitted_rate`` is the
    isotonic regression of ``raw_rate`` with bin counts as weights;
    reading it at a model score de-biases the score without ever
    crossing order.

    Exactness — isotonic regression decided ENTIRELY in integers:
    instead of iterative pool-adjacent-violators (sequential state,
    engine-unfriendly), the fit uses the minimax characterization
    ``ŷ_i = max_{j≤i} min_{k≥i} avg(y over bins j..k)`` (Robertson/
    Wright/Dykstra 1988 — provably the PAV solution), and every
    interval average is first rounded to the 9-grid AS A RATIONAL
    with integral half-away arithmetic (``(2p·10⁹ + q) div (2q)``,
    positive operands — Spark ``div`` and DuckDB ``//`` agree there),
    so the max-of-min runs over plain int64 nanos; a float quotient
    of p/q could land exactly ON a rounding midpoint where the
    engines' round() disagree (the q274 lesson — labels are 0/1, so
    p/q is maximally midpoint-prone). ``raw_rate``'s 6-grid uses the
    same trick. Scores must lie in [0, 1] (probability outputs; the
    boundary score 1.0 clamps into the top bin).

    Scale shape: ONE corpus pass (combiner-reduced (group, bin)
    agg); everything after is |bins|-bounded per group — prefix sums
    over ≤n_bins rows, an intervals table of n_bins(n_bins+1)/2
    rows, and a (position × interval) bounded join of ~n_bins³/6
    rows per group. The per-group window is over the BIN table, not
    the corpus."""
    g = F.col(group_col)
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    b = F.least(
        F.lit(int(n_bins) - 1),
        F.greatest(F.lit(0), F.floor(s * F.lit(int(n_bins))).cast("int")),
    )
    bins = (
        df.filter(g.isNotNull() & s.isNotNull() & y.isNotNull())
        .select(g.alias("__g"), b.alias("__b"), y.alias("__y"))
        .groupBy("__g", "__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__y").cast("long").alias("__s"),
        )
    )
    w = Window.partitionBy("__g").orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # |bins|-row frame per group — bounded by n_bins, never the corpus
    cum = bins.select(
        "__g",
        "__b",
        "__n",
        "__s",
        F.sum("__n").over(w).alias("__cn"),
        F.sum("__s").over(w).alias("__cs"),
    )
    l = cum.select(
        "__g",
        F.col("__b").alias("__j"),
        (F.col("__cn") - F.col("__n")).alias("__pn"),
        (F.col("__cs") - F.col("__s")).alias("__ps"),
    )
    r = cum.select(
        "__g",
        F.col("__b").alias("__k"),
        F.col("__cn").alias("__kn"),
        F.col("__cs").alias("__ks"),
    )
    # 9-grid nano average of the interval, half-away, all-integer:
    # decimal(38,0) `div` is exact integral division returning
    # bigint (positive operands — Spark div and DuckDB // agree)
    nano = F.expr(
        "(2 * CAST(__ks - __ps AS DECIMAL(38,0)) * 1000000000"
        " + CAST(__kn - __pn AS DECIMAL(38,0)))"
        " div (2 * CAST(__kn - __pn AS DECIMAL(38,0)))"
    )
    intervals = (
        l.join(r, "__g")
        .filter(F.col("__k") >= F.col("__j"))
        .select("__g", "__j", "__k", nano.alias("__a"))
    )
    pos = bins.select("__g", F.col("__b").alias("__i"), "__n", "__s")
    inner = (
        pos.join(intervals, "__g")
        .filter((F.col("__j") <= F.col("__i")) & (F.col("__k") >= F.col("__i")))
        .groupBy("__g", "__i", "__n", "__s", "__j")
        .agg(F.min("__a").alias("__mn"))
    )
    fit = inner.groupBy("__g", "__i", "__n", "__s").agg(
        F.max("__mn").alias("__fit")
    )
    raw_micro = F.expr("(2 * __s * 1000000 + __n) div (2 * __n)")
    return fit.select(
        F.col("__g").alias("group"),
        F.col("__i").alias("bin"),
        F.col("__n").alias("n_rows"),
        F.col("__s").alias("n_pos"),
        (raw_micro.cast("double") / F.lit(1e6)).alias("raw_rate"),
        (F.col("__fit").cast("double") / F.lit(1e9)).alias("fitted_rate"),
    ).orderBy("group", "bin")


def cem_att(
    df: DataFrame,
    stratum_cols: "list[str]",
    treat_col: str,
    outcome_cents_col: str,
) -> DataFrame:
    """Coarsened-Exact-Matching ATT (Iacus, King & Porro 2012) — one
    row ``(n_strata_total, n_strata_matched, n_treated_total,
    n_treated_matched, n_control_matched, att)``: coarsen covariates
    (caller-side — the stratum columns ARE the coarsening), keep
    only strata containing BOTH a treated and a control unit, and
    estimate the average treatment effect on the treated as the
    treated-weighted mean of within-stratum mean differences —
    causal inference that needs no model fit, no iteration, and no
    randomness, unlike propensity scores (which need a fitted
    logistic) — which is what makes it the matching estimator a SQL
    oracle can replay bit-for-bit. Read beside q221's CUPED (which
    adjusts a RANDOMIZED readout) — CEM is for the observational
    question where treatment correlated with covariates.

    Exactness: outcomes enter as INTEGER CENTS; within-stratum means
    are rounded to the 6-grid AS RATIONALS with integral half-away
    arithmetic (``(2·cents·10⁴ + n) div (2n)``, nonneg operands), so
    the stratum diff is an exact int, the ATT numerator
    ``Σ n_t,s·diff_s`` is an exact int, and the single signed close
    divides by the matched treated count with the sign-split
    ``div`` (negative numerators split so truncation == floor ==
    half-away on positive operands — the q274 discipline).

    Scale shape: one combiner-reduced (strata, treat) aggregation —
    the shuffle carries |strata|·2 rows, never units; everything
    after is strata-bounded. Unmatched treated units are REPORTED
    (n_treated_total vs matched), not silently dropped — the
    estimand changes when support is poor, and the gap is the
    caller's warning."""
    if not stratum_cols:
        raise ValueError("cem_att: need at least one stratum column")
    t = F.col(treat_col).cast("int")
    y = F.col(outcome_cents_col).cast("long")
    base = df.filter(t.isNotNull() & y.isNotNull())
    for c in stratum_cols:
        base = base.filter(F.col(c).isNotNull())
    cells = base.groupBy(*stratum_cols, t.alias("__t")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(y).cast("long").alias("__s"),
    )
    strata = cells.groupBy(*stratum_cols).agg(
        F.coalesce(F.sum(F.when(F.col("__t") == 1, F.col("__n"))), F.lit(0))
        .cast("long")
        .alias("__nt"),
        F.coalesce(F.sum(F.when(F.col("__t") == 1, F.col("__s"))), F.lit(0))
        .cast("long")
        .alias("__st"),
        F.coalesce(F.sum(F.when(F.col("__t") == 0, F.col("__n"))), F.lit(0))
        .cast("long")
        .alias("__nc"),
        F.coalesce(F.sum(F.when(F.col("__t") == 0, F.col("__s"))), F.lit(0))
        .cast("long")
        .alias("__sc"),
    )
    matched = F.col("__nt") > 0
    both = matched & (F.col("__nc") > 0)
    # 6-grid dollar mean from integer cents: (2*cents*1e4 + n) div (2n).
    # Summed cents go through decimal(38,0) — 2*__st*1e4 wraps int64
    # once a stratum's cents exceed ~4.6e14, while the DuckDB oracle
    # computes the mean in HUGEINT (round-14 ADVICE low).
    mt = F.expr(
        "(2 * cast(__st as decimal(38,0)) * 10000 + __nt) div (2 * __nt)"
    )
    mc = F.expr(
        "(2 * cast(__sc as decimal(38,0)) * 10000 + __nc) div (2 * __nc)"
    )
    per = strata.select(
        F.lit(1).alias("__one"),
        F.when(both, F.lit(1)).otherwise(F.lit(0)).alias("__m"),
        "__nt",
        "__nc",
        F.when(both, mt - mc).alias("__d"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata_total"),
        F.sum("__m").cast("long").alias("n_strata_matched"),
        F.sum("__nt").cast("long").alias("n_treated_total"),
        F.sum(F.when(F.col("__m") == 1, F.col("__nt")))
        .cast("long")
        .alias("n_treated_matched"),
        F.coalesce(F.sum(F.when(F.col("__m") == 1, F.col("__nc"))), F.lit(0))
        .cast("long")
        .alias("n_control_matched"),
        F.sum(
            F.when(
                F.col("__m") == 1,
                F.col("__nt").cast("decimal(38,0)") * F.col("__d"),
            )
        ).alias("__num"),
    )
    att_micro = F.expr(
        "CASE WHEN __num >= 0"
        " THEN (2 * __num + n_treated_matched) div (2 * n_treated_matched)"
        " ELSE -((2 * (-__num) + n_treated_matched)"
        "        div (2 * n_treated_matched)) END"
    )
    return agg.select(
        "n_strata_total",
        "n_strata_matched",
        "n_treated_total",
        "n_treated_matched",
        "n_control_matched",
        F.when(
            F.col("n_treated_matched") > 0,
            att_micro.cast("double") / F.lit(1e6),
        ).alias("att"),
    )


def regression_discontinuity(
    df: DataFrame,
    running_col: str,
    outcome_col: str,
    cutoff: float,
    bandwidth: float,
) -> DataFrame:
    """Sharp regression-discontinuity estimate (Thistlethwaite &
    Campbell 1960; Imbens & Lemieux 2008) — one row ``(n_below,
    n_above, slope_below, slope_above, intercept_below,
    intercept_above, rd_effect)``: fit one least-squares line on
    each side of the cutoff within ``bandwidth`` of it, and read the
    treatment effect as the gap between the two intercepts AT the
    cutoff — the third causal lens beside q221's CUPED (randomized)
    and q287's CEM (matched observational): here assignment is a
    deterministic threshold on the running variable, and the local
    comparison at the boundary is the identification.

    Exactness: the OLS normal equations close over EXACT integer
    folds — running/outcome values land on the 6-grid as 1e6-lanes,
    the five sufficient statistics (n, Σx, Σy, Σxx, Σxy) sum int64
    products into decimal(38,0), the common denominator
    ``n·Σxx − (Σx)²`` is nonnegative by Cauchy-Schwarz, and each
    signed rational (slope, intercept) rounds to its reporting grid
    with the sign-split integral ``div`` — no float accumulates
    anywhere, so the oracle replays the whole fit bit-for-bit. A
    side with zero x-variance reports NULL slope/intercept (and a
    NULL rd_effect); a side with NO rows inside the bandwidth makes
    the result empty — there is no discontinuity to estimate.

    Scale shape: ONE filtered corpus pass into a 2-row aggregation
    (combiner-reduced); the close is constant work. The bandwidth
    filter reaches the scan as a pushable range predicate."""
    x = F.col(running_col).cast("double")
    y = F.col(outcome_col).cast("double")
    lo, hi = float(cutoff) - float(bandwidth), float(cutoff) + float(bandwidth)
    xl = F.round(F.round(x - F.lit(float(cutoff)), 6) * F.lit(1e6), 0).cast(
        "long"
    )
    yl = F.round(F.round(y, 6) * F.lit(1e6), 0).cast("long")
    dec = "decimal(38,0)"
    base = df.filter(
        x.isNotNull() & y.isNotNull() & (x >= F.lit(lo)) & (x <= F.lit(hi))
    ).select(
        (x >= F.lit(float(cutoff))).alias("__above"),
        xl.alias("__x"),
        yl.alias("__y"),
    )
    side = base.groupBy("__above").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.sum(F.col("__y").cast(dec)).alias("__sy"),
        F.sum((F.col("__x") * F.col("__x")).cast(dec)).alias("__sxx"),
        F.sum((F.col("__x") * F.col("__y")).cast(dec)).alias("__sxy"),
    )
    den = F.expr("CAST(__n AS DECIMAL(38,0)) * __sxx - __sx * __sx")
    b_num = F.expr(
        "(CAST(__n AS DECIMAL(38,0)) * __sxy - __sx * __sy) * 1000000"
    )
    a_num = F.expr("__sy * __sxx - __sx * __sxy")
    side = side.select(
        "__above",
        "__n",
        F.col("__sx"),
        den.alias("__den"),
        b_num.alias("__bn"),
        a_num.alias("__an"),
    )
    micro = lambda n, d: (  # noqa: E731  — half-away signed integral round
        F.when(
            F.col(d) > 0,
            F.when(
                F.col(n) >= 0,
                F.expr(f"(2 * {n} + {d}) div (2 * {d})"),
            ).otherwise(F.expr(f"-((2 * (-{n}) + {d}) div (2 * {d}))")),
        )
    )
    per = side.select(
        "__above",
        "__n",
        micro("__bn", "__den").alias("__b"),
        micro("__an", "__den").alias("__a"),
    )
    below = per.filter(~F.col("__above")).select(
        F.col("__n").alias("n_below"),
        (F.col("__b").cast("double") / F.lit(1e6)).alias("slope_below"),
        (F.col("__a").cast("double") / F.lit(1e6)).alias("intercept_below"),
        F.col("__a").alias("__ab"),
    )
    above = per.filter(F.col("__above")).select(
        F.col("__n").alias("n_above"),
        (F.col("__b").cast("double") / F.lit(1e6)).alias("slope_above"),
        (F.col("__a").cast("double") / F.lit(1e6)).alias("intercept_above"),
        F.col("__a").alias("__aa"),
    )
    return below.crossJoin(F.broadcast(above)).select(
        "n_below",
        "n_above",
        "slope_below",
        "slope_above",
        "intercept_below",
        "intercept_above",
        ((F.col("__aa") - F.col("__ab")).cast("double") / F.lit(1e6)).alias(
            "rd_effect"
        ),
    )


def qini_uplift(
    df: DataFrame,
    treat_col: str,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Qini uplift curve (Radcliffe 2007) — per score-ordered bucket
    ``(bucket, n_treated, n_control, pos_treated, pos_control,
    uplift_rate, qini)``: rank ALL units by the uplift model's score
    (two-phase global rank — the q229 discipline), then per
    cumulative top-k bucket compare treated vs control response and
    read ``qini = cum_pos_t − cum_pos_c·(cum_n_t/cum_n_c)`` — the
    incremental conversions the targeting actually caused, the
    evaluation an uplift model needs where a plain gains table
    (:func:`gains_table`) would credit it for conversions that
    happened in the control arm too. A model that only predicts
    RESPONSE (not uplift) shows a flat-to-negative qini even with a
    great-looking gains curve.

    Exactness: bucket assignment is the exact integer
    ``((rank−1)·n) div N``; all counts fold as int64; the per-bucket
    ``uplift_rate`` (treated minus control rate, micro grid) and the
    cumulative ``qini`` (rounded on the RATIONAL
    ``(pt·nc − pc·nt)/nc`` with the sign-split integral div) never
    pass through a float until the one reporting division each.
    Buckets with an empty cumulative control arm emit NULL qini.

    Scale shape: one two-phase rank (the only full shuffle), one
    (bucket, arm) aggregation, then |buckets|-row cumulative frames."""
    from maston_spark.relational import global_rank

    base = df.filter(
        F.col(score_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(treat_col).isNotNull()
    ).select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
        F.col(treat_col).cast("int").alias("__tr"),
        F.col(tiebreak_col).alias("__t"),
    )
    ranked = global_rank(
        base, [F.col("__s").desc(), F.col("__t").asc()], rank_col="__rn"
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    cells = (
        ranked.join(F.broadcast(tot))
        .select(
            F.expr(f"((__rn - 1) * {int(n_buckets)}) div __n")
            .cast("int")
            .alias("bucket"),
            "__tr",
            "__y",
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.col("__tr")).cast("long").alias("n_treated"),
            F.sum(1 - F.col("__tr")).cast("long").alias("n_control"),
            F.sum(F.col("__tr") * F.col("__y")).cast("long").alias("pos_treated"),
            F.sum((1 - F.col("__tr")) * F.col("__y"))
            .cast("long")
            .alias("pos_control"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # |buckets|-row frame — bounded by n_buckets, never the corpus
    ct = F.sum("n_treated").over(w)
    cc = F.sum("n_control").over(w)
    pt = F.sum("pos_treated").over(w)
    pc = F.sum("pos_control").over(w)
    cum = cells.select(
        "bucket",
        "n_treated",
        "n_control",
        "pos_treated",
        "pos_control",
        ct.alias("__ct"),
        cc.alias("__cc"),
        pt.alias("__pt"),
        pc.alias("__pc"),
    )
    # per-bucket uplift rate on the micro grid: the signed rational
    # (pos_t*n_c - pos_c*n_t) / (n_t*n_c)
    # all products in decimal(38,0): cum pos×count reaches ~9.2e18 at
    # sf10-scale events, wrapping int64 in non-ANSI Spark while the
    # DuckDB oracle computes in HUGEINT (round-14 ADVICE medium)
    uplift = F.when(
        (F.col("n_treated") > 0) & (F.col("n_control") > 0),
        F.expr(
            "CASE WHEN cast(pos_treated as decimal(38,0)) * n_control"
            "          - cast(pos_control as decimal(38,0)) * n_treated >= 0"
            " THEN (2 * (cast(pos_treated as decimal(38,0)) * n_control"
            "            - cast(pos_control as decimal(38,0)) * n_treated)"
            "       * 1000000 + cast(n_treated as decimal(38,0)) * n_control)"
            "      div (2 * cast(n_treated as decimal(38,0)) * n_control)"
            " ELSE -((2 * (cast(pos_control as decimal(38,0)) * n_treated"
            "              - cast(pos_treated as decimal(38,0)) * n_control)"
            "         * 1000000 + cast(n_treated as decimal(38,0)) * n_control)"
            "        div (2 * cast(n_treated as decimal(38,0)) * n_control))"
            " END"
        ).cast("double")
        / F.lit(1e6),
    )
    qini = F.when(
        F.col("__cc") > 0,
        F.expr(
            "CASE WHEN cast(__pt as decimal(38,0)) * __cc"
            "          - cast(__pc as decimal(38,0)) * __ct >= 0"
            " THEN (2 * (cast(__pt as decimal(38,0)) * __cc"
            "            - cast(__pc as decimal(38,0)) * __ct)"
            "       * 1000000 + __cc)"
            "      div (2 * cast(__cc as decimal(38,0)))"
            " ELSE -((2 * (cast(__pc as decimal(38,0)) * __ct"
            "              - cast(__pt as decimal(38,0)) * __cc)"
            "         * 1000000 + __cc)"
            "        div (2 * cast(__cc as decimal(38,0)))) END"
        ).cast("double")
        / F.lit(1e6),
    )
    return cum.select(
        "bucket",
        "n_treated",
        "n_control",
        "pos_treated",
        "pos_control",
        uplift.alias("uplift_rate"),
        qini.alias("qini"),
    ).orderBy("bucket")


def quantile_treatment_effects(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    quantiles: "tuple[float, ...]" = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Quantile treatment effects (Doksum 1974; Firpo 2007) — one row
    per quantile ``(quantile, n_treated, n_control, q_treated,
    q_control, qte)``: the horizontal gap between the treated and
    control outcome DISTRIBUTIONS at each quantile — the
    distributional readout the mean-effect family (CUPED, CEM ATT,
    DiD, RD) cannot give: a treatment that helps the median user but
    hurts the tail shows qte(0.5) > 0 > qte(0.9) while every mean
    estimator reports a wash.

    Exactness: each arm's quantiles are
    :func:`maston_spark.relational.exact_percentiles` order
    statistics (value-histogram ranks, the ``percentile_cont``
    interpolation form pinned bit-identical to DuckDB's
    quantile_cont); the qte is one IEEE subtraction of two
    bit-parity doubles — no rounding anywhere, so the oracle matches
    exactly or the build fails loudly.

    Scale shape: ONE value-histogram aggregation per arm (shuffle
    bounded by distinct outcome values), |quantiles| flag rows to
    the close — the q15 discipline with the treatment arm as the
    group key."""
    from maston_spark.relational import exact_percentiles

    t = F.col(treat_col).cast("int")
    y = F.col(outcome_col)
    base = df.filter(t.isNotNull() & y.isNotNull()).select(
        t.alias("__arm"), y.alias("__y")
    )
    aliases = [f"q{int(round(q * 100)):02d}" for q in quantiles]
    pct = exact_percentiles(base, "__arm", "__y", list(quantiles), aliases)
    counts = base.groupBy("__arm").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    both = pct.join(counts, "__arm")
    tr = both.filter(F.col("__arm") == 1)
    ct = both.filter(F.col("__arm") == 0)
    out = None
    for q, a in zip(quantiles, aliases):
        piece = (
            tr.select(
                F.lit(float(q)).alias("quantile"),
                F.col("__n").alias("n_treated"),
                F.col(a).alias("q_treated"),
            )
            .crossJoin(
                F.broadcast(
                    ct.select(
                        F.col("__n").alias("n_control"),
                        F.col(a).alias("q_control"),
                    )
                )
            )
            .select(
                "quantile",
                "n_treated",
                "n_control",
                "q_treated",
                "q_control",
                (F.col("q_treated") - F.col("q_control")).alias("qte"),
            )
        )
        out = piece if out is None else out.unionByName(piece)
    return out.orderBy("quantile")


def ips_offpolicy_value(
    df: DataFrame,
    action_col: str,
    reward_col: str,
    target_action_col: str,
) -> DataFrame:
    """Off-policy value estimate of a deterministic target policy
    from logged bandit feedback (Horvitz-Thompson IPS; SNIPS —
    Swaminathan & Joachims 2015) — one row ``(n, n_matched,
    ips_value, snips_value, ess)``: what reward-per-decision the
    TARGET policy would have earned, estimated from logs collected
    under a DIFFERENT policy by weighting each matching decision
    with the inverse of its logging propensity. The propensities are
    the plug-in marginal action frequencies ``p(a) = n_a/n`` (the
    standard estimator when the logger didn't record them), so the
    per-action weight is the exact rational ``n/n_a``. SNIPS
    self-normalizes by the realized weight mass (kills the IPS
    variance blow-up when the target prefers rare logged actions);
    ESS ``(Σw)²/Σw²`` says how many effective samples the estimate
    really rests on — the triple every RLHF/bandit data pipeline
    reports before trusting an off-policy number.

    Exactness: per-action numerators fold as int64 micro-lanes of
    the reward; every division is a sign-split half-away integral
    div in decimal(38,0) at a documented lane (per-action micro/nano
    rounding, then exact sums — the oracle replays each lane).

    Scale shape: ONE combiner-reduced per-action aggregation
    (shuffle bounded by |actions|), then |actions|-row closing
    arithmetic."""
    dec = "decimal(38,0)"
    a = F.col(action_col)
    r = F.round(F.col(reward_col).cast("double"), 6) * 1e6
    base = df.filter(
        a.isNotNull()
        & F.col(reward_col).isNotNull()
        & F.col(target_action_col).isNotNull()
    ).select(
        a.alias("__a"),
        F.round(r, 0).cast("long").alias("__r"),
        (a == F.col(target_action_col)).cast("int").alias("__m"),
    )
    per = base.groupBy("__a").agg(
        F.count(F.lit(1)).cast("long").alias("__na"),
        F.sum(F.when(F.col("__m") == 1, F.col("__r"))).alias("__num"),
        F.sum("__m").cast("long").alias("__ma"),
    )

    def halfdiv(num, den):
        return (
            f"CASE WHEN {num} >= 0"
            f" THEN (2 * ({num}) + ({den})) div (2 * ({den}))"
            f" ELSE -((2 * (-({num})) + ({den})) div (2 * ({den}))) END"
        )

    lanes = per.select(
        "__na",
        "__ma",
        F.expr(
            halfdiv(f"coalesce(cast(__num as {dec}), cast(0 as {dec}))", "__na")
        ).alias("__c"),  # micro: num_a / n_a
        F.expr(
            halfdiv(f"cast(__ma as {dec}) * 1000000000", "__na")
        ).alias("__w1"),  # nano: m_a / n_a
        F.expr(
            halfdiv(
                f"cast(__ma as {dec}) * 1000000000000",
                f"cast(__na as {dec}) * __na",
            )
        ).alias("__w2"),  # pico: m_a / n_a²
    )
    agg = lanes.agg(
        F.sum("__na").cast("long").alias("n"),
        F.sum("__ma").cast("long").alias("n_matched"),
        F.sum(F.col("__c").cast(dec)).alias("__s0"),
        F.sum(F.col("__w1").cast(dec)).alias("__s1"),
        F.sum(F.col("__w2").cast(dec)).alias("__s2"),
    )
    ips = F.col("__s0").cast("double") / F.lit(1e6)
    snips = F.when(
        F.col("__s1") > 0,
        F.expr(halfdiv("__s0 * 1000000000", "__s1")).cast("double")
        / F.lit(1e6),
    )
    # ess·1e6 = (s1/1e9)² / (s2/1e12) · 1e6 = __s1²/__s2 exactly
    ess = F.when(
        F.col("__s2") > 0,
        F.expr(halfdiv("__s1 * __s1", "__s2")).cast("double")
        / F.lit(1e6),
    )
    return agg.select(
        "n", "n_matched", ips.alias("ips_value"),
        snips.alias("snips_value"), ess.alias("ess"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimate with right censoring
    (Nelson 1972; Aalen 1978) — one row per distinct event time
    ``(t, n_risk, n_events, n_censored, cum_hazard,
    cum_hazard_var)``: the additive-hazard companion to
    :func:`kaplan_meier`'s product-limit curve. The hazard SCALE is
    what the survival scale hides: H(t) plots ~linear under a
    constant rate, so a bend IS a rate change (the q272 CUSUM
    question asked of lifetimes), and ``exp(−H)`` ≥ KM gives the
    Fleming-Harrington cross-check. Variance is the Poisson-type
    ``Σ d/n²``.

    Exactness — unlike KM's ln/exp replay, the NA estimator is PURE
    RATIONAL: per event time the increments ``d/n`` and ``d/n²``
    close as half-away integer lanes (nano and pico respectively,
    the denominators exact in decimal(38,0)), the cumulative sums
    fold exact integers, and the two reporting divisions are the
    only IEEE steps. Same preconditions as KM: NULL and negative
    durations drop; cumulative windows run over the |distinct t|
    table, bounded by the duration domain, never the subject
    count."""
    dec = "decimal(38,0)"
    d = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & (F.col(duration_col) >= 0)
    ).select(
        F.col(duration_col).cast("long").alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
    )
    per = d.groupBy("__t").agg(
        F.sum("__e").cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum("__e")).cast("long").alias("n_censored"),
    )
    tot = per.agg(
        F.sum(F.col("n_events") + F.col("n_censored")).cast("long").alias("__n")
    )
    w_prior = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1
    )  # |distinct t| table — bounded-domain precondition
    w_incl = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    left_before = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_prior), F.lit(0)
    )
    staged = (
        per.join(F.broadcast(tot))
        .select(
            "__t",
            "n_events",
            "n_censored",
            (F.col("__n") - left_before).alias("n_risk"),
        )
        .select(
            "*",
            F.expr(
                "(2 * cast(n_events as decimal(38,0)) * 1000000000 + n_risk)"
                " div (2 * n_risk)"
            ).alias("__h"),  # nano lane of d/n
            F.expr(
                "(2 * cast(n_events as decimal(38,0)) * 1000000000000"
                " + cast(n_risk as decimal(38,0)) * n_risk)"
                " div (2 * cast(n_risk as decimal(38,0)) * n_risk)"
            ).alias("__v"),  # pico lane of d/n²
        )
    )
    return staged.select(
        F.col("__t").alias("t"),
        "n_risk",
        "n_events",
        "n_censored",
        (
            F.sum(F.col("__h").cast(dec)).over(w_incl).cast("double")
            / F.lit(1e9)
        ).alias("cum_hazard"),
        (
            F.sum(F.col("__v").cast(dec)).over(w_incl).cast("double")
            / F.lit(1e12)
        ).alias("cum_hazard_var"),
    ).orderBy("t")


def aalen_johansen(
    df: DataFrame,
    duration_col: str,
    cause_col: str,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under COMPETING RISKS
    (Aalen & Johansen 1978) — one row per (distinct time, cause)
    ``(t, cause, n_risk, n_events, cif)``: the probability of
    failing FROM cause k by time t when other causes can claim a
    subject first. ``1 − KM_k`` (treating other causes as censoring)
    over-counts — a subject taken by cause 2 at time 5 was never
    available to fail from cause 1 at time 9 — while
    ``CIF_k(t) = Σ_{s≤t} S(s−)·d_k(s)/n(s)`` (S = ALL-cause KM
    survival) partitions the probability space exactly:
    ``Σ_k CIF_k(t) = 1 − S(t)``, the identity the single-cause hand
    case reduces to (one cause → CIF = 1 − KM).

    ``cause_col``: 0 = right-censored, any positive integer = a
    failure cause. Cross-engine determinism is the q246+q308 hybrid:
    S(t−) replays the KM ln/exp discipline (per-step logs rounded to
    the 9-grid, order-fixed prefix sum, exp rounded back ONTO an
    integer nano lane ``s9``), then each increment closes EXACTLY as
    the pico half-away lane ``(2·s9·d_k·1000 + n) div (2n)`` — so
    the per-cause cumulative sum folds exact integers and the one
    reporting division ``/1e12`` is the only remaining IEEE step
    (the q274/q308 positive-operand div contract). A time where the
    whole risk set dies sends every later S(t−) to exact 0.

    Scale shape: one groupBy(t) census + one groupBy(t, cause)
    split, cumulative windows over the |distinct t| table (bounded
    duration domain — pre-bucket continuous durations, the KM
    precondition), a broadcast |causes| grid fill so every cause has
    a row at every time (CIFs are flat where the cause is quiet),
    and |distinct t|·|causes| result rows. NULL and negative
    durations drop, as do NULL causes."""
    dec = "decimal(38,0)"
    d = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(cause_col).isNotNull()
        & (F.col(duration_col) >= 0)
    ).select(
        F.col(duration_col).cast("long").alias("__t"),
        F.col(cause_col).cast("int").alias("__k"),
    )
    per = d.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("__m"),
        F.sum((F.col("__k") > 0).cast("long")).cast("long").alias("__d_all"),
    )
    perk = (
        d.filter(F.col("__k") > 0)
        .groupBy("__t", F.col("__k").alias("cause"))
        .agg(F.count(F.lit(1)).cast("long").alias("__dk"))
    )
    tot = per.agg(F.sum("__m").cast("long").alias("__n"))
    w_prior = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1
    )  # |distinct t| table — bounded-domain precondition
    risk = (
        per.join(F.broadcast(tot))
        .select(
            "__t",
            "__d_all",
            (
                F.col("__n")
                - F.coalesce(F.sum("__m").over(w_prior), F.lit(0))
            ).alias("n_risk"),
        )
    )
    # KM ln-lane for the ALL-cause survival prefix S(t−)
    lg = risk.select(
        "__t",
        "n_risk",
        "__d_all",
        F.when(
            F.col("__d_all") < F.col("n_risk"),
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("__d_all").cast("double")
                    / F.col("n_risk").cast("double")
                ),
                9,
            ),
        ).alias("__lg"),
    )
    dead_prev = F.coalesce(
        F.max(F.when(F.col("__lg").isNull(), 1).otherwise(0)).over(w_prior),
        F.lit(0),
    )
    s9 = F.when(dead_prev == 1, F.lit(0).cast("long")).otherwise(
        F.round(
            F.exp(F.coalesce(F.sum("__lg").over(w_prior), F.lit(0.0)))
            * F.lit(1e9),
            0,
        ).cast("long")
    )
    st = lg.select("__t", "n_risk", s9.alias("__s9"))
    causes = (
        d.filter(F.col("__k") > 0)
        .select(F.col("__k").alias("cause"))
        .distinct()
    )  # |causes| rows — tiny by contract, broadcast grid fill
    grid = st.join(F.broadcast(causes))
    g2 = grid.join(perk, ["__t", "cause"], "left").select(
        "__t",
        "cause",
        "n_risk",
        "__s9",
        F.coalesce(F.col("__dk"), F.lit(0)).cast("long").alias("n_events"),
    )
    inc = g2.select(
        "*",
        F.expr(
            "(2 * cast(__s9 as decimal(38,0)) * n_events * 1000 + n_risk)"
            " div (2 * n_risk)"
        ).alias("__pico"),
    )
    w_cause = (
        Window.partitionBy("cause")
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return inc.select(
        F.col("__t").alias("t"),
        "cause",
        "n_risk",
        "n_events",
        (
            F.sum(F.col("__pico").cast(dec)).over(w_cause).cast("double")
            / F.lit(1e12)
        ).alias("cif"),
    ).orderBy("t", "cause")


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    tau: int,
) -> DataFrame:
    """Restricted mean survival time (Royston & Parmar 2013 for the
    readout; the estimator is the τ-truncated area under
    :func:`kaplan_meier`'s curve) — ONE row ``(tau, n_subjects,
    n_events, rmst, rmst_lost)``: the average survival time over the
    first τ units, the single number the whole KM curve collapses to
    when arms must be compared without proportional-hazards faith
    (medians break under heavy censoring; means are undefined with
    an open tail — the τ-restricted area is always estimable).
    ``rmst_lost = τ − rmst`` is the companion "time lost" readout.

    Exactness: the KM curve's survival values are already on the
    1e-6 grid (q246's round-6 contract), interval widths are exact
    integers, so every trapezoid-free step-area term
    ``S(t_i)·(min(t_{i+1}, τ) − t_i)`` is an exact integer in
    micro·unit lanes: the fold is an exact decimal sum with ONE
    closing division. The leading ``1·(t₁ − 0)`` strip (S = 1 before
    the first distinct time) is included; steps at or past τ
    contribute nothing.

    Scale shape: :func:`kaplan_meier`'s census (one groupBy(t) +
    |distinct t| windows), then a lead-window step-area fold over
    the |distinct t| table and a 1-row close."""
    km = kaplan_meier(df, duration_col, event_col)
    w = Window.orderBy("t")
    stepped = km.select(
        "t",
        "n_events",
        # explicit round before the decimal cast: survival is a
        # 6-grid double whose ×1e6 image can sit one ulp under the
        # integer; round() agrees cross-engine, bare casts may not
        F.round(F.col("survival") * F.lit(1e6), 0)
        .cast("decimal(38,0)")
        .alias("__s6"),
        F.lead("t").over(w).alias("__nt"),  # |distinct t| table
    )
    # interval [t_i, min(next_t, tau)); clamp negatives to zero
    width = F.greatest(
        F.least(F.coalesce(F.col("__nt"), F.lit(int(tau))), F.lit(int(tau)))
        - F.least(F.col("t"), F.lit(int(tau))),
        F.lit(0),
    )
    first_t = F.min("t").over(
        Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    lead_strip = F.least(first_t, F.lit(int(tau))).cast("decimal(38,0)") * F.lit(
        1000000
    ).cast("decimal(38,0)")
    agg = stepped.select(
        (F.col("__s6") * width.cast("decimal(38,0)")).alias("__area"),
        lead_strip.alias("__lead"),
        "n_events",
        F.lit(1).alias("__k"),
    ).groupBy("__k").agg(
        F.sum("__area").alias("__a"),
        F.max("__lead").alias("__l"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("__rows"),
    )
    n_subj = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & (F.col(duration_col) >= 0)
    ).agg(F.count(F.lit(1)).cast("long").alias("n_subjects"), F.lit(1).alias("__k"))
    return (
        agg.join(F.broadcast(n_subj), "__k")
        .select(
            F.lit(int(tau)).cast("long").alias("tau"),
            "n_subjects",
            "n_events",
            ((F.col("__a") + F.col("__l")).cast("double") / F.lit(1e6)).alias(
                "rmst"
            ),
            (
                F.lit(float(tau))
                - (F.col("__a") + F.col("__l")).cast("double") / F.lit(1e6)
            ).alias("rmst_lost"),
        )
    )


def sprt_evalue(
    df: DataFrame,
    group_col: str,
    y_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
) -> DataFrame:
    """Anytime-valid sequential test via the Wald SPRT e-value
    (Wald 1945; Ramdas et al. 2023 frame it as e-process betting) —
    per group ``(group, n, k, log10_e, e_crossed)``: the likelihood
    ratio ``E = (p1/p0)^k · ((1−p1)/(1−p0))^(n−k)`` is a test
    MARTINGALE under H0: p = p0, so by Ville's inequality
    ``P(sup E ≥ 1/α) ≤ α`` and the threshold can be checked after
    EVERY observation — the monitoring discipline the fixed-n
    battery (q220 Wilson, q240 SRM, two_proportion_ztest) cannot
    offer: peeking at a z-test inflates α; peeking at an e-process
    is the design. The state is the additive ``(n, k)`` counter
    pair, so the running statistic folds across micro-batches with
    zero error — the q272/q314 counter discipline applied to
    inference.

    Determinism (the q242 no-in-engine-libm discipline): the two
    per-observation log₁₀ increments are PYTHON-side literals
    embedded into the plan — ``c1 = log10(p1/p0)``, ``c0 =
    log10((1−p1)/(1−p0))`` — so both engines fold
    ``k·c1 + (n−k)·c0`` with identical IEEE arithmetic; round 6.
    ``e_crossed`` compares against the exact literal
    ``−log10(alpha)``. NULL y drops; one combiner-reduced
    aggregation, |groups| result rows."""
    from math import log10

    c1 = log10(p1 / p0)
    c0 = log10((1.0 - p1) / (1.0 - p0))
    thresh = -log10(alpha)
    y = F.col(y_col).cast("int")
    agg = (
        df.filter(y.isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).cast("long").alias("k"),
        )
    )
    log_e = F.round(
        F.col("k") * F.lit(c1) + (F.col("n") - F.col("k")) * F.lit(c0), 6
    )
    return agg.select(
        "group",
        "n",
        "k",
        log_e.alias("log10_e"),
        (log_e >= F.lit(thresh)).alias("e_crossed"),
    ).orderBy("group")
