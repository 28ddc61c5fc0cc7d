"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard.

100 TB design rules baked in:
- NEVER all-pairs. Candidate generation is always a bucketed
  equi-join (LSH band buckets / simhash prefix), so the shuffle key
  is the bucket and work is linear-ish in corpus size.
- All hashing is md5-based (cross-engine deterministic), built-in
  functions only — the whole pipeline is JVM-side codegen.
- Verification (exact Jaccard) runs only on candidate pairs.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified
                     # type hints against these module globals

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_NUM_HASHES = 16
DEFAULT_BAND_SIZE = 4


def content_hash(col) -> Column:
    """Normalized content hash for exact dedup."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical documents: keeper = min id, n_copies per hash.

    Single shuffle on the 128-bit hash — uniformly distributed, no
    skew (identical docs beyond ~1 partition's worth of copies would
    be the only skew source; AQE skew handling covers it).
    """
    return (
        df.select(content_hash(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct normalized content."""
    from pyspark.sql import Window

    w = Window.partitionBy(content_hash(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(text_col, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) of the whitespace-tokenized text."""
    toks = F.split(text_col, r"\s+")
    # guard: sequence(1, 0) would produce a DESCENDING [1, 0] in Spark,
    # so short texts get an explicit empty shingle list
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


# Universal-hash MinHash parameters. One md5 per shingle (the 32-bit
# lane below), then each of the NUM_HASHES permutations is plain
# integer arithmetic — 16x fewer digest computations than hashing
# per (seed, shingle), and byte-identical in any SQL engine.
MINHASH_PRIME = 4_294_967_311          # smallest prime > 2^32
MINHASH_A0, MINHASH_B0 = 1_664_525, 1_013_904_223   # LCG-style constants


def shingle_hash_lane(sh: Column) -> Column:
    """32-bit integer lane of md5(shingle): first 8 hex digits."""
    return F.conv(F.substring(F.md5(sh), 1, 8), 16, 10).cast("long")


def shingle_hashes(shingle_col) -> Column:
    """array<long>: one 32-bit hash per shingle (md5 computed ONCE).

    Callers must materialize this in its own projection (a separate
    ``select``) before fanning out to the per-seed mins — Catalyst's
    CollapseProject keeps the boundary because the expression is
    non-cheap, so the md5 pass runs once however many seeds read it.
    """
    return F.transform(shingle_col, shingle_hash_lane)


def minhash_value(hashes_col, seed: int) -> Column:
    """MinHash component ``seed``: min of (a_s*h + b_s) mod p."""
    a, b = MINHASH_A0 + 2 * seed, MINHASH_B0 + seed
    return F.array_min(
        F.transform(hashes_col, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME))
    )


def minhash_signature(hashes_col, num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    """Full MinHash signature as one array column (input = the
    materialized :func:`shingle_hashes` column)."""
    return F.array(*[minhash_value(hashes_col, s) for s in range(num_hashes)])


def lsh_band_buckets(
    hashes_col, num_hashes: int = DEFAULT_NUM_HASHES, band_size: int = DEFAULT_BAND_SIZE
) -> Column:
    """array<struct<band, bucket>> over the per-shingle hash column."""
    n_bands = num_hashes // band_size
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            minhash_value(hashes_col, b * band_size + i).cast("string")
                            for i in range(band_size)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )


def shingle_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh) with non-empty shingle sets — the shared upstream of
    candidate generation AND verification. Callers that consume it
    more than once should ``persist()`` it (at cluster scale: write
    the signature table once, read many — shingling is the CPU-heavy
    stage and must not be recomputed per consumer).

    The corpus is repartitioned before shingling: document tables
    often arrive in few splits; spreading the CPU-heavy stage across
    the cluster costs one tiny shuffle.
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    return spread.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)


def lane_frame(shf: DataFrame) -> DataFrame:
    """(id, hv): per-shingle 32-bit md5 lanes, distinct per doc.
    This is the table to persist/write at scale — signatures,
    candidate buckets, and hashed-shingle Jaccard all derive from it
    with integer-only work."""
    return shf.select("id", F.array_distinct(shingle_hashes(F.col("sh"))).alias("hv"))


def candidates_from_lanes(
    lf: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket, from
    a :func:`lane_frame`. The join is per-bucket (equi on
    (band, bucket)) — never all-pairs; bucket sizes are bounded by
    collision probability, and a pathological hot bucket is split by
    AQE skew join."""
    hv = lf
    # Explode the band array INLINE (generator = the array expression).
    # Materializing it as a column first and exploding the attribute
    # invites GeneratorNestedColumnAliasing to duplicate the whole
    # 16-min computation per extracted field (measured 10x slower).
    buckets = hv.select(
        "id", F.explode(lsh_band_buckets("hv", num_hashes, band_size)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def shingle_lane_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, lane) — one row per shingle occurrence, fully codegen.

    Higher-order functions (transform/aggregate) drop out of
    whole-stage codegen into interpreted per-element evaluation —
    measured ~10x slower than this explode + window + md5 shape on
    the same corpus. Tokens explode to rows, ``lead`` builds the
    n-gram within each doc (one hash shuffle on id), and the md5
    lane is a plain codegen projection.
    """
    toks = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    ).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "tok"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    cols = [F.col("tok")] + [
        F.lead("tok", i).over(w).alias(f"__t{i}") for i in range(1, shingle_n)
    ]
    last = F.lead("tok", shingle_n - 1).over(w)
    withs = toks.select("id", *cols, last.alias("__last"))
    sh = withs.filter(F.col("__last").isNotNull()).select(
        "id",
        F.concat_ws(
            " ", "tok", *[f"__t{i}" for i in range(1, shingle_n)]
        ).alias("shingle"),
    )
    return sh.select("id", shingle_hash_lane(F.col("shingle")).alias("lane"))


def minhash_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """(id, hv, mh0..mh{n-1}): distinct lanes + all MinHash components
    in ONE codegen aggregation over the exploded lane rows. Docs with
    fewer than ``shingle_n`` tokens disappear (no shingles), matching
    :func:`shingle_frame`'s non-empty filter.

    This is the table to persist / write at scale: signatures and
    hashed-shingle Jaccard both read from it."""
    rows = shingle_lane_rows(df, text_col, id_col, shingle_n)
    mins = [
        F.min(
            (F.lit(MINHASH_A0 + 2 * s) * F.col("lane") + F.lit(MINHASH_B0 + s))
            % F.lit(MINHASH_PRIME)
        ).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return rows.groupBy("id").agg(F.collect_set("lane").alias("hv"), *mins)


def candidates_from_minhash(
    mf: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket, from
    a :func:`minhash_frame`."""
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * band_size + i}").cast("string")
                            for i in range(band_size)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = mf.select("id", F.explode(bands).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """Candidate near-duplicate pairs from raw text — convenience
    wrapper over :func:`minhash_frame` + :func:`candidates_from_minhash`."""
    return candidates_from_minhash(
        minhash_frame(df, text_col, id_col, shingle_n, num_hashes),
        num_hashes,
        band_size,
    )


def jaccard_from_lanes(
    lf: DataFrame, candidates: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Jaccard on candidate pairs over hashed shingles (32-bit md5
    lanes): integer set intersection instead of string sets — same
    result modulo negligible 32-bit collisions, and deterministic, so
    an oracle computes it identically."""
    a = lf.select(F.col("id").alias("id_a"), F.col("hv").alias("hv_a"))
    b = lf.select(F.col("id").alias("id_b"), F.col("hv").alias("hv_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("hv_a", "hv_b"))
    union = F.size(F.array_union("hv_a", "hv_b"))
    return (
        joined.select(
            "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)
    )


def rare_shingle_candidates(lf: DataFrame, max_df: int = 20) -> DataFrame:
    """Inverted-index candidate pairs for CONTAINMENT detection: two
    docs are candidates when they share a RARE hashed shingle
    (document frequency in [2, max_df]). MinHash-LSH candidates
    (:func:`candidates_from_minhash`) recall pairs with probability
    ~J^band_size — an excerpt fully contained in a 100× larger doc
    has near-zero Jaccard and essentially never collides in a band,
    yet shares EVERY one of its shingles with the container; the
    inverted index finds it from any single shared rare shingle.

    Scale shape: one doc-frequency agg (map-side combinable, shuffle
    = distinct lanes), then a self-equi-join restricted to the rare
    lanes — ``max_df`` bounds the per-lane fan-out at ≤ max_df² pairs
    AND drops boilerplate shingles (the lanes a web corpus shares
    millions of ways) exactly as a production dedup must. ``lf`` is a
    :func:`minhash_frame` (reads its ``hv`` lane sets)."""
    lanes = lf.select("id", F.explode("hv").alias("lane"))
    rare = lanes.join(
        lanes.groupBy("lane")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("lane"),
        "lane",
    )
    a = rare.alias("a")
    b = rare.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lane") == F.col("b.lane"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def containment_from_lanes(
    lf: DataFrame, candidates: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """One-sided set containment on candidate pairs (Broder 1997):
    ``c_a = |A∩B| / |A|`` and ``c_b = |A∩B| / |B|`` over the hashed
    shingle sets — the duplication the symmetric Jaccard misses: a
    100-token excerpt inside a 10k-token page has J ≈ 0.01 but
    containment 1.0. A pair survives when EITHER direction clears
    ``threshold`` (quote, boilerplate block, or prefix republication).
    Same integer-lane determinism as :func:`jaccard_from_lanes`, so
    an oracle replays it exactly."""
    a = lf.select(F.col("id").alias("id_a"), F.col("hv").alias("hv_a"))
    b = lf.select(F.col("id").alias("id_b"), F.col("hv").alias("hv_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("hv_a", "hv_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / F.size("hv_a"), 6).alias("containment_a"),
            F.round(inter / F.size("hv_b"), 6).alias("containment_b"),
        )
        .filter(
            F.greatest("containment_a", "containment_b") >= threshold
        )
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard on candidate pairs (n-gram string set overlap)
    from raw text."""
    shf = shingle_frame(df, text_col, id_col, shingle_n)
    a = shf.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shf.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.select(
            "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)
    )


def source_dup_matrix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-source duplication-rate matrix: for every unordered pair
    of corpus sources, how many near-duplicate pairs span them and
    what fraction of each source's documents is implicated —
    ``(source_a, source_b, n_dup_pairs, n_docs_a, n_docs_b,
    dup_rate_a, dup_rate_b)``. This is the mixing-weights audit that
    answers "which of my crawls mirror each other?" BEFORE sources
    are weighted (complements :func:`~maston_spark.llm.text
    .source_vocab_overlap`, which compares vocabularies, not
    documents). Same-source rows report within-source duplication.

    Distributed shape: candidate generation is the banded MinHash-LSH
    equi-join (never all-pairs); sources attach to the surviving
    pairs via two equi-joins on the doc id (pair table ≪ corpus);
    the matrix aggregations combine map-side down to ≤ |sources|²
    rows, and the per-source totals are a broadcast-joined
    |sources|-row table.
    """
    from maston_spark.caching import scoped_persist

    mf = scoped_persist(
        minhash_frame(df, text_col, id_col, shingle_n, num_hashes)
    )
    cands = candidates_from_minhash(mf, num_hashes, band_size)
    pairs = jaccard_from_lanes(mf, cands, threshold)
    srcmap = df.select(
        F.col(id_col).alias("id"), F.col(source_col).alias("src")
    )
    p = (
        pairs.join(
            srcmap.select(F.col("id").alias("id_a"), F.col("src").alias("src_a")),
            "id_a",
        )
        .join(
            srcmap.select(F.col("id").alias("id_b"), F.col("src").alias("src_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "src_a",
            "src_b",
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
    )
    pair_counts = p.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_pairs")
    )
    ends = p.select(
        "source_a", "source_b", F.col("src_a").alias("src_end"), F.col("id_a").alias("id")
    ).unionByName(
        p.select(
            "source_a", "source_b", F.col("src_b").alias("src_end"), F.col("id_b").alias("id")
        )
    )
    doc_counts = ends.groupBy("source_a", "source_b").agg(
        F.count_distinct(
            F.when(F.col("src_end") == F.col("source_a"), F.col("id"))
        )
        .cast("long")
        .alias("n_docs_a"),
        F.count_distinct(
            F.when(F.col("src_end") == F.col("source_b"), F.col("id"))
        )
        .cast("long")
        .alias("n_docs_b"),
    )
    totals = df.groupBy(F.col(source_col).alias("src")).agg(
        F.count(F.lit(1)).cast("long").alias("total")
    )
    return (
        pair_counts.join(doc_counts, ["source_a", "source_b"])
        .join(
            F.broadcast(totals.select(F.col("src").alias("source_a"), F.col("total").alias("__ta"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("src").alias("source_b"), F.col("total").alias("__tb"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_dup_pairs",
            "n_docs_a",
            "n_docs_b",
            F.round(F.col("n_docs_a") / F.col("__ta"), 6).alias("dup_rate_a"),
            F.round(F.col("n_docs_b") / F.col("__tb"), 6).alias("dup_rate_b"),
        )
    )


def simhash16(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """16-bit SimHash over whitespace tokens (with multiplicity).

    Bit b of a token's hash = high bit of hex digit b of md5(token)
    (hex digit ≥ '8'), which both Spark and any SQL oracle can
    compute identically. Document bit = sign of the ±1 vote sum.

    Shape: tokens explode to rows and each token is md5'd ONCE, with
    the 16 per-bit ±1 votes as plain codegen columns summed in one
    exchange-free hash agg (the doc-id pre-partition pattern) — the
    previous higher-order-function form evaluated md5 SIXTEEN times
    per token in interpreted mode (measured 2.8 s → 0.6 s at sf0.1).
    The fingerprint joins back to the input on the SAME partitioning,
    so the exchange is reused, not repeated.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    rep = df.repartition(n_parts, F.col(id_col))
    tok_rows = rep.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("__t")
    ).select(id_col, F.md5("__t").alias("__h"))
    vote_cols = [
        F.sum(
            F.when(F.substring("__h", b + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"__s{b}")
        for b in range(16)
    ]
    sums = tok_rows.groupBy(id_col).agg(*vote_cols)
    fp = None
    for b in range(16):
        term = F.when(F.col(f"__s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    fps = sums.select(id_col, fp.cast("int").alias(out_col))
    return rep.join(fps, id_col)


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 20,
    probe_every: int = 2,
    small_graph_max_edges: int = 2_000_000,
) -> DataFrame:
    """Duplicate clusters: per vertex, the min vertex id reachable
    over the (undirected) edge set — the canonical cluster id.

    Iterative min-label propagation: each round joins labels across
    edges and keeps the per-vertex min; converges in O(cluster
    diameter) rounds (near-dup clusters are tiny, so 2-4 rounds in
    practice; ``max_iters`` bounds pathological chains).
    ``localCheckpoint`` cuts lineage each round — without it the plan
    doubles per iteration and the job dies on plan size long before
    data size matters at 100 TB.

    The convergence probe (a driver-side ``count()`` job) runs every
    ``probe_every`` rounds, not every round: labels are monotonically
    non-increasing, so "unchanged since the last probe" is exactly
    "no change in the last ``probe_every`` rounds" — a valid fixed-
    point test. Cost trade: up to ``probe_every - 1`` no-op rounds
    after convergence vs half (at the default) the driver round-trips
    on deep chains, which is what matters on a 1000-executor cluster
    where each driver barrier idles the fleet.
    """
    if probe_every < 1:
        raise ValueError("probe_every must be >= 1")
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        # self-loops carry no connectivity (min label over {self} is a
        # no-op) and would strand their vertex between the paths: it
        # lands in `endpoints` (so not isolated) yet the fast path's
        # a < b filter never unions it — drop them so a self-loop-only
        # vertex is classified isolated (own cluster) on both paths
        .filter(F.col("a") != F.col("b"))
        # NO distinct: duplicate edges are harmless on both paths
        # (union-find skips same-root unions; the loop's per-vertex
        # min-agg is idempotent), and every edge producer in this
        # package emits distinct pairs anyway — a distinct here would
        # be one more full shuffle of the edge set for nothing
        .localCheckpoint(eager=False)
    )
    # iterate over the ACTIVE subgraph only: a vertex touching no edge
    # can never receive a smaller label, so the (normally dominant)
    # isolated majority is excluded from every round's shuffles and
    # unioned back unchanged at the end. In a dedup corpus duplicates
    # are the sparse minority, so this shrinks per-round state from
    # |corpus| to |edge endpoints|.
    endpoints = (
        sym.select(F.col("a").alias("id")).distinct().localCheckpoint(eager=False)
    )
    ids = vertices.select(F.col(id_col).alias("id"))
    isolated = ids.join(endpoints, "id", "left_anti").select(
        "id", F.col("id").alias("cluster")
    )

    # Small-graph fast path: near-dup graphs are normally SPARSE (the
    # duplicate minority of the corpus), and the iterative loop is
    # latency-bound there — each round is several fleet-wide stage
    # barriers over tiny data. When the active subgraph fits a
    # driver-safe edge budget (2M edges ≈ 32 MB), one collect + exact
    # union-find replaces the whole loop; union-by-min-root keeps the
    # same cluster id (min reachable id) as min-label propagation.
    # Past the budget — a genuinely duplicate-heavy 100 TB corpus —
    # the distributed loop below is the path. Precondition either
    # way: edge endpoints reference vertex ids (true for every edge
    # producer in this package).
    if small_graph_max_edges:
        # ONE job decides budget AND fetches the edges: collect at most
        # budget+1 canonical (a < b) edge rows — if the limit row
        # arrives, the graph exceeds the budget and the collected
        # prefix is discarded in favor of the distributed loop. This
        # replaces the former count()-then-collect() pair (two full
        # passes, two driver barriers) with a single pass.
        edge_rows = (
            sym.filter(F.col("a") < F.col("b"))
            .limit(small_graph_max_edges + 1)
            .collect()
        )
        if len(edge_rows) <= small_graph_max_edges:
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            seen = set()
            for r in edge_rows:
                a, b = r["a"], r["b"]
                seen.add(a)
                seen.add(b)
                ra, rb = find(a), find(b)
                if ra == rb:
                    continue
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
            vtype = ids.schema["id"].dataType
            from pyspark.sql.types import StructField, StructType

            out_schema = StructType(
                [StructField("id", vtype), StructField("cluster", vtype)]
            )
            resolved = vertices.sparkSession.createDataFrame(
                [(x, find(x)) for x in sorted(seen)], out_schema
            )
            return resolved.unionByName(isolated)

    labels = (
        ids.join(endpoints, "id", "left_semi")
        .select("id", F.col("id").alias("cluster"))
        .localCheckpoint(eager=False)
    )
    probe_base = labels
    for i in range(1, max_iters + 1):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("cluster").alias("n_cluster"))
        )
        # LAZY lineage cut: the checkpoint still truncates the plan
        # once computed, but no job runs until the next probe — so
        # `probe_every` rounds execute inside ONE job instead of one
        # eager materialization per round. On a 1000-executor cluster
        # each avoided job is an avoided fleet-wide barrier; measured
        # 3.7s → ~2s at sf0.1 together with the active-subgraph cut.
        labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("n_cluster"), F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=False)
        )
        if i % probe_every == 0 or i == max_iters:
            changed = (
                labels.alias("n")
                .join(probe_base.alias("o"), "id")
                .filter(F.col("n.cluster") != F.col("o.cluster"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
            probe_base = labels
    return labels.unionByName(isolated)


def _bloom_position(norm_col: Column, i: int, m: int) -> Column:
    """Bloom hash i: 32-bit md5 lane of ``norm + ':i'``, mod m.
    md5-based so the oracle computes the identical position."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(norm_col, F.lit(f":{i}"))), 1, 8), 16, 10
        ).cast("long")
        % m
    )


def build_bloom_bitmap(
    ref: DataFrame, text_col: str = "text", m: int = 1 << 20, n_hashes: int = 2
) -> bytes:
    """Distributed Bloom-filter build over a reference corpus: each
    task folds its partitions' bit positions into ONE local bitmap
    (numpy, unbuffered `bitwise_or.at`), the driver ORs the per-task
    bitmaps. Driver traffic is `n_tasks * m/8` bytes — independent of
    corpus size, which is the entire point: a trillion-key historical
    corpus collapses to a fixed-size structure.

    Positions are md5-lane hashes of the *normalized* text (same
    normalization as :func:`content_hash`), so the filter answers
    "was this exact content in the reference corpus" with zero false
    negatives and a false-positive rate ≈ (n_hashes·n_keys/m)^n_hashes.
    """
    if m % 8 != 0:
        raise ValueError("m must be a multiple of 8")
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    pos_df = ref.select(
        F.explode(F.array(*[_bloom_position(norm, i, m) for i in range(n_hashes)])).alias(
            "pos"
        )
    )
    return fold_positions_bitmap(pos_df, m)


def fold_positions_bitmap(pos_df: DataFrame, m: int) -> bytes:
    """Fold a frame of bloom bit positions (one ``pos`` long column)
    into an m-bit bitmap: per-task numpy OR, driver OR of the
    ``n_tasks × m/8``-byte partials. Shared by
    :func:`build_bloom_bitmap` (positions from text) and the
    streaming curation topology (positions replayed from its
    accepted-docs state table on restart)."""
    import numpy as np
    import pandas as pd

    nbytes = m // 8

    def fold(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            seen = True
            p = pdf["pos"].to_numpy()
            np.bitwise_or.at(bm, p // 8, (1 << (p % 8)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    out = np.zeros(nbytes, dtype=np.uint8)
    for row in pos_df.mapInPandas(fold, "bitmap binary").collect():
        out |= np.frombuffer(row.bitmap, dtype=np.uint8)
    return out.tobytes()


def bloom_probe(
    df: DataFrame,
    bitmap: bytes,
    text="text",
    m: int = 1 << 20,
    n_hashes: int = 2,
    out_col: str = "maybe_dup",
    normalize: bool = True,
) -> DataFrame:
    """Probe a prebuilt Bloom bitmap: add ``out_col`` = True when all
    ``n_hashes`` bit positions of the row's normalized text are set.
    ``text`` is a column name or Column expression (pass a
    ``coalesce`` when the column can be null — positions of a null
    text are null and the probe batch would fail).
    ``normalize=False`` hashes the column verbatim — the join-key
    path (:func:`maston_spark.relational.bloom_pruned_join`), where
    text normalization would corrupt non-text keys; the build side
    must hash the same way.

    The bitmap ships to executors via closure capture below ~4 MiB
    and ``SparkContext.broadcast`` above it (one torrent transfer per
    executor, not per task). Shared by
    :func:`bloom_incremental_dedup` (one-shot batch dedup) and the
    streaming curation topology (whose bitmap accretes accepted docs
    across micro-batches)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    if m // 8 > (4 << 20):
        bc = spark.sparkContext.broadcast(bitmap)

        def _bm() -> bytes:
            return bc.value

    else:

        def _bm() -> bytes:
            return bitmap

    @pandas_udf("boolean")
    def bits_set(pos_arrays: pd.Series) -> pd.Series:
        bm = np.frombuffer(_bm(), dtype=np.uint8)
        pv = np.stack(pos_arrays.to_numpy())  # (batch, n_hashes) int64
        hit = ((bm[pv // 8] >> (pv % 8).astype(np.uint8)) & 1).astype(bool)
        return pd.Series(hit.all(axis=1))

    tcol = F.col(text) if isinstance(text, str) else text
    norm = (
        F.lower(F.trim(F.regexp_replace(tcol, r"\s+", " "))) if normalize else tcol
    )
    return df.withColumn(
        out_col,
        bits_set(F.array(*[_bloom_position(norm, i, m) for i in range(n_hashes)])),
    )


def bloom_incremental_dedup(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 1 << 20,
    n_hashes: int = 2,
) -> DataFrame:
    """Incremental (cross-corpus) dedup of a NEW corpus against a
    REFERENCE corpus via a driver-built Bloom bitmap — the standard
    shape for deduplicating fresh crawl snapshots against a
    historical corpus too large to equi-join on every ingest.

    Per new document: ``maybe_dup`` (all ``n_hashes`` bit positions
    set in the reference bitmap — no false negatives), ``is_dup``
    (exact normalized-content match, via equi-join on the 128-bit
    content hash), and ``false_positive`` (bloom hit, exact miss) so
    the caller can measure the realized FP rate against the sizing
    formula. At 100 TB the bloom probe prunes the ingest stream with
    a broadcast fixed-size bitmap and NO shuffle; only the (rare)
    bloom survivors proceed to the exact-hash confirm join, which is
    exactly what this operator's two flags decompose.

    The bitmap ships to executors via closure capture below ~4 MiB
    and `SparkContext.broadcast` above it (one torrent transfer per
    executor, not per task).
    """
    bitmap = build_bloom_bitmap(ref_df, text_col=text_col, m=m, n_hashes=n_hashes)
    probed = bloom_probe(
        new_df, bitmap, text=text_col, m=m, n_hashes=n_hashes
    )
    ref_hashes = (
        ref_df.select(content_hash(F.col(text_col)).alias("__h")).distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        probed.withColumn("__h", content_hash(F.col(text_col)))
        .join(ref_hashes, "__h", "left")
        .select(
            id_col,
            "maybe_dup",
            F.coalesce("__hit", F.lit(False)).alias("is_dup"),
            (F.col("maybe_dup") & ~F.coalesce("__hit", F.lit(False))).alias(
                "false_positive"
            ),
        )
    )


def neardup_evidence(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    top_n: int = 3,
) -> DataFrame:
    """Human-readable EVIDENCE for near-duplicate pairs: for each
    candidate pair, the ``top_n`` shingles both documents share, as
    text — ``(id_a, id_b, rank, shingle)``. The review artifact a
    curation run attaches when a flagged pair is disputed ("show me
    WHY these two matched"), ranked by the shingle's hash lane (the
    MinHash-relevant ordering — the smallest lanes are the ones the
    signatures agreed on) with a lexicographic tiebreak.

    Distributed shape: shared shingles come from an equi-join of the
    distinct (id, shingle) table against BOTH pair endpoints — keyed
    on the pair ids and the shingle string, never all-pairs — and the
    per-pair top-n is a ranked window over pair-bounded partitions.
    Output is |pairs| × top_n rows.
    """
    from pyspark.sql import Window

    # re-derive shingle text rows (same construction as
    # shingle_lane_rows, text retained)
    toks2 = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    ).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    cols = [F.col("tok")] + [
        F.lead("tok", i).over(w).alias(f"__t{i}") for i in range(1, shingle_n)
    ]
    last = F.lead("tok", shingle_n - 1).over(w)
    sh = (
        toks2.select("id", *cols, last.alias("__last"))
        .filter(F.col("__last").isNotNull())
        .select(
            "id",
            F.concat_ws(
                " ", "tok", *[f"__t{i}" for i in range(1, shingle_n)]
            ).alias("shingle"),
        )
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("__idb"), F.col("shingle").alias("__s2"))
    shared = (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(
            b,
            (F.col("id_b") == F.col("__idb"))
            & (F.col("shingle") == F.col("__s2")),
        )
        .select("id_a", "id_b", "shingle")
    )
    lane = shingle_hash_lane(F.col("shingle"))
    wr = Window.partitionBy("id_a", "id_b").orderBy(lane.asc(), F.col("shingle"))
    return (
        shared.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select("id_a", "id_b", "rank", "shingle")
    )


def sig_bands_frame(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    shingle_n: int = 3,
    minhash_n: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Per-document MinHash signature + LSH band-bucket keys in one
    frame: ``(key, __sig array<long>, __bands array<string>)`` —
    the building block of INCREMENTAL near-dup (batch
    :func:`incremental_neardup` and the streaming curation
    topology's band-bucket state share this construction, so the
    two paths cannot drift apart). Band key b is
    ``"{b}:" + md5(sig[b*r .. b*r+r-1] joined by '|')``; documents
    with no shingles (fewer than ``shingle_n`` tokens) are excluded
    — they have no LSH identity and can never near-dup.

    Built on :func:`shingle_lane_rows` + one codegen aggregation
    (the :func:`minhash_frame` shape): higher-order array
    transforms drop out of whole-stage codegen into interpreted
    per-element evaluation — measured ~25x slower on a 5k-doc
    single-partition batch — so the signature comes from plain
    ``min()`` aggregates over exploded lane rows instead.
    """
    rows = shingle_lane_rows(df, text_col, key_col, shingle_n)
    mins = [
        F.min(
            (F.lit(MINHASH_A0 + 2 * s) * F.col("lane") + F.lit(MINHASH_B0 + s))
            % F.lit(MINHASH_PRIME)
        ).alias(f"__mh{s}")
        for s in range(minhash_n)
    ]
    mf = rows.groupBy("id").agg(*mins)
    sig = F.array(*[F.col(f"__mh{s}") for s in range(minhash_n)])
    n_bands = minhash_n // band_size
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"__mh{b * band_size + i}").cast("string")
                            for i in range(band_size)
                        ],
                    )
                ),
            )
            for b in range(n_bands)
        ]
    )
    return mf.select(
        F.col("id").alias(key_col), sig.alias("__sig"), bands.alias("__bands")
    )


def sig_agreement_ge(a, b, minhash_n: int, tau: float):
    """Column predicate: >= ceil(tau*minhash_n) signature components
    agree — the integer-exact MinHash Jaccard confirm."""
    import math

    req = max(1, int(math.ceil(tau * minhash_n)))
    return (
        F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda v: v))
        >= F.lit(req)
    )


def exact_jaccard_simjoin(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.6,
    shingle_n: int = 3,
    hot_df_threshold: int = 65536,
    n_blocks: int = 16,
) -> DataFrame:
    """EXACT all-pairs Jaccard similarity join over word n-shingle
    sets: every pair ``(doc_a, doc_b, n_common, jaccard)`` with
    ``jaccard >= tau`` — COMPLETE and deterministic, the guarantee
    the MinHash-LSH family (:func:`minhash_lsh_candidates`) trades
    away for fewer candidates. The two coexist on purpose: LSH for
    web-scale recall-tunable dedup, this for the compliance-grade
    "find EVERY pair" question (contamination audits, legal takedown
    sweeps) where a missed pair is a defect — and exactly because it
    IS exact, the oracle (q203) grades it against brute-force ground
    truth, not a replay of itself.

    Plan: one shared-shingle equi-join (the intersection-counting
    lower bound — any exact algorithm must witness every shared
    shingle of every qualifying pair, so Σ df² join rows is the
    intrinsic cost), with the size-ratio prune
    ``min(|a|,|b|) >= tau * max(|a|,|b|)`` (implied by J >= tau)
    applied INSIDE the join before the combiner-reduced
    intersection-count aggregation; J computes from exact integers
    with one IEEE division.

    The classic single-node alternative — ppjoin prefix filtering
    (Chaudhuri 2006; Bayardo 2007; Xiao 2008) — was implemented and
    MEASURED OUT (SCALE.md round 11): its win depends on verifying
    candidates by in-memory pointer merges of sorted suffixes, which
    has no DataFrame-algebra analogue; re-joining candidate pairs
    against full shingle sets costs candidates × |set| rows (at 10×
    data: 19.5M candidates — 78× the true pair count — × ~520
    shingles ≈ 10^10 rows, GC death), while this direct plan
    computed the identical 250,600 pairs in 21 s. Shingling is the
    explode+lead codegen shape (:func:`shingle_lane_rows`'
    measured-10x-faster construction), kept as strings so the join
    and the oracle share keys.

    HOT-SHINGLE skew mitigation: Σ df² witness rows are intrinsic to
    exactness, but their DISTRIBUTION is not — a stop-shingle like
    "the of the" with df=10⁶ puts 10¹² join rows inside ONE task's
    key. Shingles whose document frequency exceeds
    ``hot_df_threshold`` take a BLOCK-PARTITIONED path: each side
    buckets its doc id into ``n_blocks`` blocks and replicates across
    the other side's block index, so the join key becomes
    ``(sh, u, v)`` and every (a, b) pair is witnessed EXACTLY once —
    in the one block cell (u=block(a), v=block(b)) — while per-task
    input drops from df to ~2·df/n_blocks (input replication cost:
    2·n_blocks·df rows for hot shingles only; the hot set itself is
    tiny and broadcast). Cold shingles keep the plain equi-join.
    Completeness is unchanged — this is the algebraic salting of an
    intersection COUNT (two-level count-sum), not an approximation.
    """
    from pyspark.sql import Window

    from maston_spark.caching import scoped_persist

    toks = (
        docs.filter(F.col(text_col).isNotNull())
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, id_col
        )
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
        )
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(w).alias(f"__t{i}") for i in range(1, shingle_n)
    ]
    last = F.lead("tok", shingle_n - 1).over(w)
    sh = scoped_persist(
        toks.select("id", *parts, last.alias("__last"))
        .filter(F.col("__last").isNotNull())
        .select(
            "id",
            F.concat_ws(
                " ", "tok", *[f"__t{i}" for i in range(1, shingle_n)]
            ).alias("sh"),
        )
        .distinct()
    )
    sz = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    # document frequency per shingle: one combiner-reduced pass over
    # the (tiny relative to the corpus) shingle table; the HOT set —
    # shingles above the threshold — is by construction small enough
    # to broadcast (|hot| <= |corpus shingle rows| / threshold)
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > F.lit(hot_df_threshold))
        .select("sh")
    )
    shz = sh.join(sz, "id")
    shz_c = shz.join(F.broadcast(hot), "sh", "left_anti")
    shz_h = shz.join(F.broadcast(hot), "sh", "left_semi")
    size_ok = F.least("na", "nb").cast("double") >= F.lit(tau) * F.greatest(
        "na", "nb"
    )
    # cold path: the plain shared-shingle equi-join
    ja = shz_c.select(F.col("id").alias("ida"), "sh", F.col("n").alias("na"))
    jb = shz_c.select(F.col("id").alias("idb"), "sh", F.col("n").alias("nb"))
    cold = (
        ja.join(jb, "sh")
        .filter(F.col("ida") < F.col("idb"))
        .filter(size_ok)
        .select("ida", "idb", "na", "nb")
    )
    # hot path: block-partitioned pair generation — join key (sh, u, v)
    blk = lambda c: F.pmod(F.xxhash64(c), F.lit(n_blocks)).cast("int")  # noqa: E731
    rep = F.explode(F.array(*[F.lit(i) for i in range(n_blocks)]))
    ja_h = shz_h.select(
        F.col("id").alias("ida"),
        "sh",
        F.col("n").alias("na"),
        blk(F.col("id")).alias("__u"),
        rep.alias("__v"),
    )
    jb_h = shz_h.select(
        F.col("id").alias("idb"),
        "sh",
        F.col("n").alias("nb"),
        rep.alias("__u"),
        blk(F.col("id")).alias("__v"),
    )
    hotp = (
        ja_h.join(jb_h, ["sh", "__u", "__v"])
        .filter(F.col("ida") < F.col("idb"))
        .filter(size_ok)
        .select("ida", "idb", "na", "nb")
    )
    inter = (
        cold.unionByName(hotp)
        .groupBy("ida", "idb", "na", "nb")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return inter.filter(jac >= F.lit(tau)).select(
        F.col("ida").alias("doc_a"),
        F.col("idb").alias("doc_b"),
        F.col("i").cast("long").alias("n_common"),
        F.round(jac, 6).alias("jaccard"),
    )


def incremental_neardup(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    minhash_n: int = 16,
    band_size: int = 4,
    tau: float = 0.7,
) -> DataFrame:
    """Which NEW documents are near-duplicates of an already-accepted
    OLD corpus — ``(doc_id, n_sig_agree, is_near_dup)`` per new doc,
    with ``n_sig_agree`` the best signature agreement over band-hit
    candidates (0 when no band collides) and ``is_near_dup`` true at
    agreement ≥ ceil(tau·minhash_n). The BATCH form of the curation
    topology's ``neardup=True`` stage (same :func:`sig_bands_frame`
    construction, same confirm), which makes the streaming physics
    oracle-gradeable: candidates come ONLY from band-bucket
    equi-joins (never all-pairs), and the agreement count is exact
    integer arithmetic a SQL engine replays bit-for-bit.

    Scale shape: both sides shingle+hash once; the join key is the
    band bucket, so cost scales with collisions, not |old|×|new|;
    the per-new-doc max is a combiner-reduced agg over candidates.
    """
    oldb = sig_bands_frame(old, id_col, text_col, shingle_n, minhash_n, band_size)
    newb = sig_bands_frame(new, id_col, text_col, shingle_n, minhash_n, band_size)
    o = oldb.select(
        F.col("__sig").alias("__osig"), F.explode("__bands").alias("__bk")
    )
    n = newb.select(
        F.col(id_col).alias("__nid"),
        "__sig",
        F.explode("__bands").alias("__bk"),
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("__sig"), F.col("__osig"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    best = (
        n.join(o, "__bk")
        .groupBy("__nid")
        .agg(F.max(agree).alias("n_sig_agree"))
    )
    import math

    req = max(1, int(math.ceil(tau * minhash_n)))
    return (
        new.select(F.col(id_col))
        .distinct()
        .join(best, F.col(id_col) == F.col("__nid"), "left")
        .select(
            id_col,
            F.coalesce("n_sig_agree", F.lit(0)).cast("int").alias("n_sig_agree"),
            (F.coalesce("n_sig_agree", F.lit(0)) >= F.lit(req)).alias(
                "is_near_dup"
            ),
        )
    )


def survivorship_merge(
    df: DataFrame,
    cluster_col: str,
    fields: "list[str]",
) -> DataFrame:
    """Golden-record survivorship over duplicate clusters: for every
    (cluster, field), elect the MODAL non-null value (most votes;
    ties break by the value's sort order so the record is
    deterministic) and report how contested it was — long-format
    rows ``(cluster, field, value, n_votes, n_rows, agreement)``.
    The master-data-management step AFTER dedup finds the clusters
    (q55 / exact_dedup_groups): keeper selection keeps one ROW,
    survivorship composes the best VALUE per field, which matters
    exactly when the copies disagree (a mirrored crawl with a wrong
    language tag, a re-upload missing the source).

    Scale shape: fields melt via one ``stack`` projection (k·rows
    inline, no join per field), then ONE combiner-reduced
    (cluster, field, value) count and one rank window per
    (cluster, field) — two shuffles total regardless of how many
    fields are merged. Values compare as strings (the stack
    requires one type); agreement = votes/rows-with-a-value is an
    exact integer ratio."""
    from pyspark.sql import Window

    from maston_spark.profiling import _sql_str

    if not fields:
        raise ValueError("need at least one field to merge")
    k = len(fields)
    # _sql_str for the label literal, backtick-doubling for the
    # identifier — a quote/backtick in a field name must not
    # mis-parse the stack() expression
    stack_args = ", ".join(
        f"{_sql_str(f)}, CAST(`{f.replace('`', '``')}` AS STRING)"
        for f in fields
    )
    melted = df.select(
        F.col(cluster_col).alias("cluster"),
        F.expr(f"stack({k}, {stack_args}) AS (field, value)"),
    ).filter(F.col("value").isNotNull())
    votes = melted.groupBy("cluster", "field", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n_votes")
    )
    w = Window.partitionBy("cluster", "field").orderBy(
        F.desc("n_votes"), F.asc("value")
    )
    wt = Window.partitionBy("cluster", "field")
    ranked = votes.select(
        "cluster",
        "field",
        "value",
        "n_votes",
        F.sum("n_votes").over(wt).alias("n_rows"),
        F.row_number().over(w).alias("__rn"),
    )
    return (
        ranked.filter(F.col("__rn") == 1)
        .select(
            "cluster",
            "field",
            "value",
            "n_votes",
            "n_rows",
            F.round(
                F.col("n_votes").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("agreement"),
        )
        .orderBy("cluster", "field")
    )
