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


def minhash_value(shingle_col, seed: int) -> Column:
    """One MinHash component: min over shingles of md5(seed:shingle)
    — the md5 hex ordering stands in for a random permutation.
    Deterministic across engines."""
    return F.array_min(
        F.transform(shingle_col, lambda sh: F.md5(F.concat(F.lit(f"{seed}:"), sh)))
    )


def minhash_signature(shingle_col, num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    """Full MinHash signature as one array column."""
    return F.array(*[minhash_value(shingle_col, s) for s in range(num_hashes)])


def lsh_band_buckets(
    shingle_col, num_hashes: int = DEFAULT_NUM_HASHES, band_size: int = DEFAULT_BAND_SIZE
) -> Column:
    """array<struct<band, bucket>> built so each minhash component
    expression is referenced exactly ONCE.

    Indexing a signature *expression* per band would make Catalyst
    duplicate the whole 16-hash computation per reference (observed
    16x slowdown); composing each band directly from its four
    single-use component expressions keeps total work at one hash
    pass.
    """
    n_bands = num_hashes // band_size
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            minhash_value(shingle_col, b * band_size + i)
                            for i in range(band_size)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing ≥1 LSH band
    bucket. The join is per-bucket (equi on (band, bucket)) — never
    all-pairs; bucket sizes are bounded by collision probability, and
    a pathological hot bucket is split by AQE skew join.

    The corpus is repartitioned before hashing: shingling + minhash
    is the CPU-heavy stage, and document tables often arrive in few
    splits; spreading it across the cluster costs one tiny shuffle.
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    sig = (
        spread.select(
            F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .select("id", lsh_band_buckets("sh", num_hashes, band_size).alias("bands"))
    )
    buckets = sig.select("id", F.explode("bands").alias("bb")).select(
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


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (n-gram set overlap)."""
    sh = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, id_col
    ).select(
        F.col(id_col).alias("__id"), shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.select(
            "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)
    )


def simhash16(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """16-bit SimHash over whitespace tokens (with multiplicity).

    Bit b of a token's hash = high bit of hex digit b of md5(token)
    (hex digit ≥ '8'), which both Spark and any SQL oracle can
    compute identically. Document bit = sign of the ±1 vote sum.
    Pure expressions — per-doc cost O(tokens × 16) in codegen.
    """
    toks = F.split(F.col(text_col), r"\s+")
    votes = F.transform(toks, lambda t: F.md5(t))

    def bit_sum(b: int) -> Column:
        # +1 when md5 hex digit b has its high bit set, else -1
        return F.aggregate(
            votes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.substring(h, b + 1, 1) >= "8", 1).otherwise(-1),
        )

    fp = None
    for b in range(16):
        term = F.when(bit_sum(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return df.withColumn(out_col, fp.cast("int"))
