"""Embedding similarity search over `array<float>` vector columns.

Two tiers, mirroring how ANN is actually deployed at scale:
- brute-force cosine top-k for a SMALL broadcast query set — exact,
  one pass over the corpus, no shuffle of the corpus itself;
- sign-LSH (random-hyperplane) bucketing as the scale path: corpus
  and queries hash to bucket keys; the join is equi on bucket, so
  candidate generation is linear, not quadratic. Hyperplanes are
  deterministic (md5-derived ±1 components), so results are
  reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window


def as_double(vec_col) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is a tiny filtered subset → broadcast; Spark scans
    the corpus once, computes cosine in codegen, and takes per-query
    top-k through a window (k small ⇒ partial top-k per partition
    via AQE; for huge k use repartition on query_id first).
    """
    c = corpus.select(
        F.col(id_col).alias("n_id"), as_double(F.col(vec_col)).alias("n_vec")
    )
    q = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("n_id").alias("neighbor_id"),
            cosine(F.col("q_vec"), F.col("n_vec")).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__sim", 6).alias("sim"),
            "rn",
        )
    )


def hyperplane(plane: int, dims: int) -> Column:
    """Deterministic ±1 hyperplane: component d = +1 iff the first
    hex digit of md5('<plane>:<d>') has its high bit set."""
    return F.array(
        *[
            F.when(
                F.substring(F.md5(F.lit(f"{plane}:{d}")), 1, 1) >= "8", F.lit(1.0)
            ).otherwise(F.lit(-1.0))
            for d in range(dims)
        ]
    )


def lsh_bucket(vec_col, n_planes: int, dims: int) -> Column:
    """Sign-LSH bucket id: bit p = (vec · hyperplane_p) > 0."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + F.when(dot(vec_col, hyperplane(p, dims)) > 0, 1 << p).otherwise(0)
    return bucket.cast("int")


def lsh_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = 6,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine *within* the query's LSH
    bucket. At 100 TB the bucket column is precomputed/persisted with
    the corpus and the join is a plain equi-join on bucket."""
    withb = corpus.select(
        F.col(id_col).alias("n_id"),
        as_double(F.col(vec_col)).alias("n_vec"),
    ).withColumn("bucket", lsh_bucket(F.col("n_vec"), n_planes, dims))
    q = withb.filter(F.col("n_id").isin(query_ids)).select(
        F.col("n_id").alias("query_id"),
        F.col("n_vec").alias("q_vec"),
        F.col("bucket"),
    )
    sims = (
        withb.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("n_id").alias("neighbor_id"),
            F.col("bucket"),
            cosine(F.col("q_vec"), F.col("n_vec")).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "bucket", F.round("__sim", 6).alias("sim"), "rn")
    )
