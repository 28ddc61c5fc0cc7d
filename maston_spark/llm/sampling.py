"""Deterministic sampling for training-data pipelines: reproducible
train/val/test splits, fractional sampling, and weighted corpus
mixing.

Why not ``df.sample()``: engine-native samplers are seeded per
partition, so the selected set changes with partitioning, retries,
and engine version — unacceptable for a training corpus that must be
reproducible and auditable. Here membership is a pure function of
(salt, id): an md5 lane modulo a resolution, so the same document
lands in the same split on any engine, any cluster size, any rerun
(and the DuckDB oracle computes the identical assignment).

Scale: everything below is one codegen projection/filter on the
scan — no shuffle, no state, no RNG. At 100 TB the split column is
typically written once as a partition column so downstream epochs
prune to their split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# resolution of the hash bucket in which rates are expressed; rates
# are exact multiples of 1/1000 so the filter compares integers only
# (no float thresholds to disagree across engines)
RESOLUTION = 1000


def hash_bucket(id_col, salt: str) -> Column:
    """Deterministic bucket in [0, RESOLUTION): integer lane of
    md5('<salt>:<id>'), identical in any engine with md5."""
    lane = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (lane % RESOLUTION).cast("int")


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/... per ``weights``).

    Boundaries are cumulative weights scaled to RESOLUTION, so the
    assignment is exact and order-independent.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = hash_bucket(id_col, salt)
    expr = None
    acc = 0
    names = list(weights)
    for name in names[:-1]:
        acc += round(weights[name] * RESOLUTION)
        clause = F.when(b < acc, F.lit(name))
        expr = clause if expr is None else expr.when(b < acc, F.lit(name))
    expr = (expr if expr is not None else F).otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def sample_fraction(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id hash."""
    return df.filter(hash_bucket(id_col, salt) < round(fraction * RESOLUTION))


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixing: keep a per-source deterministic
    fraction of rows (the 'upsample books, downsample web' knob of a
    pretraining data recipe — here downsampling only; upsampling is
    explode on a repeat count, same hash discipline)."""
    rate = None
    for src, r in rates.items():
        thresh = F.lit(round(r * RESOLUTION))
        clause = F.when(F.col(source_col) == src, thresh)
        rate = clause if rate is None else rate.when(F.col(source_col) == src, thresh)
    rate = (
        rate.otherwise(F.lit(round(default_rate * RESOLUTION)))
        if rate is not None
        else F.lit(round(default_rate * RESOLUTION))
    )
    return df.filter(hash_bucket(id_col, salt) < rate)


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    n_shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document its
    position in a stream of fixed-`capacity` context windows — the
    standard pretraining packing strategy (documents are concatenated
    in a deterministic order, then split every `capacity` units; a
    document may straddle a window boundary).

    Packing is SHARD-LOCAL: documents are assigned to
    ``id % n_shards`` shards and packed within their shard in id
    order. That keeps the running-total window function parallel
    (one bounded partition per shard) instead of a single global
    cumulative sum — the difference between a 100 TB job and a
    single-task straggler. Output is fully deterministic: same ids →
    same (shard, pack_id, pack_offset) on any cluster size or rerun.
    """
    from pyspark.sql import Window

    shard = (F.col(id_col) % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(id_col)
    start = (F.sum(size_col).over(w) - F.col(size_col)).cast("long")
    return df.select(
        id_col,
        size_col,
        shard.alias("shard"),
    ).select(
        id_col,
        size_col,
        "shard",
        F.floor(start / capacity).cast("long").alias("pack_id"),
        (start % capacity).cast("long").alias("pack_offset"),
    )


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    order_col: str = "quality_score",
    id_col: str = "doc_id",
    cap: int = 100,
) -> DataFrame:
    """Per-domain quota: keep the top ``cap`` rows of each domain,
    ranked by ``order_col`` desc with ``id_col`` as deterministic
    tie-break — the web-corpus curation step that stops a single
    crawl-heavy domain from dominating the training mix (every
    CommonCrawl-scale pipeline runs some form of this).

    Scale shape: an Arrow-batched LOCAL prune first — within each
    input batch only a domain's top ``cap`` can survive globally, so
    per-task output is ≤ cap rows per (batch, domain) — then ONE hash
    shuffle on the domain for the exact ranking window. The local
    prune bounds shuffle volume at tasks × domains × cap rows
    regardless of how skewed the hot domain is; without it, a domain
    with a billion rows would funnel a billion rows into one window
    partition.

    Deterministic and oracle-checkable: rank = row_number over
    (domain, order desc, id), identical in any engine.
    """
    from pyspark.sql import Window

    def local_prune(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.sort_values(
                    [domain_col, order_col, id_col],
                    ascending=[True, False, True],
                )
                .groupby(domain_col, sort=False)
                .head(cap)
            )

    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    pruned = df.mapInPandas(local_prune, ddl)
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        pruned.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= cap)
    )
