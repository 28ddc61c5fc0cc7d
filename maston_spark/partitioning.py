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

from pyspark.sql import DataFrame, functions as F


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


_SALTED_JOIN_TYPES = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skew.

    The (large, skewed) ``left`` side gets a salt in [0, salt_n)
    derived from a stable hash of the FULL row content — so the
    assignment is deterministic across retries, stage re-attempts,
    and any repartitioning of the input (``monotonically_increasing_id``
    would not be: it changes with partition layout). The (smaller)
    ``right`` side is replicated ``salt_n`` times with every salt
    value, so the join key becomes (key, salt) and a hot key spreads
    across ``salt_n`` tasks. Row multiplicity is unchanged: each left
    row matches exactly the one right replica carrying its salt.
    Byte-identical duplicate left rows share a salt (their work
    cannot be split deterministically without an arbitrary id); skew
    relief comes from variation in the non-key columns.

    Only left-preserving join types are valid: with the right side
    replicated, ``right``/``full`` would emit each UNMATCHED right
    row once per replica (salt_n copies instead of one). Flip the
    sides (salting is asymmetric by design) or dedupe downstream.
    """
    if how not in _SALTED_JOIN_TYPES:
        raise ValueError(
            f"salted_join supports {sorted(_SALTED_JOIN_TYPES)}; got {how!r} — "
            "right/full would duplicate unmatched right rows salt_n times "
            "(swap the sides instead: salting is left-side-specific)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_n)).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = l_salted.join(r_salted, [on, "__salt"], how)
    return out.drop("__salt")


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
    slim agg broadcast back — constant columns rank 0), and the key
    interleaves the rank bits round-robin. All pure column algebra
    (shifts/masks inside codegen). Write with
    ``df.repartitionByRange(n, '__zkey').sortWithinPartitions('__zkey')``
    and every keyed column's range predicate prunes most files.
    """
    from functools import reduce as _reduce

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
    n = len(cols)
    maxrank = (1 << bits) - 1
    parts = []
    for j, c in enumerate(cols):
        rng = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        rank = F.when(rng <= 0, F.lit(0)).otherwise(
            F.floor(
                (F.col(c).cast("double") - F.col(f"__mn_{c}"))
                * maxrank
                / rng
            )
        ).cast("long")
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(rank, b).bitwiseAND(F.lit(1)),
                    b * n + j,
                )
            )
    zkey = _reduce(lambda a, x: a.bitwiseOR(x), parts)
    return out.withColumn("__zkey", zkey).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
