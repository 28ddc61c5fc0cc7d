"""Bounded persist lifetime for multi-consumer intermediates.

Several operators persist a mid-pipeline frame that feeds two or more
downstream branches (the MinHash signature table, winnowing
fingerprints, the (source, term) vocab table, budget_select's
range-ordered frame, ...). The operators return LAZY DataFrames, so
they can never unpersist safely themselves — the action that consumes
the cache happens later, in the caller. A bare ``.persist()`` therefore
pins a CacheManager entry for the life of the SparkSession, and a
long-lived session (the driver runs the whole 150-query catalog in
one) accumulates executor cache without bound.

``scoped_persist`` keeps the persist (the recompute-avoidance it buys
is measured and real — see the call sites) but registers the frame in
a small FIFO: when more than ``MAX_LIVE`` scoped frames are live, the
oldest is unpersisted. By the time a frame ages out of the window its
consuming query has long since run its action; if something ever DOES
re-execute it, Spark just recomputes — for content-derived frames
recompute is always correctness-safe. The ONE exception is a frame
whose driver-collected metadata is keyed by its physical partition
layout (budget_select's per-partition offsets: repartitionByRange
re-samples boundaries on re-execution) — such frames pin a bare
``.persist()`` instead and say so at the call site. Net: executor cache residency is bounded by the
``MAX_LIVE`` newest intermediates instead of growing monotonically.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

# At most this many scoped intermediates stay persisted. Each query
# persists at most two frames, so 8 covers several queries of
# lookback — far past the point where the frame's action has run.
MAX_LIVE = 8

_live: "OrderedDict[int, DataFrame]" = OrderedDict()


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` with bounded registry lifetime (see module doc).

    Returns the same DataFrame, persisted. Evicts (unpersists) the
    oldest scoped frames beyond ``MAX_LIVE``.
    """
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _live[id(out)] = out
    while len(_live) > MAX_LIVE:
        _, old = _live.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session torn down / already unpersisted — nothing to free
    return out


def release_persisted() -> int:
    """Explicitly unpersist every scoped frame (teardown hook for
    embedding hosts). Returns the number released."""
    n = 0
    while _live:
        _, old = _live.popitem(last=False)
        try:
            old.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n
