"""User-function surface: scalar pandas UDFs, grouped-agg pandas
UDFs, and Python UDTFs — the extension points a user of the engine
reaches for when column algebra runs out.

Everything here is Arrow-batched (pandas UDF) or plan-integrated
(UDTF); plain row-at-a-time ``F.udf`` is deliberately absent — it is
~10-100x slower and should never be the recommended path.
"""

from __future__ import annotations

import functools

import pandas as pd

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.functions import pandas_udf


@functools.cache
def _zscore_udf():
    @pandas_udf("double")
    def zscore(v: pd.Series) -> pd.Series:
        sd = v.std(ddof=0)
        return (v - v.mean()) / sd if sd else v * 0.0

    return zscore


def zscore(col):
    """Scalar pandas UDF: per-batch standardization example.
    (UDF objects are built lazily — ``pandas_udf`` needs an active
    session to parse its return type.)"""
    return _zscore_udf()(col)


@functools.cache
def _weighted_mean_udf():
    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        tw = w.sum()
        return float((v * w).sum() / tw) if tw else float("nan")

    return weighted_mean


def weighted_mean(v, w):
    """Grouped-aggregate pandas UDF: sum(v*w)/sum(w) per group.
    Usable in ``groupBy().agg(weighted_mean("x", "w"))`` and over
    unbounded windows."""
    return _weighted_mean_udf()(v, w)


def register_udtfs(spark) -> None:
    """Register the engine's table functions for SQL use."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, idx int")
    class SplitWords:
        """UDTF: one row per whitespace token with its position —
        ``SELECT s.* FROM t, LATERAL split_words(t.text) s``."""

        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield (w, i)

    @udtf(returnType="n bigint, total bigint")
    class RunningCount:
        """UDTF with state across rows of its input partition."""

        def __init__(self):
            self._n = 0
            self._total = 0

        def eval(self, x):
            # TABLE(...) arguments arrive as a Row per input row
            if hasattr(x, "__fields__"):
                x = x[0]
            self._n += 1
            self._total += int(x or 0)
            yield (self._n, self._total)

    spark.udtf.register("split_words", SplitWords)
    spark.udtf.register("running_count", RunningCount)
