"""Streaming operators: watermarked event-time windows, in-stream
dedup, stream-static and stream-stream joins.

Scale notes: every helper keys its state by the grouping/join
columns, so state is sharded across executors by the shuffle
partitioner; watermarks bound state size — without one, stream-stream
joins and dedup state grow forever at 100 TB/day ingest. Use the
RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) once state exceeds
executor heap.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("session_window.start"))
        .withColumn("window_end", F.col("session_window.end"))
        .drop("session_window")
    )


def drop_duplicates_within_watermark(
    df: DataFrame, key_cols: Sequence[str], ts_col: str, watermark: str
) -> DataFrame:
    """Keyed in-stream dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for keys older
    than the horizon is evicted."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_static_join(
    stream: DataFrame, static: DataFrame, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Enrichment join: the static side is broadcast per micro-batch
    (dimension tables — always the small side)."""
    return stream.join(F.broadcast(static), list(on), how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join; BOTH sides need watermarks and the join
    condition must bound event-time skew or state is unbounded."""
    return left.withWatermark(left_ts, watermark).join(
        right.withWatermark(right_ts, watermark), on, how
    )
