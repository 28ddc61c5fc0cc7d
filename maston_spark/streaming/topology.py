"""The two reference topologies, re-expressed as Structured
Streaming pipelines.

1. ``simple_validated_topology`` ≙ TopologyBuilder.buildVavrKStreamTopology
   (topology/TopologyBuilder.java:30-50): source → safe deserialize →
   process → branch → valid records to the output sink, invalid
   records to the error sink with provenance headers and the original
   bytes preserved.
2. ``delta_topology`` ≙ buildVavrKStreamWithDeltaTopology
   (topology/TopologyBuilder.java:53-90): source → safe deserialize →
   re-key by a recomputed business key → keyed delta state
   (emit-iff-updated) → branch → sinks.

Both return a started ``StreamingQuery`` driven by ``foreachBatch``
so the valid/error fan-out scans each micro-batch exactly once
(persist inside the batch). Sinks are injected callables — Kafka in
production (:func:`maston_spark.sinks.to_kafka_records` +
``.write.format("kafka")``), parquet/memory in tests — mirroring how
the reference injects Produced/topic names.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from maston_spark.delta import delta_dedup_fold
from maston_spark.sinks import foreach_batch_split
from maston_spark.validated import OK, safe_from_json


def _start_foreach_batch(df: DataFrame, fn, checkpoint: str, trigger: dict | None):
    writer = df.writeStream.foreachBatch(fn).option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def simple_validated_topology(
    source: DataFrame,
    value_schema,
    *,
    app_id: str,
    checkpoint: str,
    write_valid: Callable[[DataFrame], None],
    write_error: Callable[[DataFrame], None],
    value_col: str = "value",
    processor: Callable[[DataFrame], DataFrame] | None = None,
    trigger: dict | None = None,
    on_metrics: Callable[[int, dict[str, int]], None] | None = None,
    emit_valid: bool = True,
):
    """Validated consumer: parse → (optional processor over the
    validated frame, e.g. :func:`maston_spark.validated.process_validated`)
    → split-sink. ``source`` is any streaming DataFrame with a string/
    binary ``value_col`` (Kafka or test source).

    ``emit_valid=False`` reproduces the reference topology exactly:
    successfully processed records terminate (the user processor is
    side-effecting there) and ONLY failures flow to the error sink
    (topology/TopologyBuilder.java:30-50 — valid branch ends at the
    post-process invalid filter). The default generalizes to the
    produce-both shape most Spark pipelines want."""
    validated = safe_from_json(
        source.withColumn(value_col, F.col(value_col).cast("string")),
        value_col,
        value_schema,
    )
    if processor is not None:
        validated = processor(validated)
    fn = foreach_batch_split(
        write_valid if emit_valid else (lambda df: None),
        write_error,
        app_id=app_id,
        on_metrics=on_metrics,
    )
    return _start_foreach_batch(validated, fn, checkpoint, trigger)


def delta_topology(
    source: DataFrame,
    value_schema,
    *,
    app_id: str,
    checkpoint: str,
    business_key: Column | str,
    order_cols: Sequence[str],
    is_updated: Callable[[dict, dict], bool],
    write_valid: Callable[[DataFrame], None],
    write_error: Callable[[DataFrame], None],
    value_col: str = "value",
    trigger: dict | None = None,
    on_metrics: Callable[[int, dict[str, int]], None] | None = None,
):
    """Delta consumer: parse → re-key by the recomputed business key
    → per-key emit-iff-updated → split-sink.

    The within-batch fold runs via ``applyInPandas`` inside
    ``foreachBatch``; cross-batch suppression state lives in the
    durable "last accepted" pattern of
    :func:`maston_spark.delta.delta_dedup_stream` — use that directly
    when the pipeline is pure-delta with no error channel. Here the
    reference's exact shape (validated + delta + DLQ in one topology)
    needs foreachBatch, so per-key state is recomputed per batch from
    the batch plus optionally a compacted state table; the golden
    tests drive one batch per input sequence, matching the
    TopologyTestDriver semantics.
    """
    key_col = (
        F.col(business_key) if isinstance(business_key, str) else business_key
    ).alias("__business_key")
    validated = safe_from_json(
        source.withColumn(value_col, F.col(value_col).cast("string")),
        value_col,
        value_schema,
    ).withColumn("__business_key", key_col)
    # applyInPandas sorts by flat column names only — materialize
    # (possibly nested) order expressions as temp columns
    ord_aliases = [f"__ord_{i}" for i in range(len(order_cols))]
    for alias, c in zip(ord_aliases, order_cols):
        validated = validated.withColumn(alias, F.col(c) if isinstance(c, str) else c)

    split = foreach_batch_split(
        write_valid, write_error, app_id=app_id, on_metrics=on_metrics
    )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            # invalid rows bypass the delta state entirely (the
            # reference's branch happens before the transformer)
            invalid = batch_df.filter(F.col("err").isNotNull())
            valid = batch_df.filter(F.col("err").isNull() & F.col(OK).isNotNull())
            deduped = delta_dedup_fold(
                valid, ["__business_key"], ord_aliases, is_updated
            )
            split(
                deduped.unionByName(invalid).drop(*ord_aliases), batch_id
            )
        finally:
            batch_df.unpersist()

    return _start_foreach_batch(validated, fn, checkpoint, trigger)
