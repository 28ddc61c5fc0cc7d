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

from pyspark.sql import Column, DataFrame, Window, functions as F

from maston_spark.delta import delta_dedup_fold
from maston_spark.observability import with_record_logging
from maston_spark.sinks import foreach_batch_split
from maston_spark.validated import (
    OK,
    distinct_schema_ids,
    safe_from_avro_arrow,
    safe_from_avro_evolving,
    safe_from_json,
)


def _parse_validated(source: DataFrame, value_col: str, value_schema, value_format: str) -> DataFrame:
    """Serde dispatch for the topologies — the analogue of the
    reference's two consumer entry points:
    ``SimpleAvroStreamConsumer.buildAndStartWithValidation`` (its
    primary API, registry-framed Avro) and the JSON variant.
    ``value_schema`` is a DDL/StructType for json, a parsed Avro
    schema dict for avro (resolve via
    :func:`maston_spark.registry.resolve_avro_schema` when a Schema
    Registry holds it). For ``avro-evolving`` — a topic with multiple
    live schema versions, the Confluent serde's normal operating mode
    (serdes/VavrSafeSerdesBuilder.java:17-23) — ``value_schema`` is
    ``(reader_schema, {schema_id: writer_schema})``; records dispatch
    per the frame's schema id and resolve to the reader shape."""
    if value_format == "json":
        return safe_from_json(
            source.withColumn(value_col, F.col(value_col).cast("string")),
            value_col,
            value_schema,
        )
    if value_format == "avro":
        return safe_from_avro_arrow(
            source.withColumn(value_col, F.col(value_col).cast("binary")),
            value_col,
            value_schema,
        )
    if value_format == "avro-evolving":
        reader, writers_by_id = value_schema
        return safe_from_avro_evolving(
            source.withColumn(value_col, F.col(value_col).cast("binary")),
            value_col,
            reader,
            writers_by_id,
        )
    raise ValueError(f"unsupported value_format {value_format!r}")


def _start_foreach_batch(df: DataFrame, fn, checkpoint: str, trigger: dict | None):
    writer = df.writeStream.foreachBatch(fn).option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def _state_versions(spark, state_dir: str) -> list[int]:
    """List committed state versions (``v<N>`` subdirs) via the Hadoop
    FileSystem API, so the state table works on local FS, HDFS, or
    object stores alike."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def _drop_state_versions(spark, state_dir: str, versions: list[int]) -> None:
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    for v in versions:
        fs.delete(jvm.org.apache.hadoop.fs.Path(state_dir, f"v{v}"), True)


def _ensure_state_owner(spark, state_dir: str, checkpoint: str) -> None:
    """Guard against an explicit ``state_dir`` being reused with a
    FRESH checkpoint: batch ids restart at 0 there, so the previous
    run's ``v0`` would be mistaken for this run's own retry version
    (the retry corner in the batch fn) and wrongly suppress
    first-batch records. An ``_owner`` marker ties the state table to
    the checkpoint it belongs to; on mismatch the stale versions are
    dropped — a new checkpoint is a new stream, so its state starts
    empty. A restart of the SAME checkpoint matches the marker and
    keeps its durable state (that's the point of the table)."""
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    owner = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(checkpoint)).toString()
    marker = jvm.org.apache.hadoop.fs.Path(state_dir, "_owner")
    if fs.exists(marker):
        ins = fs.open(marker)
        try:
            existing = bytes(ins.readAllBytes()).decode("utf-8")
        finally:
            ins.close()
        if existing == owner:
            return
        _drop_state_versions(spark, state_dir, _state_versions(spark, state_dir))
    out = fs.create(marker, True)
    try:
        out.write(bytearray(owner.encode("utf-8")))
    finally:
        out.close()


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
    value_format: str = "json",
    log_records: bool = False,
    serialize=None,
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
    validated = _parse_validated(source, value_col, value_schema, value_format)
    if processor is not None:
        validated = processor(validated)
    fn = foreach_batch_split(
        write_valid if emit_valid else (lambda df: None),
        write_error,
        app_id=app_id,
        on_metrics=on_metrics,
        serialize=serialize,
        log_produced=log_records,
    )
    if log_records:
        # parity: the enable/disable interceptor toggle of
        # KafkaPropertiesBuilder.java:77-82
        fn = with_record_logging(fn)
    return _start_foreach_batch(validated, fn, checkpoint, trigger)


def dynamic_avro_topology(
    source: DataFrame,
    client,
    subject: str,
    *,
    app_id: str,
    checkpoint: str,
    write_valid: Callable[[DataFrame], None],
    write_error: Callable[[DataFrame], None],
    value_col: str = "value",
    processor: Callable[[DataFrame], DataFrame] | None = None,
    trigger: dict | None = None,
    on_metrics: Callable[[int, dict[str, int]], None] | None = None,
    reader_schema: dict | None = None,
    log_records: bool = False,
    serialize=None,
):
    """Validated Avro consumer that resolves NEW writer schema ids at
    RUNTIME — no restart when a producer rolls out a schema version.

    Parity: the Confluent deserializer the reference wires in
    (serdes/VavrSafeSerdesBuilder.java:17-23) fetches unknown schema
    ids from the registry lazily as records arrive. The static
    topologies bake a fixed id set at start; here the serde moves
    INSIDE ``foreachBatch``: each micro-batch's distinct ids (one
    tiny JVM-side aggregate) resolve through the cached
    :class:`~maston_spark.registry.SchemaRegistryClient` driver-side,
    then the batch decodes with :func:`safe_from_avro_evolving`.
    Already-seen ids cost nothing (client cache); ids the registry
    doesn't know yet land in ``err`` THIS batch and retry resolution
    next batch — at-least-once semantics preserved either way.

    Scale: the per-batch driver work is O(distinct new ids), not
    O(records); executors still never talk to the registry.
    """
    reader = reader_schema or client.get_latest(subject).schema
    writers: dict[int, dict] = {}
    split = foreach_batch_split(
        write_valid, write_error, app_id=app_id, on_metrics=on_metrics,
        serialize=serialize, log_produced=log_records,
    )
    if log_records:
        split = with_record_logging(split)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        raw = batch_df.withColumn(value_col, F.col(value_col).cast("binary")).persist()
        try:
            for sid in distinct_schema_ids(raw, value_col):
                if sid not in writers:
                    try:
                        writers[sid] = client.get_by_id(sid).schema
                    except Exception:  # noqa: BLE001 — unknown id → err rows
                        pass
            validated = safe_from_avro_evolving(raw, value_col, reader, writers)
            if processor is not None:
                validated = processor(validated)
            split(validated, batch_id)
        finally:
            raw.unpersist()

    return _start_foreach_batch(source, fn, checkpoint, trigger)


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
    state_dir: str | None = "auto",
    value_format: str = "json",
    log_records: bool = False,
    serialize=None,
):
    """Delta consumer: parse → re-key by the recomputed business key
    → per-key emit-iff-updated → split-sink.

    The within-batch fold runs via ``applyInPandas`` inside
    ``foreachBatch``. Cross-batch suppression state is DURABLE (the
    reference's store persists across the stream —
    topology/TopologyBuilder.java:66-69,87): the last accepted record
    per key lives in a compacted parquet state table under
    ``state_dir`` (default ``<checkpoint>/delta_state``), versioned
    per batch-id so a batch retry rewrites its own version
    idempotently instead of corrupting the table it reads. Each
    micro-batch seeds the fold with the stored record per key, so a
    record unchanged across two batches stays suppressed — the golden
    sequence of topology/VavrKStreamWithDeltaTopologyTest.java:312-331
    emits 0,2,3,5 regardless of how the records split into batches.

    Scale note: the state rewrite per batch is a full compaction of
    the active key set — one shuffle on the key plus a parquet write,
    parallel across executors, no driver materialization. For
    key-cardinality-bound state with TTL eviction prefer
    :func:`maston_spark.delta.delta_dedup_stream` /
    ``delta_dedup_tws`` (RocksDB state store) when the pipeline
    doesn't need the validated+DLQ fan-out of this topology.
    ``state_dir=None`` opts out (per-batch-only suppression).
    """
    key_col = (
        F.col(business_key) if isinstance(business_key, str) else business_key
    ).alias("__business_key")
    validated = _parse_validated(
        source, value_col, value_schema, value_format
    ).withColumn("__business_key", key_col)
    # applyInPandas sorts by flat column names only — materialize
    # (possibly nested) order expressions as temp columns
    ord_aliases = [f"__ord_{i}" for i in range(len(order_cols))]
    for alias, c in zip(ord_aliases, order_cols):
        validated = validated.withColumn(alias, F.col(c) if isinstance(c, str) else c)

    split = foreach_batch_split(
        write_valid, write_error, app_id=app_id, on_metrics=on_metrics,
        serialize=serialize, log_produced=log_records,
    )
    sdir = f"{checkpoint.rstrip('/')}/delta_state" if state_dir == "auto" else state_dir
    if sdir is not None:
        _ensure_state_owner(source.sparkSession, sdir, checkpoint)
    SEQ = "__seq"  # 0 = state seed (sorts before every batch row)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        accepted = None
        try:
            # invalid rows bypass the delta state entirely (the
            # reference's branch happens before the transformer)
            invalid = batch_df.filter(F.col("err").isNotNull())
            valid = batch_df.filter(F.col("err").isNull() & F.col(OK).isNotNull())
            if sdir is None:
                deduped = delta_dedup_fold(
                    valid, ["__business_key"], ord_aliases, is_updated
                )
                split(deduped.unionByName(invalid).drop(*ord_aliases), batch_id)
                return

            combined = valid.withColumn(SEQ, F.lit(1))
            versions = _state_versions(spark, sdir)
            prior = [v for v in versions if v < batch_id]
            # Retry corner: a crash after cleanup but before the
            # checkpoint commit leaves only this batch's own version;
            # seeding from it keeps already-stored records suppressed
            # (at-least-once delivery still holds). Reading and then
            # overwriting the same path needs the seed materialized
            # first — localCheckpoint cuts the lineage eagerly.
            seed_v = prior[-1] if prior else (batch_id if batch_id in versions else None)
            if seed_v is not None:
                seed = spark.read.parquet(f"{sdir}/v{seed_v}")
                if seed_v == batch_id:
                    seed = seed.localCheckpoint(eager=True)
                combined = combined.unionByName(seed.withColumn(SEQ, F.lit(0)))
            accepted = delta_dedup_fold(
                combined, ["__business_key"], [SEQ, *ord_aliases], is_updated
            ).persist()
            # last accepted per key (seed included, so idle keys keep
            # their state) becomes the next compacted state version
            w = Window.partitionBy("__business_key").orderBy(
                F.col(SEQ).desc(), *[F.col(a).desc_nulls_last() for a in ord_aliases]
            )
            new_state = (
                accepted.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", SEQ)
            )
            new_state.write.mode("overwrite").parquet(f"{sdir}/v{batch_id}")
            emitted = accepted.filter(F.col(SEQ) == 1).drop(SEQ)
            split(emitted.unionByName(invalid).drop(*ord_aliases), batch_id)
            # old versions are only dropped after the sinks consumed
            # this batch; a crash before this point leaves extra
            # versions behind, which the next batch ignores (reads
            # max(version < batch_id)) — never a correctness issue
            _drop_state_versions(spark, sdir, prior)
        finally:
            if accepted is not None:
                accepted.unpersist()
            batch_df.unpersist()

    if log_records:
        fn = with_record_logging(fn)
    return _start_foreach_batch(validated, fn, checkpoint, trigger)
