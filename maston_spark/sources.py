"""Sources: Kafka (batch + streaming), files (batch + streaming),
rate, and a replay test source (the TopologyTestDriver analogue).

At 100 TB the file paths are partitioned directory trees; nothing
here materializes on the driver — every source returns a lazy
DataFrame whose scan Spark schedules across executors.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from maston_spark.config import KafkaConfig

FILE_FORMATS = ("parquet", "json", "csv", "orc", "text")


def kafka_stream(spark: SparkSession, cfg: KafkaConfig, topics: str | list[str]) -> DataFrame:
    """Streaming Kafka source with headers.

    Columns: key/value binary, topic, partition, offset, timestamp,
    headers array<struct<key,value>> — the full record shape the
    reference's topologies consume (SURVEY §1.3 mapping).
    """
    reader = spark.readStream.format("kafka")
    for k, v in cfg.source_options(topics).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_batch(
    spark: SparkSession,
    cfg: KafkaConfig,
    topics: str | list[str],
    ending_offsets: str = "latest",
) -> DataFrame:
    """Bounded Kafka read (backfills / reprocessing jobs)."""
    reader = spark.read.format("kafka")
    for k, v in cfg.source_options(topics).items():
        reader = reader.option(k, v)
    return reader.option("endingOffsets", ending_offsets).load()


def file_batch(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options
) -> DataFrame:
    if fmt not in FILE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read.format(fmt).options(**{k: str(v) for k, v in options.items()})
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def file_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Streaming file source (schema required by Structured Streaming
    unless inference is explicitly enabled)."""
    if fmt not in FILE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.readStream.format(fmt).options(
        **{k: str(v) for k, v in options.items()}
    )
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def avro_file_source(
    spark: SparkSession,
    path: str,
    avro_schema: dict,
    with_file_path: bool = False,
) -> DataFrame:
    """Batch source for Avro Object Container Files without the
    spark-avro jar: ``binaryFile`` scan + the pure-Python OCF parser
    (:func:`maston_spark.avro_codec.read_ocf`) inside ``mapInPandas``.

    Parallelism unit = the file (each executor task parses whole
    containers; null + deflate codecs per the public Avro spec). The
    jar-backed reader additionally splits WITHIN a file at sync
    markers — at 100 TB prefer it when available; this path exists so
    an Avro lake is readable in jar-less deployments, consistent with
    the Confluent-framed streaming serde
    (`validated.safe_from_avro_arrow`).

    ``avro_schema`` is the READER schema. Each OCF embeds its own
    WRITER schema; files written under an older (or newer) version
    resolve per the Avro spec — name matching, reader defaults for
    missing fields, int→long-style promotions
    (:func:`maston_spark.avro_codec.resolution_spec`) — so one call
    reads a lake whose files span schema versions, exactly how the
    jar-backed reader and the reference's registry serde behave. A
    writer schema that CANNOT resolve (incompatible types, missing
    default) still raises: that's drift, not evolution.
    """
    import pandas as pd

    from maston_spark import avro_codec as AC

    out_type = AC.record_struct_type(avro_schema)
    names = [f.name for f in out_type.fields]
    ddl_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_type.fields)
    out_schema = (ddl_fields + ", _file string") if with_file_path else ddl_fields
    expected = AC.json.dumps(avro_schema, sort_keys=True)

    def parse(batches):
        for pdf in batches:
            frames = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                schema, records = AC.read_ocf(bytes(content))
                if AC.json.dumps(schema, sort_keys=True) != expected:
                    try:
                        records = AC.resolve_records(schema, avro_schema, records)
                    except ValueError as exc:
                        raise AC.AvroDecodeError(
                            f"writer schema of {fpath} cannot resolve to "
                            f"the reader schema: {exc}"
                        ) from exc
                frame = pd.DataFrame(records, columns=names)
                if with_file_path:
                    frame["_file"] = fpath
                frames.append(frame)
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(columns=names + (["_file"] if with_file_path else []))
            )

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("path", "content")
    )
    return binary.mapInPandas(parse, out_schema)


def rate_stream(
    spark: SparkSession, rows_per_second: int = 10, num_partitions: int | None = None
) -> DataFrame:
    """Built-in rate source: (timestamp, value) — load/soak testing."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()


def replay_stream(
    df: DataFrame,
    batches: int = 1,
    base_dir: str | None = None,
) -> tuple[DataFrame, str]:
    """Test source: persist a static DataFrame as ``batches`` parquet
    files and stream them back one file per trigger — the analogue of
    the reference tests' ``TestInputTopic.pipeInput`` loop
    (VavrKStreamWithDeltaTopologyTest.java:312-316). Returns
    (streaming_df, dir) — caller owns cleanup of dir.
    """
    out = base_dir or tempfile.mkdtemp(prefix="replay_src_")
    n = max(1, batches)
    if "__replay_batch" in df.columns:
        for i in range(n):
            df.filter(df["__replay_batch"] == i).drop("__replay_batch").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(out, f"b{i}"))
        schema = df.drop("__replay_batch").schema
    else:
        df.coalesce(n).write.mode("overwrite").parquet(os.path.join(out, "b0"))
        schema = df.schema
    spark = df.sparkSession
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(out, "b*"))
    )
    return stream, out
