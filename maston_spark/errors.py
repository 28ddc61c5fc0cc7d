"""Canonical error model: the Spark re-expression of maston's
``Validation<KafkaError<T>, T>`` sum type.

Reference semantics (cited for parity, not copied):
- error payload fields: ``error/KafkaError.java:13-24`` (message,
  code, throwable, targetClass, bytes, sourceRecord).
- error codes: ``error/KafkaErrorToHeaderBuilder.java:28-31``.
- the 11 provenance header keys:
  ``error/KafkaErrorToHeaderBuilder.java:16-26``.

Spark mapping: every validated DataFrame carries two nullable struct
columns, ``ok`` (the typed record) and ``err`` (the error payload),
with the invariant that exactly one of them is non-null per row.
This is pure column algebra — it costs nothing at 100 TB scale
because it never leaves the JVM/Tungsten representation.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- error codes (parity: error/KafkaErrorToHeaderBuilder.java:28-31) ---
FAILED_TO_DESERIALIZE_RECORD = "FAILED_TO_DESERIALIZE_RECORD"
FAILED_TO_PROCESS_RECORD = "FAILED_TO_PROCESS_RECORD"

# --- the 11 provenance header keys (error/KafkaErrorToHeaderBuilder.java:16-26) ---
HEADER_APP_ID = "maston.error.application.id"
HEADER_TIMESTAMP = "maston.error.timestamp"
HEADER_SOURCE_TOPIC = "maston.error.source.topic"
HEADER_SOURCE_PARTITION = "maston.error.source.partition"
HEADER_SOURCE_OFFSET = "maston.error.source.offset"
HEADER_CODE = "maston.error.application.code"
HEADER_MESSAGE = "maston.error.application.message"
HEADER_TARGET_CLASS = "maston.error.target.class"
HEADER_EXCEPTION_CLASS = "maston.error.exception.class"
HEADER_EXCEPTION_MESSAGE = "maston.error.exception.message"
HEADER_EXCEPTION_STACKTRACE = "maston.error.exception.stacktrace"

ALL_ERROR_HEADER_KEYS = (
    HEADER_APP_ID,
    HEADER_TIMESTAMP,
    HEADER_SOURCE_TOPIC,
    HEADER_SOURCE_PARTITION,
    HEADER_SOURCE_OFFSET,
    HEADER_CODE,
    HEADER_MESSAGE,
    HEADER_TARGET_CLASS,
    HEADER_EXCEPTION_CLASS,
    HEADER_EXCEPTION_MESSAGE,
    HEADER_EXCEPTION_STACKTRACE,
)


def error_struct_type(source_record_type: T.StructType | None = None) -> T.StructType:
    """Schema of the ``err`` column.

    ``raw_bytes`` preserves the original undeserializable payload so
    the error sink can re-emit it verbatim (never-lose-a-record,
    parity: serdes/VavrSafeSerializer.java:26-52). ``source_record``
    is present when a *processing* (not deserialization) step failed
    on an already-valid record.
    """
    fields = [
        T.StructField("code", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("target_class", T.StringType()),
        T.StructField("exception_class", T.StringType()),
        T.StructField("exception_message", T.StringType()),
        T.StructField("stacktrace", T.StringType()),
        T.StructField("raw_bytes", T.BinaryType()),
    ]
    if source_record_type is not None:
        fields.append(T.StructField("source_record", source_record_type))
    return T.StructType(fields)


# Kafka-style headers channel: array<struct<key string, value binary>>
HEADERS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.BinaryType()),
        ]
    )
)
