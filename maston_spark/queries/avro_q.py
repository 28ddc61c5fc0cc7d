"""Avro serde round-trip query: Confluent wire format end-to-end.

The spark-avro connector jar is absent in this environment, so the
executable path is the pure-Python binary codec
(:mod:`maston_spark.avro_codec`) run Arrow-batched via
``mapInPandas`` — it genuinely encodes and decodes Avro binary
(zigzag varints, ``["null", X]`` unions, decimal logical type),
it is not a JSON stand-in.

Parity: serdes/VavrSafeDeserializer.java:29-39 (never-throw decode,
errors-as-data), properties/KafkaPropertiesBuilder.java:43-55
(Confluent 5-byte magic + schema-id framing),
mapper/AvroByteBufferToBigDecimalMapper.java:13-26 +
src/test/resources/dummy-avro-record.avsc:27-38 (nullable
decimal-logical-type field).
"""

from __future__ import annotations

import decimal

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from maston_spark import avro_codec as AC
from maston_spark import validated as V
from maston_spark.queries import query
from maston_spark.session import load_table

# Mirrors dummy-avro-record.avsc's shape (mandatory string, nullable
# string, nullable bytes-decimal) plus a long key.
AVRO_SCHEMA = {
    "name": "DummyAvroTest",
    "type": "record",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "status", "type": ["null", "string"], "default": None},
        {"name": "priority", "type": "string"},
        {
            "name": "amount",
            "type": [
                "null",
                {"type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2},
            ],
            "default": None,
        },
    ],
}

SCHEMA_ID = 42


def encode_orders_avro(spark, sf_dir):
    """orders -> Confluent-framed Avro `value` bytes, with injected
    corruption: key%13==0 truncates below the 5-byte header (framing
    error), key%17==0 keeps the header but truncates the body
    mid-varint (decode error). key%5==0 sends a null through the
    nullable-string union branch."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    out_schema = StructType(
        [StructField("o_orderkey", LongType()), StructField("value", BinaryType())]
    )

    def enc(batches):
        for pdf in batches:
            values = []
            for k, st, pr in zip(
                pdf["o_orderkey"], pdf["o_orderstatus"], pdf["o_orderpriority"]
            ):
                k = int(k)
                cents = (k * 137) % 1_000_000
                body = AC.encode_record(
                    AVRO_SCHEMA,
                    {
                        "id": k,
                        "status": None if k % 5 == 0 else st,
                        "priority": pr,
                        "amount": decimal.Decimal(cents).scaleb(-2),
                    },
                )
                framed = AC.confluent_wrap(SCHEMA_ID, body)
                if k % 13 == 0:
                    framed = framed[:4]  # below the 5-byte Confluent header
                elif k % 17 == 0:
                    framed = framed[:5] + b"\xff"  # unterminated varint body
                values.append(framed)
            yield type(pdf)({"o_orderkey": pdf["o_orderkey"], "value": values})

    return orders.mapInPandas(enc, out_schema)


@query(
    "q73_safe_avro",
    oracle="""
    WITH o AS (
      SELECT *, (o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0) AS is_ok
      FROM orders)
    SELECT o_orderkey,
           CASE WHEN is_ok THEN o_orderkey END AS id_ok,
           CASE WHEN is_ok AND o_orderkey % 5 <> 0 THEN o_orderstatus END AS status_ok,
           CASE WHEN is_ok THEN o_orderpriority END AS priority_ok,
           CASE WHEN is_ok THEN
             CAST(((o_orderkey * 137) % 1000000) // 100 AS VARCHAR)
             || '.' ||
             lpad(CAST(((o_orderkey * 137) % 1000000) % 100 AS VARCHAR), 2, '0')
           END AS amount_str,
           CASE WHEN NOT is_ok THEN 'FAILED_TO_DESERIALIZE_RECORD' END AS err_code
    FROM o
    """,
)
def q73_safe_avro(spark, sf_dir):
    """Full Avro round-trip: encode orders rows to Confluent-framed
    Avro binary (with injected framing/body corruption), decode via
    the never-throw safe deserializer, surface decoded fields — the
    decimal comes back as DecimalType(12,2) — and error codes."""
    framed = encode_orders_avro(spark, sf_dir)
    df = V.safe_from_avro_arrow(framed, "value", AVRO_SCHEMA)
    return df.select(
        "o_orderkey",
        F.col("ok.id").alias("id_ok"),
        F.col("ok.status").alias("status_ok"),
        F.col("ok.priority").alias("priority_ok"),
        F.col("ok.amount").cast("string").alias("amount_str"),
        F.col("err.code").alias("err_code"),
    )


# ------------------------------------------------------ schema evolution

# Writer v1: the topic's ORIGINAL schema — no status, 32-bit id, and
# a field the current reader has since dropped.
EVO_V1 = {
    "name": "OrderEvt",
    "type": "record",
    "fields": [
        {"name": "id", "type": "int"},  # reader widened to long
        {"name": "priority", "type": "string"},
        {"name": "legacy_code", "type": "string"},  # reader dropped it
    ],
}

# Writer v2 == the reader: long id, nullable status, a tag added
# with a default so v1 records resolve.
EVO_V2 = {
    "name": "OrderEvt",
    "type": "record",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "status", "type": ["null", "string"], "default": None},
        {"name": "priority", "type": "string"},
        {"name": "region_tag", "type": "string", "default": "legacy"},
    ],
}

EVO_IDS = {1: EVO_V1, 2: EVO_V2}


def encode_orders_avro_mixed(spark, sf_dir):
    """orders -> Confluent-framed Avro with TWO live schema versions
    on the same 'topic': even keys carry v1 frames (schema id 1), odd
    keys v2 (schema id 2); key%19==0 frames with an UNREGISTERED id
    (99) — the record a consumer sees when a producer races ahead of
    the registry mirror."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    out_schema = StructType(
        [StructField("o_orderkey", LongType()), StructField("value", BinaryType())]
    )

    def enc(batches):
        for pdf in batches:
            values = []
            for k, st, pr in zip(
                pdf["o_orderkey"], pdf["o_orderstatus"], pdf["o_orderpriority"]
            ):
                k = int(k)
                if k % 2 == 0:
                    body = AC.encode_record(
                        EVO_V1, {"id": k, "priority": pr, "legacy_code": "L"}
                    )
                    sid = 1
                else:
                    body = AC.encode_record(
                        EVO_V2,
                        {
                            "id": k,
                            "status": None if k % 5 == 0 else st,
                            "priority": pr,
                            "region_tag": f"r{k % 3}",
                        },
                    )
                    sid = 2
                if k % 19 == 0:
                    sid = 99  # unknown to the registry set
                values.append(AC.confluent_wrap(sid, body))
            yield type(pdf)({"o_orderkey": pdf["o_orderkey"], "value": values})

    return orders.mapInPandas(enc, out_schema)


@query(
    "q87_avro_evolution",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 19 <> 0 THEN o_orderkey END AS id_ok,
           CASE WHEN o_orderkey % 19 <> 0 AND o_orderkey % 2 <> 0
                     AND o_orderkey % 5 <> 0
                THEN o_orderstatus END AS status_ok,
           CASE WHEN o_orderkey % 19 <> 0 THEN o_orderpriority END AS priority_ok,
           CASE WHEN o_orderkey % 19 <> 0 THEN
             CASE WHEN o_orderkey % 2 = 0 THEN 'legacy'
                  ELSE 'r' || CAST(o_orderkey % 3 AS VARCHAR) END
           END AS tag,
           CASE WHEN o_orderkey % 19 = 0
                THEN 'FAILED_TO_DESERIALIZE_RECORD' END AS err_code
    FROM orders
    """,
)
def q87_avro_evolution(spark, sf_dir):
    """Schema-evolution round-trip: one stream mixing two live schema
    versions per record (Confluent schema-id dispatch), decoded
    against the current reader schema — v1 rows get the int→long
    promotion, the added nullable status as NULL, and the
    ``region_tag`` default; writer-only ``legacy_code`` is dropped;
    frames with an id outside the registry set become err rows
    (never-throw). Parity: serdes/VavrSafeSerdesBuilder.java:17-23 +
    properties/KafkaPropertiesBuilder.java:43-55."""
    framed = encode_orders_avro_mixed(spark, sf_dir)
    df = V.safe_from_avro_evolving(framed, "value", EVO_V2, EVO_IDS)
    return df.select(
        "o_orderkey",
        F.col("ok.id").alias("id_ok"),
        F.col("ok.status").alias("status_ok"),
        F.col("ok.priority").alias("priority_ok"),
        F.col("ok.region_tag").alias("tag"),
        F.col("err.code").alias("err_code"),
    )


ERR_DDL = (
    "struct<code:string,message:string,target_class:string,"
    "exception_class:string,exception_message:string,"
    "stacktrace:string,raw_bytes:binary>"
)


@query(
    "q92_avro_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS id_rt,
           CASE WHEN o_orderkey % 5 <> 0 THEN o_orderstatus END AS status_rt,
           o_orderpriority AS priority_rt,
           CAST(((o_orderkey * 137) % 1000000) // 100 AS VARCHAR)
           || '.' ||
           lpad(CAST(((o_orderkey * 137) % 1000000) % 100 AS VARCHAR), 2, '0')
             AS amount_str
    FROM orders
    """,
)
def q92_avro_roundtrip(spark, sf_dir):
    """PRODUCE-side serde closure: build validated records from
    orders, serialize with the Confluent-framed Avro safe serializer
    (parity: serdes/VavrSafeSerializer.java:26-52 over the registry
    Avro serializer), then decode the produced bytes with the safe
    deserializer — the oracle is the identity on the source table,
    so any asymmetry between the encoder and decoder (framing,
    unions, decimal scaling) fails the hash."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    cents = (F.col("o_orderkey") * 137) % 1_000_000
    ok = F.struct(
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_orderkey") % 5 != 0, F.col("o_orderstatus")).alias("status"),
        F.col("o_orderpriority").alias("priority"),
        (cents.cast("decimal(14,0)") / 100).cast("decimal(12,2)").alias("amount"),
    )
    validated = orders.select(
        "o_orderkey", ok.alias("ok"), F.lit(None).cast(ERR_DDL).alias("err")
    )
    framed = V.safe_serialize_avro(validated, AVRO_SCHEMA, SCHEMA_ID)
    decoded = V.safe_from_avro_arrow(
        framed.select("o_orderkey", F.col("value_out").alias("value")),
        "value",
        AVRO_SCHEMA,
    )
    return decoded.select(
        "o_orderkey",
        F.col("ok.id").alias("id_rt"),
        F.col("ok.status").alias("status_rt"),
        F.col("ok.priority").alias("priority_rt"),
        F.col("ok.amount").cast("string").alias("amount_str"),
    )
