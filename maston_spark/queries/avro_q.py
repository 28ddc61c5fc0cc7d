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
