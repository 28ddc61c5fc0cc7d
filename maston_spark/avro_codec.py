"""Pure-Python Avro binary codec + Confluent wire-format framing.

The environment ships Spark without the ``spark-avro`` connector jar
(``from_avro``/``to_avro`` don't resolve — see
:func:`maston_spark.validated.avro_available`), so the executable
Avro path is this hand-written codec run as an Arrow-batched pandas
UDF. It implements the Avro 1.x binary encoding spec for the subset
the reference's records use: primitives, ``["null", X]`` unions, and
the ``decimal`` logical type on ``bytes``
(two's-complement big-endian unscaled int).

Parity targets in the reference:
- serdes/VavrSafeDeserializer.java:29-39 — try-decode, on failure
  wrap the raw bytes in an error instead of crashing.
- properties/KafkaPropertiesBuilder.java:43-55 — Confluent
  registry-framed payloads: 1 magic byte (0x00) + 4-byte big-endian
  schema id, then the Avro body. :func:`confluent_wrap`/
  :func:`confluent_unwrap` reproduce that framing.
- mapper/AvroByteBufferToBigDecimalMapper.java:13-26 — decimal
  logical-type bytes -> BigDecimal, including inside a
  ``["null", bytes-decimal]`` union (the shape of
  src/test/resources/dummy-avro-record.avsc:27-38).

Scale note: the codec runs inside ``mapInPandas`` over the binary
column — per-partition Python, Arrow-batched, no shuffle, no driver
involvement; it parallelizes linearly with executors. When a real
cluster has the spark-avro jar, ``validated.safe_from_avro`` is the
preferred JVM-side path and shares the same ok/err output contract.
"""

from __future__ import annotations

import decimal
import io
import struct
from typing import Any

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"\x00"


class AvroDecodeError(ValueError):
    pass


# --------------------------------------------------------------- varint


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise AvroDecodeError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7
        if shift > 70:
            raise AvroDecodeError("varint too long")


# --------------------------------------------------------------- schema model


def _is_decimal(sch: Any) -> bool:
    return (
        isinstance(sch, dict)
        and sch.get("type") == "bytes"
        and sch.get("logicalType") == "decimal"
    )


def _type_name(sch: Any) -> Any:
    if isinstance(sch, dict) and not isinstance(sch, list):
        return sch.get("type")
    return sch


def spark_type_for(sch: Any) -> DataType:
    """Map an Avro (sub)schema to the Spark type its decode yields."""
    if isinstance(sch, list):  # union — only ["null", X] supported
        branches = [b for b in sch if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported union {sch!r}")
        return spark_type_for(branches[0])
    if _is_decimal(sch):
        # Avro allows arbitrary precision (the reference's test schema
        # declares 64); Spark's DecimalType tops out at 38 digits, so
        # the COLUMN type caps there — decode itself stays exact
        # (Python Decimal), values wider than 38 digits overflow to
        # NULL at the Arrow boundary rather than corrupting silently
        return DecimalType(min(int(sch.get("precision", 38)), 38), int(sch.get("scale", 0)))
    t = _type_name(sch)
    mapping = {
        "null": StringType(),
        "boolean": BooleanType(),
        "int": IntegerType(),
        "long": LongType(),
        "float": FloatType(),
        "double": DoubleType(),
        "bytes": BinaryType(),
        "string": StringType(),
    }
    if t in mapping:
        return mapping[t]
    raise ValueError(f"unsupported avro type {sch!r}")


def record_struct_type(schema: dict) -> StructType:
    return StructType(
        [StructField(f["name"], spark_type_for(f["type"])) for f in schema["fields"]]
    )


# --------------------------------------------------------------- encode


def _encode_value(out: io.BytesIO, sch: Any, val: Any) -> None:
    if isinstance(sch, list):  # union: branch index then value
        if val is None:
            if "null" not in sch:
                raise ValueError("null for non-nullable union")
            write_long(out, sch.index("null"))
            return
        branch = next(i for i, b in enumerate(sch) if b != "null")
        write_long(out, branch)
        _encode_value(out, sch[branch], val)
        return
    if _is_decimal(sch):
        scale = int(sch.get("scale", 0))
        d = val if isinstance(val, decimal.Decimal) else decimal.Decimal(str(val))
        unscaled = int(d.scaleb(scale).to_integral_value(rounding=decimal.ROUND_HALF_UP))
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        body = unscaled.to_bytes(nbytes, "big", signed=True)
        write_long(out, len(body))
        out.write(body)
        return
    t = _type_name(sch)
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if val else b"\x00")
    elif t in ("int", "long"):
        write_long(out, int(val))
    elif t == "float":
        out.write(struct.pack("<f", float(val)))
    elif t == "double":
        out.write(struct.pack("<d", float(val)))
    elif t in ("bytes", "string"):
        body = val.encode("utf-8") if isinstance(val, str) else bytes(val)
        write_long(out, len(body))
        out.write(body)
    else:
        raise ValueError(f"unsupported avro type {sch!r}")


def encode_record(schema: dict, record: dict) -> bytes:
    out = io.BytesIO()
    for f in schema["fields"]:
        _encode_value(out, f["type"], record.get(f["name"]))
    return out.getvalue()


# --------------------------------------------------------------- decode


def _decode_value(buf: io.BytesIO, sch: Any) -> Any:
    if isinstance(sch, list):
        branch = read_long(buf)
        if not 0 <= branch < len(sch):
            raise AvroDecodeError(f"union branch {branch} out of range")
        return _decode_value(buf, sch[branch])
    if _is_decimal(sch):
        n = read_long(buf)
        if n < 0:
            raise AvroDecodeError("negative bytes length")
        body = buf.read(n)
        if len(body) != n:
            raise AvroDecodeError("truncated decimal bytes")
        scale = int(sch.get("scale", 0))
        unscaled = int.from_bytes(body, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    t = _type_name(sch)
    if t == "null":
        return None
    if t == "boolean":
        raw = buf.read(1)
        if not raw:
            raise AvroDecodeError("truncated boolean")
        return raw[0] != 0
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        raw = buf.read(4)
        if len(raw) != 4:
            raise AvroDecodeError("truncated float")
        return struct.unpack("<f", raw)[0]
    if t == "double":
        raw = buf.read(8)
        if len(raw) != 8:
            raise AvroDecodeError("truncated double")
        return struct.unpack("<d", raw)[0]
    if t in ("bytes", "string"):
        n = read_long(buf)
        if n < 0:
            raise AvroDecodeError("negative length")
        body = buf.read(n)
        if len(body) != n:
            raise AvroDecodeError("truncated bytes/string")
        return body.decode("utf-8") if t == "string" else body
    raise AvroDecodeError(f"unsupported avro type {sch!r}")


def decode_record(schema: dict, payload: bytes) -> dict:
    buf = io.BytesIO(payload)
    out = {f["name"]: _decode_value(buf, f["type"]) for f in schema["fields"]}
    if buf.read(1):
        raise AvroDecodeError("trailing bytes after record")
    return out


# --------------------------------------------------------------- confluent framing


def confluent_wrap(schema_id: int, body: bytes) -> bytes:
    return MAGIC + struct.pack(">I", schema_id) + body


def confluent_unwrap(payload: bytes) -> tuple[int, bytes]:
    if len(payload) < 5 or payload[:1] != MAGIC:
        raise AvroDecodeError("not a Confluent-framed payload")
    return struct.unpack(">I", payload[1:5])[0], payload[5:]
