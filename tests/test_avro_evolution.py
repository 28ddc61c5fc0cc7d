"""Avro schema evolution: per-record Confluent schema-id dispatch.

Parity target: the reference's registry-backed serde resolves the
WRITER schema by the 5-byte frame's schema id per record
(serdes/VavrSafeSerdesBuilder.java:17-23, registry config
properties/KafkaPropertiesBuilder.java:43-55), so a topic holding
two live schema versions decodes both — old-version records resolve
against the reader schema per the Avro spec (name matching,
defaults, promotions). Never-throw contract unchanged
(serdes/VavrSafeDeserializer.java:29-39).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from maston_spark import avro_codec as AC
from maston_spark.registry import SchemaRegistryClient
from maston_spark.validated import (
    distinct_schema_ids,
    safe_from_avro_evolving,
    safe_from_avro_registry,
)

V1 = {
    "name": "Order",
    "type": "record",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "qty", "type": "int"},
    ],
}

# evolved: qty widened int->long, nullable note added, tag added with
# a default, and a writer-only field does NOT exist here (see V3)
V2 = {
    "name": "Order",
    "type": "record",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "qty", "type": "long"},
        {"name": "note", "type": ["null", "string"], "default": None},
        {"name": "tag", "type": "string", "default": "untagged"},
    ],
}

# a writer version carrying a field the reader dropped
V3 = {
    "name": "Order",
    "type": "record",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "qty", "type": "long"},
        {"name": "legacy_flag", "type": "boolean"},
        {"name": "note", "type": ["null", "string"], "default": None},
        {"name": "tag", "type": "string", "default": "untagged"},
    ],
}


# ------------------------------------------------------------ spec


def test_resolution_spec_shapes():
    spec = AC.resolution_spec(V1, V2)
    assert spec == [
        ("copy", "key", None),
        ("copy", "qty", ("int", "long")),
        ("default", None),
        ("default", "untagged"),
    ]
    # identical schemas: all plain copies
    assert all(e[0] == "copy" and e[2] is None for e in AC.resolution_spec(V2, V2))
    # writer-only fields are skipped implicitly
    assert [e[1] for e in AC.resolution_spec(V3, V2) if e[0] == "copy"] == [
        "key",
        "qty",
        "note",
        "tag",
    ]


def test_resolution_spec_errors():
    no_default = {
        "name": "R",
        "type": "record",
        "fields": [{"name": "required_new", "type": "string"}],
    }
    with pytest.raises(ValueError, match="no default"):
        AC.resolution_spec(V1, no_default)
    narrowing = {
        "name": "R",
        "type": "record",
        "fields": [{"name": "qty", "type": "int"}],
    }
    with pytest.raises(ValueError, match="cannot resolve"):
        AC.resolution_spec(V2, narrowing)
    nullability_loss = {
        "name": "R",
        "type": "record",
        "fields": [{"name": "note", "type": "string"}],
    }
    with pytest.raises(ValueError, match="non-nullable"):
        AC.resolution_spec(V2, nullability_loss)


def test_resolving_record_decoder():
    dec = AC.compile_resolving_record_decoder(V1, V2)
    body = AC.encode_record(V1, {"key": "a", "qty": 7})
    assert dec(body) == {"key": "a", "qty": 7, "note": None, "tag": "untagged"}
    dec3 = AC.compile_resolving_record_decoder(V3, V2)
    body3 = AC.encode_record(
        V3, {"key": "c", "qty": 9, "legacy_flag": True, "note": "n", "tag": "t"}
    )
    assert dec3(body3) == {"key": "c", "qty": 9, "note": "n", "tag": "t"}


# ------------------------------------------------------------ end-to-end


def _mixed_frame(spark):
    rows = [
        Row(k="v1", value=AC.confluent_wrap(1, AC.encode_record(V1, {"key": "a", "qty": 7}))),
        Row(
            k="v2",
            value=AC.confluent_wrap(
                2, AC.encode_record(V2, {"key": "b", "qty": 8, "note": "hi", "tag": "t2"})
            ),
        ),
        Row(
            k="v3",
            value=AC.confluent_wrap(
                3,
                AC.encode_record(
                    V3, {"key": "c", "qty": 9, "legacy_flag": True, "note": None, "tag": "t3"}
                ),
            ),
        ),
        Row(k="tombstone", value=None),
        Row(k="badframe", value=b"\x01\x02\x03"),
        Row(k="unknown", value=AC.confluent_wrap(99, b"\x02")),
        Row(k="corrupt", value=AC.confluent_wrap(1, b"\xff")),  # truncated varint
    ]
    return spark.createDataFrame(rows, "k string, value binary")


def test_safe_from_avro_evolving_mixed_batch(spark):
    df = _mixed_frame(spark)
    out = {
        r["k"]: r
        for r in safe_from_avro_evolving(
            df, "value", V2, {1: V1, 2: V2, 3: V3}
        ).collect()
    }
    assert out["v1"]["err"] is None
    assert out["v1"]["ok"].asDict() == {
        "key": "a", "qty": 7, "note": None, "tag": "untagged"
    }
    assert out["v2"]["ok"].asDict() == {"key": "b", "qty": 8, "note": "hi", "tag": "t2"}
    assert out["v3"]["ok"].asDict() == {"key": "c", "qty": 9, "note": None, "tag": "t3"}
    assert out["tombstone"]["ok"] is None and out["tombstone"]["err"] is None
    assert out["badframe"]["ok"] is None
    assert "not a Confluent-framed payload" in out["badframe"]["err"]["exception_message"]
    assert out["badframe"]["err"]["raw_bytes"] == b"\x01\x02\x03"
    assert "unknown schema id 99" in out["unknown"]["err"]["exception_message"]
    assert out["corrupt"]["ok"] is None and out["corrupt"]["err"] is not None


def test_safe_from_avro_evolving_single_id_steady_state(spark):
    rows = [
        Row(k=f"r{i}", value=AC.confluent_wrap(1, AC.encode_record(V1, {"key": f"k{i}", "qty": i})))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "k string, value binary")
    got = safe_from_avro_evolving(df, "value", V2, {1: V1}).select("ok.*").collect()
    assert len(got) == 50
    assert all(r["tag"] == "untagged" and r["note"] is None for r in got)
    assert sorted(r["qty"] for r in got) == list(range(50))


def test_distinct_schema_ids(spark):
    ids = distinct_schema_ids(_mixed_frame(spark), "value")
    assert ids == [1, 2, 3, 99]


def test_safe_from_avro_registry_mocked(spark):
    payloads = {
        "/subjects/orders-value/versions/latest": {
            "subject": "orders-value", "id": 2, "version": 2, "schema": json.dumps(V2)
        },
        "/schemas/ids/1": {"schema": json.dumps(V1)},
        "/schemas/ids/2": {"schema": json.dumps(V2)},
        "/schemas/ids/3": {"schema": json.dumps(V3)},
        "/schemas/ids/99": {"schema": json.dumps(V1)},  # registry knows it; decode fails
    }
    calls: list[str] = []

    def opener(url, headers, timeout):
        path = url.replace("http://reg:8081", "")
        calls.append(path)
        return 200, json.dumps(payloads[path]).encode()

    client = SchemaRegistryClient("http://reg:8081", opener=opener)
    df = _mixed_frame(spark)
    out = {
        r["k"]: r
        for r in safe_from_avro_registry(
            df, "value", client, "orders-value"
        ).collect()
    }
    assert out["v1"]["ok"]["qty"] == 7 and out["v1"]["ok"]["tag"] == "untagged"
    assert out["v3"]["ok"]["key"] == "c"
    assert out["corrupt"]["err"] is not None
    # driver-side resolution only: one latest + one per observed id
    assert calls.count("/subjects/orders-value/versions/latest") == 1


def test_evolving_decimal_passthrough(spark):
    """Decimal logical-type fields ride through the evolution path
    unchanged (same (p, s) on both sides = plain column copy in
    resolve_struct), including the vectorized decode."""
    import decimal

    dec_schema = {
        "name": "Pay",
        "type": "record",
        "fields": [
            {"name": "key", "type": "string"},
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
    reader = {
        "name": "Pay",
        "type": "record",
        "fields": dec_schema["fields"] + [
            {"name": "note", "type": ["null", "string"], "default": None}
        ],
    }
    rows = [
        Row(value=AC.confluent_wrap(5, AC.encode_record(
            dec_schema, {"key": f"k{i}", "amount": decimal.Decimal(i * 7).scaleb(-2)}
        )))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "value binary")
    out = safe_from_avro_evolving(df, "value", reader, {5: dec_schema}).select("ok.*")
    got = {r.key: r for r in out.collect()}
    assert got["k3"].amount == decimal.Decimal("0.21")
    assert got["k3"].note is None
    assert dict(out.dtypes)["amount"] == "decimal(12,2)"


def test_safe_serialize_avro_fallback_branches(spark):
    """Producer-side never-throw contract
    (serdes/VavrSafeSerializer.java:26-52): valid → framed Avro;
    err with raw bytes → verbatim; err with only a source record →
    re-serialized; bare err → empty bytes; all-null → null."""
    from maston_spark.validated import safe_serialize_avro

    schema = {
        "name": "Rec",
        "type": "record",
        "fields": [
            {"name": "key", "type": "string"},
            {"name": "qty", "type": "long"},
        ],
    }
    err_ddl = (
        "struct<code:string,message:string,target_class:string,"
        "exception_class:string,exception_message:string,"
        "stacktrace:string,raw_bytes:binary,"
        "source_record:struct<key:string,qty:bigint>>"
    )
    df = spark.createDataFrame(
        [
            ("valid", {"key": "a", "qty": 7}, None),
            ("raw", None, {"code": "X", "raw_bytes": b"orig-bytes"}),
            ("src", None, {"code": "X", "source_record": {"key": "s", "qty": 1}}),
            ("bare", None, {"code": "X"}),
            ("null", None, None),
        ],
        f"k string, ok struct<key:string,qty:bigint>, err {err_ddl}",
    )
    out = {r.k: r.value_out for r in safe_serialize_avro(df, schema, 7).collect()}
    sid, body = AC.confluent_unwrap(bytes(out["valid"]))
    assert sid == 7
    assert AC.decode_record(schema, body) == {"key": "a", "qty": 7}
    assert bytes(out["raw"]) == b"orig-bytes"
    sid2, body2 = AC.confluent_unwrap(bytes(out["src"]))
    assert AC.decode_record(schema, body2) == {"key": "s", "qty": 1}
    assert bytes(out["bare"]) == b""
    assert out["null"] is None


def test_evolving_bytes_to_string_non_utf8_becomes_err_row(spark):
    """bytes→string promotion with NON-UTF8 writer bytes: the
    vectorized path's whole-column cast validates UTF-8 and raises
    ArrowInvalid — never-throw contract requires the bad ROW to
    become an err row, not the cast to kill the task
    (serdes/VavrSafeDeserializer.java:29-39). Good rows in the same
    batch still decode."""
    writer = {
        "name": "Blob",
        "type": "record",
        "fields": [
            {"name": "key", "type": "string"},
            {"name": "data", "type": "bytes"},
        ],
    }
    reader = {
        "name": "Blob",
        "type": "record",
        "fields": [
            {"name": "key", "type": "string"},
            {"name": "data", "type": "string"},  # bytes→string promotion
        ],
    }
    rows = [
        Row(k="good", value=AC.confluent_wrap(
            9, AC.encode_record(writer, {"key": "a", "data": b"plain ascii"}))),
        Row(k="bad", value=AC.confluent_wrap(
            9, AC.encode_record(writer, {"key": "b", "data": b"\xff\xfe\x80"}))),
        Row(k="utf8", value=AC.confluent_wrap(
            9, AC.encode_record(writer, {"key": "c", "data": "é中".encode()}))),
    ]
    df = spark.createDataFrame(rows, "k string, value binary")
    out = {r["k"]: r for r in
           safe_from_avro_evolving(df, "value", reader, {9: writer}).collect()}
    assert out["good"]["ok"]["data"] == "plain ascii"
    assert out["utf8"]["ok"]["data"] == "é中"
    assert out["bad"]["ok"] is None
    assert out["bad"]["err"] is not None
    assert out["bad"]["err"]["raw_bytes"] == bytes(rows[1].value)
