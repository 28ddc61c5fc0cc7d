"""Goldens for the validated-ingest core.

Mirrors the behavior matrix of the reference's serde/topology tests
(SimpleVavrStreamConsumerTopologyTest.java:75-185,
VavrSafeDeserializerTest / VavrSafeSerializerTest): valid records
parse into ``ok``; malformed bytes land in ``err`` with the original
payload preserved; tombstones stay valid-null; the error sink never
loses a record.
"""

from __future__ import annotations

import json

from pyspark.sql import Row, functions as F

from maston_spark import errors as E
from maston_spark.validated import (
    branch_valid,
    flatten_headers,
    process_validated,
    safe_from_json,
    safe_serialize_json,
    with_error_headers,
)

SCHEMA = "business_key string, string_value string, decimal_value decimal(18,0)"


def _parse(spark, payloads):
    df = spark.createDataFrame([Row(value=p) for p in payloads], "value string")
    return safe_from_json(df, "value", SCHEMA, target_class="DummyRecord")


GOOD = json.dumps({"business_key": "key-1", "string_value": "v1", "decimal_value": 42})
BAD = "this-is-not-json{{{"


def test_valid_record_parses_into_ok(spark):
    rows = _parse(spark, [GOOD]).collect()
    assert rows[0].err is None
    assert rows[0].ok.business_key == "key-1"
    assert int(rows[0].ok.decimal_value) == 42


def test_malformed_payload_routes_to_err_with_raw_bytes(spark):
    rows = _parse(spark, [BAD]).collect()
    assert rows[0].ok is None
    assert rows[0].err.code == E.FAILED_TO_DESERIALIZE_RECORD
    assert bytes(rows[0].err.raw_bytes) == BAD.encode()
    assert rows[0].err.target_class == "DummyRecord"


def test_tombstone_stays_valid_with_null_ok(spark):
    rows = _parse(spark, [None]).collect()
    assert rows[0].ok is None and rows[0].err is None


def test_branch_valid_partitions_rows(spark):
    df = _parse(spark, [GOOD, BAD, GOOD])
    valid, invalid = branch_valid(df)
    assert valid.count() == 2 and invalid.count() == 1


def test_process_validated_rejects_and_preserves_source_record(spark):
    df = _parse(spark, [GOOD, BAD])
    out = process_validated(
        df,
        error_when=F.col("ok.string_value") == "v1",
        error_message=F.lit("rejected v1"),
        target_class="DummyRecord",
    )
    rows = {r.value: r for r in out.collect()}
    rej = rows[GOOD]
    assert rej.ok is None and rej.err.code == E.FAILED_TO_PROCESS_RECORD
    assert rej.err.source_record.business_key == "key-1"  # original kept
    # already-invalid rows pass through untouched
    assert rows[BAD].err.code == E.FAILED_TO_DESERIALIZE_RECORD


def test_process_validated_transform_applies_to_survivors(spark):
    df = _parse(spark, [GOOD])
    out = process_validated(
        df,
        error_when=F.lit(False),
        transform=lambda ok: ok.withField("string_value", F.upper(ok["string_value"])),
    )
    assert out.collect()[0].ok.string_value == "V1"


def test_error_headers_eleven_keys_and_idempotent_rewrite(spark):
    df = _parse(spark, [BAD])
    once = with_error_headers(df, app_id="test-app")
    twice = with_error_headers(once, app_id="test-app")
    h1 = {h.key: bytes(h.value) if h.value is not None else None
          for h in once.collect()[0].headers}
    h2 = {h.key: bytes(h.value) if h.value is not None else None
          for h in twice.collect()[0].headers}
    assert set(h1) == set(E.ALL_ERROR_HEADER_KEYS)
    assert h1[E.HEADER_APP_ID] == b"test-app"
    assert h1[E.HEADER_CODE] == E.FAILED_TO_DESERIALIZE_RECORD.encode()
    # flush-then-write: reapplying yields identical headers, not 22
    assert len(twice.collect()[0].headers) == 11
    assert h1 == h2


def test_valid_rows_get_no_error_headers(spark):
    out = with_error_headers(_parse(spark, [GOOD]), app_id="test-app")
    assert out.collect()[0].headers is None


def test_flatten_headers_promotes_fields(spark):
    df = with_error_headers(_parse(spark, [BAD]), app_id="test-app")
    flat = flatten_headers(df)
    row = flat.collect()[0]
    assert row.maston_error_application_id == "test-app"
    assert row.maston_error_application_code == E.FAILED_TO_DESERIALIZE_RECORD
    assert "headers" not in flat.columns


def test_safe_serialize_never_loses_a_record(spark):
    df = _parse(spark, [GOOD, BAD, None])
    out = {r.value: r for r in safe_serialize_json(df).collect()}
    assert json.loads(bytes(out[GOOD].value_out))["business_key"] == "key-1"
    # invalid → original bytes verbatim
    assert bytes(out[BAD].value_out) == BAD.encode()
    # tombstone → null out
    assert out[None].value_out is None


def test_safe_serialize_reserializes_source_record_when_no_raw_bytes(spark):
    df = process_validated(
        _parse(spark, [GOOD]),
        error_when=F.lit(True),
        error_message=F.lit("forced"),
    )
    out = safe_serialize_json(df).collect()[0]
    assert json.loads(bytes(out.value_out))["string_value"] == "v1"


def test_process_validated_pandas_arrow_path(spark):
    """The arbitrary-Python processor path: Arrow batches in/out,
    same ok/err contract."""
    import pandas as pd

    from maston_spark.validated import process_validated_pandas

    df = _parse(spark, [GOOD])

    def upper_values(it):
        for pdf in it:
            for rec in pdf["ok"]:
                if rec is not None:
                    rec["string_value"] = rec["string_value"].upper()
            yield pdf

    out = process_validated_pandas(df, upper_values, df.schema)
    assert out.collect()[0].ok.string_value == "V1"


def test_replay_dlq_roundtrip(spark):
    """The DLQ second half: a record rejected by a buggy business
    rule is quarantined with full provenance, then REPLAYED from its
    verbatim bytes through the fixed rule — accepted, with the prior
    attempt's headers preserved as lineage."""
    from maston_spark.validated import replay_dlq

    # first ingest: buggy rule rejects k > 80 (should have been > 800)
    payload = json.dumps(
        {"business_key": "key-9", "string_value": "v9", "decimal_value": 90}
    )
    df = process_validated(
        _parse(spark, [payload]),
        error_when=F.col("ok.decimal_value") > 80,
        error_message=F.lit("decimal_value out of range"),
    )
    _, invalid = branch_valid(df)
    dlq = safe_serialize_json(with_error_headers(invalid, app_id="t-replay"))
    dlq_records = dlq.select(
        F.col("value_out").alias("value"), "headers"
    )
    assert dlq_records.count() == 1

    # replay through the FIXED rule
    replayed = replay_dlq(
        dlq_records.withColumn("value", F.col("value").cast("string")),
        SCHEMA,
    )
    fixed = process_validated(
        replayed,
        error_when=F.col("ok.decimal_value") > 800,
        error_message=F.lit("decimal_value out of range"),
    )
    [r] = fixed.collect()
    assert r.err is None and r.ok.business_key == "key-9"
    # prior attempt's provenance rides along as lineage
    lineage = {
        h.key: (bytes(h.value).decode() if h.value is not None else None)
        for h in r.replay_lineage
    }
    assert lineage["maston.error.application.message"] == "decimal_value out of range"
    assert len(r.replay_lineage) == 11

    # a record that fails AGAIN gets fresh headers while keeping lineage
    refail = process_validated(
        replayed, error_when=F.lit(True), error_message=F.lit("still bad")
    )
    _, still_bad = branch_valid(refail)
    enriched = with_error_headers(still_bad, app_id="t-replay-2")
    [r2] = enriched.collect()
    assert len(r2.headers) == 11 and len(r2.replay_lineage) == 11


def test_replay_dlq_stacks_lineage_on_second_pass(spark):
    """A frame carrying BOTH headers and replay_lineage (a re-failed
    record re-entering replay) stacks the new headers onto the prior
    lineage instead of colliding column names."""
    from maston_spark.validated import replay_dlq

    payload = json.dumps(
        {"business_key": "k", "string_value": "v", "decimal_value": 1}
    )
    df = process_validated(
        _parse(spark, [payload]), error_when=F.lit(True), error_message=F.lit("x")
    )
    _, invalid = branch_valid(df)
    first = safe_serialize_json(with_error_headers(invalid, app_id="a1")).select(
        F.col("value_out").cast("string").alias("value"), "headers"
    )
    r1 = replay_dlq(first, SCHEMA)
    # re-fail and re-quarantine: the frame now has headers AND lineage
    refail = process_validated(
        r1, error_when=F.lit(True), error_message=F.lit("y")
    )
    _, still_bad = branch_valid(refail)
    second = safe_serialize_json(
        with_error_headers(still_bad, app_id="a2")
    ).select(
        F.col("value_out").cast("string").alias("value"),
        "headers",
        "replay_lineage",
    )
    r2 = replay_dlq(second, SCHEMA)
    [row] = r2.collect()
    assert row.err is None and row.ok.business_key == "k"
    # full audit trail: 11 headers from each of the two prior attempts
    assert len(row.replay_lineage) == 22


def test_schema_drift_report_golden(spark):
    from maston_spark.validated import schema_drift_report

    payloads = [
        '{"k": 1}',
        '{"k": 2, "novel_a": true}',
        '{"k": 3, "novel_a": false, "novel_b": "zz"}',
        None,                       # tombstone: no fields at all
        "not-json{{",               # malformed: from_json map -> null
    ]
    df = spark.createDataFrame([Row(value=p) for p in payloads], "value string")
    got = {r.field: r for r in schema_drift_report(df, "value", ["k"]).collect()}
    assert set(got) == {"novel_a", "novel_b"}
    assert got["novel_a"].n_records == 2
    # deterministic min sample over stringified values
    assert got["novel_a"].sample_value == "false"
    assert got["novel_b"].n_records == 1 and got["novel_b"].sample_value == "zz"

    # fully conformant payloads -> empty report
    clean = spark.createDataFrame([Row(value='{"k": 9}')], "value string")
    assert schema_drift_report(clean, "value", ["k"]).count() == 0
