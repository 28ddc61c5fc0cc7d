"""Fail-fast lifecycle runner (S19) + record-logging interceptor (S18).

Parity targets:
- KafkaStreamsDecorator.java:24-43 — start, busy-wait to RUNNING,
  shutdown hook, uncaught-exception → exit(1) (the k8s restart
  model). run_forever reproduces: terminal query exception → stop
  siblings → run hooks → on_exit(1).
- interceptor/DefaultKafkaConsumerInterceptor.java:14-23 +
  KafkaPropertiesBuilder.java:77-82 — per-record consumed logging
  behind an enable toggle; here a bounded driver-side sample per
  micro-batch at DEBUG.
"""

from __future__ import annotations

import json
import logging
import shutil
import tempfile

import pytest
from pyspark.sql import Row

from maston_spark.sources import replay_stream
from maston_spark.streaming.runner import run_forever
from maston_spark.streaming.topology import simple_validated_topology

SCHEMA = "business_key string, string_value string, seq bigint"


def _tmp():
    return tempfile.mkdtemp(prefix="runner_test_")


@pytest.fixture()
def cleanup():
    dirs = []
    yield dirs
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _payload(key, value, seq):
    return json.dumps({"business_key": key, "string_value": value, "seq": seq})


def _start_query(spark, cleanup, fn, rows=3, trigger=None):
    src_df = spark.createDataFrame([Row(value=_payload(f"k{i}", "v", i)) for i in range(rows)])
    stream, src = replay_stream(src_df)
    chk = _tmp()
    cleanup.extend([src, chk])
    writer = stream.writeStream.foreachBatch(fn).option("checkpointLocation", chk)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def test_run_forever_fail_fast_exits_nonzero_and_runs_hooks(spark, cleanup):
    def boom(df, bid):
        raise RuntimeError("injected batch failure")

    q = _start_query(spark, cleanup, boom)
    exits: list[int] = []
    hooks: list[str] = []
    rc = run_forever(
        q,
        on_exit=exits.append,
        shutdown_hooks=[lambda: hooks.append("closed")],
        poll_interval=0.05,
        install_signal_handlers=False,
    )
    assert rc == 1
    assert exits == [1]
    assert hooks == ["closed"]
    assert not q.isActive
    # the terminal exception is surfaced on the handle, not swallowed
    assert "injected batch failure" in str(q.exception())


def test_run_forever_clean_stop_returns_zero(spark, cleanup):
    q = _start_query(
        spark, cleanup, lambda df, bid: None, trigger={"availableNow": True}
    )
    exits: list[int] = []
    rc = run_forever(
        q, on_exit=exits.append, poll_interval=0.05, install_signal_handlers=False
    )
    assert rc == 0
    assert exits == []  # clean stop is not a failure


def test_run_forever_failure_stops_sibling_queries(spark, cleanup):
    def boom(df, bid):
        raise RuntimeError("sibling takedown")

    healthy = _start_query(spark, cleanup, lambda df, bid: None)
    failing = _start_query(spark, cleanup, boom)
    rc = run_forever(
        [healthy, failing],
        on_exit=lambda code: None,
        poll_interval=0.05,
        install_signal_handlers=False,
    )
    assert rc == 1
    # the reference's shutdown hook closes the whole app: the healthy
    # sibling must not keep running in a half-dead application
    assert not healthy.isActive


def test_record_logging_toggle_on(spark, cleanup, caplog):
    src_df = spark.createDataFrame(
        [Row(key=f"k{i}", value=_payload(f"k{i}", "v", i)) for i in range(3)]
    )
    stream, src = replay_stream(src_df)
    chk = _tmp()
    cleanup.extend([src, chk])
    with caplog.at_level(logging.DEBUG, logger="maston_spark.records"):
        q = simple_validated_topology(
            stream,
            SCHEMA,
            app_id="t-log",
            checkpoint=chk,
            write_valid=lambda df: None,
            write_error=lambda df: None,
            log_records=True,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    lines = [r.message for r in caplog.records if r.name == "maston_spark.records"]
    assert any("onConsume" in ln and "key=" in ln for ln in lines)
    # one consumer-side sample per record (the producer twin logs its
    # own 'onSend' lines for the same keys — counted separately)
    assert sum("key='k0'" in ln and "onConsume" in ln for ln in lines) == 1


def test_record_logging_toggle_off_by_default(spark, cleanup, caplog):
    src_df = spark.createDataFrame([Row(key="k0", value=_payload("k0", "v", 0))])
    stream, src = replay_stream(src_df)
    chk = _tmp()
    cleanup.extend([src, chk])
    with caplog.at_level(logging.DEBUG, logger="maston_spark.records"):
        q = simple_validated_topology(
            stream,
            SCHEMA,
            app_id="t-nolog",
            checkpoint=chk,
            write_valid=lambda df: None,
            write_error=lambda df: None,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    assert not [r for r in caplog.records if r.name == "maston_spark.records"]


def test_run_forever_query_already_finished_before_call(spark, cleanup):
    """A query that terminated CLEANLY before run_forever is called
    (isActive False, exception None — e.g. an availableNow trigger
    that drained) must be treated as already-stopped, not busy-waited
    forever in the startup loop."""
    import time as _time

    q = _start_query(
        spark, cleanup, lambda df, bid: None, trigger={"availableNow": True}
    )
    q.awaitTermination(30)
    assert not q.isActive and q.exception() is None
    t0 = _time.monotonic()
    rc = run_forever(
        q, on_exit=lambda code: None, poll_interval=0.05,
        install_signal_handlers=False,
    )
    assert rc == 0
    assert _time.monotonic() - t0 < 10  # returned, did not spin


def test_produced_record_logging_twin(spark, cleanup, caplog):
    """S18 producer side (DefaultKafkaProducerInterceptor.java:13-25):
    the same log_records toggle samples the VALID branch at the sink
    ('onSend'), bounded and DEBUG-gated like the consumer twin; off by
    default."""
    def _run(log_records):
        src_df = spark.createDataFrame(
            [Row(key=f"k{i}", value=_payload(f"k{i}", "v", i)) for i in range(3)]
        )
        stream, src = replay_stream(src_df)
        chk = _tmp()
        cleanup.extend([src, chk])
        caplog.clear()
        with caplog.at_level(logging.DEBUG, logger="maston_spark.records"):
            q = simple_validated_topology(
                stream, SCHEMA, app_id="t-prod-log", checkpoint=chk,
                write_valid=lambda df: None, write_error=lambda df: None,
                log_records=log_records,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        return [r.message for r in caplog.records if r.name == "maston_spark.records"]

    lines = _run(True)
    sends = [ln for ln in lines if "onSend" in ln]
    assert any("value_out=" in ln for ln in sends)  # the serialized record
    assert any("rows=3" in ln for ln in sends)      # exact count, batch fits sample
    assert not [ln for ln in _run(False) if "onSend" in ln]
