"""Observability: error counters/rates as first-class query metrics.

Parity: metrics/MetricsBuilder.java:19-61 registers two sensors per
topology — deserialization-error count/rate and processing-error
count/rate — tagged with the application id. Spark equivalents:

- batch: ``Observation`` + :func:`observe_errors` — metrics computed
  inside the job (no second scan), read on the driver after the
  action;
- streaming: :func:`observe_errors` + :class:`MetricsListener`
  (a ``StreamingQueryListener``) — per-micro-batch observed rows
  surface in ``QueryProgressEvent.observedMetrics``; rates derive
  from batch duration.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener

from maston_spark import errors as E

METRIC_NAME = "maston_metrics"

RECORD_LOGGER = logging.getLogger("maston_spark.records")


def log_consumed_records(
    df: DataFrame,
    batch_id: int,
    *,
    logger: logging.Logger = RECORD_LOGGER,
    limit: int = 1000,
) -> None:
    """Per-record debug logging of a consumed micro-batch.

    Parity: interceptor/DefaultKafkaConsumerInterceptor.java:14-23
    (and the producer twin) — log ``topic/partition/key`` per record
    when the interceptor toggle is on
    (properties/KafkaPropertiesBuilder.java:77-82). Spark deviation,
    by design: per-record logging on 1000 executors over 100 TB is
    an outage, not observability — so the toggle logs a BOUNDED
    sample (``limit`` records) per micro-batch on the driver — with
    the exact batch row count when it fits the sample, else a
    "truncated" marker (a full count would add a job per batch) —
    and short-circuits entirely unless the logger is at DEBUG.
    """
    if not logger.isEnabledFor(logging.DEBUG):
        return
    cols = [c for c in ("topic", "partition", "key") if c in df.columns]
    if not cols:
        logger.debug("onConsume batch=%s (no topic/partition/key columns)", batch_id)
        return
    # over-fetch by one: len <= limit means the sample IS the batch,
    # so the logged count is exact without a count() job
    sample = df.select(*cols).limit(limit + 1).collect()
    if len(sample) > limit:
        logger.debug(
            "onConsume batch=%s rows>%d (sample truncated)", batch_id, limit
        )
        sample = sample[:limit]
    else:
        logger.debug("onConsume batch=%s rows=%d", batch_id, len(sample))
    for r in sample:
        logger.debug(
            "onConsume batch=%s %s",
            batch_id,
            " ".join(f"{c}={r[c]!r}" for c in cols),
        )


def log_produced_records(
    df: DataFrame,
    batch_id: int,
    *,
    logger: logging.Logger = RECORD_LOGGER,
    limit: int = 1000,
) -> None:
    """Producer twin of :func:`log_consumed_records`.

    Parity: interceptor/DefaultKafkaProducerInterceptor.java:13-25 —
    log ``topic/partition/key/value`` on send (acks only at debug to
    avoid over-logging). Same Spark deviation as the consumer side:
    a BOUNDED driver-side sample per micro-batch, short-circuited
    entirely unless the logger is at DEBUG, with the exact row count
    when the batch fits the sample.
    """
    if not logger.isEnabledFor(logging.DEBUG):
        return
    cols = [
        c for c in ("topic", "partition", "key", "value", "value_out")
        if c in df.columns
    ]
    if not cols:
        logger.debug("onSend batch=%s (no kafka record columns)", batch_id)
        return
    sample = df.select(*cols).limit(limit + 1).collect()
    if len(sample) > limit:
        logger.debug("onSend batch=%s rows>%d (sample truncated)", batch_id, limit)
        sample = sample[:limit]
    else:
        logger.debug("onSend batch=%s rows=%d", batch_id, len(sample))
    for r in sample:
        logger.debug(
            "onSend batch=%s %s",
            batch_id,
            " ".join(f"{c}={r[c]!r}" for c in cols),
        )


def with_record_logging(
    fn,
    *,
    logger: logging.Logger = RECORD_LOGGER,
    limit: int = 1000,
):
    """Wrap a ``foreachBatch`` function with the consumed-record
    logging interceptor (see :func:`log_consumed_records`)."""

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        log_consumed_records(batch_df, batch_id, logger=logger, limit=limit)
        fn(batch_df, batch_id)

    return wrapped


def error_metric_columns() -> list:
    err_code = F.col("err.code")
    return [
        F.count(F.lit(1)).alias("n_records"),
        F.count(F.col("err")).alias("n_errors"),
        F.count(F.when(err_code == E.FAILED_TO_DESERIALIZE_RECORD, 1)).alias(
            "n_deserialization_errors"
        ),
        F.count(F.when(err_code == E.FAILED_TO_PROCESS_RECORD, 1)).alias(
            "n_processing_errors"
        ),
    ]


def observe_errors(df: DataFrame, name: str = METRIC_NAME):
    """Attach error counters to a validated DataFrame.

    Batch: returns ``(df, Observation)`` — read ``observation.get``
    after an action. Streaming: returns ``(df, None)`` — metrics
    arrive via :class:`MetricsListener`.
    """
    if df.isStreaming:
        return df.observe(name, *error_metric_columns()), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *error_metric_columns()), obs


class MetricsListener(StreamingQueryListener):
    """Collects observed metrics per micro-batch, thread-safe.

    ``snapshot()`` returns a list of dicts (one per progress event
    that carried our observation), each including the derived
    ``errors_per_second`` rate — the analogue of the reference's
    Kafka rate sensor.
    """

    def __init__(self, metric_name: str = METRIC_NAME):
        self._name = metric_name
        self._lock = threading.Lock()
        self._rows: list[dict] = []

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        om = p.observedMetrics or {}
        row = om.get(self._name)
        if row is None:
            return
        d = row.asDict()
        dur = (p.durationMs or {}).get("triggerExecution")
        if dur:
            d["errors_per_second"] = round(d.get("n_errors", 0) * 1000.0 / dur, 6)
        d["batch_id"] = p.batchId
        with self._lock:
            self._rows.append(d)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._rows)
