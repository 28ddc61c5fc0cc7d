"""Queries exercising the maston validated-ingest core, the delta
operator, and the batch analogues of the streaming windows —
each against a DuckDB oracle that recomputes the expected outcome
directly (so the engine's round-trip machinery is what's under
test, not restated).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, LongType

from maston_spark import validated as V
from maston_spark.delta import changed_predicate, delta_dedup_expr, delta_dedup_fold
from maston_spark.queries import query
from maston_spark.session import load_table

K_SCHEMA = StructType([StructField("k", LongType())])


def _corrupted_events(spark, sf_dir):
    """events with every 10th payload truncated to malformed JSON."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "payload",
        F.when(F.col("event_id") % 10 == 0, F.substring("props", 1, 2)).otherwise(
            F.col("props")
        ),
    )


@query(
    "q60_safe_json",
    oracle="""
    WITH c AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN substring(props, 1, 2) ELSE props END AS v
      FROM events)
    SELECT event_id,
           CASE WHEN json_valid(v) THEN CAST(json_extract_string(
                  CASE WHEN json_valid(v) THEN v ELSE '{}' END, '$.k') AS BIGINT) END AS k_ok,
           CASE WHEN NOT json_valid(v) THEN 'FAILED_TO_DESERIALIZE_RECORD' END AS err_code,
           CASE WHEN NOT json_valid(v) THEN v END AS err_raw
    FROM c
    """,
)
def q60_safe_json(spark, sf_dir):
    """safe_from_json: corrupt payloads land in `err` with the raw
    bytes preserved; valid payloads parse into `ok`. Parity:
    serdes/VavrSafeDeserializer.java:29-39 (errors are data)."""
    df = V.safe_from_json(_corrupted_events(spark, sf_dir), "payload", K_SCHEMA)
    return df.select(
        "event_id",
        F.col("ok.k").alias("k_ok"),
        F.col("err.code").alias("err_code"),
        F.decode(F.col("err.raw_bytes"), "UTF-8").alias("err_raw"),
    )


@query(
    "q61_process_errors",
    oracle="""
    SELECT event_id,
           'FAILED_TO_PROCESS_RECORD' AS err_code,
           'k out of range' AS err_msg,
           'maston-spark' AS app_id
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 80
    """,
)
def q61_process_errors(spark, sf_dir):
    """Topology-1 semantics end-to-end (parity:
    topology/TopologyBuilder.java:30-50): parse → process with a
    business rule → only FAILURES flow on, enriched with the 11
    provenance headers, then flattened to fields (HeaderTo SMT)."""
    ev = load_table(spark, sf_dir, "events")
    df = V.safe_from_json(ev, "props", K_SCHEMA)
    df = V.process_validated(
        df,
        error_when=F.col("ok.k") > 80,
        error_message=F.lit("k out of range"),
    )
    _, invalid = V.branch_valid(df)
    invalid = V.with_error_headers(invalid, app_id="maston-spark")
    flat = V.flatten_headers(invalid)
    return flat.select(
        "event_id",
        F.col("maston_error_application_code").alias("err_code"),
        F.col("maston_error_application_message").alias("err_msg"),
        F.col("maston_error_application_id").alias("app_id"),
    )


@query(
    "q62_safe_serialize",
    oracle="""
    WITH c AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN substring(props, 1, 2) ELSE props END AS v
      FROM events)
    SELECT event_id,
           CASE WHEN json_valid(v)
                THEN CAST(to_json(struct_pack(k := CAST(json_extract_string(
                       CASE WHEN json_valid(v) THEN v ELSE '{}' END, '$.k') AS BIGINT))) AS VARCHAR)
                ELSE v END AS payload_out
    FROM c
    """,
)
def q62_safe_serialize(spark, sf_dir):
    """Sink-side safe serialization round-trip (parity:
    serdes/VavrSafeSerializer.java:26-52): valid → re-serialized
    JSON; invalid → original bytes verbatim (never lose a record)."""
    df = V.safe_from_json(_corrupted_events(spark, sf_dir), "payload", K_SCHEMA)
    out = V.safe_serialize_json(df)
    return out.select(
        "event_id", F.decode(F.col("value_out"), "UTF-8").alias("payload_out")
    )


_DELTA_ORACLE = """
SELECT event_id, user_id, event_type, ts FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
WHERE prev IS NULL OR prev <> event_type
"""


@query("q63_delta_expr", oracle=_DELTA_ORACLE)
def q63_delta_expr(spark, sf_dir):
    """maston delta op, expression fast path (emit iff the watched
    column changed vs the previous accepted record per key). Under
    an inequality predicate, last-accepted == last-seen, so a lag
    window is semantically exact — and it is the 100 TB plan: one
    shuffle on user_id, zero Python."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return delta_dedup_expr(
        ev, key_cols=["user_id"], order_cols=["ts", "event_id"], changed_cols=["event_type"]
    )


@query("q64_delta_fold", oracle=_DELTA_ORACLE)
def q64_delta_fold(spark, sf_dir):
    """Same semantics through the general-predicate engine path
    (Arrow-batched per-key ordered fold, arbitrary Python
    is_updated) — the reference implementation of
    transformer/TransformerBuilder.java:116-162 semantics."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return delta_dedup_fold(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        is_updated=changed_predicate(["event_type"]),
    )


# ------------------------------------------------- streaming batch analogues


@query(
    "q33_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q33_tumbling_window(spark, sf_dir):
    """Tumbling event-time window (same operator Structured
    Streaming uses with a watermark; batch here so the oracle can
    check it)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


@query(
    "q34_sliding_window",
    oracle="""
    WITH s AS (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS window_start,
             value
      FROM events)
    SELECT window_start, count(*) AS n,
           round(round(sum(value), 2) / count(*), 6) AS avg_value
    FROM s GROUP BY 1
    """,
)
def q34_sliding_window(spark, sf_dir):
    """Sliding window (1h length, 30min slide): each event belongs to
    exactly two windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 6).alias("avg_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "avg_value")
    )


@query(
    "q35_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM g)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, sess_id
    """,
)
def q35_session_window(spark, sf_dir):
    """Session window with a 5-minute gap (session_window() is the
    same operator streaming uses; the oracle re-derives sessions via
    a lag/cumsum construction)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q36_drop_duplicates",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q36_drop_duplicates(spark, sf_dir):
    """dropDuplicates on the key columns (batch analogue of
    streaming dropDuplicates/dropDuplicatesWithinWatermark)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
