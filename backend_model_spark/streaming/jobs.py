"""Structured Streaming jobs over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.11); this is the
extension: watermarked tumbling windows, stateful dedup, and session
windows, each run with ``availableNow`` against the parquet files so
the result is a bounded DataFrame the driver can oracle-check — the
batch-equivalence testing strategy for streams (no SQL oracle can see
a stream, but ``availableNow`` over a static source must agree with
the batch query).

Scale notes: state is keyed on (window, event_type) / (user_id,
event_type) / (session, user) — all bounded, watermark-evicted keys;
the parquet source at 100 TB becomes a Kafka/file-stream source with
identical plan shape. ``complete`` output mode is used only because
the memory sink here is the verification tap; production sinks run
``update``/``append`` with the same aggregations.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# physical schema of events.parquet under nanosAsLong (streaming reads
# require a user-declared schema)
RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of events with ts as TimestampType (µs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a directory: stream the sf_dir with a
    # glob filter selecting just the events file
    raw = (
        spark.readStream.schema(RAW_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def _run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Run an availableNow query into a uniquely-named memory sink and
    return the materialized table."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return df.sparkSession.table(name)


def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling 1-hour window counts per event type —
    must agree with the batch ``events_hourly_rollup``."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    windowed = ev.groupBy(F.window("ts", "1 hour"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    out = _run_to_memory(windowed, "complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        "event_type",
        "n_events",
        "sum_value",
    ).orderBy("hour_bucket", "event_type")


STREAMING_HOURLY_ORACLE = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
  event_type,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
"""


def streaming_dedup_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) + count per
    type — equals COUNT(DISTINCT user_id) per type in batch."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicates(["user_id", "event_type"])
    counts = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique_users")
    )
    out = _run_to_memory(counts, "complete")
    return out.orderBy("event_type")


STREAMING_DEDUP_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_unique_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) per user — must agree with
    the batch lag+prefix-sum ``events_sessionize``."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = _run_to_memory(sessions, "complete")
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# same result contract as the batch sessionizer (SESSIONIZE_ORACLE);
# duplicated here so the entry is self-contained
from backend_model_spark.operators.events_ops import (  # noqa: E402
    SESSIONIZE_ORACLE as STREAMING_SESSION_ORACLE,
)
