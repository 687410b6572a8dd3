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

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CKPT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "checkpoints",
)

def _raw_events_schema(ts_type: T.DataType) -> T.StructType:
    """Streaming reads require a user-declared schema; the ts field's
    physical type depends on how the session reads TIMESTAMP(NANOS)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of events with ts as TimestampType (µs).

    events.ts is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) →
    TIMESTAMP_NTZ natively; a nanos-written variant of the table read
    under a session built with the legacy static ``nanosAsLong`` flag
    arrives as a nanos long instead. A cheap batch schema probe
    (footer-only, no data scan) picks the branch so the stream works
    under any externally-built session.
    """
    path = os.path.join(sf_dir, "events.parquet")
    probe = spark.read.parquet(path).schema
    ts_is_long = isinstance(probe["ts"].dataType, T.LongType)
    schema = _raw_events_schema(
        T.LongType() if ts_is_long else T.TimestampNTZType()
    )
    # Two physical layouts exist: the driver testdata ships events as a
    # single FILE (stream the parent dir with a glob selecting it —
    # the file source wants a directory), while Spark-written corpora
    # (.stress/*) ship a DIRECTORY of part files — there the glob trick
    # silently matches ZERO leaf files and yields an empty stream (the
    # round-10 streaming Zipf sweep's catch: every stateful entry ran
    # 0.25 s at 10x data because it read nothing). Branch on the layout.
    if os.path.isdir(path):
        raw = spark.readStream.schema(schema).parquet(path)
    else:
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if ts_is_long:
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # NTZ → instant under the session clock: windows/watermarks operate
    # on TimestampType; UTC sessions make this an identity rendering
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Run an availableNow query into a uniquely-named memory sink and
    return the materialized table."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(_CKPT_ROOT, name)
    os.makedirs(ckpt, exist_ok=True)
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
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


_STAIRCASE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value_cents", T.LongType()),
        T.StructField("n_max_updates", T.LongType()),
    ]
)
_STAIRCASE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("n_dropped", T.LongType()),
        T.StructField("st_ts", T.ArrayType(T.LongType())),
        T.StructField("st_id", T.ArrayType(T.LongType())),
        T.StructField("st_val", T.ArrayType(T.DoubleType())),
    ]
)

# Bounded-state fallback (round-8 advice): the staircase is O(ln n)
# expected but O(n) worst case (monotonically ascending values), and
# the full state round-trips through the state store every
# micro-batch. Above this cap the OLDEST records are dropped and only
# counted: state stays bounded, ``max_value_cents``/``n_events`` stay
# exact, and ``n_max_updates`` degrades DOCUMENTEDLY to an upper
# bound (a dropped record can no longer be evicted by a late-arriving
# earlier dominator). Never reached on the bounded testdata — the
# overflow path is pinned by a small-cap unit test.
STAIRCASE_CAP = 100_000


def _staircase_fold(key, pdfs, state):
    """Order-insensitive stateful fold for
    :func:`streaming_stateful_user_stats` (module-level so the
    batch-split invariance is unit-testable —
    tests/test_streaming.py exercises interleaved-ts batchings).

    State = (n, n_dropped, record staircase): the (ts_ns, event_id,
    value) triples that are strict prefix maxima of every event seen
    so far under global (ts, event_id) order. Merging a batch
    re-derives the staircase over old-staircase ∪ batch; dominated
    points can never re-become records (their dominator stays earlier
    forever), so the final staircase — and hence ``n_max_updates =
    n_dropped + len(staircase)`` — is identical for every arrival
    order and micro-batch split. ``n_dropped`` counts records shed by
    the :data:`STAIRCASE_CAP` bounded-state fallback (0 on any
    in-contract stream; see the constant's docstring for the
    degradation semantics)."""
    import math

    import numpy as np
    import pandas as pd

    if state.exists:
        n, n_dropped, st_ts, st_id, st_val = state.get
        st_ts = np.asarray(st_ts, dtype="int64")
        st_id = np.asarray(st_id, dtype="int64")
        st_val = np.asarray(st_val, dtype="float64")
    else:
        n = 0
        n_dropped = 0
        st_ts = np.empty(0, dtype="int64")
        st_id = np.empty(0, dtype="int64")
        st_val = np.empty(0, dtype="float64")
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        allpdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        n += len(allpdf)
        # merge staircase + batch, re-derive the staircase: sort by
        # (ts, event_id) — np.lexsort (stable, last key primary) —
        # then keep strict prefix maxima
        ts = np.concatenate(
            (st_ts, allpdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64"))
        )
        eid = np.concatenate((st_id, allpdf["event_id"].to_numpy(dtype="int64")))
        val = np.concatenate((st_val, allpdf["value"].to_numpy(dtype="float64")))
        order = np.lexsort((eid, ts))
        sval = val[order]
        prev = np.maximum.accumulate(
            np.concatenate(([float("-inf")], sval))
        )[:-1]
        keep = order[sval > prev]
        st_ts, st_id, st_val = ts[keep], eid[keep], val[keep]
        # bounded fallback: keep[] is in ascending (ts, event_id)
        # order, so dropping the FRONT sheds the oldest/smallest
        # records; the tail (incl. the current max) stays exact
        if len(st_val) > STAIRCASE_CAP:
            drop = len(st_val) - STAIRCASE_CAP
            n_dropped += drop
            st_ts, st_id, st_val = st_ts[drop:], st_id[drop:], st_val[drop:]
    state.update(
        (n, n_dropped, st_ts.tolist(), st_id.tolist(), st_val.tolist())
    )
    mx = float(st_val[-1]) if len(st_val) else float("-inf")
    # integer cents via floor(x*100+0.5), NOT Python round()
    # (banker's) and NOT a rendered double: a bigint hashes
    # identically everywhere, a double depends on the renderer
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "max_value_cents": [int(math.floor(mx * 100 + 0.5))],
            "n_max_updates": [n_dropped + len(st_val)],
        }
    )


def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per
    user, an arbitrary-Python running aggregate (event count, running
    max value, count of strictly-increasing max updates) that the
    built-in windowed aggs can't express.

    This is the documented escape hatch for stateful logic beyond
    ``groupBy().agg``: state lives in the streaming state store keyed
    by user_id (bounded keys, watermark-free here since the run is
    ``availableNow``), Arrow-batched both ways. The update-mode sink
    is collapsed to final state per key below (MAX of each monotone
    stat).

    ORDER-INSENSITIVE FOLD (round-7, closing the round-6 advice):
    ``n_max_updates`` counts the prefix maxima ("records") of the
    globally (ts, event_id)-ordered value sequence. A running-max
    counter is only correct if events arrive in global order — true
    within one micro-batch after the group sort, but availableNow may
    split the source into micro-batches whose timestamp ranges
    interleave. The state therefore keeps the RECORD STAIRCASE — the
    (ts, event_id, value) triples that are prefix maxima of everything
    seen so far — and each batch merges into it: an event dominated by
    an earlier-or-equal-ts-ordered event with >= value can never
    become a record later (its dominator only gains company), and a
    newly-arrived earlier event correctly evicts later staircase
    points it dominates. The final staircase is therefore the same
    SET for every arrival order and batching, ``n_max_updates`` is
    its size, and ``max_value_cents`` its top — micro-batch-invariant
    by construction, not by precondition. Staircase length is the
    number of records: O(H(n)) ≈ ln(n) expected for exchangeable
    values, so state stays small (worst case — a fully sorted
    ascending stream — degrades to O(n) per key; acceptable for the
    bounded per-user event counts here and detectable by state-size
    metrics at scale).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = read_events_stream(spark, sf_dir)

    stats = ev.groupBy("user_id").applyInPandasWithState(
        _staircase_fold,
        outputStructType=_STAIRCASE_OUT_SCHEMA,
        stateStructType=_STAIRCASE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(stats, "update")
    # An update-mode memory sink holds one row per key PER MICRO-BATCH,
    # and availableNow may split the file source into several
    # micro-batches (maxFilesPerTrigger / state-store config —
    # environment, not semantics).  orderBy().limit() over the raw sink
    # then sees stale intermediate rows next to final ones — the
    # round-4/round-5 driver signature (rows_match true, hash false).
    # The collapse must pick each key's LAST update row, not MAX of
    # each column independently: n_max_updates can legitimately SHRINK
    # across batches (a late-arriving early event with a large value
    # evicts later staircase records), so a per-column MAX would
    # resurrect a stale intermediate count. n_events strictly
    # increases across a key's update rows (a key only emits when it
    # received events), so the struct-max keyed on n_events selects
    # exactly the final state.
    return (
        out.groupBy("user_id")
        .agg(
            F.max(
                F.struct("n_events", "max_value_cents", "n_max_updates")
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.max_value_cents").alias("max_value_cents"),
            F.col("s.n_max_updates").alias("n_max_updates"),
        )
        .orderBy("user_id")
        .limit(500)
    )


# n_max_updates: running max over the (ts, event_id)-ordered event
# sequence increments exactly when value beats every prior value.
STREAMING_STATEFUL_ORACLE = """
WITH ordered AS (
  SELECT
    user_id,
    value,
    MAX(value) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS prev_max
  FROM events
)
SELECT
  user_id,
  COUNT(*) AS n_events,
  CAST(FLOOR(MAX(value) * 100 + 0.5) AS BIGINT) AS max_value_cents,
  CAST(SUM(CASE WHEN prev_max IS NULL OR value > prev_max THEN 1 ELSE 0 END)
    AS BIGINT) AS n_max_updates
FROM ordered
GROUP BY user_id
ORDER BY user_id
LIMIT 500
"""


# same result contract as the batch sessionizer (SESSIONIZE_ORACLE);
# duplicated here so the entry is self-contained
from backend_model_spark.operators.events_ops import (  # noqa: E402
    SESSIONIZE_ORACLE as STREAMING_SESSION_ORACLE,
)


def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's clicks in the preceding 2 hours.

    The genuinely-streaming surface the other jobs don't cover: BOTH
    sides are unbounded, so the engine must buffer each side's rows in
    state and emit matches as the other side arrives. The watermarks
    plus the time-range join condition bound that state — clicks older
    than the purchase-side watermark minus 2h are evicted, which is
    what makes the join runnable forever at 100 TB/day; without the
    range condition state would grow without bound.

    Inner-join matches are emitted eagerly (not held for watermark
    finalization), so availableNow over a static source must equal the
    batch join — the oracle below.
    """
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "purchase_value", "click_id", "click_ts")
    out = _run_to_memory(joined, "append")
    return out.orderBy("purchase_id", "click_id")


STREAMING_JOIN_ORACLE = """
SELECT
  p.event_id AS purchase_id,
  p.user_id  AS user_id,
  p.ts       AS purchase_ts,
  p.value    AS purchase_value,
  c.event_id AS click_id,
  c.ts       AS click_ts
FROM events p
JOIN events c
  ON p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 2 HOUR
 AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


def streaming_left_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: every purchase, attributed to
    same-user clicks in the preceding 2 hours — or emitted with NULL
    click columns if none arrive. The semantics inner join can't
    cover: an outer result may only emit once the watermark proves no
    matching click can still arrive, so unmatched rows sit in state
    until event time passes them.

    Batch-equivalence trick (the production "flush sentinel"): a
    far-future sentinel event unioned into BOTH sides advances the
    global watermark past every real row at end-of-input, and Spark's
    no-data microbatch (``noDataMicroBatches``, on by default) then
    emits the trailing outer results that a plain ``availableNow``
    run would leave stuck in state. Sentinels use user_id −1 so they
    match nothing, and are filtered from the sink. The sentinel
    timestamp derives from a batch max-ts probe — a deployment would
    use a wall-clock heartbeat topic instead; the probe stands in for
    it against static test data.

    Scale: state per side is bounded by the watermark + the 2 h range
    condition exactly as in the inner join; outer emission adds no
    extra state, only delayed eviction.
    """
    import datetime

    max_ts = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .agg(F.max("ts"))
        .collect()[0][0]
    )  # one scalar: the heartbeat stand-in
    sent_dir = os.path.join(
        _CKPT_ROOT, "flush_sentinel_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    if not os.path.exists(os.path.join(sent_dir, "_SUCCESS")):
        sentinel_ts = (max_ts if isinstance(max_ts, datetime.datetime) else max_ts.to_pydatetime()) + datetime.timedelta(days=30)
        spark.createDataFrame(
            [(-1, sentinel_ts, -1, "__flush__", 0.0, None)],
            _raw_events_schema(T.TimestampNTZType()),
        ).coalesce(1).write.mode("overwrite").parquet(sent_dir)
    sentinel = (
        spark.readStream.schema(_raw_events_schema(T.TimestampNTZType()))
        .parquet(sent_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .unionByName(sentinel)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .unionByName(sentinel)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "left_outer",
    ).select(
        "purchase_id", "user_id", "purchase_ts", "purchase_value", "click_id", "click_ts"
    )
    out = _run_to_memory(joined, "append")
    return out.filter(F.col("user_id") >= 0).orderBy("purchase_id", "click_id")


STREAMING_LEFT_JOIN_ORACLE = """
SELECT
  p.event_id AS purchase_id,
  p.user_id  AS user_id,
  p.ts       AS purchase_ts,
  p.value    AS purchase_value,
  c.event_id AS click_id,
  c.ts       AS click_ts
FROM events p
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 2 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
ORDER BY purchase_id, click_id
"""


def streaming_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user fold via ``transformWithStateInPandas`` — the Spark 4
    arbitrary-state API (typed state handles + timers on a RocksDB
    state store), successor to ``applyInPandasWithState`` above; both
    are kept since each is the canonical pattern for its Spark line.

    Folds each user's stream into (event count, exact value cents,
    last event type by (ts, event_id)) held in a typed ValueState.
    Integer-cent sums make the fold order-insensitive, and the
    last-event tracker compares the (ts, event_id) key explicitly, so
    the result is deterministic however Arrow chunks the group.

    Scale: state is one fixed-size row per user in RocksDB —
    memory-bounded, spillable, incrementally checkpointed; exactly the
    shape a 100 TB/day clickstream fold needs.

    Environment gate: the transformWithState protocol talks protobuf
    between the JVM and the Python state server. Containers without the
    protobuf distribution use the vendored minimal runtime
    (``backend_model_spark/vendor``, pushed to workers via
    ``protobuf_compat.ensure_protobuf_on_workers``); registration is
    skipped (``HAS_PROTOBUF`` in ``plans/catalog.py``) only when
    neither a real nor the vendored runtime is available.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from backend_model_spark.protobuf_compat import ensure_protobuf_on_workers

    # the driver creates its SparkSession before importing this package,
    # so the vendored google.protobuf must be pushed to workers of the
    # live session (sc.environment), not just the pre-JVM PYTHONPATH
    ensure_protobuf_on_workers(spark)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    ev = read_events_stream(spark, sf_dir).select(
        "user_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_cents", T.LongType()),
            T.StructField("last_event_type", T.StringType()),
        ]
    )

    class UserFold(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "fold",
                "n bigint, cents bigint, last_ts bigint, last_id bigint, "
                "last_type string",
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                n, cents, last_ts, last_id, last_type = self._st.get()
            else:
                n, cents, last_ts, last_id, last_type = 0, 0, -1, -1, ""
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    np.floor(pdf["value"].to_numpy("float64") * 100.0 + 0.5)
                    .astype("int64")
                    .sum()
                )
                tail = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
                if (int(tail["ts_us"]), int(tail["event_id"])) > (last_ts, last_id):
                    last_ts = int(tail["ts_us"])
                    last_id = int(tail["event_id"])
                    last_type = str(tail["event_type"])
            self._st.update((n, cents, last_ts, last_id, last_type))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_cents": [cents],
                    "last_event_type": [last_type],
                }
            )

        def close(self) -> None:
            pass

    stats = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserFold(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    out = _run_to_memory(stats, "update")
    # Same multi-micro-batch collapse as streaming_stateful_user_stats:
    # the update-mode sink may hold one row per key per micro-batch, so
    # keep only the final state per key.  n_events strictly increases
    # with every emission for a key (a key is only invoked when it has
    # input rows), so max_by(n_events) is the last batch's row —
    # deterministic, no ties possible.
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_cents", "n_events").alias("sum_cents"),
            F.max_by("last_event_type", "n_events").alias("last_event_type"),
        )
        .orderBy("user_id")
        .limit(500)
    )


STREAMING_TWS_ORACLE = """
WITH ranked AS (
  SELECT
    user_id,
    event_type,
    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
    ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) AS rn
  FROM events
)
SELECT
  user_id,
  COUNT(*) AS n_events,
  CAST(SUM(cents) AS BIGINT) AS sum_cents,
  MAX(CASE WHEN rn = 1 THEN event_type END) AS last_event_type
FROM ranked
GROUP BY user_id
ORDER BY user_id
LIMIT 500
"""


def streaming_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``foreachBatch`` sink: each micro-batch lands through the BATCH
    writer as a parquet partition keyed by batch_id, giving replay
    idempotency — re-delivering batch N overwrites partition N instead
    of duplicating it (dynamic partition overwrite). This is the
    standard pattern for sinks with no native streaming writer (JDBC,
    MERGE targets).

    The verification tap re-reads everything the sink wrote and
    aggregates per event type; the numbers must equal the batch query
    — proving no loss and no duplication through the sink.

    Scale: each micro-batch write is a normal distributed parquet
    write; the per-type agg is on the re-read side only. Integer-cent
    sums keep the check order-insensitive.
    """
    sink_dir = os.path.join(_CKPT_ROOT, f"fb_sink_{uuid.uuid4().hex[:12]}")
    ckpt = os.path.join(_CKPT_ROOT, f"fb_ckpt_{uuid.uuid4().hex[:12]}")
    os.makedirs(sink_dir, exist_ok=True)

    ev = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("p_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("p_batch")
            .parquet(sink_dir)
        )

    query = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    landed = spark.read.parquet(sink_dir)
    out = (
        landed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")
            ).alias("sum_cents"),
        )
        .orderBy("event_type")
    )
    rows = out.collect()  # materialize before cleaning the scratch dir
    shutil.rmtree(sink_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


FOREACH_BATCH_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# geometry of the synthetic streaming python data source
_PYSTREAM_SENSORS = 4
_PYSTREAM_TICKS = 400          # total ticks per sensor
_PYSTREAM_MIX = 2_654_435_761
_PYSTREAM_P = 1_000_003


def streaming_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING source via the Spark 4 Python DataSource API
    (``DataSourceStreamReader``): a deterministic finite sensor feed
    whose offset is a tick watermark, consumed with ``availableNow``
    and aggregated per sensor — the Python-connector pattern for
    feeds with no built-in streaming source. Under ``availableNow``
    the initial→latest offset range arrives as one micro-batch; the
    ``initialOffset/latestOffset/partitions(start, end)`` contract is
    exactly what a rate-limited continuous trigger pages through, and
    the oracle's exact integer sums prove every tick was admitted
    exactly once.

    Scale: ``partitions(start, end)`` splits every offset range by
    sensor, so each micro-batch reads in parallel; offsets are the
    replay/recovery contract (checkpointed like any source). The
    aggregate is a standard map-side-combinable groupBy. ``sf_dir``
    is unused — the source IS the data.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _Part(InputPartition):
        def __init__(self, sensor: int, start: int, end: int) -> None:
            self.sensor = sensor
            self.start = start
            self.end = end

    class SensorStreamReader(DataSourceStreamReader):
        def initialOffset(self):
            return {"tick": 0}

        def latestOffset(self):
            return {"tick": _PYSTREAM_TICKS}

        def partitions(self, start, end):
            return [
                _Part(s, start["tick"], min(end["tick"], _PYSTREAM_TICKS))
                for s in range(_PYSTREAM_SENSORS)
            ]

        def read(self, partition):
            for tick in range(partition.start, partition.end):
                k = partition.sensor * _PYSTREAM_TICKS + tick
                yield (
                    partition.sensor,
                    tick,
                    (k * _PYSTREAM_MIX) % _PYSTREAM_P,
                )

        def commit(self, end):
            pass

    class SensorStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_sensor_stream"

        def schema(self) -> str:
            return "sensor_id int, tick int, w int"

        def streamReader(self, schema):
            return SensorStreamReader()

    spark.dataSource.register(SensorStreamSource)
    feed = spark.readStream.format("synthetic_sensor_stream").load()
    agg = feed.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("w").alias("w_sum"),
        F.min("w").alias("w_min"),
        F.max("w").alias("w_max"),
    )
    return _run_to_memory(agg, "complete").orderBy("sensor_id")


STREAMING_PYDS_ORACLE = f"""
WITH ticks AS (
  SELECT s.sensor_id, t.tick,
         CAST((s.sensor_id * {_PYSTREAM_TICKS} + t.tick) * {_PYSTREAM_MIX}
              % {_PYSTREAM_P} AS INTEGER) AS w
  FROM (SELECT unnest(generate_series(0, {_PYSTREAM_SENSORS - 1}))
          AS sensor_id) s,
       (SELECT unnest(generate_series(0, {_PYSTREAM_TICKS - 1})) AS tick) t
)
SELECT
  CAST(sensor_id AS INTEGER) AS sensor_id,
  COUNT(*) AS n_ticks,
  CAST(SUM(w) AS BIGINT) AS w_sum,
  MIN(w) AS w_min,
  MAX(w) AS w_max
FROM ticks
GROUP BY sensor_id
ORDER BY sensor_id
"""


def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup via
    ``dropDuplicatesWithinWatermark`` — the production at-least-once →
    effectively-once repair stage: duplicates are dropped only while
    their key is inside the watermark horizon, so dedup state is
    EVICTED as event time advances (plain streaming
    ``dropDuplicates`` keeps every key forever — unbounded state).

    The duplicate source is constructed honestly: the event stream
    unioned with itself, so every event_id arrives exactly twice
    within the same horizon. The per-type counts after dedup must
    equal the batch per-type counts (each event once) — which is the
    oracle.

    Scale: state is bounded by (keys arriving within one watermark
    window), not by stream history — the difference between a dedup
    that survives a month-long run and one that OOMs.
    """
    ev1 = read_events_stream(spark, sf_dir)
    ev2 = read_events_stream(spark, sf_dir)
    doubled = ev1.unionByName(ev2).withWatermark("ts", "1 hour")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    counts = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = _run_to_memory(counts, "complete")
    return out.orderBy("event_type")


STREAMING_DEDUP_WWM_ORACLE = """
SELECT event_type, COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment — the production pattern
    the other streaming entries don't cover: the event STREAM joins
    the static customer dimension (broadcast per micro-batch; the
    static side is re-planned each batch, so a dimension refresh is
    picked up without restarting the query), then aggregates purchase
    value per market segment.

    Scale: the static side is a broadcast hash join inside each
    micro-batch — no stream-side shuffle for the join, state only in
    the final aggregation (|segments| rows).
    """
    from backend_model_spark.sources.tables import load_table

    ev = read_events_stream(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    dim = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(dim), "user_id")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("revenue_cents"),
    )
    out = _run_to_memory(agg, "complete")
    return out.orderBy("c_mktsegment")


STREAMING_STATIC_ENRICH_ORACLE = """
SELECT c.c_mktsegment,
  COUNT(*) AS n_purchases,
  CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


def streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily trending users — the windowed top-k pattern (per tumbling
    1-day window, the 3 most-active users by event count): the one
    rank-shaped readout the streaming family was missing.

    Structured Streaming cannot stack a rank on an aggregation inside
    one continuous query (no chained stateful operators after an agg
    in this shape), so this uses the production two-step: the
    watermarked windowed COUNT runs in the stream, and the per-window
    rank runs downstream on the materialized frame — exactly what a
    foreachBatch serving job does. The rank window partitions by day
    (never a global window); ties break by user_id so the top-3 is
    total-order deterministic.

    Scale: streaming state is (windows × active users), bounded by
    the 1-hour watermark horizon; the downstream rank shuffles only
    the already-aggregated per-(day, user) counts, not events.
    """
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    counts = ev.groupBy(F.window("ts", "1 day"), F.col("user_id")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = _run_to_memory(counts, "complete")
    from pyspark.sql import Window as W

    day = F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("day")
    per_day = out.select(day, "user_id", "n_events")
    w = W.partitionBy("day").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        per_day.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .orderBy("day", "rnk")
    )


STREAMING_WINDOWED_TOPK_ORACLE = """
WITH counts AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         user_id, COUNT(*) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT day, user_id, n_events,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY day ORDER BY n_events DESC, user_id
  ) AS INTEGER) AS rnk
FROM counts
QUALIFY rnk <= 3
ORDER BY day, rnk
"""
