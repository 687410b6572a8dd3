"""SparkSession factory tuned for both local testing and cluster scale.

The knobs below are chosen for correctness-critical determinism (UTC
session timezone; ANSI mode stays at the Spark 4 default ON, which
matches the DuckDB oracle's fail-on-error arithmetic — tolerant paths
use the try_* functions explicitly) and for scale
(AQE on, skew-join handling on, partition coalescing on). On a real
cluster the same builder works unchanged — ``master`` is only defaulted
when nothing else set it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from backend_model_spark.protobuf_compat import ensure_protobuf

# must run BEFORE the JVM starts: local-mode Python workers inherit the
# driver environment, so the vendored google.protobuf (used by the
# transformWithStateInPandas state channel) has to be on PYTHONPATH now
HAS_PROTOBUF = ensure_protobuf()

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "backend_model_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Scale notes: AQE re-plans joins and coalesces shuffle partitions at
    runtime, and ``skewJoin`` splits hot partitions — all essential at
    100 TB where static planning guesses wrong. ``maxPartitionBytes``
    stays at the 128 MB default so a 100 TB scan fans out to ~800k
    tasks, which the DAG scheduler handles fine.
    """
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Round-11 measured lever: with parallelismFirst (default on)
        # AQE coalesces to max(shuffleBytes/defaultParallelism,
        # minPartitionSize); the 1 MB default floor serialized several
        # compute-bound small shuffles onto 1–5 tasks (ADC distance
        # scan, tfidf rollups, per-bin pair joins). 256 KB keeps those
        # stages at full local width (A/B: tfidf 1.45→1.03 s, overlap
        # topk 2.0→1.76 s, no regressions) and is INERT at scale,
        # where bytes/parallelism ≫ any floor. Env-tunable for other
        # geometries.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "256k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # measured lever (SCALE.md round 5): 64k Arrow batches amortize
        # the per-batch Arrow + numpy-matmul overhead in the Pandas-UDF
        # serving path — ml_mlp_model_compare 10.95s->8.34s (1.31x) and
        # ml_mlp_batch_inference 5.76s->4.63s (1.24x) at 10x stress;
        # 128k regresses (memory pressure). All hashed outputs are
        # batch-size invariant by construction (chunk-order-invariant
        # folds), so this is purely a throughput knob.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # events.parquet's physical timestamp type has flipped between
        # TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across data drops.
        # Spark 4 CANNOT read nanos natively (PARQUET_TYPE_ILLEGAL);
        # this STATIC conf (builder-time only — runtime set is
        # silently ignored) makes nanos files read as LongType, which
        # tables.py normalizes back to timestamps. It is a no-op for
        # micros files, so the current data is unaffected either way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "90g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if HAS_PROTOBUF and os.environ.get("PYTHONPATH"):
        # propagate the (possibly vendored) protobuf path to executors
        # on real clusters; local mode already inherits the driver env
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"]
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
