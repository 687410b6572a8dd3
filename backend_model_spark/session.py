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
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark 4 reads it
        # natively as TIMESTAMP_NTZ (µs-truncated) — no legacy flag, so
        # this session behaves identically to any externally-built one
        # (the round driver's included), keeping one tested code path.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "90g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
