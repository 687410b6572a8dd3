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

DEFAULT_DRIVER_MEMORY = os.environ.get("SPARK_DRIVER_MEMORY", "32g")

# Round-12 measured lever (guide §5, §7.4): on this round's host the
# kernel serializes concurrent page faults in a process whenever
# another thread is mutating the address space (mmap/munmap/mprotect
# take the mmap_lock in write mode), and the JVM is full of such
# mutators by default: a growable heap (Xmx 90g, tiny Xms — every
# bench run's System.gc() shrank the heap and the next query's
# allocations re-committed it), a growable code cache (each query
# compiles fresh codegen classes), and 15 concurrent C2 compiler
# threads. Measured effect: 32 executor threads collapse to 20-77%
# SYSTEM cpu (kernel stacks: vm_mmap_pgoff / lock_mm_and_find_vma),
# dedup_minhash_lsh_candidates 17.5 s where the same plan runs 1.3 s
# with the churn removed. The fix pins every growable region:
#   -Xms == -Xmx            heap committed once, never resized
#   InitialCodeCacheSize == ReservedCodeCacheSize
#                           code cache committed once
#   CICompilerCount=4       bounds concurrent compilation while
#                           executor threads are faulting
# A/B (3 worst headline entries, min-of-3 each, same tree):
# minhash 17.5→1.3 s, semdedup 5.9→2.9 s, calibration 17.7→2.9 s.
# Heap sized 32g (was an arbitrary day-1 90g): the suite's working
# set at the test scale factors sits far below it (16g measured
# slightly GC-tight: window_rfm 2.5 s vs 1.7 s at 32g), a committed
# 90g heap costs ~90 GB of serialized first-touch faults on this
# kernel, and anything evicted spills to the (tmpfs) local dir.
# Env-overridable for other geometries.
_DRIVER_JAVA_OPTS = os.environ.get(
    "SPARK_GRAFT_DRIVER_JAVA_OPTS",
    f"-Xms{DEFAULT_DRIVER_MEMORY}"
    " -XX:InitialCodeCacheSize=512m -XX:ReservedCodeCacheSize=512m"
    " -XX:CICompilerCount=4",
)

# Floor for "is this tmpfs big enough to hold shuffle scratch": local
# runs shuffle well under a GB per query; 4 GiB of headroom keeps a
# small container from thrashing its page cache.
_SCRATCH_MIN_BYTES = 4 * 1024 * 1024 * 1024


def _local_scratch_dir() -> str | None:
    """Pick the local-mode shuffle/spill scratch directory.

    Guide §1.3/§2.1: shuffle blocks are written to and re-read from
    ``spark.local.dir``, so local disk bandwidth for shuffle files can
    be the tighter limit — measured on this round's host: the backing
    device sustains ~25 MB/s writes while /dev/shm (tmpfs) sustains
    ~400 MB/s, and every shuffle-heavy query was writeback-throttled
    through /tmp (sessionize 8.1 s vs 0.9 s, minhash 17.5 s vs ~4 s).
    Scratch data is per-job ephemera (never results, never reused
    across runs), so placing it on the fastest medium changes no
    query's output. On a real cluster the cluster manager supplies
    its own local dirs (NVMe scratch); this only applies to local
    masters, and ``SPARK_GRAFT_LOCAL_DIR`` overrides for other
    geometries.
    """
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    shm = "/dev/shm"
    try:
        if os.path.isdir(shm) and os.access(shm, os.W_OK):
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize >= _SCRATCH_MIN_BYTES:
                return os.path.join(shm, "spark-graft-local")
    except OSError:
        pass
    return None


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
        .config("spark.driver.memory", DEFAULT_DRIVER_MEMORY)
        .config("spark.driver.extraJavaOptions", _DRIVER_JAVA_OPTS)
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        scratch = _local_scratch_dir()
        if scratch:
            # shuffle/spill scratch on the fastest local medium — see
            # _local_scratch_dir (round-12 measured lever)
            builder = builder.config("spark.local.dir", scratch)
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
