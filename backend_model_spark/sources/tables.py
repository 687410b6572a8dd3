"""Declared schemas + loaders for the test star schema.

Tables (TPC-H-ish star schema + events/documents/embeddings, see
TESTDATA.md) live as one parquet file per table under an ``sf_dir``.
We read with the parquet file's own physical types — casting at scan
time would defeat vectorized reading and desync us from the DuckDB
oracle, which also reads the physical types. The declared schemas here
are a contract: :func:`load_table` verifies the file matches, so a
drifted input fails loudly instead of silently changing results.

Scale note: each loader is a plain ``spark.read.parquet`` — at 100 TB
the same call reads a partitioned directory tree, and Catalyst handles
partition pruning / predicate pushdown / column pruning from whatever
the downstream plan selects. Nothing here materializes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Inferred-schema memo: Spark's reader schedules one footer-read
# inference job per `spark.read.parquet(path)` call (~50-100 ms of
# per-query build latency; a 6-table join pays it 6 times — round-11
# stage evidence showed it as the first jobs of every bench entry).
# The PHYSICAL schema of a given dataset cannot change without the
# file changing, so the inference result is memoized per
# (path, mtime_ns, size) and later loads pass it explicitly, skipping
# the job. This is metadata caching only (same category as Spark's
# own FileStatusCache): the schema is still Spark's own inference for
# that exact file state — fixtures with pandas-widened physical types
# (float32→double embeddings, int64 keys) read exactly as before, and
# a rewritten file invalidates the key via mtime/size.
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def _dataset_key(path: str) -> tuple | None:
    try:
        st = os.stat(path)
        key: tuple = (path, st.st_mtime_ns, st.st_size)
        if os.path.isdir(path):
            # round-12 hardening (verdict ask #8): the former key
            # sampled only the first 64 sorted children, so an
            # in-place rewrite of the 65th+ part file changed neither
            # the directory mtime nor any sampled stat and a stale
            # schema could be served. Hash the FULL first-level
            # listing (name, mtime_ns, size per child) instead —
            # constant-size key, every child's state observed.
            import hashlib

            h = hashlib.sha256()
            for p in sorted(
                p for p in os.listdir(path) if not p.startswith(("_", "."))
            ):
                sub = os.stat(os.path.join(path, p))
                h.update(f"{p}\x00{sub.st_mtime_ns}\x00{sub.st_size}\x00".encode())
            key += (h.hexdigest(),)
        return key
    except OSError:
        return None


def _inferred_schema(spark: SparkSession, path: str) -> T.StructType:
    key = _dataset_key(path)
    if key is not None:
        got = _SCHEMA_CACHE.get(key)
        if got is not None:
            return got
    schema = spark.read.parquet(path).schema
    if key is not None:
        if len(_SCHEMA_CACHE) > 256:
            _SCHEMA_CACHE.clear()
        _SCHEMA_CACHE[key] = schema
    return schema


def load_table(
    spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR, verify: bool = False
) -> DataFrame:
    """Lazy parquet scan of one table; optionally verify the contract schema."""
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = table_path(sf_dir, name)
    schema = _inferred_schema(spark, path)
    df = spark.read.schema(schema).parquet(path)
    if name == "events":
        # events.ts is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
        # → TIMESTAMP_NTZ natively, TZ-free, in ANY session. (Round-1
        # testdata stored TIMESTAMP(NANOS); if an input like that is
        # read under a session built with the legacy static
        # ``spark.sql.legacy.parquet.nanosAsLong`` flag — runtime
        # conf.set is ignored for it — the column arrives as a nanos
        # LongType; normalize that branch to the same NTZ µs.)
        if isinstance(schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
            )
        return df
    if verify:
        _verify_schema(name, df)
    return df


def _verify_schema(name: str, df: DataFrame) -> None:
    expected = TABLE_SCHEMAS[name]
    got = df.schema
    # Compare name+type only (nullability is a storage detail).
    exp_pairs = [(f.name, f.dataType) for f in expected.fields]
    got_pairs = [(f.name, f.dataType) for f in got.fields]
    if exp_pairs != got_pairs:
        raise ValueError(
            f"schema drift for {name}: expected {exp_pairs}, got {got_pairs}"
        )


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the scan is under-parallel.

    Local test files are single-split parquet, so per-row-expensive
    stages (tokenize, md5, regex) would otherwise serialize on one
    core. On a real cluster a 100 TB scan already yields ~800k splits
    — far above ``defaultParallelism`` — so this is a no-op there and
    never shuffles the corpus. Keep it ahead of CPU-heavy narrow
    stages only; never "for good measure" before a join or groupBy,
    which repartition on their own keys anyway.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # two-stage probe: file count is metadata-only and short-circuits
    # the common scale case (many files ⇒ already parallel) without
    # building the Python RDD wrapper (~135 ms/call); only a
    # few-files scan pays for the exact split count, which still
    # rules out the big-single-splittable-file case (one parquet
    # file, many row-group splits) that needs no repartition.
    if len(df.inputFiles()) >= target:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so operators can use spark.sql."""
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
