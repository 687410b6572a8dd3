"""Bucketed co-located join — the zero-shuffle fact⨝fact pattern.

At 100 TB, orders⨝customer on custkey shuffles both tables every time
the join runs. Bucketing both tables by the join key at write time
pre-partitions them once; every subsequent join reads co-located
buckets and plans a SortMergeJoin with NO Exchange on either side.
This test writes both tables bucketed into the (gitignored) local
warehouse, joins them, and asserts the shuffle-free plan AND the
result parity against the plain (shuffling) join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    load_table(spark, "orders", sf_dir).write.bucketBy(
        N_BUCKETS, "o_custkey"
    ).sortBy("o_custkey").mode("overwrite").saveAsTable("orders_bucketed")
    load_table(spark, "customer", sf_dir).write.bucketBy(
        N_BUCKETS, "c_custkey"
    ).sortBy("c_custkey").mode("overwrite").saveAsTable("customer_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def _joined(spark):
    o = spark.table("orders_bucketed")
    c = spark.table("customer_bucketed")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    # force the SMJ path (broadcast would hide the bucketing benefit)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "SortMergeJoin" in plan
    # in formatted explain, a node's subtree has smaller ids than the
    # node itself — no Exchange below the join means the bucket layout
    # satisfied the join's distribution requirement on both sides
    # (the exchanges above it belong to the aggregation, not the join)
    import re

    smj_id = int(re.search(r"SortMergeJoin[^(]*\((\d+)\)", plan).group(1))
    feeding_exchanges = [
        int(m) for m in re.findall(r"Exchange \((\d+)\)", plan) if int(m) < smj_id
    ]
    assert not feeding_exchanges, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    bucketed = {tuple(r) for r in _joined(spark).collect()}
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    plain = {
        tuple(r)
        for r in (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
    }
    assert bucketed == plain


def test_small_file_compaction(spark, sf_dir, tmp_path_factory):
    """The small-files problem and its fix: a fragmented write (64
    files for a small table) compacted via coalesce to 4 — content
    identical, file count bounded. At 100 TB fragmentation comes from
    over-parallel writers and streaming micro-batches; periodic
    coalesce-rewrite is the maintenance op."""
    import os

    from backend_model_spark.sources.io_ops import _scratch
    from backend_model_spark.sources.tables import load_table

    frag = _scratch("compaction", "fragmented")
    compact = _scratch("compaction", "compacted")
    nation = load_table(spark, "nation", sf_dir)
    nation.repartition(64).write.mode("overwrite").parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(compact)
    n_compact = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    assert n_compact <= 4 < n_frag
    before = {tuple(r) for r in nation.collect()}
    after = {tuple(r) for r in spark.read.parquet(compact).collect()}
    assert before == after
