"""Sorts, limits, top-k (SURVEY.md §2.7) and set operations (§2.4).

Reference surface: ``sort_values`` (nb cells 12/19/36/45), ``head``
(cells 9/32/50), ``pd.concat`` union-all (cell 6). Top-k is expressed
as ``orderBy(...).limit(k)`` which Spark plans as
``TakeOrderedAndProject`` — a per-partition heap + driver merge, never
a full sort. All limit queries carry a unique tiebreaker so the
selected rows are deterministic for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table


def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 orders by total price (O2+O4; TakeOrderedAndProject)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


TOPK_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


def sort_by_key_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 + P2: column-subset projection sorted by a string key
    (mirrors ``df[['...']]`` + ``sort_values(by=['zipcode'])``)."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.select("p_partkey", "p_brand", "p_name")
        .orderBy("p_brand", "p_partkey")
        .limit(50)
    )


SORT_PROJECTION_ORACLE = """
SELECT p_partkey, p_brand, p_name
FROM part
ORDER BY p_brand, p_partkey
LIMIT 50
"""


def union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (``pd.concat`` union-all preserving duplicates): two customer
    segments unioned by name, then counted per nation — the row-
    conservation invariant the reference sanity-checks (74111+25458)."""
    cust = load_table(spark, "customer", sf_dir)
    seg_a = cust.filter(F.col("c_mktsegment") == "BUILDING")
    seg_b = cust.filter(F.col("c_acctbal") > 5000)
    return (
        seg_a.unionByName(seg_b)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("c_nationkey")
    )


UNION_ALL_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_rows
FROM (
  SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT * FROM customer WHERE c_acctbal > 5000
)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): customers in BUILDING ∩ high-balance."""
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b).orderBy("c_custkey")


INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
"""


def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: BUILDING customers minus high-balance ones."""
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.exceptAll(b).orderBy("c_custkey")


EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
ORDER BY c_custkey
"""
