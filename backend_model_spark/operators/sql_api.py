"""Queries expressed through the ``spark.sql`` API (SURVEY.md §3.3).

The same Catalyst plans come out of SQL text as from the DataFrame
API; these entries exercise the SQL front-end plus constructs that are
cleanest in SQL — GROUPING SETS, HAVING, FILTER-ed aggregates, IN /
scalar subqueries. Each oracle is the *identical* ANSI text, so the
check is engine-vs-engine on the same SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from backend_model_spark.sources.tables import register_views

GROUPING_SETS_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


HAVING_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 6) AS avg_bal
FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) > 50 AND AVG(c_acctbal) > 0
ORDER BY c_nationkey
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(HAVING_SQL)


FILTERED_AGG_SQL = """
SELECT
  l_returnflag,
  COUNT(*)                                            AS n_items,
  COUNT(*) FILTER (WHERE l_discount > 0.05)           AS n_discounted,
  COUNT(*) FILTER (WHERE l_quantity >= 25)            AS n_bulk,
  ROUND(SUM(l_extendedprice) FILTER (WHERE l_tax > 0.04), 2) AS taxed_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(FILTERED_AGG_SQL)


SUBQUERIES_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
  AND o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  )
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SUBQUERIES_SQL)


CASE_BUCKETS_SQL = """
SELECT
  CASE
    WHEN o_totalprice < 50000  THEN 'small'
    WHEN o_totalprice < 150000 THEN 'medium'
    ELSE 'large'
  END AS price_bucket,
  COUNT(*) AS n_orders,
  ROUND(AVG(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY 1
ORDER BY price_bucket
"""


def case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(CASE_BUCKETS_SQL)


Q4_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — Catalyst rewrites it to a
    left-semi join on l_orderkey (one shuffle, no subquery-per-row)."""
    register_views(spark, sf_dir)
    return spark.sql(Q4_EXISTS_SQL)


Q12_CONDITIONAL_AGG_SQL = """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⨝fact join + conditional (CASE) counts."""
    register_views(spark, sf_dir)
    return spark.sql(Q12_CONDITIONAL_AGG_SQL)


Q14_PROMO_SHARE_SQL = """
SELECT
  ROUND(
    100.00 * SUM(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / SUM(l_extendedprice * (1 - l_discount)),
  4) AS promo_revenue_pct,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate < TIMESTAMP '1995-10-01'
GROUP BY ALL
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio-of-sums over a dimension join. The
    part side broadcasts; the two sums fold in one aggregate pass."""
    register_views(spark, sf_dir)
    return spark.sql(Q14_PROMO_SHARE_SQL)


RECURSIVE_CTE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1995-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
  WHERE m < CAST('1996-12-01' AS DATE)
)
SELECT CAST(CAST(m AS DATE) AS STRING) AS month_start,
       COUNT(o_orderkey) AS n_orders
FROM months
LEFT JOIN orders
  ON o_orderdate >= CAST(m AS TIMESTAMP)
 AND o_orderdate < CAST(m + INTERVAL '1' MONTH AS TIMESTAMP)
GROUP BY m
ORDER BY month_start
"""


def recursive_cte_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE calendar spine (24 generated months) left-joined
    to orders — the recursive-CTE front-end surface (Spark 4+),
    identical ANSI text on both engines.

    Scale note: the recursion generates the SPINE (bounded, driver-
    tiny), never iterates over the fact table — the single fact pass
    is the left join, and the month list broadcasts.
    """
    register_views(spark, sf_dir)
    return spark.sql(RECURSIVE_CTE_SQL)


NAMED_WINDOW_SQL = """
SELECT * FROM (
  SELECT
    o_orderstatus,
    o_orderkey,
    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
    ROW_NUMBER() OVER w AS rn,
    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w
         AS BIGINT) AS running_cents
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
)
WHERE rn <= 5
ORDER BY o_orderstatus, rn
"""


def named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI named-WINDOW clause — one definition, two consumers (a
    rank and a running sum; the default ORDER-BY frame is running,
    and the unique order key makes RANGE vs ROWS indistinguishable) —
    identical text on Spark 4 and DuckDB. QUALIFY would be the
    DuckDB-only spelling of the rank filter; the subquery form is the
    portable one."""
    register_views(spark, sf_dir)
    return spark.sql(NAMED_WINDOW_SQL)


GROUP_BY_ALL_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS cents
FROM orders
GROUP BY ALL
ORDER BY o_orderstatus, o_orderpriority
"""


def group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (every non-aggregate select item) — the
    dialect convergence both engines landed; identical text."""
    register_views(spark, sf_dir)
    return spark.sql(GROUP_BY_ALL_SQL)


LATERAL_TOPK_SQL = """
SELECT
  c.c_custkey,
  c.c_mktsegment,
  t.o_orderkey,
  t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_acctbal > 9000
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each high-balance customer's top-2
    orders by price — the SQL-standard form of per-group top-k, run
    from identical ANSI text on both engines.

    Scale: Catalyst decorrelates the lateral into a ranked window
    join (no per-row re-execution); the outer filter prunes customers
    before the correlation, so the work is bounded by the filtered
    side. The DataFrame twin is ``window_top_per_customer`` — this
    entry proves the SQL front-end path for the same shape.
    """
    register_views(spark, sf_dir)
    return spark.sql(LATERAL_TOPK_SQL)


RECURSIVE_HIERARCHY_SQL = """
WITH RECURSIVE anc AS (
  SELECT p_partkey AS k, p_partkey AS root, 0 AS depth, p_retailprice AS price
  FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT c.p_partkey, a.root, a.depth + 1, c.p_retailprice
  FROM part c JOIN anc a
    ON CAST(FLOOR(c.p_partkey / 10.0) AS BIGINT) = a.k
   AND c.p_partkey >= 10
)
SELECT
  root,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(MAX(depth) AS INT) AS max_depth,
  CAST(FLOOR(SUM(price) * 100 + 0.5) AS BIGINT) AS subtree_price_cents
FROM anc
GROUP BY root
ORDER BY root
"""


def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-depth hierarchy traversal with a JOIN **inside** the
    recursive arm — the BOM-explosion / org-chart shape that plain
    joins can't express because the depth is data-dependent. The part
    "assembly" tree is the decimal-digit hierarchy (parent(k) =
    floor(k/10)); the query rolls every subtree up to its single-digit
    root: descendant count, height, and subtree price. Identical ANSI
    text runs on both engines (Spark 4 recursive CTE / DuckDB).

    Scale: Spark executes the recursion as an iterative UnionLoop —
    one *distributed equi-join per level*, so total work is
    O(edges x height) and each level is shuffle-parallel; the frontier
    never routes through the driver. Height here is 3 (decimal
    digits); for deep chains the O(log n) pointer-jumping alternative
    is implemented in ``operators/dedup.py`` (duplicate_clusters) —
    this entry pins the declarative front-end, that one the
    doubling algorithm.
    """
    register_views(spark, sf_dir)
    return spark.sql(RECURSIVE_HIERARCHY_SQL)
