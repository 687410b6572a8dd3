"""TPC-H-shape query suite adapted to the test star schema.

The reference's own query surface is one full-table SELECT
(``db_queries.py:26-29``); the driver's star-schema tables let us cover
the classic decision-support shapes the reference never needed. Q1/Q3/
Q4/Q5/Q6/Q12/Q14 live in other modules; this module adds the remaining
shapes, adapted to the columns that exist (no partsupp table, no
commit/receipt dates, no phone/comment columns — substitutions noted
per query).

Scale notes (100 TB stance), per shape:

* BOUNDED dims (nation/region — fixed cardinality at any SF) carry an
  explicit ``F.broadcast`` hint: always correct, never a budget risk.
  SF-GROWING sides (part, supplier, filtered aggregates) carry NO hint
  — a hard hint overrides AQE's size check and becomes an executor-OOM
  at 100× scale; AQE promotes them to broadcast at runtime when their
  ACTUAL size fits ``spark.sql.autoBroadcastJoinThreshold``, and falls
  back to shuffled join when it doesn't. The runtime bloom filter
  (pinned by tests/test_plans.py) carries the selectivity either way.
* Fact⨝fact (orders⨝lineitem) is a sort-merge on the join key; AQE
  picks shuffled-hash / handles skew at runtime.
* Correlated EXISTS / scalar subqueries are re-expressed as aggregate-
  then-broadcast-join: the aggregate result is tiny (one row, or one
  row per group) so the second pass over the fact is shuffle-free.
* Disjunctive predicates (Q19) stay a single scan with one OR predicate
  pushed to parquet — never a union of three scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Q2 shape (adapted): min-cost supplier per part.
# No partsupp ⇒ unit cost is derived from lineitem as
# min(l_extendedprice / l_quantity) per (part, supplier).
# --------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each STANDARD-type small part, the supplier offering the
    minimum observed unit price.

    Shape: grouped min → broadcast join back on (key, min) — the
    classic "argmin per group" without a correlated subquery. The
    per-(part,supplier) aggregate shuffles lineitem once on
    (partkey, suppkey); the per-part min is a cheap second partial
    agg; the join-back of best is unhinted — AQE broadcasts it when
    its runtime size fits (it grows with |part|, so no hard hint).
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)

    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # explicit rename before the self-derived join: `cost` and `best`
    # share lineage, so joining on same-named columns would resolve to
    # one expression id (trivially-true predicate)
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "best_partkey")
    )
    wanted = part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    return (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("best_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .drop("best_partkey")
        .join(wanted, F.col("l_partkey") == wanted.p_partkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("unit_cost", "p_partkey", "s_name")
        .limit(100)
    )


Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost
  FROM cost
  GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_name, ROUND(cost.unit_cost, 4) AS unit_cost
FROM cost
JOIN best ON cost.l_partkey = best.l_partkey AND cost.unit_cost = best.min_cost
JOIN part ON cost.l_partkey = p_partkey
JOIN supplier ON cost.l_suppkey = s_suppkey
WHERE p_type = 'STANDARD' AND p_size <= 10
ORDER BY unit_cost, p_partkey, s_name
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations by year.
# --------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume NATION_1 ↔ NATION_2 per ship year.

    supplier→nation and customer→nation are broadcast lookups
    (bounded dims); supplier itself is unhinted (AQE sizes it). The
    only real shuffles are lineitem⨝orders and the final tiny
    groupBy. The nation-pair disjunction is applied after both
    lookups.
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    n1 = nat.select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("cust_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("supp_nationkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("cust_nationkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    EXTRACT(YEAR FROM l_shipdate) AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q8 shape: market share of one supplier-nation inside a region market.
# --------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5's share of ECONOMY-part revenue sold into ASIA, by
    order year. Conditional-sum ratio over the fully joined star —
    the CASE lives in the aggregate, so one pass computes both
    numerator and denominator (no second scan, no self-join).
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir)
    n_supp = nat.select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n_cust = nat.select(
        F.col("n_nationkey").alias("cust_nationkey"),
        F.col("n_regionkey").alias("cust_regionkey"),
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            part.filter(F.col("p_type") == "ECONOMY"),
            li.l_partkey == part.p_partkey,
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_supp), sup.s_nationkey == F.col("supp_nationkey"))
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cust_nationkey"))
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            F.col("cust_regionkey") == reg.r_regionkey,
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(
                        0.0
                    )
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT
  EXTRACT(YEAR FROM o_orderdate) AS o_year,
  ROUND(
    SUM(CASE WHEN n1.n_name = 'NATION_5'
             THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
    / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year.
# No partsupp.ps_supplycost ⇒ cost proxy = 0.6 * p_retailprice * qty.
# --------------------------------------------------------------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue minus a retail-price-derived cost proxy) for
    parts whose name contains 'red', by supplier nation and year.

    nation broadcasts (bounded dim); the filtered part and supplier
    sides are unhinted — AQE promotes them to broadcast at runtime
    while their actual size fits, and degrades gracefully at 100×.
    Orders joins on orderkey for the year. One shuffle for the fact
    join, one for the final small groupBy.
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            part.filter(F.col("p_name").like("%red%")),
            li.l_partkey == part.p_partkey,
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = """
SELECT
  n_name AS nation,
  EXTRACT(YEAR FROM o_orderdate) AS o_year,
  ROUND(SUM(l_extendedprice * (1 - l_discount)
            - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# --------------------------------------------------------------------------
# Q10 shape: returned-item revenue ranking.
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returns for orders placed
    in 1996Q1. Order-date filter pushes into the orders scan; the
    customer/nation lookups broadcast; TakeOrderedAndProject caps the
    result without a global sort.
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            # exact-cents discipline: floor(x*100+0.5) is the same IEEE
            # op sequence on both engines (unlike ROUND, whose half-way
            # handling differs), and integer sums are order-independent
            # — so partial-agg ordering can never flip the 2dp result
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                        + 0.5
                    )
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT
  c_custkey, c_name, c_acctbal, n_name,
  ROUND(SUM(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)) / 100.0, 2)
    AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q15 shape: top supplier(s) by quarterly revenue (scalar-max subquery).
# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose 1996Q1 revenue equals the maximum. The revenue
    aggregate is one shuffle; its global max is a one-row broadcast
    joined back — no window over an unpartitioned frame (which would
    funnel every row through one task at scale).
    """
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(
            F.broadcast(max_rev),
            revenue.total_revenue == max_rev.max_revenue,
        )
        .join(sup, revenue.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16 shape: supplier diversity per part attribute bucket.
# --------------------------------------------------------------------------
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) for non-excluded
    parts, from the lineitem supply relationship (no partsupp table).
    countDistinct shuffles on the group key with partial distinct
    aggregation map-side.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    wanted = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 49))
    )
    return (
        li.join(wanted, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
"""


# --------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (correlated avg subquery).
# --------------------------------------------------------------------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-ized revenue from Brand#3 lineitems whose quantity is
    below 20% of that part's average. The correlated AVG becomes a
    per-part aggregate joined back onto the (part-filtered) fact
    (AQE-sized, no hard hint — it grows with |brand parts|) — two
    passes over a pruned scan, zero correlated execution.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    brand_parts = part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    brand_li = li.join(
        brand_parts, li.l_partkey == F.col("p_partkey")
    )
    per_part_avg = brand_li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        brand_li.join(
            per_part_avg.withColumnRenamed("l_partkey", "ap_key"),
            F.col("l_partkey") == F.col("ap_key"),
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


Q17_ORACLE = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
  )
"""


# --------------------------------------------------------------------------
# Q18 shape: large-volume orders (HAVING over fact, join back).
# --------------------------------------------------------------------------
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 300, with customer detail.
    The HAVING aggregate runs first (one shuffle on orderkey, partial
    sums map-side); the survivors are few, so AQE broadcasts the
    filtered aggregate at runtime (unhinted — survivor count is
    data-dependent), never re-shuffling the facts.
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q19 shape: disjunctive (OR-of-ANDs) predicate revenue.
# --------------------------------------------------------------------------
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under three alternative brand/size/quantity envelopes.
    One scan, one OR predicate — Catalyst pushes the common
    conjuncts; never three scans unioned.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_ORACLE = """
SELECT
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q20 shape: nested semi-join (suppliers of high-volume small parts).
# --------------------------------------------------------------------------
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than 80 units of any 'small %'
    part. Inner semi: per-(supplier, part) quantity aggregate filtered
    to the part subset; outer semi: suppliers join that key set
    left_semi — short-circuit, no fanout.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    small_parts = part.filter(F.col("p_name").like("small %")).select(
        "p_partkey"
    )
    heavy = (
        li.join(small_parts, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 80)
        .select("l_suppkey")
    )
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


Q20_ORACLE = """
SELECT s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small %'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 80
)
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# Q21 shape (adapted): the supplier who shipped strictly last on
# multi-supplier failed orders. l_shipdate stands in for the missing
# receipt/commit dates.
# --------------------------------------------------------------------------
def q21_last_shipping_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count per supplier of 'F' orders where ≥2 suppliers shipped and
    this supplier's latest line shipped strictly after every other
    supplier's.

    The doubly-correlated EXISTS/NOT-EXISTS is re-expressed with one
    window over the per-(order, supplier) aggregate: order-level max,
    count of suppliers at that max, and supplier count — strictly-last
    ⇔ mine == max ∧ exactly one supplier at max ∧ ≥2 suppliers. One
    shuffle for the aggregate; the window reuses its partitioning.
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    per = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_max"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "l_orderkey",
        "l_suppkey",
        "supp_max",
        F.max("supp_max").over(w).alias("order_max"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    ).withColumn(
        "n_at_max",
        F.sum(
            (F.col("supp_max") == F.col("order_max")).cast("long")
        ).over(w),
    )
    return (
        flagged.filter(
            (F.col("n_supp") >= 2)
            & (F.col("supp_max") == F.col("order_max"))
            & (F.col("n_at_max") == 1)
        )
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_ORACLE = """
WITH per AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_max
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per p1
JOIN supplier ON p1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM per p2
    WHERE p2.l_orderkey = p1.l_orderkey AND p2.l_suppkey <> p1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM per p3
    WHERE p3.l_orderkey = p1.l_orderkey
      AND p3.l_suppkey <> p1.l_suppkey
      AND p3.supp_max >= p1.supp_max
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q22 shape (adapted): rich-but-idle customers. c_nationkey stands in
# for the missing phone country code.
# --------------------------------------------------------------------------
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in nations 1-7 with above-average positive balance and
    no recent orders (none since 1999), grouped by nation. The scalar
    AVG is a one-row broadcast; the NOT EXISTS is a left_anti join on
    custkey against the date-filtered orders.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    in_scope = cust.filter(F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7))
    avg_bal = in_scope.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        in_scope.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, in_scope.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_ORACLE = """
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
  AND c_acctbal > (
    SELECT AVG(c_acctbal) FROM customer
    WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


# --------------------------------------------------------------------------
# Q13 shape (adapted): customer distribution of order counts.
# No o_comment column ⇒ the "special requests" exclusion becomes an
# o_orderpriority exclusion ('1-URGENT').
# --------------------------------------------------------------------------
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of customers by how many (non-urgent) orders they
    placed, including zero-order customers.

    Shape: instead of the textbook left-join-then-double-aggregate
    (which shuffles the full orders fact joined wide against customer),
    orders is pre-aggregated to one row per custkey — map-side partial
    counts make that shuffle carry only (custkey, count) pairs — and
    the customer table left-joins the *aggregate*. At 100 TB the
    second shuffle moves |customers| rows, never |orders| rows.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q11 shape (adapted): important stock identification. No partsupp ⇒
# "stock value" per (part, supplier) is derived from lineitem as
# sum(quantity × extendedprice/quantity) = sum(extendedprice), scoped
# to suppliers in nations 0-4.
# --------------------------------------------------------------------------
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose in-scope stock value exceeds a fixed fraction
    (0.1%) of the grand total, ranked by value.

    Shape: grouped sum per part + a scalar grand total broadcast into
    the HAVING predicate — the Q11 global-ratio filter without a
    correlated subquery. The supplier scope filter is a broadcast
    semi-join before aggregation (dim first, so the fact shuffle
    carries only in-scope rows). Exact-cents sums keep the 2-decimal
    values stable under AQE reordering.
    """
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)

    scope_sup = sup.join(
        F.broadcast(nat.filter(F.col("n_nationkey") < 5)),
        sup.s_nationkey == nat.n_nationkey,
    ).select("s_suppkey")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    scoped = li.join(
        F.broadcast(scope_sup), li.l_suppkey == scope_sup.s_suppkey, "left_semi"
    ).select("l_partkey", cents.alias("cents"))
    per_part = scoped.groupBy("l_partkey").agg(F.sum("cents").alias("value_cents"))
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            "l_partkey",
            (F.col("value_cents") / 100.0).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), F.col("l_partkey").asc())
    )


Q11_ORACLE = """
WITH scoped AS (
  SELECT l.l_partkey,
         CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l
  WHERE l.l_suppkey IN (
    SELECT s_suppkey FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_nationkey < 5
  )
),
per_part AS (
  SELECT l_partkey, CAST(SUM(cents) AS BIGINT) AS value_cents
  FROM scoped GROUP BY l_partkey
)
SELECT l_partkey,
       CAST(value_cents AS DOUBLE) / 100.0 AS stock_value
FROM per_part
WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM per_part)
ORDER BY stock_value DESC, l_partkey ASC
"""
