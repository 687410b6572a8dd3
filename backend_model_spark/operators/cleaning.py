"""Cleaning / scalar-function operators (SURVEY.md §2.2 + §2.8).

The reference's wrangling surface — conditional updates (nb cell 16),
junk filtering (cell 41), regex cleanup + first-token split (cell 40),
casts (cells 44/78), epoch-days conversion (cell 86), exp/round (cell
18) — re-expressed as native column expressions over the test tables.
All of these were row-wise Python in the reference; here every one is
a JVM-side codegen'd expression (no Python in the hot path).

DuckDB parity notes baked into the oracles:
* DuckDB ``regexp_replace`` is first-match-only without the ``'g'``
  flag; Spark's replaces all occurrences — oracles always pass ``'g'``.
* ``date_diff('day', a, b)`` (DuckDB) == ``datediff(b, a)`` (Spark),
  both cast to INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table


def conditional_flag_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (bool/'t'/'f' → 0/1 conditional update): encode order status
    into int flags with CASE WHEN, count per flag combination."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.withColumn(
            "is_open", F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
        )
        .withColumn(
            "is_urgent",
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0),
        )
        .groupBy("is_open", "is_urgent")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("is_open", "is_urgent")
    )


CONDITIONAL_FLAG_ORACLE = """
SELECT
  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open,
  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS is_urgent,
  COUNT(*) AS n_orders,
  ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY 1, 2
ORDER BY is_open, is_urgent
"""


def junk_value_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (drop rows whose key matches junk literals): the reference's
    junk-zipcode delete (nb:1464-1471), as an anti-isin filter that
    pushes down to the scan."""
    docs = load_table(spark, "documents", sf_dir)
    junk = ["src13", "src7"]
    return (
        docs.filter(~F.col("source").isin(junk))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


JUNK_FILTER_ORACLE = """
SELECT lang, COUNT(*) AS n_docs
FROM documents
WHERE source NOT IN ('src13', 'src7')
GROUP BY lang
ORDER BY lang
"""


def regex_clean_first_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F5 (regex scrub then first space-token, the zipcode cleaner
    nb:1437-1452): scrub non-alphanumerics from p_type, take the first
    token, count parts per token."""
    part = load_table(spark, "part", sf_dir)
    cleaned = F.split(
        F.regexp_replace(F.col("p_type"), r"[^ a-zA-Z0-9]", " "), " "
    ).getItem(0)
    return (
        part.withColumn("type_head", cleaned)
        .groupBy("type_head")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("type_head")
    )


REGEX_CLEAN_ORACLE = """
SELECT
  string_split(regexp_replace(p_type, '[^ a-zA-Z0-9]', ' ', 'g'), ' ')[1] AS type_head,
  COUNT(*) AS n_parts
FROM part
GROUP BY 1
ORDER BY type_head
"""


def cast_string_priority_to_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 (string→int cast, ``astype(int)`` nb:1594): numeric prefix of
    o_orderpriority ('1-URGENT' → 1) cast to int, aggregated."""
    orders = load_table(spark, "orders", sf_dir)
    prio = F.split(F.col("o_orderpriority"), "-").getItem(0).cast("int")
    return (
        orders.withColumn("prio_num", prio)
        .groupBy("prio_num")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("prio_num")
    )


CAST_PRIORITY_ORACLE = """
SELECT
  CAST(string_split(o_orderpriority, '-')[1] AS INTEGER) AS prio_num,
  COUNT(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY prio_num
"""


def epoch_days_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 (date → integer epoch-days, ``datetime_to_UTC_days`` nb cell
    86): via ``datediff`` from 1970-01-01 — TZ-proof integer parity."""
    orders = load_table(spark, "orders", sf_dir)
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    return (
        orders.withColumn("order_epoch_day", days)
        .groupBy("order_epoch_day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("order_epoch_day")
        .limit(100)
    )


EPOCH_DAYS_ORACLE = """
SELECT
  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
    AS order_epoch_day,
  COUNT(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY order_epoch_day
LIMIT 100
"""


def exp_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2 (``round(exp(log_price), 2)`` nb:575-578): log→exp
    round-trip on o_totalprice, asserting the reference's price
    inversion semantics."""
    orders = load_table(spark, "orders", sf_dir)
    price = F.round(F.exp(F.log(F.col("o_totalprice"))), 2)
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").alias("price_orig"),
            price.alias("price_roundtrip"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


EXP_LOG_ORACLE = """
SELECT
  o_orderkey,
  o_totalprice AS price_orig,
  ROUND(EXP(LN(o_totalprice)), 2) AS price_roundtrip
FROM orders
ORDER BY o_orderkey
LIMIT 1000
"""


def dropna_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 (``dropna(axis=0)`` nb:538): row count before/after
    any-null drop, the reference's null-budget invariant."""
    ev = load_table(spark, "events", sf_dir)
    before = ev.count()
    after = ev.na.drop("any").count()
    return spark.createDataFrame(
        [(before, after)], "rows_before bigint, rows_after bigint"
    )


DROPNA_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM events) AS rows_before,
  (SELECT COUNT(*) FROM events
   WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
     AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL)
  AS rows_after
"""


def hcc_column_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 (high-cardinality-column detection, nb:813-815): distinct
    count of every string column in documents, flagged >100."""
    docs = load_table(spark, "documents", sf_dir)
    string_cols = ["text", "lang", "source"]
    counts = docs.agg(
        *[F.countDistinct(c).alias(c) for c in string_cols]
    ).collect()[0]
    rows = [(c, int(counts[c]), bool(counts[c] > 100)) for c in string_cols]
    return spark.createDataFrame(
        rows, "column_name string, n_distinct bigint, is_hcc boolean"
    ).orderBy("column_name")


HCC_ORACLE = """
SELECT * FROM (
  SELECT 'text'   AS column_name, COUNT(DISTINCT text)   AS n_distinct, COUNT(DISTINCT text)   > 100 AS is_hcc FROM documents
  UNION ALL
  SELECT 'lang'   AS column_name, COUNT(DISTINCT lang)   AS n_distinct, COUNT(DISTINCT lang)   > 100 AS is_hcc FROM documents
  UNION ALL
  SELECT 'source' AS column_name, COUNT(DISTINCT source) AS n_distinct, COUNT(DISTINCT source) > 100 AS is_hcc FROM documents
)
ORDER BY column_name
"""


def outlier_iqr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier detection per order status: Tukey fences
    (Q1 − 1.5·IQR, Q3 + 1.5·IQR) and the outlier rate inside each
    group — the distribution-diagnostics step behind the reference's
    normality probe (`EDA Notebook.ipynb` cell 22, nb:705) made
    actionable as a filter.

    Two passes over a pruned 2-column scan: the per-group exact
    percentiles (sort-based aggregate), broadcast back onto the fact
    for the fence comparison — never a correlated subquery. At 100 TB
    swap `percentile` for `approx_percentile` (t-digest, mergeable)
    when exactness isn't contractual.
    """
    orders = load_table(spark, "orders", sf_dir)
    fences = (
        orders.groupBy(F.col("o_orderstatus").alias("f_status"))
        .agg(
            F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
            F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
        )
        .select(
            "f_status",
            (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
            (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
        )
    )
    return (
        orders.join(
            F.broadcast(fences), orders.o_orderstatus == fences.f_status
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                (
                    (F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi"))
                ).cast("long")
            ).alias("n_outliers"),
            F.round(F.min("lo"), 6).alias("fence_lo"),
            F.round(F.min("hi"), 6).alias("fence_hi"),
        )
        .orderBy("o_orderstatus")
    )


OUTLIER_IQR_ORACLE = """
WITH fences AS (
  SELECT
    o_orderstatus AS f_status,
    quantile_cont(o_totalprice, 0.25)
      - 1.5 * (quantile_cont(o_totalprice, 0.75)
               - quantile_cont(o_totalprice, 0.25)) AS lo,
    quantile_cont(o_totalprice, 0.75)
      + 1.5 * (quantile_cont(o_totalprice, 0.75)
               - quantile_cont(o_totalprice, 0.25)) AS hi
  FROM orders
  GROUP BY o_orderstatus
)
SELECT
  o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  ROUND(MIN(lo), 6) AS fence_lo,
  ROUND(MIN(hi), 6) AS fence_hi
FROM orders
JOIN fences ON o_orderstatus = f_status
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-median imputation — the sklearn ``SimpleImputer``
    pattern the reference's cleaning stage gestures at, done
    group-aware (impute a customer's missing balance with their
    NATION's median, not the global one). "Missing" is the negative
    account balance (the sentinel convention in the synthetic data).

    Exact parity: medians via ``percentile``/``quantile_cont`` over
    non-missing rows only; the report sums integer cents of the
    imputed column so aggregation order can't drift the hash.

    Scale: one groupBy for the 25-row median table, broadcast back
    onto the scan; no shuffle of the fact side.
    """
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    missing = F.col("c_acctbal") < 0
    medians = (
        cust.filter(~missing)
        .groupBy("c_nationkey")
        .agg(F.percentile("c_acctbal", F.lit(0.5)).alias("nation_median"))
    )
    filled = (
        cust.join(F.broadcast(medians), "c_nationkey", "left")
        .withColumn(
            "bal_filled",
            F.when(missing, F.col("nation_median")).otherwise(F.col("c_acctbal")),
        )
    )
    cents = F.floor(F.col("bal_filled") * 100 + 0.5).cast("bigint")
    return (
        filled.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(missing.cast("long")).alias("n_imputed"),
            (
                F.floor(F.max("nation_median") * 1_000_000.0 + 0.5) / 1_000_000.0
            ).alias("nation_median"),
            F.sum(cents).alias("filled_cents"),
        )
        .orderBy("c_nationkey")
    )


IMPUTE_ORACLE = """
WITH medians AS (
  SELECT c_nationkey AS m_nation,
         quantile_cont(c_acctbal, 0.5) AS nation_median
  FROM customer WHERE c_acctbal >= 0
  GROUP BY c_nationkey
),
filled AS (
  SELECT
    c.c_nationkey,
    CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END AS imputed,
    CASE WHEN c.c_acctbal < 0 THEN m.nation_median ELSE c.c_acctbal END
      AS bal_filled,
    m.nation_median
  FROM customer c LEFT JOIN medians m ON c.c_nationkey = m.m_nation
)
SELECT
  c_nationkey,
  COUNT(*) AS n_customers,
  CAST(SUM(imputed) AS BIGINT) AS n_imputed,
  FLOOR(MAX(nation_median) * 1000000 + 0.5) / 1000000 AS nation_median,
  CAST(SUM(CAST(FLOOR(bal_filled * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS filled_cents
FROM filled
GROUP BY c_nationkey
ORDER BY c_nationkey
"""
