"""Scalar-function batteries (SURVEY.md §2.8 generalized): string,
date, and math expressions — all JVM-side, all inside whole-stage
codegen, each verified against DuckDB.

Engine-parity notes encoded here:
* substring is 1-based in both; LIKE semantics identical;
* day-of-week is NOT used (Spark: 1=Sunday; DuckDB: 0=Sunday) —
  year/month/day/quarter extractions agree;
* exact ``percentile`` (linear interpolation) == DuckDB
  ``quantile_cont``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/replace/concat/length/LIKE over part."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.lower(F.col("p_name")).alias("name_lower"),
            F.substring(F.col("p_name"), 1, 5).alias("name_head"),
            F.length(F.col("p_name")).alias("name_len"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            F.col("p_name").like("%a%").alias("has_a"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        )
        .orderBy("p_partkey")
        .limit(1000)
    )


STRING_FUNCS_ORACLE = """
SELECT
  p_partkey,
  UPPER(p_brand)                 AS brand_upper,
  LOWER(p_name)                  AS name_lower,
  SUBSTRING(p_name, 1, 5)        AS name_head,
  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
  REPLACE(p_type, ' ', '_')      AS type_snake,
  p_brand || '|' || p_type       AS brand_type,
  p_name LIKE '%a%'              AS has_a,
  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
ORDER BY p_partkey
LIMIT 1000
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter extraction + last_day + add_months,
    aggregated per (year, quarter)."""
    orders = load_table(spark, "orders", sf_dir)
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            F.year(d).alias("yr"),
            F.quarter(d).alias("qtr"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("dom"),
            F.last_day(d).alias("month_end"),
            F.add_months(d, 3).alias("plus_quarter"),
        )
        .groupBy("yr", "qtr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("mo").alias("n_months"),
            F.countDistinct("month_end").alias("n_month_ends"),
            F.date_format(F.min("plus_quarter"), "yyyy-MM-dd").alias("min_plus_quarter"),
            F.max("dom").alias("max_dom"),
        )
        .orderBy("yr", "qtr")
    )


DATE_FUNCS_ORACLE = """
SELECT
  CAST(YEAR(o_orderdate) AS INTEGER)    AS yr,
  CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr,
  COUNT(*)                              AS n_orders,
  COUNT(DISTINCT MONTH(o_orderdate))    AS n_months,
  COUNT(DISTINCT last_day(CAST(o_orderdate AS DATE))) AS n_month_ends,
  STRFTIME(CAST(MIN(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH) AS DATE), '%Y-%m-%d') AS min_plus_quarter,
  CAST(MAX(DAY(o_orderdate)) AS INTEGER) AS max_dom
FROM orders
GROUP BY 1, 2
ORDER BY yr, qtr
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/square/ceil/floor/mod/sign/greatest/least on lineitem,
    plus a digit-count log10 proxy.

    Every hashed column is IEEE-exact across engines: sqrt is
    correctly rounded by IEEE-754; the square is a plain multiply
    (NOT libm ``pow``); the log10 proxy is the decimal digit count of
    the cent-scaled price (``floor(x*100+0.5)`` — the repo's cent
    discipline), which equals ``floor(log10(cents))+1`` without ever
    calling a non-correctly-rounded libm function. ``ln``/``log10``
    doubles are deliberately excluded from hash-compared output:
    libm last-ulp differences across JVM/DuckDB builds flip the 6th
    rounded decimal on boundary values (round-4 driver hash-fail).

    ``price_sqrt_micros`` / ``disc_sq_micros`` are emitted as BIGINT
    micro-units via the shared ``FLOOR(x * 1e6 + 0.5)`` formula
    rather than ``ROUND(x, 6)`` doubles: ROUND-to-6 is itself
    engine-divergent on near-tie 6th decimals (Spark rounds the
    shortest decimal string HALF_UP, DuckDB scales the binary
    double), which kept this entry driver-red in rounds 4–5 even
    after the libm columns were dropped.  FLOOR over the identical
    IEEE double pipeline is bit-deterministic in both engines.
    """
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.floor(F.sqrt("l_extendedprice") * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("price_sqrt_micros"),
            F.floor(
                (F.col("l_discount") + 1.0) * (F.col("l_discount") + 1.0) * 1e6
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("disc_sq_micros"),
            F.length(cents.cast("string")).cast("bigint").alias("price_digits"),
            F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
            F.floor(F.col("l_quantity") / 7).cast("bigint").alias("qty_div7"),
            (F.col("l_orderkey") % 97).alias("key_mod97"),
            # signum → ±1.0/0.0 doubles; DuckDB SIGN(double) → integer.
            # Cast BOTH to bigint (exact values) for dtype-strict parity.
            F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(2000)
    )


MATH_FUNCS_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(FLOOR(SQRT(l_extendedprice) * 1000000.0 + 0.5) AS BIGINT) AS price_sqrt_micros,
  CAST(FLOOR((l_discount + 1.0) * (l_discount + 1.0) * 1000000.0 + 0.5) AS BIGINT) AS disc_sq_micros,
  CAST(LENGTH(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR)) AS BIGINT)
                                       AS price_digits,
  CAST(FLOOR(CEIL(l_quantity)) AS BIGINT)      AS qty_ceil,
  CAST(FLOOR(FLOOR(l_quantity / 7)) AS BIGINT) AS qty_div7,
  l_orderkey % 97                      AS key_mod97,
  CAST(SIGN(l_discount - 0.05) AS BIGINT) AS disc_sign,
  GREATEST(l_discount, l_tax)          AS max_rate,
  LEAST(l_discount, l_tax)             AS min_rate
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 2000
"""


def percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) per order status — single-pass
    sort-based aggregate; at 100 TB swap in ``approx_percentile``
    (t-digest) when exactness isn't contractual."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )


PERCENTILES_ORACLE = """
SELECT
  o_orderstatus,
  COUNT(*) AS n_orders,
  ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
  ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over tokenized documents: distinct,
    contains, sort, slice — all codegen'd collection expressions
    (SURVEY §1.2: the driver's extended tables add array types the
    reference lacks)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim("text"), r"\s+")
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_unique"),
            F.array_contains(toks, "data").alias("has_data"),
            F.sort_array(toks).getItem(0).alias("first_sorted"),
            F.concat_ws("-", F.slice(toks, 1, 3)).alias("head3"),
        )
        .orderBy("doc_id")
        .limit(1000)
    )


ARRAY_FUNCS_ORACLE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
)
SELECT
  doc_id,
  CAST(len(toks) AS INTEGER) AS n_tokens,
  CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique,
  list_contains(toks, 'data') AS has_data,
  list_sort(toks)[1] AS first_sorted,
  array_to_string(toks[1:3], '-') AS head3
FROM t
ORDER BY doc_id
LIMIT 1000
"""


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic battery on real nulls (customers without
    orders after a left join): null-skipping COUNT(col)/AVG, `=` vs
    null-safe `<=>` self-comparison, COALESCE. These semantics are
    where engines classically diverge; the oracle pins Spark to ANSI
    behavior (DuckDB: `IS NOT DISTINCT FROM`).

    Scale: per-customer pre-aggregation BEFORE the join keeps the left
    join 1:1 (customer ⟕ order-totals), so the null-producing join
    never multiplies rows; both sides shuffle on custkey once.
    """
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
            "cents"
        )
    )
    j = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    )
    cents = F.col("cents")
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(cents.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_no_orders"),
            F.count(cents).alias("n_cents_counted"),  # null-skipping
            F.sum(F.when(cents == cents, 1).otherwise(0))
            .cast("bigint")
            .alias("n_eq_self"),  # NULL = NULL → NULL → else-branch
            F.sum(F.when(cents.eqNullSafe(cents), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nullsafe_self"),  # NULL <=> NULL → true
            (F.floor(F.avg(cents) * 1_000_000.0 + 0.5) / 1_000_000.0).alias(
                "avg_cents"
            ),  # AVG skips nulls
            F.sum(F.coalesce(cents, F.lit(0))).alias("sum_coalesced"),
        )
        .orderBy("c_mktsegment")
    )


NULL_SEMANTICS_ORACLE = """
WITH per_cust AS (
  SELECT
    o_custkey,
    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c_mktsegment, cents
  FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
)
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_no_orders,
  COUNT(cents) AS n_cents_counted,
  CAST(SUM(CASE WHEN cents = cents THEN 1 ELSE 0 END) AS BIGINT)
    AS n_eq_self,
  CAST(SUM(CASE WHEN cents IS NOT DISTINCT FROM cents THEN 1 ELSE 0 END)
       AS BIGINT) AS n_nullsafe_self,
  FLOOR(AVG(cents) * 1000000 + 0.5) / 1000000 AS avg_cents,
  CAST(SUM(COALESCE(cents, 0)) AS BIGINT) AS sum_coalesced
FROM j
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery over documents: extract / extract-all / count /
    boolean match, aggregated per source (SURVEY.md §2.8 F4 extended
    to the full regex surface).

    All four run inside whole-stage codegen (JVM regex); the pattern
    is digit runs, identical syntax in Spark (Java regex) and DuckDB
    (RE2) for this class.
    """
    docs = load_table(spark, "documents", sf_dir)
    first_num = F.regexp_extract(F.col("text"), r"([0-9]+)", 1)
    n_runs = F.regexp_count(F.col("text"), F.lit(r"[0-9]+"))
    all_nums = F.concat_ws(
        ",", F.slice(F.regexp_extract_all(F.col("text"), F.lit(r"([0-9]+)"), 1), 1, 5)
    )
    return (
        docs.select(
            "source",
            first_num.alias("first_num"),
            n_runs.alias("n_runs"),
            all_nums.alias("first5_nums"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("first_num") != "", 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_with_digits"),
            F.sum("n_runs").alias("total_digit_runs"),
            F.countDistinct("first5_nums").alias("distinct_prefix_sets"),
        )
        .orderBy("source")
    )


REGEX_FUNCS_ORACLE = r"""
WITH feats AS (
  SELECT
    source,
    regexp_extract(text, '([0-9]+)', 1) AS first_num,
    len(regexp_extract_all(text, '[0-9]+')) AS n_runs,
    COALESCE(
      array_to_string(regexp_extract_all(text, '([0-9]+)', 1)[1:5], ','), ''
    ) AS first5_nums  -- DuckDB: array_to_string([]) is NULL, Spark concat_ws is ''
  FROM documents
)
SELECT
  source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN first_num <> '' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_docs_with_digits,
  CAST(SUM(n_runs) AS BIGINT) AS total_digit_runs,
  COUNT(DISTINCT first5_nums) AS distinct_prefix_sets
FROM feats
GROUP BY source
ORDER BY source
"""


PROBE_NAMES = [
    "Customer#000000001",
    "Custoner#000000002",  # one substitution
    "Customer#00000003",   # one deletion
    "Cstomer#000000004x",  # deletion + append
    "totally-different",
]


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: edit-distance join of a small probe list
    against customer names (entity-resolution shape). The probe side
    is broadcast; levenshtein runs inside codegen on the stream side;
    matches keep distance ≤ 2 with the closest customer per probe.

    Scale: NEVER an all-pairs fuzzy join — the pattern is
    (tiny probe set) × (big entity table) broadcast, or at
    probe-set scale, a blocking key (prefix/soundex/LSH) before any
    distance. The anti-join-style blocking variant is the dedup
    module's LSH pipeline.
    """
    customer = load_table(spark, "customer", sf_dir)
    probes = spark.createDataFrame(
        [(p,) for p in PROBE_NAMES], "probe string"
    )
    dist = F.levenshtein(F.col("c_name"), F.col("probe"))
    matched = (
        customer.crossJoin(F.broadcast(probes))
        .withColumn("dist", dist)
        .filter(F.col("dist") <= 2)
    )
    w = Window.partitionBy("probe").orderBy(
        F.col("dist").asc(), F.col("c_name").asc()
    )
    return (
        matched.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("probe", F.col("c_name").alias("best_match"), "dist")
        .orderBy("probe")
    )


FUZZY_MATCH_ORACLE = f"""
WITH probes(probe) AS (
  VALUES {", ".join("('" + p + "')" for p in PROBE_NAMES)}
),
matched AS (
  SELECT probe, c_name, levenshtein(c_name, probe) AS dist
  FROM customer CROSS JOIN probes
  WHERE levenshtein(c_name, probe) <= 2
),
best AS (
  SELECT probe, c_name AS best_match, dist,
         ROW_NUMBER() OVER (
           PARTITION BY probe ORDER BY dist ASC, c_name ASC
         ) AS rk
  FROM matched
)
SELECT probe, best_match, dist FROM best WHERE rk = 1
ORDER BY probe
"""


def fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate statistics at TABLE x TABLE scale —
    the blocking variant that :func:`fuzzy_name_match`'s docstring
    promises, composed from the two disciplines that keep fuzzy
    self-joins off the O(n²) cliff:

    1. **Group by content first** (the dedup family's digest-groupBy
       rule): edit distance depends only on the STRING pair, so
       distances are computed once per distinct (brand, size, name)
       — clone-heavy data (this table: ~64 distinct names over all
       parts) collapses before any join — and pair counts come back
       via multiplicity products (cntA x cntB across names,
       C(cnt, 2) within a name).
    2. **Multi-pass token blocking**: each distinct name emits two
       blocking records (slot 0 = first token, slot 1 = last token);
       cross-name candidates are the DISTINCT union of equi-join
       matches on (brand, size, slot, token). A true near-pair
       evades blocking only if BOTH end tokens were edited — the
       standard, documented recall tradeoff of blocked ER.

    Semantics are pair-level (the oracle enumerates pairs directly);
    this plan computes the same counts without materializing them.
    Per brand: blocked candidate pairs, matches at levenshtein <= 3,
    and the closest non-identical distance.

    Scale: levenshtein cost is bounded by (distinct names)² within a
    block, independent of row count; the row-scale work is one
    map-side-combinable groupBy. Measured: the naive pair-enumerating
    form ran 24.5 s at the 10x stress volume (pairs grow
    quadratically with clone density); this form is O(rows) + O(name
    vocabulary²).
    """
    part = load_table(spark, "part", sf_dir).select("p_name", "p_brand", "p_size")
    names = part.groupBy("p_brand", "p_size", "p_name").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    toks = F.split(F.col("p_name"), " ")
    blocked = names.select(
        "p_brand",
        "p_size",
        "p_name",
        "cnt",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("slot"), toks.getItem(0).alias("token")),
                F.struct(
                    F.lit(1).alias("slot"), F.element_at(toks, -1).alias("token")
                ),
            )
        ).alias("blk"),
    ).select(
        "p_brand", "p_size", "p_name", "cnt",
        F.col("blk.slot").alias("slot"), F.col("blk.token").alias("token"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.slot") == F.col("b.slot"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_size").alias("size"),
            F.col("a.p_name").alias("na"),
            F.col("b.p_name").alias("nb"),
            F.col("a.cnt").alias("ca"),
            F.col("b.cnt").alias("cb"),
        )
        .distinct()  # a name pair blocked by both slots counts once
        .select(
            "brand",
            F.levenshtein(F.col("na"), F.col("nb")).alias("dist"),
            (F.col("ca") * F.col("cb")).alias("mult"),
        )
    )
    same = names.filter(F.col("cnt") >= 2).select(
        F.col("p_brand").alias("brand"),
        F.lit(0).alias("dist"),
        F.expr("cnt * (cnt - 1) DIV 2").alias("mult"),
    )
    return (
        cross.unionByName(same)
        .groupBy("brand")
        .agg(
            F.sum("mult").cast("long").alias("n_candidate_pairs"),
            F.sum(F.when(F.col("dist") <= 3, F.col("mult")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_match_pairs"),
            F.min(F.when(F.col("dist") > 0, F.col("dist"))).cast("int").alias(
                "min_nonzero_dist"
            ),
        )
        .orderBy("brand")
    )


FUZZY_BLOCKED_ORACLE = """
WITH blocked AS (
  SELECT p_partkey, p_name, p_brand, p_size, b.slot, b.token
  FROM part,
  LATERAL (
    SELECT 0 AS slot, string_split(p_name, ' ')[1] AS token
    UNION ALL
    SELECT 1 AS slot, string_split(p_name, ' ')[-1] AS token
  ) b
),
pairs AS (
  SELECT DISTINCT a.p_brand AS brand, a.p_partkey AS ka, b.p_partkey AS kb,
         levenshtein(a.p_name, b.p_name) AS dist
  FROM blocked a JOIN blocked b
    ON a.p_brand = b.p_brand
   AND a.p_size = b.p_size
   AND a.slot = b.slot
   AND a.token = b.token
   AND a.p_partkey < b.p_partkey
)
SELECT brand,
  COUNT(*) AS n_candidate_pairs,
  CAST(SUM(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_match_pairs,
  CAST(MIN(CASE WHEN dist > 0 THEN dist END) AS INTEGER) AS min_nonzero_dist
FROM pairs
GROUP BY brand
ORDER BY brand
"""
