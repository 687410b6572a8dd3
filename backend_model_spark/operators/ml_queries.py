"""ML-flavored queries over the test tables (SURVEY.md §2.10: the
reference's "query engine" is model training M1-M4; these queries are
the oracle-checkable / seeded-deterministic slice of that surface).

* :func:`linear_fit_closed_form` — per-group simple linear regression
  via sufficient statistics (single-pass distributive aggregates), the
  oracle-checkable core of linear modeling: DuckDB's ``regr_slope`` /
  ``regr_intercept`` / ``regr_r2`` verify the math exactly.
* :func:`gbt_train_eval` — end-to-end MLlib pipeline (assembler →
  scaler → GBT) trained on lineitem features; rows-only (training is
  not SQL-expressible) but seeded-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table


def linear_fit_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of l_extendedprice ~ l_quantity per returnflag from
    sufficient statistics (mean/var/cov), one distributed pass."""
    li = load_table(spark, "lineitem", sf_dir)
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("l_quantity").alias("mx"),
        F.avg("l_extendedprice").alias("my"),
        F.covar_pop("l_quantity", "l_extendedprice").alias("cxy"),
        F.var_pop("l_quantity").alias("vx"),
        F.var_pop("l_extendedprice").alias("vy"),
    )
    slope = F.col("cxy") / F.col("vx")
    intercept = F.col("my") - slope * F.col("mx")
    r2 = (F.col("cxy") * F.col("cxy")) / (F.col("vx") * F.col("vy"))
    return g.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("l_returnflag")


LINEAR_FIT_ORACLE = """
SELECT
  l_returnflag,
  COUNT(*) AS n,
  ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6)     AS slope,
  ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS intercept,
  ROUND(REGR_R2(l_extendedprice, l_quantity), 6)        AS r2
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


GBT_FEATURES = ["l_quantity", "l_discount", "l_tax", "l_partkey"]

# The fitted GBT is shared between gbt_train_eval and
# gbt_feature_importance — one training serves both views (metrics,
# importances), exactly like a model registry in a production
# pipeline. Keyed by (application, data dir); entries die with the
# Spark application. Training is the most expensive single step in
# the whole registry, so recomputing it per query would double the
# correctness-gate cost for zero information.
_GBT_CACHE: dict = {}


def _fitted_gbt(spark: SparkSession, sf_dir: str):
    """(pipeline_model, train_df, test_df) for the seeded GBT split."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _GBT_CACHE.get(key)
    if hit is not None:
        return hit
    li = load_table(spark, "lineitem", sf_dir).select(
        *GBT_FEATURES, "l_extendedprice"
    )
    train, test = li.randomSplit([0.8, 0.2], seed=42)
    pipeline = Pipeline(
        stages=[
            VectorAssembler(inputCols=GBT_FEATURES, outputCol="features"),
            GBTRegressor(
                featuresCol="features",
                labelCol="l_extendedprice",
                seed=42,
                maxDepth=4,
                maxIter=10,
            ),
        ]
    )
    model = pipeline.fit(train)
    _GBT_CACHE[key] = (model, train, test)
    return _GBT_CACHE[key]


def gbt_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded MLlib GBT on lineitem (predict extendedprice from
    quantity/discount/tax/partkey), returning a schema-stable metrics
    row. Rows-only check: training isn't SQL-expressible."""
    from pyspark.ml.evaluation import RegressionEvaluator

    model, train, test = _fitted_gbt(spark, sf_dir)
    preds = model.transform(test)
    evaluator = RegressionEvaluator(
        labelCol="l_extendedprice", predictionCol="prediction"
    )
    mae = evaluator.setMetricName("mae").evaluate(preds)
    rmse = evaluator.setMetricName("rmse").evaluate(preds)
    r2 = evaluator.setMetricName("r2").evaluate(preds)
    return spark.createDataFrame(
        [(train.count(), test.count(), float(mae), float(rmse), float(r2))],
        "n_train bigint, n_test bigint, mae double, rmse double, r2 double",
    )


def group_ols_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, linestatus) OLS via grouped-map
    ``applyInPandas`` — the Pandas-UDAF tier of the same math as
    :func:`linear_fit_closed_form`, verified by the same DuckDB
    ``regr_*`` oracle.

    This is the escape hatch for per-group logic that genuinely needs
    numpy/pandas (matrix algebra, scipy); for anything expressible as
    built-in aggregates, prefer the closed-form version — it keeps
    whole-stage codegen and partial aggregation.

    Scale: Arrow-batched shuffle on the group key; each group must fit
    in one executor's memory (fine here — a handful of flag/status
    combinations; a skewed giant group would need pre-aggregation of
    sufficient statistics instead, see ``agg_salted_skew``).
    """
    import pandas as pd

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_quantity"].to_numpy(dtype="float64")
        y = pdf["l_extendedprice"].to_numpy(dtype="float64")
        mx = x.mean()
        my = y.mean()
        dx = x - mx
        dy = y - my
        cxy = (dx * dy).mean()
        vx = (dx * dx).mean()
        vy = (dy * dy).mean()
        slope = cxy / vx
        intercept = my - slope * mx
        r2 = (cxy * cxy) / (vx * vy)

        def r6(v: float) -> float:
            import math

            return math.floor(v * 1_000_000.0 + 0.5) / 1_000_000.0

        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "n": [len(pdf)],
                "slope": [r6(slope)],
                "intercept": [r6(intercept)],
                "r2": [r6(r2)],
            }
        )

    out_schema = (
        "l_returnflag string, l_linestatus string, n bigint, "
        "slope double, intercept double, r2 double"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .applyInPandas(ols, schema=out_schema)
        .orderBy("l_returnflag", "l_linestatus")
    )


GROUP_OLS_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n,
  FLOOR(REGR_SLOPE(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000
    AS slope,
  FLOOR(REGR_INTERCEPT(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000
    AS intercept,
  FLOOR(REGR_R2(l_extendedprice, l_quantity) * 1000000 + 0.5) / 1000000
    AS r2
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def gbt_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature importances of the seeded GBT from
    :func:`gbt_train_eval` — model interpretability as a query
    (rows-only: importances aren't SQL-expressible; deterministic
    under the fixed seed/split). Importance ratios are floor-rounded
    for a stable schema check.
    """
    import math

    model, _, _ = _fitted_gbt(spark, sf_dir)
    imps = model.stages[-1].featureImportances.toArray()
    rows = [
        (name, math.floor(float(v) * 1_000_000 + 0.5) / 1_000_000)
        for name, v in zip(GBT_FEATURES, imps)
    ]
    return spark.createDataFrame(
        rows, "feature string, importance double"
    ).orderBy(F.col("importance").desc(), F.col("feature").asc())


IRLS_STEPS = 8


def logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression by IRLS (Newton–Raphson): at
    each step the executors reduce the 3×3 Hessian ``Xᵀ W X`` and the
    3-vector gradient as NINE sufficient-statistic aggregates in one
    map-side pass; the driver solves the tiny system and broadcasts
    the updated coefficients into the next step's expressions. The
    driver never sees rows — only the 12 scalars per step — the same
    contract as the connected-components loop. Model: P(order is
    high-priority) ~ intercept + scaled price + scaled year.

    Fixed IRLS_STEPS=8 steps (quadratic convergence makes that
    effectively exact); deterministic given the data, but the nested
    solve isn't SQL-expressible, so this is a rows-only registry
    entry verified against a numpy IRLS reference in
    tests/test_property_based.py.
    """
    import numpy as np

    orders = load_table(spark, "orders", sf_dir)
    feats = orders.select(
        F.when(F.col("o_orderpriority") < "3", 1.0).otherwise(0.0).alias("y"),
        (F.col("o_totalprice") / 100000.0).alias("x1"),
        ((F.year("o_orderdate") - 1995) / 4.0).alias("x2"),
    )
    beta = np.zeros(3)
    for _ in range(IRLS_STEPS):
        b0, b1, b2 = (float(v) for v in beta)
        eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = p * (F.lit(1.0) - p)
        r = F.col("y") - p
        x = [F.lit(1.0), F.col("x1"), F.col("x2")]
        aggs = []
        for i in range(3):
            for j in range(i, 3):
                aggs.append(F.sum(w * x[i] * x[j]).alias(f"h{i}{j}"))
            aggs.append(F.sum(r * x[i]).alias(f"g{i}"))
        row = feats.agg(*aggs).collect()[0]
        H = np.array(
            [
                [row["h00"], row["h01"], row["h02"]],
                [row["h01"], row["h11"], row["h12"]],
                [row["h02"], row["h12"], row["h22"]],
            ]
        )
        g = np.array([row["g0"], row["g1"], row["g2"]])
        beta = beta + np.linalg.solve(H + 1e-9 * np.eye(3), g)
    b0, b1, b2 = (float(v) for v in beta)
    eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
    pred = (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)) > 0.5).cast("double")
    metrics = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg((pred == F.col("y")).cast("double")).alias("accuracy"),
        F.avg("y").alias("base_rate"),
    )
    return metrics.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.lit(b0), 6).alias("beta0"),
        F.round(F.lit(b1), 6).alias("beta1"),
        F.round(F.lit(b2), 6).alias("beta2"),
        F.round("accuracy", 6).alias("accuracy"),
        F.round("base_rate", 6).alias("base_rate"),
    )
