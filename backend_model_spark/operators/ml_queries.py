"""ML-flavored queries over the test tables.

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


def gbt_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded MLlib GBT on lineitem (predict extendedprice from
    quantity/discount/tax/partkey), returning a schema-stable metrics
    row. Rows-only check: training isn't SQL-expressible."""
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_quantity", "l_discount", "l_tax", "l_partkey", "l_extendedprice"
    )
    train, test = li.randomSplit([0.8, 0.2], seed=42)
    pipeline = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=["l_quantity", "l_discount", "l_tax", "l_partkey"],
                outputCol="features",
            ),
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
