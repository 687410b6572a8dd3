"""ML-flavored queries over the test tables (SURVEY.md §2.10: the
reference's "query engine" is model training M1-M4; these queries are
the oracle-checkable / seeded-deterministic slice of that surface).

* :func:`linear_fit_closed_form` — per-group simple linear regression
  via sufficient statistics (single-pass distributive aggregates), the
  oracle-checkable core of linear modeling: DuckDB's ``regr_slope`` /
  ``regr_intercept`` / ``regr_r2`` verify the math exactly.
* :func:`gbt_train_eval` — end-to-end MLlib pipeline (indexers →
  assembler → GBT) trained on document features (the testdata's one
  learnable label — see the round-7 note above ``GBT_FEATURES``);
  registered via its certificate face, which includes a truthful
  ``test_r2_positive`` generalization boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from backend_model_spark.operators.sampling import BUCKET
from backend_model_spark.operators.scale_utils import purge_other_apps
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
    # zero-variance groups must mirror the oracle's SQL-standard
    # regr_* semantics (probed on DuckDB): var(x)=0 → all NULL;
    # var(y)=0 with var(x)>0 → slope 0, intercept mean(y), r2 1.
    # Bare divisions are an ANSI DIVIDE_BY_ZERO crash instead.
    slope = F.try_divide(F.col("cxy"), F.col("vx"))
    intercept = F.col("my") - slope * F.col("mx")
    r2 = (
        F.when(F.col("vx") == 0, F.lit(None).cast("double"))
        .when(F.col("vy") == 0, F.lit(1.0))
        .otherwise(
            F.try_divide(F.col("cxy") * F.col("cxy"), F.col("vx") * F.col("vy"))
        )
    )
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


# Round-7 task change (closing the round-6 verdict's GBT item): the
# round-6 GBT predicted l_extendedprice, and its test R² was measured
# NEGATIVE at sf0.01. Root cause is the DATA, not the features: in
# the driver-generated testdata l_extendedprice is independent noise
# — measured |corr| <= 0.007 against l_quantity, l_discount, l_tax,
# l_partkey, p_retailprice, p_size, and even l_quantity*p_retailprice
# (the TPC-H identity does not hold here), and o_totalprice is
# equally independent of its lineitems. No feature set can certify
# test_r2 > 0 on an unlearnable label, and the round-6 partkey
# feature was merely memorizing that noise. The one label in the
# testdata with real signal is documents.n_chars (corr 0.998 with
# token count), so the supervised-pipeline entry — the capability the
# reference's price predictor demonstrates (model.py:1-80: features →
# train/test split → fit → held-out metrics) — trains on documents:
# predict n_chars from text-derived features. Generalization is now
# certified: test R² measured ~0.99 at sf0.001 and sf0.01.
GBT_FEATURES = [
    "n_tokens",
    "n_uniq_tokens",
    "max_token_len",
    "lang_idx",
    "source_idx",
]

# The fitted GBT is shared between gbt_train_eval and
# gbt_feature_importance — one training serves both views (metrics,
# importances), exactly like a model registry in a production
# pipeline. Keyed by (application, data dir); entries die with the
# Spark application. Training is the most expensive single step in
# the whole registry, so recomputing it per query would double the
# correctness-gate cost for zero information.
_GBT_CACHE: dict = {}


def gbt_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared (doc_id, text features, label) frame: documents'
    n_chars with token count, distinct-token count, longest token,
    and the raw lang/source strings — honest inputs (none
    reconstructs the label exactly; n_chars also counts the
    whitespace the tokenizer discards). Shared with the
    shuffled-label flip test so the certificate's falsifiability
    proof always covers the SHIPPED feature engineering."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.trim("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("double").alias("n_uniq_tokens"),
        F.array_max(F.transform(toks, lambda t: F.length(t)))
        .cast("double")
        .alias("max_token_len"),
        "lang",
        "source",
        F.col("n_chars").cast("double").alias("label"),
    )


def gbt_pipeline():
    """The shared indexers → assembler → GBT pipeline (seeded).

    handleInvalid='keep': a lang/source category that lands entirely
    in the held-out split maps to the indexer's unseen bucket instead
    of crashing transform. Note this also raises the nominal arity the
    tree sees by one (the unseen slot), so maxBins is pinned to 64 —
    a category count growing past the default 32 would otherwise turn
    into a fit-time crash at a larger SF (round-7 review)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    return Pipeline(
        stages=[
            StringIndexer(
                inputCol="lang",
                outputCol="lang_idx",
                stringOrderType="alphabetAsc",
                handleInvalid="keep",
            ),
            StringIndexer(
                inputCol="source",
                outputCol="source_idx",
                stringOrderType="alphabetAsc",
                handleInvalid="keep",
            ),
            VectorAssembler(inputCols=GBT_FEATURES, outputCol="features"),
            GBTRegressor(
                featuresCol="features",
                labelCol="label",
                seed=42,
                maxDepth=4,
                maxIter=10,
                maxBins=64,
            ),
        ]
    )


def _fitted_gbt(spark: SparkSession, sf_dir: str):
    """(pipeline_model, train_df, test_df) over
    :func:`gbt_feature_frame` through :func:`gbt_pipeline`.

    The split is CONTENT-ADDRESSED (md5(doc_id) bucket < 80 trains —
    the repo-wide discipline, cf. naive_bayes_lang /
    target_encode_kfold) rather than randomSplit: randomSplit sorts
    each partition by ALL columns for deterministic resampling, so
    membership silently changes whenever a column is added to the
    feature frame, and it is partitioning-dependent besides (round-7
    review). The md5 bucket depends only on doc_id — stable across
    column changes, partitionings, and engines."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _GBT_CACHE.get(key)
    if hit is not None:
        return hit
    feats = gbt_feature_frame(spark, sf_dir)
    # sampling.BUCKET — the ONE repo-wide bucket expression (round-8
    # advice: hand-copied split expressions drift silently)
    bucket = F.expr(BUCKET)
    train = feats.filter(bucket < 80)
    test = feats.filter(bucket >= 80)
    model = gbt_pipeline().fit(train)
    purge_other_apps(_GBT_CACHE, key[0])
    _GBT_CACHE[key] = (model, train, test)
    return _GBT_CACHE[key]


def gbt_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded MLlib GBT on documents (predict n_chars from
    text-derived features), returning a schema-stable metrics row.
    Rows-only check: training isn't SQL-expressible."""
    from pyspark.ml.evaluation import RegressionEvaluator

    model, train, test = _fitted_gbt(spark, sf_dir)
    preds = model.transform(test)
    evaluator = RegressionEvaluator(labelCol="label", predictionCol="prediction")
    mae = evaluator.setMetricName("mae").evaluate(preds)
    rmse = evaluator.setMetricName("rmse").evaluate(preds)
    r2 = evaluator.setMetricName("r2").evaluate(preds)
    return spark.createDataFrame(
        [(train.count(), test.count(), float(mae), float(rmse), float(r2))],
        "n_train bigint, n_test bigint, mae double, rmse double, r2 double",
    )


def gbt_train_eval_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable face of :func:`gbt_train_eval` (round-6
    certificate pattern): the split is content-addressed and fully
    deterministic (see :func:`_fitted_gbt`) but the trained metrics
    are engine-local tree-ensemble floats, so the hash covers the
    exact TOTAL row count (train + test must conserve documents) plus
    certificates — the split fraction lands near 0.8 (±0.10 — an md5
    bucket on a 500-row table has binomial sd ≈ 0.018),
    MAE <= RMSE (Cauchy–Schwarz, any correct evaluator),
    test R² <= 1, TRAIN R² > 0 (boosting starts from the mean
    prediction and strictly reduces training SSE), and — new in
    round 7, on the learnable label — TEST R² > 0: the fitted model
    must beat the mean predictor on HELD-OUT rows (measured ~0.99;
    a shuffled-label training flips it — tests/test_certificates.py)."""
    from pyspark.ml.evaluation import RegressionEvaluator

    model, train, test = _fitted_gbt(spark, sf_dir)
    preds = model.transform(test)
    evaluator = RegressionEvaluator(labelCol="label", predictionCol="prediction")
    mae = evaluator.setMetricName("mae").evaluate(preds)
    rmse = evaluator.setMetricName("rmse").evaluate(preds)
    r2 = evaluator.setMetricName("r2").evaluate(preds)
    r2_train = evaluator.setMetricName("r2").evaluate(model.transform(train))
    n_train, n_test = train.count(), test.count()
    n_total = n_train + n_test
    return spark.createDataFrame(
        [
            (
                n_total,
                bool(abs(n_train / n_total - 0.8) <= 0.10),
                bool(mae <= rmse + 1e-9),
                bool(r2 <= 1.0 + 1e-9),
                bool(r2_train > 0.0),
                bool(r2 > 0.0),
            )
        ],
        "n_total bigint, split_frac_ok boolean, mae_le_rmse boolean, "
        "r2_le_one boolean, train_beats_mean boolean, test_r2_positive boolean",
    )


GBT_TRAIN_CERT_ORACLE = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_total,
  TRUE AS split_frac_ok,
  TRUE AS mae_le_rmse,
  TRUE AS r2_le_one,
  TRUE AS train_beats_mean,
  TRUE AS test_r2_positive
FROM documents
"""


def gbt_feature_importance_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable face of :func:`gbt_feature_importance`: the
    importance VALUES are tree-ensemble floats no SQL engine can
    reproduce, so the hash covers the fixed feature list plus the
    axioms any valid importance vector satisfies — every component
    non-negative and the vector summing to 1 (MLlib normalizes)."""
    import math

    model, _, _ = _fitted_gbt(spark, sf_dir)
    imps = [float(v) for v in model.stages[-1].featureImportances.toArray()]
    sum_ok = bool(math.isclose(sum(imps), 1.0, rel_tol=0, abs_tol=1e-9))
    rows = [
        (name, bool(v >= 0.0), sum_ok)
        for name, v in zip(GBT_FEATURES, imps)
    ]
    return spark.createDataFrame(
        rows, "feature string, nonneg_ok boolean, sum_to_one boolean"
    ).orderBy("feature")


GBT_IMPORTANCE_CERT_ORACLE = """
SELECT feature, TRUE AS nonneg_ok, TRUE AS sum_to_one
FROM (VALUES ('n_tokens'), ('n_uniq_tokens'), ('max_token_len'),
             ('lang_idx'), ('source_idx'))
     AS t(feature)
ORDER BY feature
"""


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
        # deterministic order before float summation: shuffle arrival
        # order varies run-to-run and numpy's pairwise sums are
        # order-sensitive in the last ulp — the edge-round then flips
        pdf = pdf.sort_values(["l_quantity", "l_extendedprice"])
        x = pdf["l_quantity"].to_numpy(dtype="float64")
        y = pdf["l_extendedprice"].to_numpy(dtype="float64")
        mx = x.mean()
        my = y.mean()
        dx = x - mx
        dy = y - my
        cxy = (dx * dy).mean()
        vx = (dx * dx).mean()
        vy = (dy * dy).mean()
        # zero-variance groups must mirror the oracle's SQL-standard
        # regr_* semantics (probed on DuckDB): var(x)=0 → all NULL;
        # var(y)=0 with var(x)>0 → slope 0, intercept mean(y), r2 1.
        # A bare cxy/vx is a ZeroDivisionError worker crash instead.
        if vx == 0.0:
            slope = intercept = r2 = None
        else:
            slope = cxy / vx
            intercept = my - slope * mx
            r2 = 1.0 if vy == 0.0 else (cxy * cxy) / (vx * vy)

        def r6(v):
            import math

            if v is None:
                return None
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


def _irls_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y, x1, x2) design frame shared by the trainer and the
    certificate entry."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        F.when(F.col("o_orderpriority") < "3", 1.0).otherwise(0.0).alias("y"),
        (F.col("o_totalprice") / 100000.0).alias("x1"),
        ((F.year("o_orderdate") - 1995) / 4.0).alias("x2"),
    )


def _irls_fit(feats: DataFrame):
    """IRLS/Newton loop: per step ONE map-side-combinable aggregate of
    the nine sufficient statistics; the driver solves the 3x3 system
    and broadcasts the next coefficients as literals. Returns the
    final numpy beta (see :func:`logistic_irls` for the contract)."""
    import numpy as np

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
    return beta


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
    effectively exact); deterministic given the data. The nested
    solve isn't SQL-expressible, so the betas themselves are verified
    against a numpy IRLS reference in tests/test_property_based.py;
    the REGISTERED entry is :func:`logistic_irls_certified`, which
    hashes exact counts plus convergence-certificate booleans under a
    full DuckDB oracle (round-6 upgrade from rows-only).
    """
    feats = _irls_feats(spark, sf_dir)
    beta = _irls_fit(feats)
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


def logistic_irls_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGISTERED face of :func:`logistic_irls`, fully oracled
    (round-6 upgrade from rows-only, the `agg_approx_distinct`
    pattern): the trained betas are driver-solved floats no SQL
    engine can reproduce, so what is hashed is (a) exact class
    counts and (b) Spark-side CERTIFICATE booleans the oracle emits
    as literal TRUE —

    - ``grad_converged``: after the final Newton step the score
      equations hold: max_i |Σ (y−p)·x_i| ≤ 1e-6·n. A broken solver,
      a feature drift, or a diverging fit flips it.
    - ``separation_ok``: mean fitted p over y=1 exceeds mean fitted p
      over y=0 — the fit actually orders the classes.

    Scale: identical to the trainer (per-step one aggregate row to
    the driver); the certificate adds ONE more sufficient-stats pass.
    """
    feats = _irls_feats(spark, sf_dir)
    beta = _irls_fit(feats)
    b0, b1, b2 = (float(v) for v in beta)
    eta = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    r = F.col("y") - p
    cert = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.abs(F.sum(r)).alias("g0"),
        F.abs(F.sum(r * F.col("x1"))).alias("g1"),
        F.abs(F.sum(r * F.col("x2"))).alias("g2"),
        F.avg(F.when(F.col("y") == 1.0, p)).alias("p1"),
        F.avg(F.when(F.col("y") == 0.0, p)).alias("p0"),
    )
    return cert.select(
        "n",
        "n_pos",
        (
            F.greatest("g0", "g1", "g2") <= F.lit(1e-6) * F.col("n")
        ).alias("grad_converged"),
        (F.col("p1") > F.col("p0")).alias("separation_ok"),
    )


LOGISTIC_IRLS_ORACLE = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(*) FILTER (WHERE o_orderpriority < '3') AS BIGINT) AS n_pos,
  TRUE AS grad_converged,
  TRUE AS separation_ok
FROM orders
"""


def naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and
    scored entirely in SQL algebra — the canonical "ML as
    aggregation" query: class priors and per-(class, token) counts
    are one groupBy over the train split; scoring a held-out doc is
    a join + weighted log-sum; the whole model IS a DataFrame.

    Split is content-addressed (md5 bucket < 80 trains, repo-wide
    discipline), features are whitespace tokens (the ``text.py``
    token contract), smoothing is add-one over the train vocabulary,
    and unseen-vocab test tokens are dropped (standard MNB). Output
    is the confusion matrix actual x predicted.

    Determinism: per-class scores are ROUND(...,6) on both engines
    before the argmax, with the class name as tiebreak. (The
    synthetic corpus draws every lang from one shared vocabulary, so
    measured accuracy ~= the class prior — the oracle checks the
    *math*, not a modeling claim; on a real corpus the same query is
    the fastText-era language-ID baseline.)

    Scale: counts/priors are map-side-combinable aggregates; the
    class table (|langs| rows + broadcast scalars V, N) cross-joins
    the test tokens as a broadcast; the count join is an equi-join on
    (token, lang). The argmax window partitions by doc — never
    global. Nothing touches the driver.
    """
    docs = load_table(spark, "documents", sf_dir)
    bucket = F.expr(BUCKET)  # the ONE repo-wide bucket expression
    base = docs.select(
        "doc_id",
        "lang",
        F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
        bucket.alias("b"),
    )
    train = base.filter(F.col("b") < 80)
    test = base.filter(F.col("b") >= 80)

    ttok = train.select("lang", F.explode("toks").alias("token"))
    counts = ttok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    counts = counts.persist()  # reused: vocab, class totals, score join
    vocab = counts.select("token").distinct()

    # broadcast scalars: vocab size V, train doc count N
    stats = vocab.agg(F.count(F.lit(1)).alias("v")).crossJoin(
        train.agg(F.count(F.lit(1)).alias("n_docs"))
    )
    classes = (
        counts.groupBy("lang")
        .agg(F.sum("c").alias("tot"))
        .join(train.groupBy("lang").agg(F.count(F.lit(1)).alias("nd")), "lang")
        .crossJoin(F.broadcast(stats))
        .withColumnRenamed("lang", "cand")
    )

    tt = (
        test.select("doc_id", F.col("lang").alias("actual"), F.explode("toks").alias("token"))
        .join(vocab, "token")
        .groupBy("doc_id", "actual", "token")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    scored = (
        tt.crossJoin(F.broadcast(classes))
        .join(
            counts.withColumnRenamed("lang", "cand"),
            ["token", "cand"],
            "left",
        )
        .groupBy("doc_id", "actual", "cand", "nd", "tot", "v", "n_docs")
        .agg(
            F.sum(F.col("n_t") * F.log(F.coalesce(F.col("c"), F.lit(0)) + 1)).alias("s1"),
            F.sum("n_t").alias("nt"),
        )
        .select(
            "doc_id",
            "actual",
            "cand",
            F.round(
                F.log("nd")
                - F.log("n_docs")
                + F.col("s1")
                - F.col("nt") * F.log(F.col("tot") + F.col("v")),
                6,
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("actual", F.col("cand").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual", "predicted")
    )


NAIVE_BAYES_ORACLE = r"""
WITH base AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS b
  FROM documents
),
train_tok AS (
  SELECT lang, unnest(toks) AS token FROM base WHERE b < 80
),
counts AS (SELECT lang, token, COUNT(*) AS c FROM train_tok GROUP BY 1, 2),
vocab AS (SELECT DISTINCT token FROM counts),
stats AS (
  SELECT (SELECT COUNT(*) FROM vocab) AS v,
         (SELECT COUNT(*) FROM base WHERE b < 80) AS n_docs
),
classes AS (
  SELECT lang AS cand, CAST(SUM(c) AS BIGINT) AS tot FROM counts GROUP BY lang
),
class_docs AS (
  SELECT lang AS cand, COUNT(*) AS nd FROM base WHERE b < 80 GROUP BY lang
),
tt AS (
  SELECT doc_id, actual, token, COUNT(*) AS n_t
  FROM (
    SELECT doc_id, lang AS actual, unnest(toks) AS token
    FROM base WHERE b >= 80
  )
  WHERE token IN (SELECT token FROM vocab)
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT tt.doc_id, tt.actual, cl.cand,
    ROUND(
      ln(cd.nd) - ln(s.n_docs)
      + SUM(tt.n_t * ln(COALESCE(c.c, 0) + 1))
      - SUM(tt.n_t) * ln(cl.tot + s.v), 6) AS score
  FROM tt
  CROSS JOIN classes cl
  JOIN class_docs cd ON cd.cand = cl.cand
  CROSS JOIN stats s
  LEFT JOIN counts c ON c.token = tt.token AND c.lang = cl.cand
  GROUP BY tt.doc_id, tt.actual, cl.cand, cd.nd, cl.tot, s.n_docs, s.v
),
pred AS (
  SELECT doc_id, actual, cand,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rk
  FROM scored
)
SELECT actual, cand AS predicted, COUNT(*) AS n_docs
FROM pred WHERE rk = 1
GROUP BY 1, 2
ORDER BY actual, predicted
"""


def ols_cv_sufficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated simple OLS (l_extendedprice ~
    l_quantity) where the ENTIRE CV is one aggregation pass: per-fold
    sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²) are computed
    once; each fold's TRAIN stats are total − fold (sufficient
    statistics are subtractable), the fit is closed-form, and the
    held-out RMSE expands algebraically from the same fold stats:
    SSE_f = Σy² − 2aΣy − 2bΣxy + 2abΣx + a²n + b²Σx².

    This is the scale-defining trick for linear-model selection at
    100 TB: k-fold CV costs ONE scan + O(k) driver-free algebra on a
    k-row frame — not k training scans. Folds are keyed on the
    lineitem PK through a Lehmer (multiplicative-congruential) step —
    pure 64-bit integer arithmetic both engines evaluate identically,
    so membership is engine- and partitioning-independent like the
    md5 discipline but ~7x cheaper per row (measured at 10x: the md5
    fold derivation was 85% of this query's runtime; fold balance
    under the Lehmer map is within ±0.06% of n/5). md5 stays the
    choice for the sampling family, where decisions must be keyed on
    CONTENT; a CV fold only needs a fixed, well-mixed partition of
    the key space.
    """
    li = load_table(spark, "lineitem", sf_dir)
    # ((k % M) * 48271) % M is full-period for M = 2^31-1 (MINSTD);
    # the multiply peaks below 2^47 so BIGINT arithmetic is exact on
    # both engines. l_linenumber breaks ties within an order.
    fold = (
        (
            (F.col("l_orderkey") % 2147483647) * 48271 % 2147483647
            + F.col("l_linenumber")
        )
        % 5
    ).cast("int")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    stats = li.select(fold.alias("fold"), x.alias("x"), y.alias("y")).groupBy(
        "fold"
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    totals = stats.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    j = stats.crossJoin(F.broadcast(totals))
    ntr = F.col("tn") - F.col("n")
    sxtr = F.col("tsx") - F.col("sx")
    sytr = F.col("tsy") - F.col("sy")
    sxxtr = F.col("tsxx") - F.col("sxx")
    sxytr = F.col("tsxy") - F.col("sxy")
    # try_divide: a zero-variance training fold (constant x) zeroes
    # the slope denominator — NULL fit, matching DuckDB's double/0
    # semantics; NULL then propagates through a/sse/test_rmse on both
    # engines identically
    b = F.try_divide(ntr * sxytr - sxtr * sytr, ntr * sxxtr - sxtr * sxtr)
    a = F.try_divide(sytr - b * sxtr, ntr)
    sse = (
        F.col("syy")
        - 2 * a * F.col("sy")
        - 2 * b * F.col("sxy")
        + 2 * a * b * F.col("sx")
        + a * a * F.col("n")
        + b * b * F.col("sxx")
    )
    # clamp float-cancellation negatives before sqrt: Spark would give
    # NaN but DuckDB sqrt(negative) is a hard error; CASE (not
    # GREATEST) so NULL sse still propagates as NULL on both engines
    msr = sse / F.col("n")
    return j.select(
        "fold",
        # FLOOR(x + 0.5) on both engines: Spark's cast-to-long truncates
        # while DuckDB's CAST(double AS BIGINT) rounds to nearest — bare
        # casts only agree on exactly-integral doubles
        F.floor(ntr + F.lit(0.5)).alias("n_train"),
        F.floor(F.col("n") + F.lit(0.5)).alias("n_test"),
        F.round(b, 6).alias("slope"),
        F.round(a, 6).alias("intercept"),
        F.round(
            F.sqrt(F.when(msr < 0, F.lit(0.0)).otherwise(msr)), 6
        ).alias("test_rmse"),
    ).orderBy("fold")


OLS_CV_ORACLE = """
WITH s AS (
  SELECT
    CAST(((l_orderkey % 2147483647) * 48271 % 2147483647
      + l_linenumber) % 5 AS INTEGER) AS fold,
    CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(l_quantity) AS sx,
    SUM(l_extendedprice) AS sy,
    SUM(l_quantity * l_quantity) AS sxx,
    SUM(l_quantity * l_extendedprice) AS sxy,
    SUM(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
  GROUP BY 1
),
t AS (
  SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
         SUM(sxx) AS tsxx, SUM(sxy) AS tsxy
  FROM s
),
fit AS (
  SELECT s.fold, s.n, s.sx, s.sy, s.sxx, s.sxy, s.syy,
    (t.tn - s.n) AS ntr, (t.tsx - s.sx) AS sxtr, (t.tsy - s.sy) AS sytr,
    (t.tsxx - s.sxx) AS sxxtr, (t.tsxy - s.sxy) AS sxytr
  FROM s CROSS JOIN t
),
ab AS (
  SELECT fold, n, sx, sy, sxx, sxy, syy, ntr,
    (ntr * sxytr - sxtr * sytr)
      / NULLIF(ntr * sxxtr - sxtr * sxtr, 0) AS b,
    (sytr - (ntr * sxytr - sxtr * sytr)
      / NULLIF(ntr * sxxtr - sxtr * sxtr, 0) * sxtr)
      / NULLIF(ntr, 0) AS a
  FROM fit
),
msr AS (
  SELECT fold, ntr, n, b, a,
    (syy - 2 * a * sy - 2 * b * sxy + 2 * a * b * sx
     + a * a * n + b * b * sxx) / n AS m
  FROM ab
)
SELECT fold,
  CAST(FLOOR(ntr + 0.5) AS BIGINT) AS n_train,
  CAST(FLOOR(n + 0.5) AS BIGINT) AS n_test,
  ROUND(b, 6) AS slope,
  ROUND(a, 6) AS intercept,
  ROUND(sqrt(CASE WHEN m < 0 THEN 0 ELSE m END), 6) AS test_rmse
FROM msr
ORDER BY fold
"""


def decision_stump_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a depth-1 decision tree (best Gini split of
    l_quantity predicting returnflag == 'R') as pure relational
    algebra — the third "ML as aggregation" entry after Naive Bayes
    and the sufficient-statistic CV: class counts per distinct
    feature value, cumulative (left-of-split) counts via ONE
    two-stage prefix-sum with both counters bit-packed into a single
    bigint (the KS/Mann-Whitney skeleton), weighted Gini per
    candidate threshold, argmin by rounded impurity with threshold
    tiebreak.

    This is one boosting-round / tree-node inner loop of every
    GBDT library, shown as a single scan + value-level rollup: the
    candidate evaluation never touches rows again — it runs over the
    ~50-row distinct-value frame.

    Range contract (same as :func:`ks_two_sample`): the bit-packed
    counter is exact while the TOTAL row count is < 2^32 and the
    class-1 count is < 2^31 (the low field would otherwise carry into
    the high field silently). Beyond that — a full 100 TB fact table
    can exceed 4B rows — run the same skeleton with two separate
    prefix-sum columns (2 shuffles of the same tiny rollup) instead
    of the packed single column.
    """
    from backend_model_spark.operators.scale_utils import with_global_rank

    li = load_table(spark, "lineitem", sf_dir)
    rollup = (
        li.select(
            # FLOOR(x + 0.5): truncate-vs-round cast parity (see ols_cv)
            F.floor(F.col("l_quantity") + F.lit(0.5)).alias("x"),
            (F.col("l_returnflag") == "R").cast("long").alias("is1"),
        )
        .groupBy("x")
        .agg(F.sum("is1").alias("n1v"), F.count(F.lit(1)).alias("ntv"))
        .withColumn("packed", F.col("n1v") * F.lit(4294967296) + F.col("ntv"))
    )
    ranked = with_global_rank(
        rollup,
        [F.col("x").asc()],
        "rk",
        prefix_sum=("packed", "cum"),
        grand_total=("packed", "gt"),
    )
    cl = F.expr("cum DIV 4294967296").cast("double")   # class-1 left of split
    ct = (F.col("cum") % F.lit(4294967296)).cast("double")  # total left
    N1 = F.expr("gt DIV 4294967296").cast("double")
    N = (F.col("gt") % F.lit(4294967296)).cast("double")
    cr, tr = N1 - cl, N - ct
    gini_l = 1.0 - (cl / ct) * (cl / ct) - ((ct - cl) / ct) * ((ct - cl) / ct)
    gini_r = 1.0 - (cr / tr) * (cr / tr) - ((tr - cr) / tr) * ((tr - cr) / tr)
    weighted = ct / N * gini_l + tr / N * gini_r
    base = 1.0 - (N1 / N) * (N1 / N) - ((N - N1) / N) * ((N - N1) / N)
    cands = ranked.filter(F.col("cum") != F.col("gt")).select(  # split keeps both sides non-empty
        F.col("x").alias("threshold"),
        F.round(weighted, 9).alias("gini_split"),
        F.round(base, 9).alias("gini_base"),
        N.cast("long").alias("n_rows"),
    )
    return cands.orderBy("gini_split", "threshold").limit(1)


DECISION_STUMP_ORACLE = """
WITH rollup AS (
  SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
    COUNT(*) AS ntv
  FROM lineitem
  GROUP BY 1
),
cum AS (
  SELECT x,
    CAST(SUM(n1v) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cl,
    CAST(SUM(ntv) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS ct
  FROM rollup
),
tot AS (
  SELECT CAST(SUM(n1v) AS DOUBLE) AS n1, CAST(SUM(ntv) AS DOUBLE) AS n
  FROM rollup
),
cands AS (
  SELECT c.x AS threshold,
    ROUND(
      c.ct / t.n * (1.0 - (c.cl / c.ct) * (c.cl / c.ct)
        - ((c.ct - c.cl) / c.ct) * ((c.ct - c.cl) / c.ct))
      + (t.n - c.ct) / t.n * (1.0 - ((t.n1 - c.cl) / (t.n - c.ct)) * ((t.n1 - c.cl) / (t.n - c.ct))
        - (((t.n - c.ct) - (t.n1 - c.cl)) / (t.n - c.ct)) * (((t.n - c.ct) - (t.n1 - c.cl)) / (t.n - c.ct))),
      9) AS gini_split,
    ROUND(1.0 - (t.n1 / t.n) * (t.n1 / t.n)
      - ((t.n - t.n1) / t.n) * ((t.n - t.n1) / t.n), 9) AS gini_base,
    CAST(t.n AS BIGINT) AS n_rows
  FROM cum c CROSS JOIN tot t
  WHERE c.ct <> t.n
)
SELECT threshold, gini_split, gini_base, n_rows
FROM cands
ORDER BY gini_split, threshold
LIMIT 1
"""


FEATURE_CUTOFF = "1996-01-01"


def feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature-store materialization — the engine-side
    twin of the reference's feature-matrix construction (its pandas
    pipeline engineers per-listing features before modeling;
    `Reordered - Feature Matrix.csv`): per-customer behavioral
    features computed strictly from orders BEFORE the cutoff date (no
    label leakage — the property that makes a feature store
    trustworthy), left-joined onto the full customer dimension so
    cold-start customers appear with empty history, reported as
    per-segment feature means.

    Scale: one pushed-down date-filtered scan of orders, one
    map-side-combinable per-customer rollup, one shuffle join onto
    customers (AQE-planned), one segment rollup. The cutoff filter
    reaches the parquet scan (PushedFilters), so a 100 TB history
    prunes to the training horizon before anything else runs.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit(FEATURE_CUTOFF).cast("date")
    )
    hist = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("spend_cents"),
        F.datediff(
            F.lit(FEATURE_CUTOFF).cast("date"), F.max("o_orderdate")
        ).alias("recency_days"),
    )
    feats = cust.join(
        hist, cust.c_custkey == hist.o_custkey, "left"
    ).select(
        "c_mktsegment",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("spend_cents"), F.lit(0)).alias("spend_cents"),
        "recency_days",
    )
    return (
        feats.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum((F.col("n_orders") > 0).cast("long")).alias("n_with_history"),
            F.round(F.avg("n_orders"), 6).alias("mean_orders"),
            F.round(F.avg("spend_cents"), 6).alias("mean_spend_cents"),
            F.round(F.avg("recency_days"), 6).alias("mean_recency_days"),
        )
        .orderBy("c_mktsegment")
    )


FEATURE_STORE_ORACLE = f"""
WITH hist AS (
  SELECT o_custkey,
    COUNT(*) AS n_orders,
    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS spend_cents,
    date_diff('day', MAX(o_orderdate), DATE '{FEATURE_CUTOFF}')
      AS recency_days
  FROM orders
  WHERE o_orderdate < DATE '{FEATURE_CUTOFF}'
  GROUP BY o_custkey
),
feats AS (
  SELECT c.c_mktsegment,
    COALESCE(h.n_orders, 0) AS n_orders,
    COALESCE(h.spend_cents, 0) AS spend_cents,
    h.recency_days
  FROM customer c LEFT JOIN hist h ON c.c_custkey = h.o_custkey
)
SELECT c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(SUM(CASE WHEN n_orders > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_with_history,
  ROUND(AVG(n_orders), 6) AS mean_orders,
  ROUND(AVG(spend_cents), 6) AS mean_spend_cents,
  ROUND(AVG(recency_days), 6) AS mean_recency_days
FROM feats
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


RIDGE_LAMBDA = 10.0


def ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ridge regression (l_extendedprice ~ l_quantity +
    l_discount, penalty RIDGE_LAMBDA on the non-intercept diagonal)
    solved in CLOSED FORM inside the query: one aggregation pass
    collects the 9 sufficient statistics, the 3x3 normal equations
    (X'X + lambda*I) beta = X'y are solved by Cramer's rule —
    determinants are polynomials in the sums, so the whole fit is a
    single SELECT over a one-row frame. Train RMSE expands
    algebraically from the same sums. The multivariate sibling of
    `ml_linear_fit_closed_form` (1 feature) and `ml_logistic_irls`
    (driver-solved Newton): this one needs NO driver round-trip at
    all.

    Scale: ONE map-side-combinable scan at any data size; everything
    after is arithmetic on nine numbers.
    """
    li = load_table(spark, "lineitem", sf_dir)
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum(y * y).alias("syy"),
    )
    lam = F.lit(RIDGE_LAMBDA)
    a11, a12, a13 = F.col("n"), F.col("s1"), F.col("s2")
    a22 = F.col("s11") + lam
    a23 = F.col("s12")
    a33 = F.col("s22") + lam
    b1, b2, b3 = F.col("sy"), F.col("s1y"), F.col("s2y")

    def det3(c1, c2, c3):
        # columns are (top, mid, bot) triples of the symmetric system
        (p, q, r), (t, u, v), (w, x_, z) = c1, c2, c3
        return p * (u * z - v * x_) - t * (q * z - r * x_) + w * (q * v - r * u)

    colA = (a11, a12, a13)
    colB = (a12, a22, a23)
    colC = (a13, a23, a33)
    colY = (b1, b2, b3)
    # try_divide: the ridge system is non-singular for λ>0 on any
    # non-empty data, but a pathological all-zero frame still zeroes
    # det — NULL betas (matching the oracle's NULLIF), not a crash
    det = det3(colA, colB, colC)
    beta0 = F.try_divide(det3(colY, colB, colC), det)
    beta1 = F.try_divide(det3(colA, colY, colC), det)
    beta2 = F.try_divide(det3(colA, colB, colY), det)
    sse = (
        F.col("syy")
        - 2 * (beta0 * b1 + beta1 * b2 + beta2 * b3)
        + beta0 * beta0 * F.col("n")
        + beta1 * beta1 * F.col("s11")
        + beta2 * beta2 * F.col("s22")
        + 2 * beta0 * beta1 * F.col("s1")
        + 2 * beta0 * beta2 * F.col("s2")
        + 2 * beta1 * beta2 * F.col("s12")
    )
    # clamp float-cancellation negatives before sqrt (sse ≈ 0 on
    # degenerate/near-perfect fits; DuckDB sqrt(negative) is a hard
    # error, Spark a NaN) — same CASE text on both engines
    msr = sse / F.col("n")
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(beta0, 6).alias("intercept"),
        F.round(beta1, 6).alias("b_quantity"),
        F.round(beta2, 6).alias("b_discount"),
        F.round(
            F.sqrt(F.when(msr < 0, F.lit(0.0)).otherwise(msr)), 6
        ).alias("train_rmse"),
    )


RIDGE_ORACLE = f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
    SUM(l_quantity) AS s1, SUM(l_discount) AS s2, SUM(l_extendedprice) AS sy,
    SUM(l_quantity * l_quantity) AS s11,
    SUM(l_discount * l_discount) AS s22,
    SUM(l_quantity * l_discount) AS s12,
    SUM(l_quantity * l_extendedprice) AS s1y,
    SUM(l_discount * l_extendedprice) AS s2y,
    SUM(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
),
m AS (
  SELECT n, s1, s2, sy, s11, s22, s12, s1y, s2y, syy,
    s11 + {RIDGE_LAMBDA} AS a22, s22 + {RIDGE_LAMBDA} AS a33
  FROM s
),
d AS (
  SELECT *,
    n * (a22 * a33 - s12 * s12) - s1 * (s1 * a33 - s2 * s12)
      + s2 * (s1 * s12 - s2 * a22) AS det,
    sy * (a22 * a33 - s12 * s12) - s1y * (s1 * a33 - s2 * s12)
      + s2y * (s1 * s12 - s2 * a22) AS det0,
    n * (s1y * a33 - s2y * s12) - s1 * (sy * a33 - s2 * s2y)
      + s2 * (sy * s12 - s2 * s1y) AS det1,
    n * (a22 * s2y - s12 * s1y) - s1 * (s1 * s2y - sy * s12)
      + s2 * (s1 * s1y - sy * a22) AS det2
  FROM m
),
fit AS (
  SELECT *,
    det0 / NULLIF(det, 0) AS b0,
    det1 / NULLIF(det, 0) AS b1,
    det2 / NULLIF(det, 0) AS b2
  FROM d
),
msr AS (
  SELECT n, b0, b1, b2,
    (syy - 2 * (b0 * sy + b1 * s1y + b2 * s2y)
     + b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22
     + 2 * b0 * b1 * s1 + 2 * b0 * b2 * s2 + 2 * b1 * b2 * s12) / n AS m
  FROM fit
)
SELECT CAST(n AS BIGINT) AS n,
  ROUND(b0, 6) AS intercept,
  ROUND(b1, 6) AS b_quantity,
  ROUND(b2, 6) AS b_discount,
  ROUND(sqrt(CASE WHEN m < 0 THEN 0 ELSE m END), 6) AS train_rmse
FROM msr
"""


# ---------------------------------------------------------------------------
# K-fold target encoding — leakage-safe categorical featurization
# ---------------------------------------------------------------------------

TE_FOLDS = 5
TE_SMOOTHING = 10  # pseudo-observations of the global prior

# shared encoding algebra (identical text in F.expr and oracle SQL):
# out-of-fold smoothed mean in cents — ((Σ_cat − Σ_cat,fold) +
# m·prior) / ((n_cat − n_cat,fold) + m), prior = global mean. All
# inputs are exact BIGINTs; the two divisions are the only doubles.
TE_ENC = (
    "floor((( (cat_sum - fold_sum) + {m} * (g_sum / cast(g_n as double)) )"
    " / cast((cat_n - fold_n) + {m} as double)) * 1e6 + 0.5) / 1e6"
).format(m=TE_SMOOTHING)


def target_encode_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold target encoding of a categorical feature (customer
    nation) against an integer-cents target (order totalprice) — the
    leakage-safe featurization a model pipeline applies to
    high-cardinality categoricals (the reference's label encoding,
    SURVEY §2.7 E1, is its unsupervised cousin; target encoding is
    what replaces it when the category carries signal). Each fold's
    rows are encoded with the mean computed from the OTHER folds only
    (so a row never sees its own target), smoothed toward the global
    prior with TE_SMOOTHING pseudo-observations (the Micci-Barreca
    formulation).

    Determinism: folds are content-addressed (md5(orderkey) % K —
    reproducible across engines and partitionings, the repo's
    sampling discipline); all sufficient statistics are exact BIGINT
    cent sums; the encoding is the shared expression text above.

    Scale: ONE scan of the fact (broadcast dim join for the
    category), ONE map-side-combinable groupBy on (category, fold) —
    |categories|·K rows — then everything (per-category totals, the
    global prior, the out-of-fold algebra) derives from that tiny
    persisted frame. Encoding a trillion-row fact costs one shuffle
    of |categories|·K pre-aggregated rows.
    """
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    fact = orders.select(
        "o_custkey",
        F.expr(
            f"cast(conv(substring(md5(cast(o_orderkey as string)), 1, 4),"
            f" 16, 10) % {TE_FOLDS} as int)"
        ).alias("fold"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    ).join(F.broadcast(cust), "o_custkey")
    cells = (
        fact.groupBy("c_nationkey", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("fold_n"),
            F.sum("cents").cast("bigint").alias("fold_sum"),
        )
        .persist()  # |nations|·K rows; feeds totals, prior, and output
    )
    cat_totals = cells.groupBy("c_nationkey").agg(
        F.sum("fold_n").cast("bigint").alias("cat_n"),
        F.sum("fold_sum").cast("bigint").alias("cat_sum"),
    )
    from backend_model_spark.operators.scale_utils import broadcast_scalars

    g = cells.agg(
        F.sum("fold_n").cast("bigint").alias("g_n"),
        F.sum("fold_sum").cast("bigint").alias("g_sum"),
    )
    out = broadcast_scalars(cells.join(cat_totals, "c_nationkey"), g)
    return out.select(
        "c_nationkey",
        "fold",
        "fold_n",
        F.expr(TE_ENC).alias("enc_cents"),
    ).orderBy("c_nationkey", "fold")


TARGET_ENCODE_ORACLE = f"""
WITH fact AS (
  SELECT c.c_nationkey,
    CAST(CAST('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 4) AS BIGINT) % {TE_FOLDS} AS INTEGER) AS fold,
    CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT c_nationkey, fold,
    CAST(COUNT(*) AS BIGINT) AS fold_n,
    CAST(SUM(cents) AS BIGINT) AS fold_sum
  FROM fact GROUP BY 1, 2
),
cat_totals AS (
  SELECT c_nationkey,
    CAST(SUM(fold_n) AS BIGINT) AS cat_n,
    CAST(SUM(fold_sum) AS BIGINT) AS cat_sum
  FROM cells GROUP BY 1
),
g AS (
  SELECT CAST(SUM(fold_n) AS BIGINT) AS g_n,
    CAST(SUM(fold_sum) AS BIGINT) AS g_sum
  FROM cells
)
SELECT cells.c_nationkey, cells.fold, cells.fold_n,
  {TE_ENC} AS enc_cents
FROM cells JOIN cat_totals USING (c_nationkey) CROSS JOIN g
ORDER BY cells.c_nationkey, cells.fold
"""
