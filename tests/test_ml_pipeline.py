"""MLlib pipeline + tuning tests (SURVEY.md §5 item 3): E2E smoke with
finite MAE, better-than-baseline sanity, and deterministic tuning
selection under a fixed seed."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from backend_model_spark.ml import cleaning, tuning
from backend_model_spark.ml.fixtures import generate_listings, to_spark
from backend_model_spark.ml.pipeline import train_and_evaluate


@pytest.fixture(scope="module")
def splits(spark):
    train_pdf, test_pdf, _ = generate_listings(n_rows=2000)
    cleaned = cleaning.clean_listings(
        to_spark(spark, train_pdf), to_spark(spark, test_pdf)
    )
    train, valid = cleaned.randomSplit([0.8, 0.2], seed=42)
    return train.cache(), valid.cache()


def test_e2e_train_predict_smoke(splits):
    train, valid = splits
    result = train_and_evaluate(train, valid, model="linear")
    assert result.mae == result.mae  # finite, not NaN
    assert result.mae > 0
    # sanity: beat a degenerate always-mean predictor on MAE
    mean_price = train.agg(F.avg("price")).collect()[0][0]
    baseline_mae = (
        valid.select(F.abs(F.col("price") - F.lit(mean_price)).alias("ae"))
        .agg(F.avg("ae"))
        .collect()[0][0]
    )
    assert result.mae <= baseline_mae * 1.05


@pytest.mark.parametrize("scaler", ["normalizer", "binarizer", "minmax", "none"])
def test_e3_scaler_stages_e2e(splits, scaler):
    """E3 finish: every scaler the reference imports (Normalizer,
    Binarizer, plus MinMax/none) must run e2e through fit → transform
    → evaluate with a finite MAE."""
    train, valid = splits
    result = train_and_evaluate(train, valid, model="linear", scaler=scaler)
    assert result.mae == result.mae and result.mae > 0


def test_ordinal_indexer_alphabetical_codes(spark):
    """OrdinalEncoder equivalent: codes follow sklearn's alphabetical
    category order, not MLlib's default frequency order."""
    from pyspark.ml import Pipeline

    from backend_model_spark.ml.pipeline import ordinal_indexer

    df = spark.createDataFrame(
        [("delta", "y"), ("alpha", "n"), ("carol", "y"), ("alpha", "y")],
        "city string, flag string",
    )
    fitted = Pipeline(stages=ordinal_indexer(["city", "flag"])).fit(df)
    out = {
        (r["city"], r["flag"]): (r["city_ord"], r["flag_ord"])
        for r in fitted.transform(df).collect()
    }
    # alphabetical: alpha=0, carol=1, delta=2 even though alpha is most frequent
    assert out[("alpha", "y")] == (0.0, 1.0)
    assert out[("carol", "y")] == (1.0, 1.0)
    assert out[("delta", "y")] == (2.0, 1.0)
    assert out[("alpha", "n")] == (0.0, 0.0)


def test_grid_search_selects_deterministically(splits):
    train, _ = splits
    cv1 = tuning.grid_search_linear(train, n_folds=2)
    cv2 = tuning.grid_search_linear(train, n_folds=2)
    best1 = cv1.bestModel.stages[-1]
    best2 = cv2.bestModel.stages[-1]
    assert best1.getRegParam() == best2.getRegParam()
    assert best1.getElasticNetParam() == best2.getElasticNetParam()


def test_tpe_beats_random_search_at_equal_budget():
    """The M4 contract: the TPE surrogate (good/bad Parzen split,
    density-ratio argmax) must out-optimize uniform random search at
    the same trial budget. Synthetic deterministic objective with its
    minimum inside SPACE — no Spark fits, so 5 seeds × 20 trials is
    instant and the comparison is seed-for-seed fair."""

    def objective(p):
        return (
            (p["maxDepth"] - 4) ** 2 * 2.0
            + (p["maxIter"] - 22) ** 2 / 20.0
            + 80.0 * (p["stepSize"] - 0.12) ** 2
        )

    seeds = range(5)
    tpe = [tuning.tpe_search(objective, 20, n_explore=4, seed=s).best_mae for s in seeds]
    rnd = [tuning.random_search(objective, 20, seed=s).best_mae for s in seeds]
    assert sum(tpe) < sum(rnd), (tpe, rnd)
    # and not by luck of one seed: TPE wins pointwise on a majority
    wins = sum(1 for a, b in zip(tpe, rnd) if a <= b)
    assert wins >= 3, (tpe, rnd)


def test_tpe_deterministic_under_seed():
    def objective(p):
        return (p["maxDepth"] - 3) ** 2 + p["stepSize"]

    a = tuning.tpe_search(objective, 12, seed=7)
    b = tuning.tpe_search(objective, 12, seed=7)
    assert a.best_params == b.best_params
    assert a.best_mae == b.best_mae
    assert [t.params for t in a.trials] == [t.params for t in b.trials]


def test_bayesian_loop_deterministic_and_improving(splits):
    train, valid = splits
    r1 = tuning.bayesian_optimize_gbt(train, valid, n_trials=4, n_explore=2)
    r2 = tuning.bayesian_optimize_gbt(train, valid, n_trials=4, n_explore=2)
    assert r1.best_params == r2.best_params
    assert r1.best_mae == pytest.approx(r2.best_mae)
    assert len(r1.trials) == 4
    assert r1.best_mae == min(t.mae for t in r1.trials)


# ---------------------------------------------------------------------------
# Batch MLP inference (ml/mlp.py): numpy parity, accuracy, plan shape
# ---------------------------------------------------------------------------


def test_mlp_spark_matches_numpy_exactly(spark, sf_dir):
    """The JVM-expression scoring path must equal the pure-numpy
    forward pass BIT-FOR-BIT (the dyadic-grid exactness contract),
    row by row."""
    import numpy as np
    import pyarrow.parquet as pq

    from backend_model_spark.ml import mlp

    out = (
        mlp.mlp_batch_inference(spark, sf_dir)
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )

    t = (
        pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                     "l_tax", "l_extendedprice"],
        )
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    X = np.stack(
        [
            np.floor(t["l_extendedprice"].to_numpy() / 1000.0),
            np.floor(t["l_discount"].to_numpy() * 100 + 0.5),
            np.floor(t["l_tax"].to_numpy() * 100 + 0.5),
            np.floor(t["l_quantity"].to_numpy() + 0.5),
        ],
        axis=1,
    )
    expect = mlp.predict_cents(X)
    assert (out["pred_price_cents"].to_numpy() == expect).all()


def test_mlp_requantization_keeps_values_exact():
    """Adversarial inputs at the feature-range extremes: every
    intermediate must stay an exact binary fraction (magnitude * 2^16
    below 2^53), so forward_numpy run twice — once via BLAS matmul,
    once via explicit per-unit python sums in REVERSED order — must
    agree exactly. Catches any future weight/architecture change that
    silently leaves the exact regime."""
    import itertools

    import numpy as np

    from backend_model_spark.ml import mlp

    corners = np.array(
        [p for p in itertools.product([0, 105], [0, 10], [0, 8], [1, 50])],
        dtype=np.float64,
    )
    blas = mlp.forward_numpy(corners)

    w = mlp.weight_arrays()

    def slow_forward(x):
        def layer(a, W, B):
            out = []
            for j in range(W.shape[1]):
                s = 0.0
                for i in reversed(range(W.shape[0])):  # reversed sum order
                    s += a[i] * W[i, j]
                out.append((s + B[j]) / 256.0)
            return np.array(out)

        def act(z):
            a = np.where(z >= 0, z, 0.25 * z)
            return np.floor(a * 256.0) / 256.0

        a1 = act(layer(x, w["W1"], w["B1"]))
        a2 = act(layer(a1, w["W2"], w["B2"]))
        return layer(a2, w["W3"], w["B3"])[0]

    slow = np.array([slow_forward(x) for x in corners])
    assert (blas == slow).all(), "summation order changed the result: not exact"


def test_mlp_beats_mean_baseline(sf_dir):
    """Deployed (quantized) accuracy: the model must explain most of
    the charge variance — RMSE well under the predict-the-mean
    baseline, or the serving path is shipping a broken model.
    Computed row-aligned in numpy (the Spark path is proven
    bit-identical by test_mlp_spark_matches_numpy_exactly; a key join
    would mispair rows — (l_orderkey, l_linenumber) is NOT unique in
    the synthetic data)."""
    import numpy as np
    import pyarrow.parquet as pq

    from backend_model_spark.ml import mlp

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    ).to_pandas()
    price = t["l_extendedprice"].to_numpy()
    X = np.stack(
        [
            np.floor(price / 1000.0),
            np.floor(t["l_discount"].to_numpy() * 100 + 0.5),
            np.floor(t["l_tax"].to_numpy() * 100 + 0.5),
            np.floor(t["l_quantity"].to_numpy() + 0.5),
        ],
        axis=1,
    )
    y = price * (1 - t["l_discount"].to_numpy()) * (1 + t["l_tax"].to_numpy())
    pred = mlp.predict_cents(X) / 100.0
    rmse = np.sqrt(((pred - y) ** 2).mean())
    base = y.std()
    assert rmse < 0.2 * base, f"deployed RMSE {rmse:.1f} vs baseline {base:.1f}"


def test_mlp_plan_is_shuffle_free_arrow_stage(spark, sf_dir):
    """Serving must be a narrow map pipeline: one Arrow-batched python
    stage, ZERO exchanges — at 100 TB the scoring cost is a linear
    scan, never a shuffle. (mapInPandas is the MEASURED winner over
    the pure-expression path: the fused codegen method exceeds the
    JIT compile limit and runs interpreted — SCALE.md round 6.)"""
    from backend_model_spark.ml import mlp

    df = mlp.mlp_batch_inference(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "Exchange" not in plan, "batch inference must not shuffle"


def test_forward_expr_bit_identical_to_numpy(spark, sf_dir):
    """The Catalyst expression twin (forward_expr — the exact text the
    DuckDB oracle runs) must match the shipping numpy path
    BIT-FOR-BIT on real feature rows: this is what certifies the
    oracle's semantics against the serving implementation.  Also pins
    the 256e0 double-literal rule — with 256.0, Spark's
    DECIMAL-division path silently truncates scale and ±1-cent
    diffs appear."""
    import numpy as np

    from backend_model_spark.ml import mlp

    feats = (
        mlp.load_table(spark, "lineitem", sf_dir)
        .selectExpr(
            "CAST(FLOOR(l_extendedprice / 1000.0) AS DOUBLE) x1",
            "CAST(FLOOR(l_discount * 100 + 0.5) AS DOUBLE) x2",
            "CAST(FLOOR(l_tax * 100 + 0.5) AS DOUBLE) x3",
            "CAST(FLOOR(l_quantity + 0.5) AS DOUBLE) x4",
        )
    )
    out = mlp.forward_expr(
        feats,
        mlp.QW1, mlp.QB1, mlp.QW2, mlp.QB2, mlp.QW3, mlp.QB3,
        "0.25",
        ["x1", "x2", "x3", "x4"],
    ).selectExpr(
        "x1", "x2", "x3", "x4",
        "CAST(FLOOR(y0 * 100.0 + 0.5) AS BIGINT) AS pred",
    ).toPandas()
    X = out[["x1", "x2", "x3", "x4"]].to_numpy(np.float64)
    assert (out["pred"].to_numpy() == mlp.predict_cents(X)).all()


def test_mlp_model_b_requantization_exact():
    """Model B (slope 0.5, wider layers) must live in the same exact
    dyadic regime as model A: BLAS matmul vs reversed-order python
    sums agree bit-for-bit at the feature-range corners."""
    import itertools

    import numpy as np

    from backend_model_spark.ml import mlp

    corners = np.array(
        [p for p in itertools.product([0, 105], [0, 10], [0, 8], [1, 50])],
        dtype=np.float64,
    )
    w = mlp.weight_arrays_b()
    blas = mlp.forward_numpy(corners, w, leaky=mlp.LEAKY_B)

    def slow_forward(x):
        def layer(a, W, B):
            out = []
            for j in range(W.shape[1]):
                s = 0.0
                for i in reversed(range(W.shape[0])):
                    s += a[i] * W[i, j]
                out.append((s + B[j]) / 256.0)
            return np.array(out)

        def act(z):
            a = np.where(z >= 0, z, 0.5 * z)
            return np.floor(a * 256.0) / 256.0

        a1 = act(layer(x, w["W1"], w["B1"]))
        a2 = act(layer(a1, w["W2"], w["B2"]))
        return layer(a2, w["W3"], w["B3"])[0]

    slow = np.array([slow_forward(x) for x in corners])
    assert (blas == slow).all(), "model B left the exact regime"


def test_mlp_model_compare_matches_numpy(spark, sf_dir):
    """The one-scan champion-challenger rollup must equal a direct
    numpy evaluation of both nets: same n, RMSE, MAE and signed bias
    per model (integer-exact diffs, one rounded divide at the edge)."""
    import numpy as np
    import pyarrow.parquet as pq

    from backend_model_spark.ml import mlp

    rows = {r.model: r for r in mlp.mlp_model_compare(spark, sf_dir).collect()}
    assert set(rows) == {"grid", "bayes"}

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    ).to_pandas()
    price_c = np.floor(t["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    disc = np.floor(t["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
    tax = np.floor(t["l_tax"].to_numpy() * 100 + 0.5).astype(np.int64)
    charge_e4 = price_c * (100 - disc) * (100 + tax)
    X = np.stack(
        [
            np.floor(t["l_extendedprice"].to_numpy() / 1000.0),
            disc.astype(np.float64),
            tax.astype(np.float64),
            np.floor(t["l_quantity"].to_numpy() + 0.5),
        ],
        axis=1,
    )
    def half_away(x):  # Spark's ROUND(, 2) semantics, not python's half-even
        return np.sign(x) * np.floor(abs(x) * 100 + 0.5) / 100

    for model, w, slope in [
        ("grid", mlp.weight_arrays(), mlp.LEAKY),
        ("bayes", mlp.weight_arrays_b(), mlp.LEAKY_B),
    ]:
        d = mlp.predict_cents(X, w, slope) * 10000 - charge_e4
        n = len(d)
        r = rows[model]
        assert r.n == n
        assert r.rmse_cents == half_away(
            float(np.sqrt((d.astype(np.float64) ** 2).mean())) / 10000.0
        )
        assert r.mae_cents == half_away(float(np.abs(d).sum()) / n / 10000.0)
        assert r.bias_cents == half_away(float(d.sum()) / n / 10000.0)
    # the bayes model should win on this task (it did at training time;
    # if a retrain flips this, the comparison op is still correct — the
    # assertion documents the shipped pair)
    assert rows["bayes"].rmse_cents < rows["grid"].rmse_cents


def test_mlp_compare_plan_single_small_aggregate_exchange(spark, sf_dir):
    """Champion-challenger must stay a narrow map pipeline: one
    MapInPandas stage scoring BOTH nets, partial aggregation below the
    single exchange (which moves 2 keys x |mappers| pre-aggregated
    rows, never scored rows), and no join anywhere."""
    from backend_model_spark.ml import mlp

    df = mlp.mlp_model_compare(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # formatted plans print each node twice (tree + numbered detail)
    assert plan.count("MapInPandas") == 2, "both nets must share ONE python stage"
    assert "Join" not in plan, "actual-charge must ride along, not join back"
    import re

    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)
    assert len(exchanges) <= 2, f"only the 2-row aggregate (+sort) may shuffle: {exchanges}"
    assert "partial_" in plan, "error rollup must combine map-side"
