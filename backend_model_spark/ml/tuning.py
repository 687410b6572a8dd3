"""Hyperparameter search: brute-force grid + Bayesian-style loop.

Maps the reference's two tuning strategies (SURVEY.md §2.10):
* M3 grid search (``brute_force_grid_search_model/``) →
  ``CrossValidator`` + ``ParamGridBuilder`` — built-in, each fold's
  trials run as parallel Spark jobs.
* M4 Bayesian optimization (``bayesian_optimization_model/``) → no
  MLlib equivalent; implemented as a dependency-free driver loop
  (SURVEY.md §7 hard part #1): seeded exploration followed by
  Gaussian exploitation around the incumbent — the
  propose-evaluate-update skeleton of TPE/GP tuners with a trivial
  surrogate. Each trial is itself a distributed Spark fit; the loop
  is driver-side control flow only.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.regression import LinearRegression
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

from pyspark.sql import DataFrame

from backend_model_spark.ml.pipeline import LABEL_COL, build_pipeline, train_and_evaluate

SEED = 42


def grid_search_linear(train: DataFrame, n_folds: int = 3):
    """Brute-force grid over LinearRegression regularization (M3)."""
    pipeline = build_pipeline("linear")
    lr = pipeline.getStages()[-1]
    assert isinstance(lr, LinearRegression)
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.01, 0.1, 1.0])
        .addGrid(lr.elasticNetParam, [0.0, 0.5, 1.0])
        .build()
    )
    evaluator = RegressionEvaluator(
        labelCol=LABEL_COL, predictionCol="prediction", metricName="mae"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=n_folds,
        seed=SEED,
        parallelism=4,
    )
    return cv.fit(train)


@dataclass
class Trial:
    params: dict
    mae: float


@dataclass
class BayesianResult:
    best_params: dict
    best_mae: float
    trials: list[Trial] = field(default_factory=list)


# search space for the GBT regressor (M4 analog)
SPACE = {
    "maxDepth": (2, 6),  # int uniform
    "maxIter": (5, 30),  # int uniform
    "stepSize": (0.05, 0.3),  # float log-ish uniform
}


def bayesian_optimize_gbt(
    train: DataFrame,
    valid: DataFrame,
    n_trials: int = 8,
    n_explore: int = 4,
    seed: int = SEED,
) -> BayesianResult:
    """Seeded explore-then-exploit loop: ``n_explore`` uniform draws,
    then Gaussian proposals around the incumbent (clipped to SPACE).
    Deterministic under a fixed seed — the testable contract the
    missing reference notebook implies (SURVEY.md §2.10 M4)."""
    rng = random.Random(seed)
    trials: list[Trial] = []
    best: Trial | None = None

    def sample_uniform() -> dict:
        return {
            "maxDepth": rng.randint(*SPACE["maxDepth"]),
            "maxIter": rng.randint(*SPACE["maxIter"]),
            "stepSize": round(rng.uniform(*SPACE["stepSize"]), 4),
        }

    def sample_around(p: dict) -> dict:
        lo_d, hi_d = SPACE["maxDepth"]
        lo_i, hi_i = SPACE["maxIter"]
        lo_s, hi_s = SPACE["stepSize"]
        return {
            "maxDepth": min(max(p["maxDepth"] + rng.choice([-1, 0, 1]), lo_d), hi_d),
            "maxIter": min(max(p["maxIter"] + rng.randint(-5, 5), lo_i), hi_i),
            "stepSize": round(
                min(max(rng.gauss(p["stepSize"], 0.03), lo_s), hi_s), 4
            ),
        }

    for t in range(n_trials):
        params = (
            sample_uniform()
            if t < n_explore or best is None
            else sample_around(best.params)
        )
        result = train_and_evaluate(train, valid, model="gbt", **params)
        trial = Trial(params=params, mae=result.mae)
        trials.append(trial)
        if best is None or trial.mae < best.mae:
            best = trial

    assert best is not None
    return BayesianResult(best_params=best.params, best_mae=best.mae, trials=trials)
