"""Hyperparameter search: brute-force grid + Bayesian-style loop.

Maps the reference's two tuning strategies (SURVEY.md §2.10):
* M3 grid search (``brute_force_grid_search_model/``) →
  ``CrossValidator`` + ``ParamGridBuilder`` — built-in, each fold's
  trials run as parallel Spark jobs.
* M4 Bayesian optimization (``bayesian_optimization_model/``) → no
  MLlib equivalent; implemented as a dependency-free driver loop
  (SURVEY.md §7 hard part #1) with a TPE surrogate (Bergstra et al.
  2011, "Algorithms for Hyper-Parameter Optimization"): observed
  trials split into good/bad by loss quantile, each modeled as a
  per-dimension Parzen (Gaussian-mixture) density; candidates are
  drawn from the good density and the next trial maximizes the
  density ratio l(x)/g(x) — a real posterior-driven acquisition, not
  perturb-around-best. Each trial is itself a distributed Spark fit;
  the loop is driver-side control flow only.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field
from typing import Callable

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


# TPE knobs: good/bad split quantile, candidates per proposal step
TPE_GAMMA = 0.25
TPE_CANDIDATES = 24


def _sample_uniform(rng: random.Random, space: dict | None = None) -> dict:
    """One uniform draw from ``space`` (int dims when both bounds are
    ints, else 4-dp floats). Iteration order of the dict fixes the
    rng-consumption order — deterministic under a seed."""
    space = SPACE if space is None else space
    out: dict = {}
    for name, (lo, hi) in space.items():
        if isinstance(lo, int) and isinstance(hi, int):
            out[name] = rng.randint(lo, hi)
        else:
            out[name] = round(rng.uniform(lo, hi), 4)
    return out


def _bandwidth(lo: float, hi: float, n_centers: int) -> float:
    """Parzen kernel width: shrinks as evidence accumulates, floored
    at 5% of the range so the mixture never collapses to spikes."""
    return max((hi - lo) / (2.0 * math.sqrt(n_centers)), 0.05 * (hi - lo))


def _parzen_logpdf(x: float, centers: list[float], lo: float, hi: float) -> float:
    bw = _bandwidth(lo, hi, len(centers))
    total = 0.0
    for c in centers:
        z = (x - c) / bw
        total += math.exp(-0.5 * z * z)
    return math.log(total / (len(centers) * bw * math.sqrt(2 * math.pi)) + 1e-300)


def _tpe_propose(
    rng: random.Random, trials: list[Trial], space: dict | None = None
) -> dict:
    """One TPE step: model good trials (top TPE_GAMMA by MAE) and bad
    trials as per-dimension Parzen densities l(x), g(x); draw
    TPE_CANDIDATES from l; return the candidate maximizing
    Σ_dim [log l(x_d) − log g(x_d)] (argmax of the density ratio —
    equivalently of Expected Improvement under the TPE derivation)."""
    space = SPACE if space is None else space
    ordered = sorted(trials, key=lambda t: (t.mae, sorted(t.params.items()).__repr__()))
    n_good = max(1, math.ceil(TPE_GAMMA * len(ordered)))
    good = ordered[:n_good]
    bad = ordered[n_good:] or ordered  # degenerate split early on

    candidates: list[dict] = []
    for _ in range(TPE_CANDIDATES):
        p: dict = {}
        for name, (lo, hi) in space.items():
            centers = [float(t.params[name]) for t in good]
            bw = _bandwidth(float(lo), float(hi), len(centers))
            center = centers[rng.randrange(len(centers))]
            v = min(max(rng.gauss(center, bw), lo), hi)
            p[name] = int(round(v)) if isinstance(lo, int) else round(v, 4)
        candidates.append(p)

    def ratio(p: dict) -> float:
        s = 0.0
        for name, (lo, hi) in space.items():
            x = float(p[name])
            s += _parzen_logpdf(x, [float(t.params[name]) for t in good], lo, hi)
            s -= _parzen_logpdf(x, [float(t.params[name]) for t in bad], lo, hi)
        return s

    # max() keeps the first of equal scores — deterministic under seed
    return max(candidates, key=ratio)


def _optimize(
    objective: Callable[[dict], float],
    n_trials: int,
    n_explore: int,
    seed: int,
    propose: Callable[..., dict] | None,
    space: dict | None = None,
) -> BayesianResult:
    rng = random.Random(seed)
    trials: list[Trial] = []
    best: Trial | None = None
    for t in range(n_trials):
        if t < n_explore or best is None or propose is None:
            params = _sample_uniform(rng, space)
        else:
            params = propose(rng, trials, space)
        trial = Trial(params=params, mae=objective(params))
        trials.append(trial)
        if best is None or trial.mae < best.mae:
            best = trial
    assert best is not None
    return BayesianResult(best_params=best.params, best_mae=best.mae, trials=trials)


def random_search(
    objective: Callable[[dict], float],
    n_trials: int,
    seed: int = SEED,
    space: dict | None = None,
) -> BayesianResult:
    """Pure uniform random search — the equal-budget baseline TPE must
    beat (and the test holds it to that)."""
    return _optimize(objective, n_trials, n_trials, seed, None, space)


def tpe_search(
    objective: Callable[[dict], float],
    n_trials: int,
    n_explore: int = 4,
    seed: int = SEED,
    space: dict | None = None,
) -> BayesianResult:
    """TPE over an arbitrary objective(params) -> loss, searched over
    ``space`` (default: the GBT SPACE). Deterministic under a fixed
    seed."""
    return _optimize(objective, n_trials, n_explore, seed, _tpe_propose, space)


def bayesian_optimize_gbt(
    train: DataFrame,
    valid: DataFrame,
    n_trials: int = 8,
    n_explore: int = 4,
    seed: int = SEED,
) -> BayesianResult:
    """TPE-driven hyperparameter search for the GBT regressor:
    ``n_explore`` uniform warmup draws, then density-ratio proposals
    (:func:`_tpe_propose`). Deterministic under a fixed seed — the
    testable contract the reference's bayesian_optimization_model/
    implies (SURVEY.md §2.10 M4). Each objective call is a distributed
    Spark fit; only the proposer runs on the driver."""

    def objective(params: dict) -> float:
        return train_and_evaluate(train, valid, model="gbt", **params).mae

    return tpe_search(objective, n_trials, n_explore=n_explore, seed=seed)
