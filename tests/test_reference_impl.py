"""Randomized cross-checks against independent pure-pandas reference
implementations.

The DuckDB oracle and the Spark query could, in principle, share a
misreading of the spec (both written by the same author). These tests
re-implement two non-trivial operators a third way — imperative
pandas, no SQL — over seeded random data, so a shared-misreading bug
has to survive three independent formulations to pass.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from backend_model_spark.sources.tables import table_path

SCRATCH_SF = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "random_sf",
)

GAP_S = 30 * 60


def _random_events(seed: int, n_users: int = 20, n_events: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    return pd.DataFrame(
        {
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": [
                base + pd.Timedelta(seconds=int(s))
                for s in rng.integers(0, 3 * 24 * 3600, n_events)
            ],
            "user_id": rng.integers(1, n_users + 1, n_events).astype(np.int64),
            "event_type": rng.choice(["click", "view", "purchase"], n_events),
            "value": np.round(rng.uniform(0, 100, n_events), 2),
            "props": ["{}"] * n_events,
        }
    )


def _sessionize_pandas(events: pd.DataFrame) -> dict[int, tuple[int, int, int]]:
    """Imperative gap-based sessionization: per user, sorted by
    (ts, event_id), a new session starts when the gap exceeds 30 min."""
    out = {}
    for user, g in events.sort_values(["ts", "event_id"]).groupby("user_id"):
        sessions = []
        last = None
        for t in g["ts"]:
            if last is None or (t - last).total_seconds() > GAP_S:
                sessions.append(0)
            sessions[-1] += 1
            last = t
        out[int(user)] = (len(sessions), int(g.shape[0]), max(sessions))
    return out


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_sessionize_matches_pandas_reference(spark, seed):
    from backend_model_spark.operators.events_ops import sessionize_users

    sf = os.path.join(SCRATCH_SF, f"seed{seed}")
    os.makedirs(sf, exist_ok=True)
    events = _random_events(seed)
    events.to_parquet(table_path(sf, "events"))

    expected = _sessionize_pandas(events)
    got = {
        int(r["user_id"]): (
            r["n_sessions"],
            r["n_events"],
            r["max_session_events"],
        )
        for r in sessionize_users(spark, sf).collect()
    }
    assert got == expected


def _salted_reference(li: pd.DataFrame) -> pd.DataFrame:
    g = li.groupby("l_returnflag")
    return pd.DataFrame(
        {
            "sum_qty": g["l_quantity"].sum().round(2),
            "n_items": g.size(),
        }
    )


def test_salted_agg_matches_pandas_reference(spark):
    from backend_model_spark.operators.aggregates import salted_skew_aggregation

    sf = "/root/testdata/sf0.001"
    li = pd.read_parquet(os.path.join(sf, "lineitem.parquet"))
    expected = _salted_reference(li)
    got = salted_skew_aggregation(spark, sf).toPandas().set_index("l_returnflag")
    for flag, row in expected.iterrows():
        assert got.loc[flag, "n_items"] == row["n_items"]
        assert abs(got.loc[flag, "sum_qty"] - row["sum_qty"]) < 1e-6
