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
    # driver testdata stores TIMESTAMP(MICROS); pandas defaults to
    # nanos, which Spark rejects without a legacy session flag
    events["ts"] = events["ts"].astype("datetime64[us]")
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


def _funnel_pandas(events: pd.DataFrame) -> dict[str, int]:
    """Imperative ordered funnel: strictly-after stage advancement."""
    n = {"view": 0, "click": 0, "purchase": 0}
    for _, g in events.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        if views.empty:
            continue
        n["view"] += 1
        t_view = views.min()
        clicks = g.loc[(g["event_type"] == "click") & (g["ts"] > t_view), "ts"]
        if clicks.empty:
            continue
        n["click"] += 1
        t_click = clicks.min()
        buys = g.loc[(g["event_type"] == "purchase") & (g["ts"] > t_click), "ts"]
        if not buys.empty:
            n["purchase"] += 1
    return n


@pytest.mark.parametrize("seed", [11, 42])
def test_funnel_matches_pandas_reference(spark, seed):
    from backend_model_spark.operators.events_ops import funnel_conversion

    sf = os.path.join(SCRATCH_SF, f"funnel_seed{seed}")
    os.makedirs(sf, exist_ok=True)
    events = _random_events(seed)
    # driver testdata stores TIMESTAMP(MICROS); pandas defaults to
    # nanos, which Spark rejects without a legacy session flag
    events["ts"] = events["ts"].astype("datetime64[us]")
    events.to_parquet(table_path(sf, "events"))

    expected = _funnel_pandas(events)
    got = {r["stage"]: r["n_users"] for r in funnel_conversion(spark, sf).collect()}
    assert got["1_view"] == expected["view"]
    assert got["2_click_after_view"] == expected["click"]
    assert got["3_purchase_after_click"] == expected["purchase"]


def _chunks_python(doc_id: int, text: str) -> list[tuple[int, int, int, str]]:
    """Imperative chunker: 200-char windows, 150-char stride, at least
    one chunk per document."""
    import hashlib
    import math

    n = len(text)
    n_chunks = 1 if n <= 200 else int(math.ceil((n - 200) / 150.0)) + 1
    out = []
    for i in range(n_chunks):
        chunk = text[i * 150 : i * 150 + 200]
        out.append(
            (
                doc_id,
                i,
                len(chunk),
                hashlib.md5(chunk.encode()).hexdigest()[:16],
            )
        )
    return out


def test_chunking_matches_python_reference(spark):
    from backend_model_spark.operators.text import chunk_documents

    # boundary lengths: below / at / just-over the window, stride
    # multiples, and a long tail
    lengths = [1, 199, 200, 201, 349, 350, 351, 500, 1201]
    rng = np.random.default_rng(5)
    texts = [
        "".join(rng.choice(list("abcde fghij"), size=n)) for n in lengths
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["synthetic"] * len(texts),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    sf = os.path.join(SCRATCH_SF, "chunk_bounds")
    os.makedirs(sf, exist_ok=True)
    docs.to_parquet(table_path(sf, "documents"))

    expected = sorted(
        row for d, t in zip(docs["doc_id"], docs["text"]) for row in _chunks_python(int(d), t)
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_len"], r["chunk_fp"])
        for r in chunk_documents(spark, sf).collect()
    )
    assert got == expected
