"""Hypothesis property tests over generated corpora.

The oracle harness proves Spark == DuckDB on fixed data; these tests
assert operator INVARIANTS on adversarially-generated inputs
(hypothesis shrinks failures to minimal cases): conservation laws for
sequence packing, duplication-invariance for winnowing fingerprints,
and session-count bounds for sessionization.

Each example writes a parquet fixture into a unique scratch subdir so
Spark's file-index caching never sees a mutated path.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "prop_sf",
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

doc_text = st.lists(st.sampled_from(WORDS), min_size=0, max_size=40).map(" ".join)
doc_lang = st.sampled_from(["en", "de"])


def _write_docs(texts: list[str], langs: list[str]) -> str:
    sf = os.path.join(SCRATCH, uuid.uuid4().hex[:12])
    os.makedirs(sf, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": langs,
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(sf, "documents.parquet"))
    return sf


@pytest.fixture(scope="module", autouse=True)
def _clean_scratch():
    yield
    shutil.rmtree(SCRATCH, ignore_errors=True)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(st.tuples(doc_text, doc_lang), min_size=1, max_size=12))
def test_pack_sequences_conservation(spark, data):
    """Packing must conserve documents and tokens per language, and
    bin ids must start at 0 and be contiguous."""
    from backend_model_spark.operators.sampling import pack_sequences

    sf = _write_docs([t for t, _ in data], [lg for _, lg in data])
    out = pack_sequences(spark, sf).toPandas()

    ref = pd.DataFrame(
        {
            "lang": [lg for _, lg in data],
            "n_tokens": [len(t.split()) if t.strip() else 1 for t, _ in data],
        }
    )
    # Spark's split('', '\s+') yields [''] → size 1; mirror that above
    for lang, g in ref.groupby("lang"):
        bins = out[out["lang"] == lang]
        assert bins["n_docs"].sum() == len(g)
        assert bins["bin_tokens"].sum() == g["n_tokens"].sum()
        ids = sorted(bins["bin_id"])
        assert ids == list(range(len(ids))), "bin ids contiguous from 0"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(text=doc_text)
def test_winnow_duplicate_invariance(spark, text):
    """Identical documents must produce identical fingerprint sets,
    and fingerprints exist iff the doc has >= WINNOW_K tokens."""
    from backend_model_spark.operators.text import WINNOW_K, winnow_fingerprints

    sf = _write_docs([text, text], ["en", "en"])
    fps = winnow_fingerprints(spark, sf).toPandas()
    by_doc = {
        d: sorted(g["fingerprint"]) for d, g in fps.groupby("doc_id")
    }
    n_tokens = len(text.split()) if text.strip() else 1
    if n_tokens >= WINNOW_K:
        assert by_doc.get(0) == by_doc.get(1) and by_doc.get(0)
    else:
        assert not by_doc


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 7200)),
        min_size=1,
        max_size=20,
    )
)
def test_sessionize_bounds(spark, offsets):
    """Per user: events conserved; 1 <= n_sessions <= n_events; the
    max single-session size never exceeds the user's event count."""
    from backend_model_spark.operators.events_ops import sessionize_users

    sf = os.path.join(SCRATCH, uuid.uuid4().hex[:12])
    os.makedirs(sf, exist_ok=True)
    base = pd.Timestamp("2024-01-01")
    events = pd.DataFrame(
        {
            "event_id": range(len(offsets)),
            "ts": [base + pd.Timedelta(seconds=s) for _, s in offsets],
            "user_id": [u for u, _ in offsets],
            "event_type": ["click"] * len(offsets),
            "value": [1.0] * len(offsets),
            "props": ["{}"] * len(offsets),
        }
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    events.to_parquet(os.path.join(sf, "events.parquet"))

    out = sessionize_users(spark, sf).toPandas().set_index("user_id")
    counts = pd.Series([u for u, _ in offsets]).value_counts()
    for user, n in counts.items():
        row = out.loc[user]
        assert row["n_events"] == n
        assert 1 <= row["n_sessions"] <= n
        assert row["max_session_events"] <= n


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-5, max_value=5), min_size=1, max_size=60
    ),
    k=st.integers(min_value=1, max_value=7),
)
def test_global_rank_ntile_prefix_sum_match_window_semantics(spark, vals, k):
    """The two-stage rank primitive (every former global window routes
    through it) must agree exactly with Spark's own single-partition
    row_number / ntile / running sum on arbitrary tie-heavy data."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from backend_model_spark.operators.scale_utils import (
        with_global_ntile,
        with_global_rank,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, v int"
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    got = with_global_ntile(
        with_global_rank(
            df, order, "r", total_col="n", prefix_sum=("v", "cum")
        ),
        k,
        order,
        "t",
    ).toPandas().set_index("id").sort_index()
    w = W.orderBy(*order)
    ref = (
        df.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy()))
        .withColumn(
            "cum", F.sum("v").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
        .withColumn("t", F.ntile(k).over(w))
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    for col in ["r", "n", "cum", "t"]:
        assert got[col].tolist() == ref[col].tolist(), (col, vals, k)


def _chunk_first_wins_reference(texts: list[str]) -> dict[int, tuple[int, int]]:
    """Python reference for chunk_first_wins: per doc_id (n_toks,
    kept_toks) under corpus-wide first-occurrence semantics."""
    seen: set[str] = set()
    out: dict[int, tuple[int, int]] = {}
    for doc_id, text in enumerate(texts):
        toks = text.strip().split() if text.strip() else [""]
        n_toks = kept = 0
        for i in range(0, max(len(toks), 1), 20):
            chunk = " ".join(toks[i : i + 20])
            n = len(chunk.split(" "))
            n_toks += n
            if chunk not in seen:
                seen.add(chunk)
                kept += n
        out[doc_id] = (n_toks, kept)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(st.tuples(doc_text, doc_lang), min_size=1, max_size=12))
def test_chunk_first_wins_matches_python_reference(spark, data):
    """First-wins dedup must agree with an imperative reference on
    arbitrary corpora: token conservation and first-occurrence
    ownership (earlier doc_id keeps, later ones lose)."""
    from backend_model_spark.operators.dedup import chunk_first_wins

    texts = [t for t, _ in data]
    sf = _write_docs(texts, [lg for _, lg in data])
    out = {
        r["doc_id"]: (r["n_toks"], r["kept_toks"])
        for r in chunk_first_wins(spark, sf).collect()
    }
    assert out == _chunk_first_wins_reference(texts)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(st.tuples(doc_text, doc_lang), min_size=2, max_size=12))
def test_curriculum_order_is_permutation_with_quality_monotone(spark, data):
    """Curriculum positions are a 1..N permutation and, within a
    source, quality is non-increasing along the curriculum."""
    from backend_model_spark.operators.sampling import curriculum_order

    sf = _write_docs([t for t, _ in data], [lg for _, lg in data])
    rows = sorted(
        curriculum_order(spark, sf).collect(), key=lambda r: r["curriculum_pos"]
    )
    assert [r["curriculum_pos"] for r in rows] == list(range(1, len(data) + 1))
    last_q: dict[str, float] = {}
    for r in rows:
        if r["source"] in last_q:
            assert r["quality_score"] <= last_q[r["source"]]
        last_q[r["source"]] = r["quality_score"]


def _pattern_reference(histories: dict[int, list[str]]) -> dict[int, tuple[int, int]]:
    """Python reference: (n_strict_vcp, first_vcp_pos 1-based/0)."""
    out = {}
    for uid, types in histories.items():
        seq = "".join(t[0] for t in types)
        out[uid] = (seq.count("vcp"), seq.find("vcp") + 1)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.sampled_from(["view", "click", "purchase", "signup", "error"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_pattern_sequence_matches_python_reference(spark, data):
    """Strict-run counting over arbitrary per-user histories must
    agree with a direct string scan (events get increasing timestamps
    in list order, so arrival order IS string order)."""
    from backend_model_spark.operators.events_ops import pattern_sequence

    sf = os.path.join(SCRATCH, uuid.uuid4().hex[:12])
    os.makedirs(sf, exist_ok=True)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    histories: dict[int, list[str]] = {}
    for i, (uid, ty) in enumerate(data):
        rows.append((i, t0 + pd.Timedelta(seconds=i), uid, ty, 0.0, "{}"))
        histories.setdefault(uid, []).append(ty)
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(os.path.join(sf, "events.parquet"))
    out = {
        r["user_id"]: (r["n_strict_vcp"], r["first_vcp_pos"])
        for r in pattern_sequence(spark, sf).collect()
    }
    assert out == _pattern_reference(histories)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),      # user
            st.integers(min_value=0, max_value=5000),   # offset seconds
        ),
        min_size=2,
        max_size=25,
    )
)
def test_session_overlap_matches_bruteforce(spark, data):
    """The bin-bucketed interval join must agree with an O(n²)
    brute-force over the same session set (sessions built with the
    identical 30-min-gap rule)."""
    from backend_model_spark.operators.events_ops import session_overlap_join

    sf = os.path.join(SCRATCH, uuid.uuid4().hex[:12])
    os.makedirs(sf, exist_ok=True)
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (i, t0 + pd.Timedelta(seconds=off), uid, "c", 0.0, "{}")
        for i, (uid, off) in enumerate(data)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(os.path.join(sf, "events.parquet"))

    # brute-force reference: sessionize per user, then all-pairs
    per_user: dict[int, list[int]] = {}
    for i, (uid, off) in enumerate(data):
        per_user.setdefault(uid, []).append(off * 1_000_000)
    sessions = []  # (user, start_us, end_us)
    for uid, times in per_user.items():
        times.sort()
        start = prev = times[0]
        for t in times[1:]:
            if t - prev > 30 * 60 * 1_000_000:
                sessions.append((uid, start, prev))
                start = t
            prev = t
        sessions.append((uid, start, prev))
    expect: dict[tuple[int, int], tuple[int, int]] = {}
    for ua, sa, ea in sessions:
        for ub, sb, eb in sessions:
            if ua < ub and sa <= eb and sb <= ea:
                n, tot = expect.get((ua, ub), (0, 0))
                expect[(ua, ub)] = (n + 1, tot + min(ea, eb) - max(sa, sb))

    got = {
        (r["user_a"], r["user_b"]): (r["n_overlaps"], r["total_overlap_us"])
        for r in session_overlap_join(spark, sf).collect()
    }
    assert got == expect
