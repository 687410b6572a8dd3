"""Round-5 additions: CDC merge-apply, ANALYZE column stats, count-min
sketch top-k, and calendar-spine linear interpolation — hand-computed
fixtures plus real-data invariants (the DuckDB oracle parity for each
is covered by the registry sweep; these pin the semantics)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _write_events(tmp_path, rows):
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [pd.Timestamp(d) for d, *_ in rows],
            "user_id": [u for _, u, *_ in rows],
            "event_type": [t for _, _, t, _ in rows],
            "value": [v for *_, v in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")


def test_linear_interpolate_hand_computed(spark, tmp_path):
    """User 1: purchases of 100c on day 2 and 500c on day 6 → days 3-5
    must be the exact linear ramp 200/300/400, day 1 bfill, days 7-8
    ffill. User 3: 100c→101c over a 3-day bracket — integer floor
    division must give 100/100 (not 100.33/100.67). User 2 (views
    only) defines the 8-day spine and stays NULL/'empty' throughout."""
    from backend_model_spark.operators.events_ops import (
        linear_interpolate_daily,
    )

    rows = [(f"2024-01-0{d}", 2, "view", 0.0) for d in range(1, 9)]
    rows += [
        ("2024-01-02", 1, "purchase", 1.00),
        ("2024-01-06", 1, "purchase", 5.00),
        ("2024-01-01", 3, "purchase", 1.00),
        ("2024-01-04", 3, "purchase", 1.01),
    ]
    _write_events(tmp_path, rows)

    out = linear_interpolate_daily(spark, str(tmp_path)).collect()
    got = {(r.user_id, r.day): (r.filled_cents, r.fill_kind) for r in out}
    assert len(out) == 24  # 3 users x 8 spine days

    assert got[(1, "2024-01-01")] == (100, "bfill")
    assert got[(1, "2024-01-02")] == (100, "actual")
    assert got[(1, "2024-01-03")] == (200, "interp")
    assert got[(1, "2024-01-04")] == (300, "interp")
    assert got[(1, "2024-01-05")] == (400, "interp")
    assert got[(1, "2024-01-06")] == (500, "actual")
    assert got[(1, "2024-01-07")] == (500, "ffill")
    assert got[(1, "2024-01-08")] == (500, "ffill")

    # bigint floor blend: (100*2+101*1) div 3 = 100, (100*1+101*2) div 3 = 100
    assert got[(3, "2024-01-02")] == (100, "interp")
    assert got[(3, "2024-01-03")] == (100, "interp")

    for d in range(1, 9):
        assert got[(2, f"2024-01-0{d}")] == (None, "empty")


def test_cdc_merge_apply_hand_computed(spark, tmp_path):
    """Base {1,2,3}; changelog: cust 1 gets U(seq 5) then D(seq 13,
    13%10=3) → deleted; cust 2 gets U(seq 20, $20) → updated to 2000c;
    cust 3 untouched → original balance; o_orderkey 194 (194%97=0)
    targets new key 1000002 → insert. Latest-sequence-wins semantics,
    verified row by row."""
    from backend_model_spark.sources.io_ops import cdc_merge_apply

    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_name": ["a", "b", "c"],
            "c_nationkey": [0, 0, 0],
            "c_acctbal": [11.11, 22.22, 33.33],
            "c_mktsegment": ["S"] * 3,
        }
    ).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame(
        {
            "o_orderkey": [5, 13, 20, 194],
            "o_custkey": [1, 1, 2, 2],
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": [10.00, 99.99, 20.00, 55.55],
            "o_orderdate": [pd.Timestamp("1995-01-01")] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    ).to_parquet(tmp_path / "orders.parquet")

    out = {r.pk: (r.bal_cents, r.merge_action)
           for r in cdc_merge_apply(spark, str(tmp_path)).collect()}
    assert 1 not in out  # latest change for cust 1 is a DELETE
    assert out[2] == (2000, "update")
    assert out[3] == (3333, "unchanged")
    assert out[1000002] == (5555, "insert")
    assert len(out) == 3


def test_countmin_estimates_upper_bound_exact(spark):
    """Count-min guarantee: est >= exact for every reported key, the
    ranking is by (est desc, user_id), and on sf0.001's small key space
    (few dozen users vs 2048 cells) the top estimate equals the true
    top frequency."""
    from backend_model_spark.operators.aggregates import countmin_topk

    rows = countmin_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.est_cnt >= r.exact_cnt for r in rows)
    ests = [(r.est_cnt, -r.user_id) for r in rows]
    assert ests == sorted(ests, reverse=True)

    li = spark.read.parquet(f"{SF_DIR}/events.parquet")
    true_top = (
        li.filter("user_id IS NOT NULL").groupBy("user_id").count()
        .orderBy("count", ascending=False).first()["count"]
    )
    assert rows[0].est_cnt >= true_top
    assert rows[0].exact_cnt <= rows[0].est_cnt


def test_analyze_table_stats_matches_pandas(spark):
    """The stats row for each column must equal an independent pandas
    recompute on the same parquet: exact NDV, null count, canonical
    min/max strings, and integer avg-length×100."""
    from backend_model_spark.sources.io_ops import analyze_table_stats

    got = {r.col_name: r for r in analyze_table_stats(spark, SF_DIR).collect()}
    assert set(got) == {
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_shipdate",
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for col in ["l_orderkey", "l_returnflag"]:
        s = li[col]
        r = got[col]
        assert r.ndv == s.nunique()
        assert r.n_nulls == int(s.isna().sum())
        assert r.min_str == str(s.min())
        assert r.max_str == str(s.max())
        lens = s.dropna().astype(str).str.len()
        assert r.avg_len_x100 == int(lens.sum()) * 100 // len(lens)

    sd = li["l_shipdate"].dropna()
    assert got["l_shipdate"].min_str == sd.min().strftime("%Y-%m-%d")
    assert got["l_shipdate"].max_str == sd.max().strftime("%Y-%m-%d")
