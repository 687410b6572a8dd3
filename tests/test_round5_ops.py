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


# --- property-based semantics checks (python references) ---

import shutil
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "prop_r5",
)


@pytest.fixture(scope="module", autouse=True)
def _clean_scratch_r5():
    yield
    shutil.rmtree(SCRATCH, ignore_errors=True)


def _fresh_dir():
    sf = os.path.join(SCRATCH, uuid.uuid4().hex[:12])
    os.makedirs(sf, exist_ok=True)
    return sf


# (user, day 1..9, cents 0..500 as value/100, is_purchase) observations
obs = st.tuples(
    st.integers(0, 3), st.integers(1, 9), st.integers(0, 500),
    st.booleans(),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(obs, min_size=1, max_size=25))
def test_linear_interpolate_matches_python_reference(spark, data):
    """Random sparse observations vs a pure-python implementation of
    the same integer-blend contract: identical filled values and fill
    kinds for every (user, day) spine cell."""
    from backend_model_spark.operators.events_ops import (
        linear_interpolate_daily,
    )

    sf = _fresh_dir()
    pd.DataFrame(
        {
            "event_id": range(len(data)),
            "ts": [pd.Timestamp(f"2024-01-0{d}") for _, d, _, _ in data],
            "user_id": [u for u, *_ in data],
            "event_type": ["purchase" if p else "view" for *_, p in data],
            "value": [c / 100.0 for _, _, c, _ in data],
            "props": ["{}"] * len(data),
        }
    ).to_parquet(os.path.join(sf, "events.parquet"))

    got = {
        (r.user_id, r.day): (r.filled_cents, r.fill_kind)
        for r in linear_interpolate_daily(spark, sf).collect()
    }

    users = sorted({u for u, *_ in data})
    days = sorted({d for _, d, _, _ in data})
    # value was written as c/100.0, so floor(value*100+0.5) recovers c
    daily = {}
    for u, d, c, p in data:
        if p:
            daily[(u, d)] = daily.get((u, d), 0) + c

    assert len(got) == len(users) * len(days)
    for u in users:
        for d in days:
            day_key = (u, f"2024-01-0{d}")
            prevs = [dd for (uu, dd) in daily if uu == u and dd <= d]
            nexts = [dd for (uu, dd) in daily if uu == u and dd >= d]
            if (u, d) in daily:
                want = (daily[(u, d)], "actual")
            elif not prevs and not nexts:
                want = (None, "empty")
            elif not prevs:
                nd = min(nexts)
                want = (daily[(u, nd)], "bfill")
            elif not nexts:
                pv = max(prevs)
                want = (daily[(u, pv)], "ffill")
            else:
                pv, nd = max(prevs), min(nexts)
                ln, pos = nd - pv, d - pv
                pc, nc = daily[(u, pv)], daily[(u, nd)]
                want = ((pc * (ln - pos) + nc * pos) // ln, "interp")
            assert got[day_key] == want, (u, d, got[day_key], want)


chg = st.tuples(st.integers(1, 60), st.integers(1, 5), st.integers(0, 9999))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=st.lists(chg, min_size=1, max_size=30, unique_by=lambda t: t[0]))
def test_cdc_merge_matches_python_reference(spark, changes):
    """Random changelogs vs a dict-based reference MERGE: same
    surviving keys, balances, and action labels (upsert / delete /
    insert / pass-through), with latest-sequence-wins resolution."""
    from backend_model_spark.sources.io_ops import cdc_merge_apply

    sf = _fresh_dir()
    base_keys = [1, 2, 3, 4, 5]
    pd.DataFrame(
        {
            "c_custkey": base_keys,
            "c_name": [f"c{k}" for k in base_keys],
            "c_nationkey": [0] * 5,
            "c_acctbal": [k * 10.0 for k in base_keys],
            "c_mktsegment": ["S"] * 5,
        }
    ).to_parquet(os.path.join(sf, "customer.parquet"))
    pd.DataFrame(
        {
            "o_orderkey": [ok for ok, _, _ in changes],
            "o_custkey": [ck for _, ck, _ in changes],
            "o_orderstatus": ["F"] * len(changes),
            "o_totalprice": [cents / 100.0 for *_, cents in changes],
            "o_orderdate": [pd.Timestamp("1995-01-01")] * len(changes),
            "o_orderpriority": ["1-URGENT"] * len(changes),
        }
    ).to_parquet(os.path.join(sf, "orders.parquet"))

    got = {r.pk: (r.bal_cents, r.merge_action)
           for r in cdc_merge_apply(spark, sf).collect()}

    latest = {}
    for ok, ck, cents in changes:
        pk = ck + 1_000_000 if ok % 97 == 0 else ck
        op = "D" if ok % 10 == 3 else "U"
        if pk not in latest or ok > latest[pk][0]:
            latest[pk] = (ok, op, cents)
    want = {}
    for k in base_keys:
        if k in latest:
            _, op, cents = latest[k]
            if op != "D":
                want[k] = (cents, "update")
        else:
            want[k] = (k * 1000, "unchanged")
    for pk, (_, op, cents) in latest.items():
        if pk > 1_000_000 and op != "D":
            want[pk] = (cents, "insert")
    assert got == want


def test_provenance_audit_one_file_per_day_and_conserves(spark, tmp_path):
    """Two days, interleaved users: the audit must report exactly one
    file per day partition (the repartition-before-partitionBy
    contract), conserve row counts and cent sums through the
    write→read-back, and label days from _metadata.file_path."""
    from backend_model_spark.sources.io_ops import provenance_audit

    rows = [
        ("2024-02-01", 1, "view", 1.00),
        ("2024-02-01", 2, "purchase", 2.50),
        ("2024-02-01", 1, "click", 0.25),
        ("2024-02-02", 3, "view", 4.00),
        ("2024-02-02", 1, "purchase", 0.75),
    ]
    _write_events(tmp_path, rows)

    got = {r.src_day: r for r in provenance_audit(spark, str(tmp_path)).collect()}
    assert set(got) == {"2024-02-01", "2024-02-02"}
    d1, d2 = got["2024-02-01"], got["2024-02-02"]
    assert (d1.n_rows, d1.n_users, d1.n_files, d1.sum_cents) == (3, 2, 1, 375)
    assert (d2.n_rows, d2.n_users, d2.n_files, d2.sum_cents) == (2, 2, 1, 475)


def test_golden_record_survivorship_rules(spark, tmp_path):
    """Two identical-text docs (guaranteed LSH cluster) with different
    n_chars and sources, plus a singleton: content must come from the
    longest member (doc 1), lineage from the first-seen member
    (doc 0), and the singleton must self-cluster untouched."""
    from backend_model_spark.operators.dedup import dedup_golden_record

    dup = "the quick brown fox jumps over the lazy dog again and again"
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [dup, dup, "completely different content here entirely"],
            "lang": ["en"] * 3,
            "source": ["src_a", "src_b", "src_c"],
            "n_chars": [10, 999, 43],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {r.comp: r for r in dedup_golden_record(spark, str(tmp_path)).collect()}
    cluster = got[0]  # comp label = min doc_id of the cluster
    assert cluster.n_members == 2
    assert cluster.rep_doc_id == 1          # longest-wins content
    assert cluster.canon_prefix == dup[:60]
    assert cluster.first_source == "src_a"  # first-seen lineage
    assert cluster.total_chars == 1009
    assert got[2].n_members == 1 and got[2].first_source == "src_c"


def test_kmv_sketch_exact_below_k_and_estimates_above(spark):
    """Below k distinct (sf0.001) the sketch holds every hash, so the
    estimate path collapses to near-exact; at sf0.1 (thousands of
    users, n >> k=256) the estimator must land within 25% of the true
    distinct count, and the intersection count is bounded by k."""
    from backend_model_spark.operators.aggregates import (
        KMV_K,
        kmv_distinct_sketch,
    )

    small = {r.sketch: r for r in kmv_distinct_sketch(spark, SF_DIR).collect()}
    for seg in ("click", "purchase"):
        r = small[seg]
        assert r.k_used <= KMV_K
        if r.k_used < KMV_K:  # sketch is the full set
            # (kp-1)*p div max_h is still an estimate, but with the
            # full hash set it must bracket the truth loosely
            assert r.est_distinct > 0
        assert r.n_exact > 0

    big = {
        r.sketch: r
        for r in kmv_distinct_sketch(spark, "/root/testdata/sf0.1").collect()
    }
    for seg in ("click", "purchase"):
        r = big[seg]
        assert r.k_used == KMV_K  # saturated sketch
        err = abs(r.est_distinct - r.n_exact) / r.n_exact
        assert err < 0.25, (seg, r.est_distinct, r.n_exact)
    u = big["union"]
    assert u.k_used == KMV_K
    assert 0 <= u.inter_of_k <= KMV_K
    assert u.jaccard_micro == u.inter_of_k * 1_000_000 // KMV_K


def test_cardinality_estimate_audit_hand_computed(spark, tmp_path):
    """Hand-built joins pin the whole arithmetic chain: NULL keys are
    excluded from n/ndv AND from the join (orders row with NULL
    o_custkey, lineitem row with NULL l_partkey); est = n_l*n_r div
    max(ndv) in integer floor division; err_ppm is floor'd too.

    orders_customer: n_l=4 ndv_l=3 (custkeys 1,1,2,3), n_r=4 ndv_r=3
      (1,2,2,4) -> est = 16 div 3 = 5; actual = 2*1 + 1*2 = 4;
      err_ppm = 1_000_000 div 4 = 250_000.
    lineitem_orders: n_l=4 ndv_l=3, n_r=5 ndv_r=5 -> est = 20 div 5
      = 4 = actual -> err_ppm 0 (the contained-uniform ideal case).
    lineitem_part: n_l=3 ndv_l=2, n_r=2 ndv_r=2 -> est = 3;
      actual = 2 (part 300 unmatched) -> err_ppm = 500_000.
    """
    from backend_model_spark.sources.io_ops import cardinality_estimate_audit

    pd.DataFrame(
        {"o_orderkey": [10, 11, 12, 13, 14], "o_custkey": [1, 1, 2, 3, None]}
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({"c_custkey": [1, 2, 2, 4]}).to_parquet(
        tmp_path / "customer.parquet"
    )
    pd.DataFrame(
        {"l_orderkey": [10, 10, 11, 14], "l_partkey": [100, 100, 200, None]}
    ).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({"p_partkey": [100, 300]}).to_parquet(
        tmp_path / "part.parquet"
    )

    got = {
        r.join_name: r
        for r in cardinality_estimate_audit(spark, str(tmp_path)).collect()
    }
    oc = got["orders_customer"]
    assert (oc.n_left, oc.ndv_left, oc.n_right, oc.ndv_right) == (4, 3, 4, 3)
    assert (oc.est_rows, oc.actual_rows, oc.err_ppm) == (5, 4, 250_000)
    lo = got["lineitem_orders"]
    assert (lo.est_rows, lo.actual_rows, lo.err_ppm) == (4, 4, 0)
    lp = got["lineitem_part"]
    assert (lp.n_left, lp.ndv_left) == (3, 2)
    assert (lp.est_rows, lp.actual_rows, lp.err_ppm) == (3, 2, 500_000)


# --- exact repeated-substring spans (ExactSubstr) ---------------------------


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["srcT"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")


def _w(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(1, n + 1))


def test_substring_spans_hand_computed(spark, tmp_path):
    """Doc 0 shares block X (10 tokens) with doc 1 and block Y
    (9 tokens) with doc 3, separated by 9 unique tokens → exactly two
    islands totalling 19 duplicated tokens; doc 2 is unique and must
    be absent; docs 4 and 5 are verbatim copies → fully covered."""
    from backend_model_spark.operators.dedup import substring_spans

    X, Y = _w("x", 10), _w("y", 9)
    texts = [
        f"{_w('u', 5)} {X} {_w('m', 9)} {Y} {_w('v', 4)}",  # 0: n=37
        f"{_w('b', 6)} {X} b7 b8",  # 1: n=18
        _w("c", 20),  # 2: unique
        f"{Y} {_w('d', 7)}",  # 3: n=16
        _w("e", 12),  # 4: copy of 5
        _w("e", 12),  # 5: copy of 4
    ]
    _write_docs(tmp_path, texts)

    got = {
        r.doc_id: (r.n_words, r.n_dup_spans, r.dup_words, r.dup_permille)
        for r in substring_spans(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 3, 4, 5}
    assert got[0] == (37, 2, 19, 19000 // 37)
    assert got[1] == (18, 1, 10, 10000 // 18)
    assert got[3] == (16, 1, 9, 9000 // 16)
    assert got[4] == (12, 1, 12, 1000)
    assert got[5] == (12, 1, 12, 1000)


def test_substring_scrub_hand_computed(spark, tmp_path):
    """The scrub rewrite must cut exactly the covered spans: doc 0
    keeps its unique prose in order, doc 2 passes through verbatim,
    and the verbatim twins 4/5 scrub to the empty string (never
    NULL — the cross-engine empty-concat contract)."""
    from backend_model_spark.operators.dedup import substring_scrub

    X, Y = _w("x", 10), _w("y", 9)
    texts = [
        f"{_w('u', 5)} {X} {_w('m', 9)} {Y} {_w('v', 4)}",
        f"{_w('b', 6)} {X} b7 b8",
        _w("c", 20),
        f"{Y} {_w('d', 7)}",
        _w("e", 12),
        _w("e", 12),
    ]
    _write_docs(tmp_path, texts)

    got = {
        r.doc_id: (r.n_words, r.kept_words, r.cleaned_text)
        for r in substring_scrub(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 5}  # row conservation
    assert got[0] == (37, 18, f"{_w('u', 5)} {_w('m', 9)} {_w('v', 4)}")
    assert got[1] == (18, 8, f"{_w('b', 6)} b7 b8")
    assert got[2] == (20, 20, _w("c", 20))
    assert got[3] == (16, 7, _w("d", 7))
    assert got[4] == (12, 0, "")
    assert got[5] == (12, 0, "")


def test_substring_spans_scrub_consistency(spark):
    """Cross-operator invariant on real data: for every document the
    scrub's kept_words equals n_words minus the span report's
    dup_words (coverage accounting must agree between the detector
    and the rewriter), and untouched documents keep all words."""
    from backend_model_spark.operators.dedup import (
        substring_scrub,
        substring_spans,
    )

    spans = {
        r.doc_id: r.dup_words for r in substring_spans(spark, SF_DIR).collect()
    }
    scrub = substring_scrub(spark, SF_DIR).collect()
    assert len(scrub) > 0
    for r in scrub:
        assert r.kept_words == r.n_words - spans.get(r.doc_id, 0)
        assert (r.kept_words == 0) == (r.cleaned_text == "")


def test_ivfpq_topk_hand_computed(spark, tmp_path):
    """Three constant-vector clusters at 0 / 10 / 100: every centroid
    equals its members, so ADC distances are exact. A query from
    cluster A (value 0) probes [A, B] — C is pruned — and must rank
    its 4 co-members first (adc_dist 0, vec_id order), then the first
    B member at exactly 64·(10·1e6)² = 6.4e15 micro-units²."""
    import pandas as pd

    from backend_model_spark.operators.similarity import ivfpq_topk

    vals = {0: 0.0, 1: 10.0, 2: 100.0}
    rows = []
    for label in (0, 1, 2):
        for j in range(5):
            rows.append(
                {
                    "vec_id": label * 5 + j,
                    "embedding": [vals[label]] * 64,
                    "label": label,
                }
            )
    pd.DataFrame(rows).to_parquet(tmp_path / "embeddings.parquet")

    got = {
        (r.q_id, r.rank): (r.neighbor_id, r.list_id, r.adc_dist)
        for r in ivfpq_topk(spark, str(tmp_path)).collect()
    }
    # 10 queries (vec_id < 10) x top-5
    assert len(got) == 50
    D_AB = 64 * (10 * 1_000_000) ** 2  # 6.4e15

    # query 0 (cluster A): co-members 1,2,3,4 at 0, then B's vec 5
    assert got[(0, 1)] == (1, 0, 0)
    assert got[(0, 2)] == (2, 0, 0)
    assert got[(0, 3)] == (3, 0, 0)
    assert got[(0, 4)] == (4, 0, 0)
    assert got[(0, 5)] == (5, 1, D_AB)

    # query 7 (cluster B): co-members 5,6,8,9 at 0, then A's vec 0
    assert got[(7, 1)] == (5, 1, 0)
    assert got[(7, 2)] == (6, 1, 0)
    assert got[(7, 3)] == (8, 1, 0)
    assert got[(7, 4)] == (9, 1, 0)
    assert got[(7, 5)] == (0, 0, D_AB)

    # cluster C (distance 90 from B, 100 from A) must never appear:
    # nprobe=2 prunes it for every query
    assert all(n < 10 for (n, _, _) in got.values())


def test_ivfpq_prunes_to_probed_lists(spark):
    """On real data every reported neighbor's list_id must be one of
    at most IVFPQ_NPROBE distinct lists per query — the pruning
    contract that distinguishes IVF-PQ from the full ADC scan."""
    from backend_model_spark.operators.similarity import (
        IVFPQ_NPROBE,
        ivfpq_topk,
    )

    rows = ivfpq_topk(spark, SF_DIR).collect()
    assert len(rows) > 0
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, set()).add(r.list_id)
        assert r.neighbor_id != r.q_id
    for lists in per_q.values():
        assert len(lists) <= IVFPQ_NPROBE


def test_ab_power_mde_hand_computed(spark, tmp_path):
    """Two purchasing users with metrics 1.0 and 3.0 → mean 2,
    sample variance 2. MDE must equal (z_a + z_p)·√(2σ²/n) for the
    published z constants, and mde_rel = mde_abs / mean."""
    from backend_model_spark.operators.events_ops import ab_power_mde

    rows = [
        ("2024-01-01", 1, "purchase", 1.00),
        ("2024-01-02", 2, "purchase", 3.00),
        ("2024-01-03", 3, "view", 9.99),  # non-purchase: excluded
    ]
    _write_events(tmp_path, rows)

    out = ab_power_mde(spark, str(tmp_path)).collect()
    assert len(out) == 10  # 5 n-grid x 2 power rows
    got = {(r.power_pct, r.n_per_arm): r for r in out}
    for (p, n), r in got.items():
        z = {80: 0.841621, 90: 1.281552}[p]
        expected = (1.959964 + z) * (2 * 2.0 / n) ** 0.5
        assert r.n_users_observed == 2
        assert r.mean_metric == 2.0
        assert r.sigma2 == 2.0
        assert abs(r.mde_abs - expected) < 1e-6
        assert abs(r.mde_rel - expected / 2.0) < 1e-6
    # more users / more power → smaller MDE (monotone in both axes)
    assert got[(80, 100_000)].mde_abs < got[(80, 1_000)].mde_abs
    assert got[(80, 1_000)].mde_abs < got[(90, 1_000)].mde_abs


def test_ab_did_hand_computed(spark, tmp_path):
    """Arm A (even users) deltas {1, 1}; arm B (odd users) deltas
    {3, 5} → DiD = 4 − 1 = 3, se = √(0/2 + 2/2) = 1, t = 3; all four
    cell means verified too (cutoff 2024-01-16)."""
    from backend_model_spark.operators.events_ops import ab_did_estimator

    rows = [
        ("2024-01-10", 2, "purchase", 1.00),
        ("2024-01-20", 2, "purchase", 2.00),
        ("2024-01-10", 4, "purchase", 2.00),
        ("2024-01-20", 4, "purchase", 3.00),
        ("2024-01-10", 1, "purchase", 1.00),
        ("2024-01-20", 1, "purchase", 4.00),
        ("2024-01-10", 3, "purchase", 2.00),
        ("2024-01-20", 3, "purchase", 7.00),
        ("2024-01-12", 5, "view", 99.0),  # non-purchase: excluded
    ]
    _write_events(tmp_path, rows)

    [r] = ab_did_estimator(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b) == (2, 2)
    assert (r.pre_mean_a, r.post_mean_a) == (1.5, 2.5)
    assert (r.pre_mean_b, r.post_mean_b) == (1.5, 5.5)
    assert (r.did, r.se_did, r.t_did) == (3.0, 1.0, 3.0)


def test_ab_did_zero_variance_arm_is_null_not_crash(spark, tmp_path):
    """A single-user arm has undefined delta variance: the NULLIF
    guards must yield NULL se/t (matching the oracle), never an ANSI
    DIVIDE_BY_ZERO crash."""
    from backend_model_spark.operators.events_ops import ab_did_estimator

    rows = [
        ("2024-01-10", 2, "purchase", 1.00),  # lone A user
        ("2024-01-10", 1, "purchase", 1.00),
        ("2024-01-20", 1, "purchase", 2.00),
        ("2024-01-10", 3, "purchase", 1.00),
    ]
    _write_events(tmp_path, rows)

    [r] = ab_did_estimator(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b) == (1, 2)
    assert r.se_did is None and r.t_did is None
    assert r.did is not None


# --- RRF hybrid retrieval ----------------------------------------------------


def _write_embeddings(tmp_path, vecs):
    import numpy as np

    pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype="float32") for v in vecs],
            "label": [0] * len(vecs),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")


def _rrf_reference(texts, vecs):
    """Independent pure-Python implementation of the RRF spec:
    rational-idf lexical arm (per-term micro-floor, integer sum),
    exact-cosine dense arm (query = vec 0), integer-nano fusion."""
    import math
    import re

    toks = [re.split(r"\s+", t.strip()) for t in texts]
    dl = [len(t) for t in toks]
    n_docs = float(len(dl))
    avgdl = sum(dl) / len(dl)
    terms = ("data", "spark", "filter")
    df = {t: float(sum(1 for tk in toks if t in tk)) for t in terms}
    lex = {}
    for d, tk in enumerate(toks):
        micro = 0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            ts = (
                ((n_docs - df[t] + 0.5) / (df[t] + 0.5))
                * tf
                * (1.2 + 1.0)
                / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl[d] / avgdl))
            )
            micro += math.floor(ts * 1e6 + 0.5)
        if micro or any(t in tk for t in terms):
            lex[d] = micro
    lex_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(lex.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        )
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    qv = vecs[0]
    qn = math.sqrt(dot(qv, qv))
    cos = {
        i: round(dot(qv, v) / (qn * math.sqrt(dot(v, v))), 6)
        for i, v in enumerate(vecs)
    }
    dense_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        )
    }
    fused = {}
    for d in set(lex_rank) | set(dense_rank):
        nano = 0
        if d in lex_rank:
            nano += 1_000_000_000 // (60 + lex_rank[d])
        if d in dense_rank:
            nano += 1_000_000_000 // (60 + dense_rank[d])
        fused[d] = nano
    out = []
    for i, (d, nano) in enumerate(
        sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ):
        out.append(
            (d, lex_rank.get(d), dense_rank.get(d), nano / 1e9, i + 1)
        )
    return out


def test_rrf_hybrid_matches_python_reference(spark, tmp_path):
    """6-doc fixture where every fusion regime occurs: doc 0 is
    dense-only (no query terms, dense rank 1 as the query itself),
    docs 2/3 are lexical-heavy, doc 4 matches neither arm's top — the
    Spark output must equal an independent pure-Python implementation
    row for row."""
    from backend_model_spark.operators.similarity import rrf_hybrid_rank

    texts = [
        "alpha beta gamma",
        "data spark filter",
        "data data spark",
        "filler filler filler filler data",
        "nothing here at all",
        "spark filter spark",
    ]
    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    vecs = [
        e1,
        [2.0 * x for x in e1],
        e2,
        [a + b for a, b in zip(e1, e2)],
        [-x for x in e1],
        e2,
    ]
    _write_docs(tmp_path, texts)
    _write_embeddings(tmp_path, vecs)

    got = [
        (r.doc_id, r.lex_rank, r.dense_rank, r.rrf, r.fused_rank)
        for r in rrf_hybrid_rank(spark, str(tmp_path)).collect()
    ]
    assert got == _rrf_reference(texts, vecs)
    # doc 0: the query vector itself — dense rank 1, no lexical rank
    top = {d: (lr, dr) for d, lr, dr, _, _ in got}
    assert top[0][1] == 1 and top[0][0] is None


def test_ab_srm_hand_computed(spark, tmp_path):
    """Day 1: 3 even vs 1 odd active user → chi2 = (3−1)²/4 = 1.0,
    no flag; day 2: 9 even vs 1 odd → chi2 = 64/10 = 6.4 > 3.841 →
    flagged. Duplicate events for one user must not double-count
    (distinct on day×user)."""
    from backend_model_spark.operators.events_ops import ab_srm_daily

    rows = [("2024-01-01", u, "view", 1.0) for u in (2, 4, 6, 1)]
    rows += [("2024-01-01", 2, "click", 1.0)]  # dup user-day: ignored
    rows += [
        ("2024-01-02", u, "view", 1.0)
        for u in (2, 4, 6, 8, 10, 12, 14, 16, 18, 1)
    ]
    _write_events(tmp_path, rows)

    got = {r.day: r for r in ab_srm_daily(spark, str(tmp_path)).collect()}
    d1, d2 = got["2024-01-01"], got["2024-01-02"]
    assert (d1.n_a, d1.n_b, d1.chi2, d1.srm_flag) == (3, 1, 1.0, 0)
    assert (d2.n_a, d2.n_b, d2.chi2, d2.srm_flag) == (9, 1, 6.4, 1)


def test_mlp_calibration_deciles_invariants_and_reference(spark):
    """Exact-decile invariants on real data (sizes differ by ≤1, the
    gains curve is monotone and ends at exactly 1.0, mean predictions
    are non-increasing across deciles) plus a full numpy/pandas
    recomputation of the table from the same quantized net."""
    import math

    import numpy as np

    from backend_model_spark.ml.mlp import (
        mlp_calibration_deciles,
        predict_cents,
        weight_arrays,
    )

    rows = mlp_calibration_deciles(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    gains = [r.cum_revenue_share for r in rows]
    assert all(a <= b for a, b in zip(gains, gains[1:]))
    assert gains[-1] == 1.0
    preds = [r.avg_pred_cents for r in rows]
    assert all(a >= b for a, b in zip(preds, preds[1:]))

    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    X = np.column_stack(
        [
            np.floor(li["l_extendedprice"] / 1000.0),
            np.floor(li["l_discount"] * 100 + 0.5),
            np.floor(li["l_tax"] * 100 + 0.5),
            np.floor(li["l_quantity"] + 0.5),
        ]
    ).astype(np.float64)
    ref = pd.DataFrame(
        {
            "k1": li["l_orderkey"].astype("int64"),
            "k2": li["l_linenumber"].astype("int32"),
            "actual": np.floor(li["l_extendedprice"] * 100 + 0.5).astype(
                "int64"
            ),
            "pred": predict_cents(X, weight_arrays()),
        }
    ).sort_values(["pred", "k1", "k2"], ascending=[False, True, True])
    n = len(ref)
    big, q, r = None, n // 10, n % 10
    bounds = []
    start = 0
    for t in range(10):
        size = q + (1 if t < r else 0)
        bounds.append((start, start + size))
        start += size
    exp = []
    ta = int(ref["actual"].sum())
    ca = 0
    for t, (lo, hi) in enumerate(bounds, 1):
        chunk = ref.iloc[lo:hi]
        sp, sa, m = int(chunk["pred"].sum()), int(chunk["actual"].sum()), hi - lo
        ca += sa
        exp.append(
            (
                t,
                m,
                math.floor(sp / m * 100 + 0.5) / 100,
                math.floor(sa / m * 100 + 0.5) / 100,
                math.floor((sp - sa) / m * 100 + 0.5) / 100,
                math.floor(ca / ta * 1e6 + 0.5) / 1e6,
            )
        )
    got = [
        (
            r_.decile,
            r_.n,
            r_.avg_pred_cents,
            r_.avg_actual_cents,
            r_.bias_cents,
            r_.cum_revenue_share,
        )
        for r_ in rows
    ]
    assert got == exp


def test_streaming_windowed_topk_hand_computed(spark, tmp_path):
    """Day 1: counts 5→3, 7→3, 2→2, 9→1 — top-3 keeps the tie in
    user_id order and drops user 9; day 2 has a single row."""
    from backend_model_spark.streaming.jobs import streaming_windowed_topk

    rows = (
        [("2024-01-01", 5, "view", 1.0)] * 3
        + [("2024-01-01", 7, "view", 1.0)] * 3
        + [("2024-01-01", 2, "view", 1.0)] * 2
        + [("2024-01-01", 9, "view", 1.0)]
        + [("2024-01-02", 1, "click", 1.0)]
    )
    _write_events(tmp_path, rows)

    got = [
        (r.day, r.user_id, r.n_events, r.rnk)
        for r in streaming_windowed_topk(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2024-01-01", 5, 3, 1),
        ("2024-01-01", 7, 3, 2),
        ("2024-01-01", 2, 2, 3),
        ("2024-01-02", 1, 1, 1),
    ]


def test_kmeans_lloyd_matches_python_reference(spark):
    """Independent pure-Python Lloyd implementation of the spec
    (first-K init, left-to-right L2² fold, micro-floored distances,
    integer-micro centroid means, 2 updates + final assignment) must
    reproduce the engine's cluster table exactly on real data."""
    import math

    from backend_model_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_UPDATES,
        kmeans_lloyd,
    )

    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }

    def l2_micro(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return math.floor(acc * 1_000_000 + 0.5)

    def assign(cents):
        out = {}
        for vid, v in vecs.items():
            best = min(
                ((l2_micro(v, cv), cid) for cid, cv in sorted(cents.items()))
            )
            out[vid] = best  # (dist_micro, c_id) — min ties break by c_id
        return out

    cents = {cid: vecs[cid] for cid in range(KMEANS_K)}
    for _ in range(KMEANS_UPDATES):
        a = assign(cents)
        sums, cnts = {}, {}
        for vid, (_, cid) in a.items():
            cnts[cid] = cnts.get(cid, 0) + 1
            s = sums.setdefault(cid, [0] * len(vecs[vid]))
            for i, x in enumerate(vecs[vid]):
                s[i] += math.floor(x * 1_000_000 + 0.5)
        cents = {
            cid: [sm / cnts[cid] / 1_000_000.0 for sm in sums[cid]]
            for cid in sums
        }
    final = assign(cents)
    exp = {}
    for _, (dm, cid) in final.items():
        n, s = exp.get(cid, (0, 0))
        exp[cid] = (n + 1, s + dm)
    expected = [
        (cid, n, s, math.floor(s / n + 0.5) / 1e6)
        for cid, (n, s) in sorted(exp.items())
    ]

    got = [
        (r.c_id, r.n_vectors, r.sum_dist_micro, r.avg_dist)
        for r in kmeans_lloyd(spark, SF_DIR).collect()
    ]
    assert got == expected


def test_ab_sequential_hand_computed(spark, tmp_path):
    """Two looks. Look 1: arm A = {100c, 100c} (zero variance), arm B
    = {200c, 400c} → z = (300−100)/√(20000/2) = 2.0 — crosses the
    fixed 1.96 but NOT the OBF boundary 1.96·√2 ≈ 2.771859. Look 2:
    A gains 100c, B gains 300c → z = 2√3 ≈ 3.464102 and the OBF
    boundary has shrunk to its 1.96 terminal anchor → both cross."""
    from backend_model_spark.operators.events_ops import ab_sequential_monitor

    rows = [
        ("2024-01-01", 2, "purchase", 1.00),
        ("2024-01-01", 4, "purchase", 1.00),
        ("2024-01-01", 1, "purchase", 2.00),
        ("2024-01-01", 3, "purchase", 4.00),
        ("2024-01-02", 6, "purchase", 1.00),
        ("2024-01-02", 5, "purchase", 3.00),
        ("2024-01-02", 8, "view", 9.00),  # non-purchase: excluded
    ]
    _write_events(tmp_path, rows)

    got = [
        (r.day, r.look, r.n_a, r.n_b, r.z, r.obf_bound, r.fixed_cross, r.obf_cross)
        for r in ab_sequential_monitor(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2024-01-01", 1, 2, 2, 2.0, 2.771859, 1, 0),
        ("2024-01-02", 2, 3, 3, 3.464102, 1.96, 1, 1),
    ]


# --- property tests: RRF + Lloyd vs their Python references ------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# float32-exact values (multiples of 0.25 within ±4): parquet stores
# float32, the engine upcasts to double — exactness keeps the Python
# reference's float fold bit-identical to the engine's
_f32exact = st.integers(min_value=-16, max_value=16).map(lambda k: k / 4.0)
_rrf_words = ["data", "spark", "filter", "alpha", "beta", "gamma"]


def _scratch_dir(tmp_base="/root/repo/.scratch/r5prop"):
    import uuid

    d = os.path.join(tmp_base, uuid.uuid4().hex[:12])
    os.makedirs(d, exist_ok=True)
    return d


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.lists(st.sampled_from(_rrf_words), min_size=1, max_size=12),
            st.lists(_f32exact, min_size=7, max_size=7),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_rrf_hybrid_property(spark, data):
    """Adversarially-generated corpora: Spark RRF must equal the
    pure-Python reference row for row (vector component 0 is pinned
    to 1.0 so no norm is zero)."""
    from pathlib import Path

    from backend_model_spark.operators.similarity import rrf_hybrid_rank

    texts = [" ".join(words) for words, _ in data]
    vecs = [[1.0] + tail for _, tail in data]
    sf = _scratch_dir()
    _write_docs(Path(sf), texts)
    _write_embeddings(Path(sf), vecs)

    got = [
        (r.doc_id, r.lex_rank, r.dense_rank, r.rrf, r.fused_rank)
        for r in rrf_hybrid_rank(spark, sf).collect()
    ]
    assert got == _rrf_reference(texts, vecs)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(_f32exact, min_size=4, max_size=4), min_size=1, max_size=14
    )
)
def test_kmeans_lloyd_property(spark, vecs):
    """Random small corpora (any n vs the K=8 init, duplicate vectors,
    exact ties): the engine must equal a pure-Python Lloyd run with
    the same init/tie-break/quantization rules."""
    import math
    from pathlib import Path

    from backend_model_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_UPDATES,
        kmeans_lloyd,
    )

    sf = _scratch_dir()
    _write_embeddings(Path(sf), vecs)

    vd = {i: v for i, v in enumerate(vecs)}

    def l2_micro(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return math.floor(acc * 1_000_000 + 0.5)

    def assign(cents):
        return {
            vid: min((l2_micro(v, cv), cid) for cid, cv in sorted(cents.items()))
            for vid, v in vd.items()
        }

    cents = {cid: vd[cid] for cid in range(min(KMEANS_K, len(vecs)))}
    for _ in range(KMEANS_UPDATES):
        a = assign(cents)
        sums, cnts = {}, {}
        for vid, (_, cid) in a.items():
            cnts[cid] = cnts.get(cid, 0) + 1
            s = sums.setdefault(cid, [0] * len(vd[vid]))
            for i, x in enumerate(vd[vid]):
                s[i] += math.floor(x * 1_000_000 + 0.5)
        cents = {
            cid: [sm / cnts[cid] / 1_000_000.0 for sm in sums[cid]]
            for cid in sums
        }
    final = assign(cents)
    exp = {}
    for _, (dm, cid) in final.items():
        n, s = exp.get(cid, (0, 0))
        exp[cid] = (n + 1, s + dm)
    expected = [
        (cid, n, s, math.floor(s / n + 0.5) / 1e6)
        for cid, (n, s) in sorted(exp.items())
    ]

    got = [
        (r.c_id, r.n_vectors, r.sum_dist_micro, r.avg_dist)
        for r in kmeans_lloyd(spark, sf).collect()
    ]
    assert got == expected


@pytest.fixture(scope="module", autouse=True)
def _clean_r5prop_scratch():
    yield
    import shutil

    shutil.rmtree("/root/repo/.scratch/r5prop", ignore_errors=True)


def test_target_encode_kfold_matches_python_reference(spark, tmp_path):
    """Python reference with the same md5 folds and smoothing algebra:
    a row's own fold must be excluded from its encoding, and every
    (nation, fold) cell must match the closed form exactly."""
    import hashlib
    import math

    from backend_model_spark.operators.ml_queries import (
        TE_FOLDS,
        TE_SMOOTHING,
        target_encode_kfold,
    )

    orders = [(k, 100 + k, float(10 + k)) for k in range(1, 41)]
    pd.DataFrame(
        {
            "o_orderkey": [o[0] for o in orders],
            "o_custkey": [o[1] for o in orders],
            "o_totalprice": [o[2] for o in orders],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame(
        {
            "c_custkey": [100 + k for k in range(1, 41)],
            "c_nationkey": [k % 3 for k in range(1, 41)],
        }
    ).to_parquet(tmp_path / "customer.parquet")

    def fold(orderkey):
        return int(hashlib.md5(str(orderkey).encode()).hexdigest()[:4], 16) % TE_FOLDS

    cells = {}
    for k, ck, price in orders:
        nat, f = (ck - 100) % 3, fold(k)
        cents = math.floor(price * 100 + 0.5)
        n, s = cells.get((nat, f), (0, 0))
        cells[(nat, f)] = (n + 1, s + cents)
    cat = {}
    for (nat, f), (n, s) in cells.items():
        cn, cs = cat.get(nat, (0, 0))
        cat[nat] = (cn + n, cs + s)
    g_n = sum(n for n, _ in cells.values())
    g_s = sum(s for _, s in cells.values())
    m = TE_SMOOTHING
    expected = [
        (
            nat,
            f,
            n,
            math.floor(
                ((cat[nat][1] - s) + m * (g_s / g_n))
                / float((cat[nat][0] - n) + m)
                * 1e6
                + 0.5
            )
            / 1e6,
        )
        for (nat, f), (n, s) in sorted(cells.items())
    ]

    got = [
        (r.c_nationkey, r.fold, r.fold_n, r.enc_cents)
        for r in target_encode_kfold(spark, str(tmp_path)).collect()
    ]
    assert got == expected
    # leakage check by construction: a singleton (nation, fold) cell's
    # encoding must not equal its own raw mean
    for (nat, f), (n, s) in cells.items():
        if n == 1 and cat[nat][0] > 1:
            enc = dict(((a, b), d) for a, b, _, d in got)[(nat, f)]
            assert abs(enc - s / 100.0) > 1e-9


def test_log2_histogram_hand_computed(spark, tmp_path):
    """Prices 0.01, 0.02, 0.03, 10.24 → cents 1, 2, 3, 1024 →
    buckets 0 ([1,1]), 1 ([2,3] twice), 10 ([1024,2047]); shares in
    exact micro units."""
    from backend_model_spark.operators.aggregates import log2_histogram

    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_totalprice": [0.01, 0.02, 0.03, 10.24],
        }
    ).to_parquet(tmp_path / "orders.parquet")

    got = [
        (r.bucket, r.lo_cents, r.hi_cents, r.n_orders, r.sum_cents, r.share_micro)
        for r in log2_histogram(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (0, 1, 1, 1, 1, 250000),
        (1, 2, 3, 2, 5, 500000),
        (10, 1024, 2047, 1, 1024, 250000),
    ]
