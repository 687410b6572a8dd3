"""Zero-variance (constant-column) robustness gate.

Round-5's verdict found `stat_mann_whitney` crashing with an ANSI
DIVIDE_BY_ZERO on all-tied input and asked for a sweep of the whole
stat/agg surface on a constant-column fixture.  The round-6 sweep
(full registry over a fixture where every numeric measure column is a
constant) found seven more: agg_spearman_corr, agg_correlation
(F.corr itself raises under ANSI), agg_normality_probe (zero IQR),
events_anomaly_zscore (zero variance + DuckDB sqrt(negative)),
ml_linear_fit_closed_form / ml_ols_cv_sufficient (zero slope
denominator), ml_group_ols_pandas (Python ZeroDivisionError in the
grouped-map UDF), and ml_ridge_closed_form (DuckDB sqrt of a
float-cancellation negative in the oracle).

This test pins the fixed behavior: every entry that touched a
degenerate-sensitive formula must RUN on the constant fixture and
hash-match its DuckDB oracle there — except ml_ridge_closed_form,
where Cramer-determinant cancellation on an all-constant corpus
legitimately differs between engines at the 6th decimal (documented
exemption: run-without-crash is still asserted).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# entries whose formulas divide by a variance/IQR/determinant — the
# degenerate-sensitive surface found by the round-6 full-registry sweep
ENTRIES = [
    "stat_mann_whitney",
    "agg_spearman_corr",
    "agg_correlation",
    "agg_normality_probe",
    "events_anomaly_zscore",
    "ml_linear_fit_closed_form",
    "ml_ols_cv_sufficient",
    "ml_group_ols_pandas",
    "ml_ridge_closed_form",
]

# cross-engine float-cancellation on an all-constant corpus (±1e-6
# rmse, -0.0 signs) — crash-freedom asserted, hash parity exempted
HASH_EXEMPT = {"ml_ridge_closed_form"}

# entries whose cosine/normalization divides by a vector norm — the
# zero-vector fixture drove every one to DIVIDE_BY_ZERO before the
# shared _safe_cos CASE text (zero-norm ⇒ cosine 0.0) landed
VEC_ENTRIES = [
    "sim_cosine_topk_bruteforce",
    "sim_ivf_topk",
    "sim_ivf_recall",
    "sim_knn_classify",
    "sim_matryoshka_recall",
    "sim_centroid_assign",
    "sim_rrf_hybrid_rank",
    "dedup_embedding_neardup",
    "dedup_embedding_clusters",
]
# MLlib's own contract rejects all-zero inputs (MinHashLSH requires a
# non-zero entry; KMeans degenerates) — library behavior, not ours:
# mllib_minhash_neardup / mllib_brp_ann_join / mllib_kmeans_clusters /
# mllib_pca_variance stay exempt here (since round 6 they are oracled
# certificate entries, but the zero-vector rejection is still the
# library's, so the exemption stands).


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory) -> str:
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("degenerate"))
    for f in glob.glob(os.path.join(src, "*.parquet")):
        name = os.path.basename(f)
        df = pd.read_parquet(f)
        if name == "orders.parquet":
            df["o_totalprice"] = 100.0
        elif name == "lineitem.parquet":
            df["l_extendedprice"] = 100.0
            df["l_quantity"] = 10.0
            df["l_discount"] = 0.05
            df["l_tax"] = 0.02
        elif name == "events.parquet":
            df["value"] = 1.0
        df.to_parquet(os.path.join(dst, name), index=False)
    return dst


def _vhash(pdf: pd.DataFrame) -> str:
    # dtype-strict (itertuples), same as scripts/drive_driver.py
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5(json.dumps(rows).encode()).hexdigest()[:12]


@pytest.fixture(scope="module")
def zerovec_dir(tmp_path_factory) -> str:
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("zerovec"))
    for f in glob.glob(os.path.join(src, "*.parquet")):
        name = os.path.basename(f)
        df = pd.read_parquet(f)
        if name == "embeddings.parquet":
            df["embedding"] = df["embedding"].map(lambda v: [0.0] * len(v))
        df.to_parquet(os.path.join(dst, name), index=False)
    return dst


def test_zero_vector_entries_run_and_match(spark, zerovec_dir):
    from backend_model_spark.plans.registry import oracle_sql, queries

    qs, osql = queries(), oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{zerovec_dir}/{t}.parquet')"
        )
    failures = []
    for name in VEC_ENTRIES:
        spdf = qs[name](spark, zerovec_dir).toPandas()  # must not raise
        if name not in osql:
            continue
        opdf = con.execute(osql[name]).fetchdf()
        if _vhash(spdf) != _vhash(opdf):
            failures.append(name)
    assert not failures, f"zero-vector hash mismatches: {failures}"


def test_degenerate_entries_run_and_match(spark, degen_dir):
    from backend_model_spark.plans.registry import oracle_sql, queries

    qs, osql = queries(), oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degen_dir}/{t}.parquet')"
        )
    failures = []
    for name in ENTRIES:
        spdf = qs[name](spark, degen_dir).toPandas()  # must not raise
        if name in HASH_EXEMPT or name not in osql:
            continue
        opdf = con.execute(osql[name]).fetchdf()  # must not raise either
        if _vhash(spdf) != _vhash(opdf):
            failures.append(name)
    assert not failures, f"degenerate hash mismatches: {failures}"
