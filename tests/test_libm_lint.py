"""Lint: no NEW libm calls in oracle-hashed output lineage.

Policy (SCALE.md §"Cross-engine float determinism"): ``ln``, ``log10``,
``exp``, ``pow`` & friends are not correctly rounded by IEEE-754, so the
JVM and DuckDB may disagree in the last ulp. When such a value is
rounded (``ROUND(x, 6)`` / ``FLOOR(x*1e6+0.5)``) and then hash-compared
across engines, a boundary value flips the last kept digit on one
engine only — the ``func_math`` round-4 failure class. The flip
probability per emitted value is tiny but per-ROW libm over thousands
of rows makes it material.

Allowed patterns, each requiring an ALLOWLIST entry below:
  - ORDER-BY-only: the libm value ranks rows but is dropped from the
    projection, and key gaps are ≫ 1 ulp by construction.
  - bounded-cardinality: the libm value lands in a projection with few
    rows (aggregate level, fixed grids, distinct-vocab tables), where
    the per-round flip risk is accepted and has stayed green.
  - exact-roundtrip: exp(ln(x)) of a value already quantized to the
    rounding grid (boundary distance ≫ ulp error).
  - rows-only entries (no oracle hash), e.g. numpy-verified IRLS.

Forbidden (fix, don't allowlist): per-row libm whose rounded value is
hashed and scales with the data (use plain multiplies for integer
powers, ``x*sqrt(x)`` for 1.5 powers, digit-count proxies for log10,
monotone equivalents for sigmoids, or shared decimal-literal weight
tables for bounded exponent ranges — see scalar_funcs.math_functions,
text.quality_classifier, events_ops._EWMA_W_LITS).

A new libm call site therefore FAILS this test until it is either
re-expressed exactly or consciously added here with its justification.
"""

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent / "backend_model_spark"

_LIBM = re.compile(
    r"F\.(log|log10|log2|log1p|exp|expm1|pow)\("
    r"|\*\* *[0-9.]"
    r"|\*\* *F\.lit"
    r"|[^A-Za-z_](LN|LOG|LOG10|LOG2|EXP|POW|POWER)\("
)
_CTX = re.compile(r"^(?:def (\w+)|(\w+)\s*=|    def (\w+))")

# (relative file, enclosing def/constant) -> justification
ALLOWLIST = {
    ("ml/cleaning.py", "invert_log_price"): "exact-roundtrip: exp(log_price) snaps to the 2-decimal price grid",
    ("operators/cleaning.py", "exp_log_roundtrip"): "exact-roundtrip (F1/F2 battery)",
    ("operators/cleaning.py", "EXP_LOG_ORACLE"): "exact-roundtrip (oracle side)",
    ("operators/events_ops.py", "value_drift_psi"): "bounded-cardinality: PSI terms over a fixed decile grid",
    ("operators/events_ops.py", "ab_survival_km"): "bounded-cardinality: KM curve over the bounded day grid",
    ("operators/ml_queries.py", "logistic_irls"): "betas numpy-test-verified, not oracle-hashed; sigmoid feeds a > 0.5 decision",
    ("operators/ml_queries.py", "_irls_fit"): "trainer sufficient stats: driver-solved, never hashed",
    ("operators/ml_queries.py", "logistic_irls_certified"): "sigmoid feeds only certificate booleans; hashed columns are exact counts + TRUEs",
    ("operators/ml_queries.py", "naive_bayes_lang"): "log-scores feed rounded argmax; hashed output is the count matrix",
    ("operators/relational.py", "benford_first_digit"): "9 fixed data-independent LOG10 constants",
    ("operators/relational.py", "BENFORD_ORACLE"): "9 fixed data-independent LOG10 constants (oracle side)",
    ("operators/relational.py", "mutual_information"): "bounded-cardinality: single-row entropy aggregates",
    ("operators/sampling.py", "weighted_sample_topk"): "ORDER-BY-only: ln key dropped from projection, hash-separated gaps",
    ("operators/sampling.py", "WEIGHTED_TOPK_ORACLE"): "ORDER-BY-only (oracle side)",
    ("operators/text.py", "tfidf_top_terms"): "bounded-cardinality: idf over the distinct-term table, not the corpus",
    ("operators/text.py", "TFIDF_ORACLE"): "bounded-cardinality (oracle side)",
    ("operators/text.py", "unigram_entropy"): "bounded-cardinality: single-row corpus entropy",
    ("operators/text.py", "UNIGRAM_ENTROPY_ORACLE"): "bounded-cardinality (oracle side)",
    ("operators/text.py", "source_kl_divergence"): "bounded-cardinality: one row per source",
    ("operators/text.py", "KL_DIVERGENCE_ORACLE"): "bounded-cardinality (oracle side)",
    ("operators/text.py", "bigram_doc_logprob"): "bounded-cardinality: smoothed log-prob ranks a fixed top-k",
    ("operators/text.py", "bm25_rank"): "bounded-cardinality: idf over the few query terms, top-10 output",
}


def _strip_comments(line: str) -> str:
    # python '#' and SQL '--' comments both host prose mentioning POW()
    line = re.sub(r"#.*$", "", line)
    return re.sub(r"--.*$", "", line)


def _scan():
    hits = []
    for f in sorted(ROOT.rglob("*.py")):
        rel = f.relative_to(ROOT).as_posix()
        if rel.startswith("vendor/"):
            # vendored protobuf runtime: integer-only wire format, never
            # in any hashed query lineage
            continue
        lines = f.read_text().splitlines()
        for i, raw in enumerate(lines):
            line = _strip_comments(raw)
            if not _LIBM.search(line) or "explode" in line.lower():
                continue
            ctx = "?"
            for j in range(i, -1, -1):
                cm = _CTX.match(lines[j])
                if cm:
                    ctx = next(g for g in cm.groups() if g)
                    break
            hits.append((rel, ctx, i + 1))
    return hits


def test_no_unreviewed_libm_call_sites():
    unreviewed = [
        f"{rel}:{line} (context: {ctx})"
        for rel, ctx, line in _scan()
        if (rel, ctx) not in ALLOWLIST
    ]
    assert not unreviewed, (
        "libm call sites outside the reviewed allowlist (cross-engine "
        "last-ulp flip risk — re-express exactly or add a justified "
        "ALLOWLIST entry in tests/test_libm_lint.py):\n"
        + "\n".join(unreviewed)
    )


def test_allowlist_has_no_stale_entries():
    live = {(rel, ctx) for rel, ctx, _ in _scan()}
    stale = [k for k in ALLOWLIST if k not in live]
    assert not stale, f"ALLOWLIST entries with no remaining call site: {stale}"
