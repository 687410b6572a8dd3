"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); keeping the
default at sf0.001 makes the suite fast while iterating. Set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full-size check.
"""

from __future__ import annotations

import pytest

from backend_model_spark.plans import registry
from backend_model_spark.testing.oracle import compare

registry._ensure_loaded()
_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()
_ORACLE_NAMES = sorted(_ORACLES)
_ROWS_ONLY_NAMES = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    result = compare(name, spark, _QUERIES[name], _ORACLES[name], sf_dir)
    assert result.ok, str(result)


def test_no_rows_only_entries_remain():
    """Round 6 eliminated the rows-only tail (every registered entry
    carries a full DuckDB oracle); this pins that invariant so a new
    oracle-less registration fails loudly. Replaces the old
    per-rows-only-entry smoke test, which skipped with an empty
    parameter set once the tail hit zero — the suite's one mystery
    skip (round-7 verdict item)."""
    assert _ROWS_ONLY_NAMES == [], (
        f"entries registered without an oracle: {_ROWS_ONLY_NAMES} — "
        "add an oracle_sql (or a certificate oracle) for each"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
