"""Central query registry: name -> (spark_fn, oracle_sql | None).

``__spark_entry__.py`` re-exports this as the driver contract. Every
operator family registers here; oracle_sql is ``None`` only for
genuinely non-SQL-expressible ops (approximate LSH, streaming state,
ML training), which the driver checks rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = RegisteredQuery(fn=fn, oracle=oracle)


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from backend_model_spark.plans import catalog  # noqa: F401

    _LOADED = True
