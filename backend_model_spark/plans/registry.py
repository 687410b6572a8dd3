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


def promote(names: list[str]) -> None:
    """Reorder the registry so ``names`` come first, in list order.

    The round driver verifies a finite PREFIX of the registry, so the
    verified set is an ordering decision, not a code-location one.
    ``catalog.TIER1`` rotates per round (never-yet-driver-checked and
    just-changed entries surface; long-stable ones yield their slot)
    while registration stays grouped by operator family for readers.
    Names must all be registered; the remainder keeps insertion order.
    """
    missing = [n for n in names if n not in _REGISTRY]
    if missing:
        raise ValueError(f"promote of unregistered queries: {missing}")
    rest = {n: rq for n, rq in _REGISTRY.items() if n not in set(names)}
    reordered = {n: _REGISTRY[n] for n in names}
    reordered.update(rest)
    _REGISTRY.clear()
    _REGISTRY.update(reordered)


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
