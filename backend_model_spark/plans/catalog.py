"""Wires every operator into the registry. Import side-effectful."""

from __future__ import annotations

from backend_model_spark.operators import relational
from backend_model_spark.plans.registry import register

register("q1_pricing_summary", relational.q1_pricing_summary, relational.Q1_ORACLE)
