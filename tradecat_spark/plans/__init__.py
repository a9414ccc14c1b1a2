"""Declared query registry (driver contract surface)."""

from tradecat_spark.plans.registry import REGISTRY, QuerySpec, query  # noqa: F401
