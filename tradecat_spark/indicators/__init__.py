"""Registered indicator surface (reference §2.9 parity).

Import :mod:`tradecat_spark.indicators.library` to populate the
registry, then drive :func:`tradecat_spark.indicators.engine.compute_all`.
"""

from tradecat_spark.indicators.base import (  # noqa: F401
    REGISTRY,
    IndicatorMeta,
    active_indicators,
    register,
)
