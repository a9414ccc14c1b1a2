"""Indicator plugin registry.

Mirrors the reference's contract (indicators/base.py:21-125): each
indicator declares meta (name, lookback, min_data), is registered via a
decorator, can be enabled/disabled by env config, and computes a
**single latest-row result** from a per-(symbol, interval) OHLCV tail.

Differences from the reference are deliberate Spark-first choices:
- compute functions are pure pandas-in/dict-out (no DB handles), so one
  Arrow batch can evaluate the whole surface per group;
- every indicator declares its output schema up front (the reference
  infers SQLite columns from the first written DataFrame,
  db/reader.py:262-279 — implicit schemas don't survive a cluster).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd

# output dtype names are Spark SQL type strings
ComputeFn = Callable[[pd.DataFrame], dict[str, object]]


@dataclass
class IndicatorMeta:
    name: str
    outputs: list[tuple[str, str]]  # (column, spark type)
    lookback: int = 300
    min_data: int = 30
    citation: str = ""
    fn: ComputeFn = field(default=None, repr=False)  # type: ignore[assignment]


REGISTRY: dict[str, IndicatorMeta] = {}


def register(
    name: str,
    outputs: list[tuple[str, str]],
    lookback: int = 300,
    min_data: int = 30,
    citation: str = "",
) -> Callable[[ComputeFn], ComputeFn]:
    """Register an indicator compute function.

    ``fn(bars)`` receives a time-ordered OHLCV DataFrame with columns
    ``open, high, low, close, volume`` (float64) and returns
    ``{output_col: value}`` for the latest bar. Missing keys become
    NULL; extra keys are dropped (the reference's column-alignment rule,
    db/reader.py:262-279)."""

    def deco(fn: ComputeFn) -> ComputeFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate indicator {name!r}")
        REGISTRY[name] = IndicatorMeta(
            name=name, outputs=outputs, lookback=lookback,
            min_data=min_data, citation=citation, fn=fn,
        )
        return fn

    return deco


def active_indicators() -> dict[str, IndicatorMeta]:
    """Env-filtered view of the registry (reference base.py:88-107:
    INDICATORS_ENABLE / INDICATORS_DISABLE comma lists)."""
    import tradecat_spark.indicators.library  # noqa: F401  (populate)

    enable = {
        s.strip() for s in os.environ.get("INDICATORS_ENABLE", "").split(",") if s.strip()
    }
    disable = {
        s.strip() for s in os.environ.get("INDICATORS_DISABLE", "").split(",") if s.strip()
    }
    out = {}
    for name, meta in REGISTRY.items():
        if enable and name not in enable:
            continue
        if name in disable:
            continue
        out[name] = meta
    return out
