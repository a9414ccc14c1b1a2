"""Query registry machinery.

Each declared query is a named (Spark builder, DuckDB oracle SQL) pair.
The Spark builder takes (spark, sf_dir) and returns a DataFrame; the
oracle is ANSI SQL over the same parquet tables, used by the verify
driver for row-count + schema + value-hash comparison. Queries whose
semantics are not SQL-expressible (recursive/stateful) carry
``oracle=None`` and get a rows-only check.

Mirrors the reference's registry idiom (indicator ``@register``,
/root/reference/services/trading-service/src/indicators/base.py:78-125).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    survey: str = ""
    description: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    survey: str = "",
    description: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey,
            description=description, bench=bench, tags=tags,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so the registry is fully populated."""
    from tradecat_spark.plans import (  # noqa: F401
        q_relational,
        q_timeseries,
        q_indicators,
        q_text,
        q_similarity,
        q_surface,
        q_serving,
        q_multimodal,
        q_streaming,
        q_sketch,
        q_signal_pack,
        q_orderbook,
        q_charts,
        q_quality,
        q_pg_realtime,
        q_monitor,
        q_cluster,
        q_sessions,
        q_reshape,
        q_instruments,
        q_scale,
        q_retrieval,
        q_anomaly,
        q_checksums,
    )

    return REGISTRY
