"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ranking query on sf0.001;
``queries()`` exposes every declared query from the tradecat_spark
registry; ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
hash-match correctness gate (queries with no SQL-expressible semantics
are intentionally absent there and get the rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tradecat_spark.plans.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["flagship_rank_24h_change"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
