"""Cross-engine exactness helpers: overflow-regression pins.

The r5 advice found ratio6's int64 intermediate (``|num| * 2e6``)
overflows once |num| exceeds ~4.6e12 — and the engines DIVERGE on
overflow (Spark wraps, DuckDB errors), so at large SF the hash gate
would have broken in an unattributable way. The helpers now run in
DECIMAL(38,0) / HUGEINT; these tests pin values past the old edge.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tradecat_spark.plans.exact import (
    mean6,
    mean6_sql,
    ratio6,
    ratio6_sql,
)


@pytest.mark.parametrize(
    "num,den",
    [
        (4_600_000_000_000, 7),          # old int64 edge
        (9_223_372_036_854, 3),          # ~int64_max / 1e6
        (123_456_789_012_345, 997),      # far past the edge
        (-4_600_000_000_001, 13),        # negative side
        (1_135_55, 16_000_000),          # the documented midpoint case
    ],
)
def test_ratio6_wide_intermediates_match_duckdb(spark, num, den):
    got = (
        spark.range(1)
        .select(
            ratio6(
                F.lit(num).cast("long"), F.lit(den).cast("long")
            ).alias("r")
        )
        .collect()[0]["r"]
    )
    want = duckdb.sql(
        f"SELECT {ratio6_sql(str(num), str(den))} AS r"
    ).fetchone()[0]
    assert got == want, (num, den, got, want)


def test_mean6_group_sum_past_int64(spark):
    """A group whose micro-unit SUM exceeds int64 must still produce
    the exact 6dp mean (decimal/HUGEINT accumulator, no wrap)."""
    n_rows, v = 4, 4.0e12  # sum of micros = 1.6e19 > int64 max
    df = spark.range(n_rows).select(F.lit(v).alias("x"))
    got = df.agg(mean6(F.col("x")).alias("m")).collect()[0]["m"]
    want = duckdb.sql(
        f"SELECT {mean6_sql('x')} AS m FROM "
        f"(SELECT CAST({v!r} AS DOUBLE) AS x FROM range({n_rows}))"
    ).fetchone()[0]
    assert got == want == v
