"""Exact cross-engine rounding helpers.

Problem: ``round(num/den, 6)`` disagrees between Spark and DuckDB when
the true quotient is an exact decimal midpoint that is not binary-
representable (e.g. 1135.55/160 = 7.0971875): Spark rounds the shortest
decimal rendering of the quotient double (BigDecimal HALF_UP), DuckDB
rounds ``x*1e6`` computed in doubles — the two paths can land on
opposite sides of the midpoint. Quotients of money-like values (2dp ×
integer counts) hit such midpoints systematically.

Fix: when numerator and denominator are exactly representable as scaled
integers, compute round-half-away-from-zero at 1e-6 entirely in int64:

    micros = (|num| * 2_000_000 + den) div (2 * den)   # den > 0
    result = sign(num) * micros / 1e6

Identical in both engines by construction (int64 division + a final
int→double division, both exact). int64 bound: |num| must stay below
~4.6e12 so ``num * 2e6`` fits int64 — ample for the driver's scale
factors; a petabyte deployment lifts the intermediate to DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Exact integer cents from a 2dp-valued double column."""
    return F.round(col * 100).cast("long")


def ratio6(num_int: Column, den_int: Column) -> Column:
    """round(num/den, 6) with half-away-from-zero ties, exact in int64.

    NULL when den <= 0 or any input is NULL.
    """
    a = F.abs(num_int).cast("long")
    sign = F.when(num_int >= 0, F.lit(1)).otherwise(F.lit(-1))
    micros = F.call_function(
        "div", a * F.lit(2_000_000) + den_int, den_int * F.lit(2)
    )
    return F.when(den_int > 0, sign * micros / F.lit(1_000_000.0))


def ratio6_sql(num_sql: str, den_sql: str) -> str:
    """DuckDB SQL rendering of the same exact rounded ratio."""
    return (
        f"CASE WHEN ({den_sql}) > 0 THEN "
        f"(CASE WHEN ({num_sql}) >= 0 THEN 1 ELSE -1 END) * "
        f"((ABS({num_sql}) * 2000000 + ({den_sql})) // (2 * ({den_sql}))) "
        f"/ 1000000.0 ELSE NULL END"
    )


def cents_sql(col_sql: str) -> str:
    return f"CAST(ROUND(({col_sql}) * 100) AS BIGINT)"


def mean6(col6: Column) -> Column:
    """Aggregate: ``round(avg(col6), 6)`` with half-away-from-zero ties,
    exact in int64, for a column ALREADY rounded to 6dp.

    ``ROUND(SUM(decimal)/COUNT, 6)`` in doubles hits decimal midpoints
    systematically — sums of 6dp-rounded values over integer counts —
    and Spark/DuckDB round() land on opposite sides (found by the r4
    sf0.1 mimic on the bigram LM scorer). Since col6·1e6 is an exact
    integer, the micro-unit mean is one integer division."""
    s6 = F.sum(F.round(col6 * 1_000_000).cast("long"))
    n = F.count(F.lit(1))
    sign = F.when(s6 >= 0, F.lit(1)).otherwise(F.lit(-1))
    micros = F.call_function("div", F.abs(s6) * 2 + n, n * 2)
    return sign * micros / F.lit(1_000_000.0)


def mean6_sql(col_sql: str) -> str:
    """DuckDB rendering of the same exact 6dp mean (aggregate context)."""
    s6 = f"CAST(SUM(CAST(ROUND(({col_sql}) * 1000000) AS BIGINT)) AS BIGINT)"
    return (
        f"(CASE WHEN {s6} >= 0 THEN 1 ELSE -1 END)"
        f" * ((ABS({s6}) * 2 + COUNT(*)) // (2 * COUNT(*)))"
        f" / 1000000.0"
    )
