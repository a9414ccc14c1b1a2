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

Identical in both engines by construction (exact wide-integer division
+ a final int→double division). The intermediates run in DECIMAL(38,0)
on the Spark side and HUGEINT (int128) in DuckDB (r5 advice: the old
int64 form overflowed once |num| exceeded ~4.6e12 — e.g. an amplitude
sum scaled by 1e8 at large SF — and Spark wraps where DuckDB errors,
so overflow was an engine-divergence hazard, not just a wrong answer).
The published micros value (the RATIO × 1e6) must still fit int64 /
2^53 — true for every bounded-ratio call site by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Exact integer cents from a 2dp-valued double column."""
    return F.round(col * 100).cast("long")


def ratio6(num_int: Column, den_int: Column) -> Column:
    """round(num/den, 6) with half-away-from-zero ties, exact in
    DECIMAL(38,0) intermediates (module docstring: overflow hazard).

    NULL when den <= 0 or any input is NULL.
    """
    a = F.abs(num_int).cast("decimal(38,0)")
    d = den_int.cast("decimal(38,0)")
    sign = F.when(num_int >= 0, F.lit(1)).otherwise(F.lit(-1))
    micros = F.call_function(
        "div", a * F.lit(2_000_000) + d, d * F.lit(2)
    )
    return F.when(den_int > 0, sign * micros / F.lit(1_000_000.0))


def ratio6_sql(num_sql: str, den_sql: str) -> str:
    """DuckDB SQL rendering of the same exact rounded ratio (HUGEINT
    intermediates match Spark's DECIMAL(38,0))."""
    return (
        f"CASE WHEN ({den_sql}) > 0 THEN "
        f"(CASE WHEN ({num_sql}) >= 0 THEN 1 ELSE -1 END) * "
        f"((CAST(ABS({num_sql}) AS HUGEINT) * 2000000 + ({den_sql})) "
        f"// (2 * CAST(({den_sql}) AS HUGEINT))) "
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
    integer, the micro-unit mean is one integer division. The sum runs
    in DECIMAL(38,0) / HUGEINT so a 100 TB-sized group cannot overflow
    the micro-unit accumulator (same hazard class as ratio6)."""
    s6 = F.sum(F.round(col6 * 1_000_000).cast("decimal(38,0)"))
    n = F.count(F.lit(1))
    sign = F.when(s6 >= 0, F.lit(1)).otherwise(F.lit(-1))
    micros = F.call_function("div", F.abs(s6) * 2 + n, n * 2)
    return sign * micros / F.lit(1_000_000.0)


def mean6_sql(col_sql: str) -> str:
    """DuckDB rendering of the same exact 6dp mean (aggregate context).
    SUM(BIGINT) is natively HUGEINT in DuckDB — kept wide on purpose to
    mirror the Spark DECIMAL(38,0) accumulator."""
    s6 = f"SUM(CAST(ROUND(({col_sql}) * 1000000) AS BIGINT))"
    return (
        f"(CASE WHEN {s6} >= 0 THEN 1 ELSE -1 END)"
        f" * ((ABS({s6}) * 2 + COUNT(*)) // (2 * COUNT(*)))"
        f" / 1000000.0"
    )
