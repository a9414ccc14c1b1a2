"""Serving-layer display formatters as pure Column expressions.

Reference: the signal-service formatter helpers — strength bars, price /
percent / volume rendering — are the reference's ONLY unit-tested
surface (/root/reference/services/signal-service/src/formatters/base.py,
tests/test_formatters.py:7-66). Re-expressed here as JVM-side column
functions so ranking cards and signal sinks can format in-plan instead
of per-row in Python.

Rounding: Java's ``format_string``/``format_number`` round HALF_UP on
the double's SHORTEST decimal rendering (0.00015 → "0.0002"), while
CPython f-strings round half-even on the EXACT binary value
(float(0.00015) ≈ 1.4999…e-4 → "0.0001") — so Java-side formatting
cannot reproduce the reference's strings. ``_fixed`` below re-derives
CPython's result in column algebra: scale, floor, compare the remainder
to 1/2 (half-even on exact ties), then rebuild the digit string. The
scaled compare uses one correctly-rounded multiply, which agrees with
exact-value rounding unless v·10^d lands bit-exactly on .5 — a
measure-zero family the money-shaped inputs here don't hit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FULL, EMPTY = "█", "░"


def _scaled_int(value: Column, decimals: int) -> Column:
    """|value|·10^d rounded half-even on the exact double, as a long."""
    a = F.abs(value.cast("double"))
    scaled = a * F.lit(float(10**decimals))
    f = F.floor(scaled)  # BIGINT
    frac = scaled - f
    bump = (frac > 0.5) | ((frac == 0.5) & (f % 2 == 1))
    return (f + F.when(bump, 1).otherwise(0)).cast("long")


def _fixed(value: Column, decimals: int, grouped: bool = False) -> Column:
    """CPython-faithful ``f"{v:.{d}f}"`` (optionally ``:,`` grouped)."""
    v = value.cast("double")
    n = _scaled_int(v, decimals)
    sign = F.when(v < 0, F.lit("-")).otherwise(F.lit(""))
    if decimals == 0:
        ip, digits = n, n.cast("string")
    else:
        p = 10**decimals
        ip = (n - n % p) / p
        ip = ip.cast("long")
        digits = F.concat(
            ip.cast("string"),
            F.lit("."),
            F.lpad((n % p).cast("string"), decimals, "0"),
        )
    if grouped:
        head = F.format_number(ip, 0)  # integer input: grouping only
        digits = head if decimals == 0 else F.concat(
            head, F.substring_index(digits, ".", -1)
        )
    return F.concat(sign, digits)


def strength_bar(value: Column, max_val: float = 100.0) -> Column:
    """10-cell bar: ``strength_bar(50) == '█████░░░░░'`` (base.py:9-15)."""
    pct = F.least(F.greatest(value / F.lit(max_val), F.lit(0.0)), F.lit(1.0))
    filled = F.floor(pct * 10).cast("int")
    bar = F.concat(
        F.repeat(F.lit(FULL), filled), F.repeat(F.lit(EMPTY), 10 - filled)
    )
    return F.coalesce(bar, F.lit(EMPTY * 10))


def fmt_price(value: Column) -> Column:
    """``$50,000`` / ``$3.50`` / ``$0.0001`` by magnitude (base.py:18-30)."""
    v = value.cast("double")
    body = (
        F.when(v >= 1000, F.concat(F.lit("$"), _fixed(v, 0, grouped=True)))
        .when(v >= 1, F.concat(F.lit("$"), _fixed(v, 2)))
        .otherwise(F.concat(F.lit("$"), _fixed(v, 4)))
    )
    return F.when(v.isNull(), F.lit("-")).otherwise(body)


def fmt_pct(value: Column, with_sign: bool = True) -> Column:
    """``+5.50%`` / ``-3.20%`` / ``0.00%`` (base.py:33-42)."""
    v = value.cast("double")
    plain = F.concat(_fixed(v, 2), F.lit("%"))
    body = (
        F.when(v > 0, F.concat(F.lit("+"), plain)).otherwise(plain)
        if with_sign
        else plain
    )
    return F.when(v.isNull(), F.lit("-")).otherwise(body)


def fmt_vol(value: Column) -> Column:
    """``$1.50B`` / ``$50.0M`` / ``$5K`` banded volume (base.py:45-57)."""
    v = value.cast("double")
    body = (
        F.when(v >= 1e9, F.concat(F.lit("$"), _fixed(v / 1e9, 2), F.lit("B")))
        .when(v >= 1e6, F.concat(F.lit("$"), _fixed(v / 1e6, 1), F.lit("M")))
        .when(v >= 1e3, F.concat(F.lit("$"), _fixed(v / 1e3, 0), F.lit("K")))
        .otherwise(F.concat(F.lit("$"), _fixed(v, 0)))
    )
    return F.when(v.isNull(), F.lit("-")).otherwise(body)


def fmt_num(value: Column, decimals: int = 2) -> Column:
    """Plain fixed-decimal rendering; 0dp adds thousands grouping
    (base.py:60-69)."""
    v = value.cast("double")
    body = _fixed(v, decimals, grouped=decimals == 0)
    return F.when(v.isNull(), F.lit("-")).otherwise(body)
