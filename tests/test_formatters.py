"""Formatter parity — the reference's own unit-test surface, verbatim.

Expected strings copied from
/root/reference/services/signal-service/tests/test_formatters.py:7-66;
our column-expression formatters must render identically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tradecat_spark.functions.format import (
    fmt_num,
    fmt_pct,
    fmt_price,
    fmt_vol,
    strength_bar,
)


def _render(spark, fn, values):
    pdf = pd.DataFrame({"v": pd.array(values, dtype="Float64")})
    df = spark.createDataFrame(pdf, schema="v double")
    return [r["out"] for r in df.select(fn(F.col("v")).alias("out")).collect()]


def test_strength_bar(spark):
    got = _render(spark, strength_bar, [100.0, 50.0, 0.0, None])
    assert got == ["██████████", "█████░░░░░", "░░░░░░░░░░", "░░░░░░░░░░"]


def test_fmt_price(spark):
    got = _render(spark, fmt_price, [50000.0, 3.5, 0.00015, None])
    assert got == ["$50,000", "$3.50", "$0.0001", "-"]


def test_fmt_pct(spark):
    got = _render(spark, fmt_pct, [5.5, -3.2, 0.0, None])
    assert got == ["+5.50%", "-3.20%", "0.00%", "-"]


def test_fmt_vol(spark):
    got = _render(spark, fmt_vol, [1_500_000_000.0, 50_000_000.0, 5000.0, None])
    assert got == ["$1.50B", "$50.0M", "$5K", "-"]


def test_fmt_num(spark):
    got = _render(spark, fmt_num, [1234.567, None])
    assert got == ["1234.57", "-"]
    got0 = _render(spark, lambda c: fmt_num(c, 0), [1234567.0])
    assert got0 == ["1,234,567"]


import math

from hypothesis import given, settings
from hypothesis import strategies as st

_vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).filter(
        lambda x: not (x == 0 and math.copysign(1, x) < 0)  # -0.0 renders "-0.00"
    ),
    min_size=1,
    max_size=25,
)


@given(vals=_vals)
@settings(max_examples=10, deadline=None)
def test_fmt_pct_matches_cpython(spark, vals):
    got = _render(spark, fmt_pct, vals)
    want = [f"+{v:.2f}%" if v > 0 else f"{v:.2f}%" for v in vals]
    assert got == want
