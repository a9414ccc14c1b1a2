"""Bit-identity pins for tradecat_spark.functions.ta_np.

The indicator library calls the compiled pandas window kernels
directly on ndarrays (skipping Series/rolling dispatch). Equality here
must be EXACT — the checksum-twin driver gate hashes round-6 values,
and the r14/r15 standard for indicator rewrites is bit-identical
output. Adversarial shapes: mixed magnitudes, zeros, negatives,
constant runs (the GH#42064 same-value short-circuit), NaN prefixes
and mid-series gaps (ewm old_wt decay), tiny magnitudes, short series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tradecat_spark.functions import ta_np


def _cases():
    rng = np.random.default_rng(42)
    out = {
        "price": 100 + np.cumsum(rng.normal(0, 1, 1500)),
        "volume": np.abs(rng.normal(0, 1e7, 1500)),
        "mixed": rng.normal(0, 1, 1500) * (10.0 ** rng.integers(-8, 9, 1500)),
        "zeros": np.where(rng.random(1500) < 0.15, 0.0, rng.normal(5, 2, 1500)),
        "neg": rng.normal(-3, 1, 1500),
        "construn": np.where(rng.random(1500) < 0.4, 7.25, rng.normal(0, 1, 1500)),
        "allconst": np.full(400, 3.7),
        "tiny": rng.normal(0, 1e-300, 400),
        "short": rng.normal(0, 1, 3),
        "one": np.array([2.5]),
    }
    nanpfx = rng.normal(0, 1, 400)
    nanpfx[:34] = np.nan
    out["nanprefix"] = nanpfx
    nanmid = rng.normal(0, 1, 400)
    nanmid[0] = np.nan
    nanmid[100:120] = np.nan
    out["nanmid"] = nanmid
    return out


def _eq(a, b):
    return np.array_equal(
        np.asarray(a, dtype=np.float64),
        np.asarray(b, dtype=np.float64),
        equal_nan=True,
    )


@pytest.mark.parametrize("name,x", sorted(_cases().items()))
def test_rolling_kernels_bit_identical(name, x):
    s = pd.Series(x)
    for n in (5, 14, 20, 30, 200):
        r = s.rolling(n, min_periods=1)
        assert _eq(r.mean().to_numpy(), ta_np.roll_mean(x, n)), (name, n, "mean")
        assert _eq(r.sum().to_numpy(), ta_np.roll_sum(x, n)), (name, n, "sum")
        assert _eq(r.var().to_numpy(), ta_np.roll_var(x, n)), (name, n, "var")
        assert _eq(r.std().to_numpy(), ta_np.roll_std(x, n)), (name, n, "std")
        assert _eq(r.max().to_numpy(), ta_np.roll_max(x, n)), (name, n, "max")
        assert _eq(r.min().to_numpy(), ta_np.roll_min(x, n)), (name, n, "min")
        assert _eq(r.median().to_numpy(), ta_np.roll_median(x, n)), (name, n, "med")


@pytest.mark.parametrize("name,x", sorted(_cases().items()))
def test_ewm_bit_identical(name, x):
    s = pd.Series(x)
    for alpha in (1 / 3, 1 / 14, 1 / 7, 1 / 21, 2 / 10, 1 / 20):
        want = s.ewm(alpha=alpha, adjust=False).mean().to_numpy()
        assert _eq(want, ta_np.ewm_mean(x, alpha=alpha)), (name, alpha)
    for span in (5, 7, 9, 12, 13, 20, 25, 26, 34, 70, 99, 200):
        want = s.ewm(span=span, adjust=False).mean().to_numpy()
        assert _eq(want, ta_np.ewm_mean(x, span=span)), (name, span)


@pytest.mark.parametrize("name,x", sorted(_cases().items()))
def test_series_stats_bit_identical(name, x):
    s = pd.Series(x)
    assert _eq([s.mean()], [ta_np.nanmean(x)]), name
    assert _eq([s.std()], [ta_np.nanstd(x)]), name


def test_noncontiguous_column_views():
    """The library feeds column views out of a single float64 block;
    the kernels must accept them (or the wrapper must copy)."""
    pdf = pd.DataFrame(
        np.random.default_rng(0).normal(0, 1, (300, 5)),
        columns=list("abcde"),
    ).astype("float64")
    col = pdf["c"].to_numpy()
    s = pd.Series(col)
    assert _eq(
        s.rolling(20, min_periods=1).mean().to_numpy(),
        ta_np.roll_mean(col, 20),
    )
    assert _eq(
        s.ewm(span=20, adjust=False).mean().to_numpy(),
        ta_np.ewm_mean(col, span=20),
    )
