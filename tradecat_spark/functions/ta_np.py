"""ndarray-level access to the exact pandas window kernels (r14 verdict
Next #3: vectorize the indicator surface without changing one value).

Why this exists: the 38-class indicator surface spends >70% of its
Python-stage time in pandas *dispatch* (Series construction, block
manager, isinstance storms — cProfile: 208k Series.__init__ calls per
1050 groups), not in math. Rewriting the classes on raw ndarrays
removes that overhead — but pandas' rolling mean/sum/var use RUNNING
add/remove algorithms with Kahan compensation whose results are NOT
bit-equal to fresh per-window recomputation (measured 20-99% of
positions differ in the last ulps on mixed-scale data), and ``ewm``
round-trips the user alpha through center-of-mass
(``alpha_eff = 1/(1 + (1-alpha)/alpha)``), which is not the user's
alpha bit-for-bit either.

So instead of re-implementing, these wrappers call the SAME compiled
pandas kernels (``pandas._libs.window.aggregations``) directly on
ndarrays with precomputed window bounds — bit-identical to the
``Series.rolling(...)``/``Series.ewm(...)`` calls they replace by
construction (it is literally the same code), at C speed, with none of
the frame machinery. ``tests/test_ta_np.py`` pins bit-equality against
the public pandas API on adversarial data (mixed scales, zeros, NaN
prefixes and gaps, constant runs, short series) so a pandas upgrade
that changes kernel behavior or signatures fails loudly.

Whole-series ``nanmean``/``nanstd`` replicate pandas ``nanops`` (no
bottleneck installed: masked pairwise sum / count), pinned by the same
test.
"""

from __future__ import annotations

import numpy as np
from pandas._libs.window import aggregations as _agg

NAN = float("nan")

#: (N, n) -> (start, end) int64 bounds for a fixed trailing window.
#: Tails are <=500 bars and windows come from a fixed menu, so this
#: stays tiny; it lives per Python worker process.
_BOUNDS_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _bounds(N: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    key = (N, n)
    b = _BOUNDS_CACHE.get(key)
    if b is None:
        idx = np.arange(N, dtype=np.int64)
        b = (np.maximum(idx - n + 1, 0), idx + 1)
        _BOUNDS_CACHE[key] = b
    return b


def _f8(x: np.ndarray) -> np.ndarray:
    return x if x.dtype == np.float64 else x.astype(np.float64)


def roll_mean(x: np.ndarray, n: int) -> np.ndarray:
    """``Series.rolling(n, min_periods=1).mean()`` bit-for-bit."""
    s, e = _bounds(len(x), n)
    return _agg.roll_mean(_f8(x), s, e, 1)


def roll_sum(x: np.ndarray, n: int) -> np.ndarray:
    """``Series.rolling(n, min_periods=1).sum()`` bit-for-bit."""
    s, e = _bounds(len(x), n)
    return _agg.roll_sum(_f8(x), s, e, 1)


def roll_var(x: np.ndarray, n: int, ddof: int = 1) -> np.ndarray:
    """``Series.rolling(n, min_periods=1).var(ddof)`` bit-for-bit."""
    s, e = _bounds(len(x), n)
    return _agg.roll_var(_f8(x), s, e, 1, ddof)


def roll_std(x: np.ndarray, n: int, ddof: int = 1) -> np.ndarray:
    """``Series.rolling(n, min_periods=1).std(ddof)``: pandas computes
    ``zsqrt(var)`` — sqrt with NEGATIVE variances (running-algorithm
    artifacts on extreme-magnitude data) clipped to 0, not NaN."""
    v = roll_var(x, n, ddof)
    with np.errstate(invalid="ignore"):
        out = np.sqrt(v)
    mask = v < 0
    if mask.any():
        out[mask] = 0
    return out


def roll_max(x: np.ndarray, n: int) -> np.ndarray:
    """``Series.rolling(n, min_periods=1).max()`` bit-for-bit."""
    s, e = _bounds(len(x), n)
    return _agg.roll_max(_f8(x), s, e, 1)


def roll_min(x: np.ndarray, n: int) -> np.ndarray:
    """``Series.rolling(n, min_periods=1).min()`` bit-for-bit."""
    s, e = _bounds(len(x), n)
    return _agg.roll_min(_f8(x), s, e, 1)


def roll_median(x: np.ndarray, n: int) -> np.ndarray:
    """``Series.rolling(n, min_periods=1).median()`` bit-for-bit."""
    s, e = _bounds(len(x), n)
    return _agg.roll_median_c(_f8(x), s, e, 1)


def ewm_mean(x: np.ndarray, alpha: float | None = None,
             span: float | None = None) -> np.ndarray:
    """``Series.ewm(alpha|span, adjust=False).mean()`` bit-for-bit.

    pandas converts the user parameter to center-of-mass before the
    kernel sees it (``com = (1-alpha)/alpha`` / ``com = (span-1)/2``)
    and the kernel recovers ``alpha = 1/(1+com)`` — a lossy float
    round-trip that changes results in the last ulp, so we hand the
    kernel the same ``com`` pandas would."""
    if span is not None:
        com = (span - 1.0) / 2.0
    else:
        com = (1.0 - alpha) / alpha
    x = _f8(x)
    N = len(x)
    s = np.zeros(1, dtype=np.int64)
    e = np.full(1, N, dtype=np.int64)
    return _agg.ewm(x, s, e, 1, com, False, False,
                    np.ones(max(N - 1, 0)), True)


def nanmean(x: np.ndarray) -> float:
    """pandas ``Series.mean()`` (nanops.nanmean, no bottleneck):
    NaNs masked to 0, pairwise-summed, divided by the non-NaN count."""
    mask = np.isnan(x)
    cnt = x.size - int(mask.sum())
    if cnt == 0:
        return NAN
    return float(np.where(mask, 0.0, x).sum() / cnt)


def nanstd(x: np.ndarray, ddof: int = 1) -> float:
    """pandas ``Series.std()`` (nanops.nanstd → sqrt(nanvar)): mean via
    masked pairwise sum, then masked pairwise sum of (avg-x)^2 over
    (count - ddof)."""
    mask = np.isnan(x)
    cnt = x.size - int(mask.sum())
    d = cnt - ddof
    if cnt == 0 or d <= 0:
        return NAN
    xv = np.where(mask, 0.0, x)
    avg = xv.sum() / cnt
    sqr = (avg - x) ** 2
    sqr = np.where(mask, 0.0, sqr)
    return float(np.sqrt(sqr.sum() / d))
