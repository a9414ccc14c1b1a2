"""Streaming incremental indicators — per-key numeric recurrences as
keyed state.

The reference's ``incremental/`` indicator family updates each symbol's
registers in O(1) per new bar instead of recomputing the window:
macd.py:6-12 (EMA12/26 + signal), ema_gc.py:9-59 (EMA7/25/99),
atr.py:7-16 (Wilder TR fold), kdj.py:6-14 (9-bar RSV + double 1/3-EWM),
obv.py:9-22 (signed-volume cumsum), cvd.py:6-24 (taker-delta cumsum).

The Spark mapping is one generic ``applyInPandasWithState`` fold: a
:class:`FoldSpec` declares the state tuple (checkpointed by the
engine), the per-bar recurrence, and the emitted columns; every
concrete indicator is a spec instance. Bars are folded in event-time
order over the WHOLE micro-batch group (Arrow may deliver a key's batch
as multiple chunks — they are concatenated before sorting, so chunking
can never reorder the recurrence).

Parity contract: each recurrence is the exact fold of the pandas
formula the batch side uses (``ewm(adjust=False)`` with the reference's
``min_periods`` masking, rolling-window RSV, cumsum) — a stream fed the
same bars in any micro-batch slicing produces bit-identical outputs,
asserted across checkpoint restarts in tests/test_streaming.py.

Scale: state is a handful of scalars per (symbol, interval) key (KDJ
additionally carries an 8-bar high/low ring buffer); at 615 symbols x
14 intervals the whole state store is well under a MB, and the only
shuffle is the per-batch hash by key that any keyed stream pays.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NAN = float("nan")


def _f(x) -> float:
    v = float(x)
    return v



def _ewm_step(prev: float, x: float, alpha: float) -> float:
    """One ``ewm(adjust=False)`` update with pandas' exact arithmetic:
    the Cython kernel computes ``(old_wt*prev + new_wt*x) /
    (old_wt + new_wt)`` with ``old_wt = 1-alpha`` — the trailing
    division is NOT always a no-op in floating point, and the parity
    contract is bit-identity with the batch pandas fold.

    Known boundary: pandas additionally guards constant stretches — it
    skips the update entirely when ``x == prev`` EXACTLY, keeping the
    register's old bits, while this (guard-free) law recomputes and can
    land 1 ulp away. The guard-free form is the repo's canonical fold:
    every SQL oracle (``_pk_scan`` and the q_signal_pack scans) encodes
    it, and the streaming hash gates compare against those, so adding
    the guard here would desync the gate. Pandas parity therefore holds
    except at exact register == value collisions, which real bar series
    do not produce (and the property tests exclude by construction)."""
    ow = 1.0 - alpha
    return (ow * prev + alpha * x) / (ow + alpha)


def _pandas_alpha(alpha: float) -> float:
    """pandas normalizes ``ewm(alpha=...)`` through the center-of-mass
    (``com = (1-alpha)/alpha``, then ``alpha = 1/(1+com)`` inside the
    kernel) — a LOSSY float round-trip for e.g. alpha=1/3, which lands
    1 ulp away and changes every downstream register. Specs taking a
    raw alpha must fold with the round-tripped value to stay
    bit-identical with the batch formula. (Span-derived alphas
    round-trip exactly, so Macd/EmaGc need no correction.)"""
    com = (1.0 - alpha) / alpha
    return 1.0 / (1.0 + com)


class FoldSpec:
    """One incremental indicator: state layout + per-bar recurrence."""

    #: Spark DDL for the keyed state tuple.
    state_schema: str
    #: Spark DDL fragment for the emitted (non-key, non-ts) columns.
    out_schema: str
    #: input columns required on the stream (besides keys + ts).
    input_cols: tuple[str, ...]

    def init_state(self) -> tuple:
        raise NotImplementedError

    def step(self, state: tuple, row) -> tuple[tuple, tuple]:
        """Advance the recurrence by one bar -> (new state, out values)."""
        raise NotImplementedError


class MacdSpec(FoldSpec):
    """EMA(fast)/EMA(slow)/signal registers (incremental/macd.py:6-12).

    Seeding matches ``ewm(adjust=False)``: the first bar seeds both EMAs
    with its price and the signal line with the first MACD value.
    """

    state_schema = "e_fast double, e_slow double, e_sig double, n long"
    out_schema = (
        "close double, ema_fast double, ema_slow double, macd double, "
        "signal_line double, hist double"
    )
    input_cols = ("close",)

    def __init__(self, fast: int = 12, slow: int = 26, signal: int = 9):
        self.a_f = 2.0 / (fast + 1)
        self.a_s = 2.0 / (slow + 1)
        self.a_g = 2.0 / (signal + 1)

    def init_state(self):
        return (None, None, None, 0)

    def step(self, state, row):
        e_f, e_s, e_g, n = state
        x = _f(row.close)
        if n == 0:
            e_f = e_s = x
        else:
            e_f = _ewm_step(e_f, x, self.a_f)
            e_s = _ewm_step(e_s, x, self.a_s)
        macd = e_f - e_s
        e_g = macd if n == 0 else _ewm_step(e_g, macd, self.a_g)
        return (e_f, e_s, e_g, n + 1), (x, e_f, e_s, macd, e_g, macd - e_g)


class EmaGcSpec(FoldSpec):
    """EMA7/25/99 trend registers (incremental/ema_gc.py:9-59,
    ``ewm(span=n, adjust=False, min_periods=1)`` — no masking)."""

    state_schema = "e7 double, e25 double, e99 double, n long"
    out_schema = "close double, ema7 double, ema25 double, ema99 double"
    input_cols = ("close",)

    def __init__(self, spans: tuple[int, int, int] = (7, 25, 99)):
        self.alphas = tuple(2.0 / (s + 1) for s in spans)

    def init_state(self):
        return (None, None, None, 0)

    def step(self, state, row):
        *emas, n = state
        x = _f(row.close)
        if n == 0:
            emas = [x, x, x]
        else:
            emas = [
                _ewm_step(e, x, a) for e, a in zip(emas, self.alphas)
            ]
        return (*emas, n + 1), (x, *emas)


class AtrSpec(FoldSpec):
    """Wilder ATR register (incremental/atr.py:7-16): true range off the
    previous close folded with ``ewm(alpha=1/period, adjust=False,
    min_periods=period)`` — output is NaN until ``period`` bars seen,
    exactly like the batch formula's mask."""

    state_schema = "prev_close double, atr double, n long"
    out_schema = "tr double, atr double"
    input_cols = ("high", "low", "close")

    def __init__(self, period: int = 14):
        self.alpha = _pandas_alpha(1.0 / period)
        self.period = period

    def init_state(self):
        return (None, None, 0)

    def step(self, state, row):
        pc, atr, n = state
        h, lo, c = _f(row.high), _f(row.low), _f(row.close)
        tr = h - lo
        if pc is not None:
            tr = max(tr, abs(h - pc), abs(lo - pc))
        atr = tr if n == 0 else _ewm_step(atr, tr, self.alpha)
        out_atr = atr if n + 1 >= self.period else NAN
        return (c, atr, n + 1), (tr, out_atr)


class KdjSpec(FoldSpec):
    """KDJ registers (incremental/kdj.py:6-14): RSV over a 9-bar
    rolling extreme window, K = EWM(1/3) of RSV, D = EWM(1/3) of the
    *masked* K output (both ``min_periods=3``), J = 3K - 2D. The state
    carries the previous 8 bars' highs/lows as a ring buffer plus the
    two EWM registers and the non-NaN observation counters pandas'
    min_periods masking depends on."""

    state_schema = (
        "highs array<double>, lows array<double>, k double, d double, "
        "n_rsv long, n_k long"
    )
    out_schema = "rsv double, kdj_k double, kdj_d double, kdj_j double"
    input_cols = ("high", "low", "close")

    def __init__(self, window: int = 9, alpha: float = 1.0 / 3.0,
                 min_periods: int = 3):
        self.window = window
        self.alpha = _pandas_alpha(alpha)
        self.min_periods = min_periods

    def init_state(self):
        return ([], [], None, None, 0, 0)

    def step(self, state, row):
        highs, lows, k, d, n_rsv, n_k = state
        highs = [*highs, _f(row.high)][-self.window:]
        lows = [*lows, _f(row.low)][-self.window:]
        rsv = NAN
        if len(highs) == self.window:
            hi, lo = max(highs), min(lows)
            denom = hi - lo
            rsv = (_f(row.close) - lo) / denom * 100.0 if denom else NAN
        k_out = d_out = NAN
        if not math.isnan(rsv):
            k = rsv if n_rsv == 0 else _ewm_step(k, rsv, self.alpha)
            n_rsv += 1
            if n_rsv >= self.min_periods:
                k_out = k
                # D folds the masked K series, so its recursion starts
                # at the first EMITTED k and counts emitted k's only
                d = k_out if n_k == 0 else _ewm_step(d, k_out, self.alpha)
                n_k += 1
                if n_k >= self.min_periods:
                    d_out = d
        j = 3.0 * k_out - 2.0 * d_out
        return (
            (highs, lows, k, d, n_rsv, n_k),
            (rsv, k_out, d_out, j),
        )


class ObvSpec(FoldSpec):
    """OBV cumsum register (incremental/obv.py:9-22):
    sign(close.diff()) * volume, first diff counts as 0."""

    state_schema = "prev_close double, obv double, n long"
    out_schema = "obv double"
    input_cols = ("close", "volume")

    def init_state(self):
        return (None, 0.0, 0)

    def step(self, state, row):
        pc, obv, n = state
        c, v = _f(row.close), _f(row.volume)
        if pc is not None:
            sign = 1.0 if c > pc else (-1.0 if c < pc else 0.0)
            obv += sign * v
        return (c, obv, n + 1), (obv,)


class CvdSpec(FoldSpec):
    """CVD cumsum register (incremental/cvd.py:6-24): taker delta
    ``buy - (volume - buy)`` accumulated; missing taker volume falls
    back to 50/50 (delta 0), like the reference's fillna."""

    state_schema = "cvd double, n long"
    out_schema = "delta double, cvd double"
    input_cols = ("volume", "taker_buy_volume")

    def init_state(self):
        return (0.0, 0)

    def step(self, state, row):
        cvd, n = state
        vol = _f(row.volume)
        buy = row.taker_buy_volume
        buy = vol * 0.5 if buy is None or pd.isna(buy) else _f(buy)
        sell = max(vol - buy, 0.0)
        delta = buy - sell
        cvd += delta
        return (cvd, n + 1), (delta, cvd)


SPECS: dict[str, type[FoldSpec]] = {
    "macd": MacdSpec,
    "ema_gc": EmaGcSpec,
    "atr": AtrSpec,
    "kdj": KdjSpec,
    "obv": ObvSpec,
    "cvd": CvdSpec,
}


def streaming_fold(
    stream: DataFrame,
    keys: list[str],
    ts: str,
    spec: FoldSpec,
    watermark: str | None = None,
) -> DataFrame:
    """Fold ``spec``'s recurrence over a keyed bar stream.

    Emits one row per input bar with the registers after consuming it.
    The keyed state is exactly ``spec.state_schema``; restarts resume
    from the checkpoint with bit-identical continuations.
    """
    if watermark is not None:
        stream = stream.withWatermark(ts, watermark)
    key_fields = ", ".join(
        f"{k} {stream.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = f"{key_fields}, {ts} timestamp, {spec.out_schema}"
    out_names = [
        f.strip().split()[0] for f in spec.out_schema.split(",")
    ]
    cols = [*keys, ts, *out_names]

    def _proc(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        st = tuple(state.get) if state.exists else spec.init_state()
        rows: list[tuple] = []
        # Materialize the whole group before sorting: Arrow delivers a
        # key's micro-batch as MULTIPLE chunks once it exceeds
        # maxRecordsPerBatch, and folding chunk-by-chunk would apply
        # the recurrence out of global event-time order.
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts)
            for r in pdf.itertuples(index=False):
                st, out = spec.step(st, r)
                rows.append((*key, getattr(r, ts), *out))
        state.update(st)
        yield pd.DataFrame(rows, columns=cols)

    return stream.groupBy(*keys).applyInPandasWithState(
        _proc,
        outputStructType=out_schema,
        stateStructType=spec.state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_macd(
    stream: DataFrame,
    keys: list[str],
    ts: str,
    price: str,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    watermark: str | None = None,
) -> DataFrame:
    """Per-bar MACD(fast, slow, signal) over a keyed bar stream
    (kept as the named entry point; now a :func:`streaming_fold`)."""
    if price != "close":
        stream = stream.withColumnRenamed(price, "close")
    return streaming_fold(
        stream, keys, ts, MacdSpec(fast, slow, signal), watermark
    )
