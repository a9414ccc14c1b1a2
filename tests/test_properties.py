"""Property-based tests (hypothesis) for the operator laws.

The reference has no property tests (SURVEY §5); these pin the algebraic
laws the engine's correctness rests on:

- merge idempotence: re-applying a source batch changes nothing — the
  foundation of exactly-once-ish ingest via replayed upserts.
- cascade law: a coarse rollup built from a finer rollup equals the
  coarse rollup built directly from raw — the soundness condition for
  chaining continuous aggregates (1m → 5m → 1h → 1d).
- real-time view law: materialized-buckets ∪ fresh-tail equals the
  direct rollup for ANY refresh horizon — the materialized_only=false
  read contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tradecat_spark.operators.merge import MERGE_COLS, merge_candles
from tradecat_spark.operators.rollup import (
    cascade_rollup,
    ohlcv_rollup,
    realtime_view,
)

T0 = pd.Timestamp("2025-01-01 00:00:00")

prices = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
).map(lambda x: round(x, 4))


@st.composite
def event_frames(draw):
    """Events with UNIQUE (event_type, ts) — ties would make min_by/max_by
    nondeterministic, which is an input contract (the real tables key bars
    by timestamp), not an engine law."""
    rows = draw(
        st.dictionaries(
            keys=st.tuples(
                st.sampled_from(["X", "Y"]), st.integers(0, 7199)
            ),
            values=prices,
            min_size=1,
            max_size=60,
        )
    )
    return pd.DataFrame(
        [
            dict(event_type=k, ts=T0 + pd.Timedelta(seconds=s), value=v)
            for (k, s), v in rows.items()
        ]
    )


@st.composite
def bar_frames(draw):
    keys = st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 3))
    rows = draw(
        st.dictionaries(
            keys=keys,
            values=st.tuples(prices, prices, prices, prices,
                             st.integers(1, 50), st.booleans()),
            min_size=0,
            max_size=8,
        )
    )
    return pd.DataFrame(
        [
            dict(
                symbol=sym,
                bucket_ts=T0 + pd.Timedelta(minutes=b),
                open=o, high=max(o, h, lo, c), low=min(o, h, lo, c),
                close=c, trade_count=n, is_closed=cl,
            )
            for (sym, b), (o, h, lo, c, n, cl) in rows.items()
        ],
        columns=["symbol", "bucket_ts", *MERGE_COLS],
    )


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(target=bar_frames(), source=bar_frames())
@SETTINGS
def test_merge_idempotent(spark, target, source):
    schema = ("symbol string, bucket_ts timestamp, open double, high double,"
              " low double, close double, trade_count long, is_closed boolean")
    t = spark.createDataFrame(target, schema=schema)
    s = spark.createDataFrame(source, schema=schema)
    once = merge_candles(t, s, ["symbol", "bucket_ts"])
    twice = merge_candles(once, s, ["symbol", "bucket_ts"])
    cols = ["symbol", "bucket_ts", *MERGE_COLS]
    assert _rows(twice, cols) == _rows(once, cols)
    # and unmatched rows pass through: merging an empty source is identity
    empty = spark.createDataFrame(pd.DataFrame(columns=target.columns), schema=schema)
    ident = merge_candles(t, empty, ["symbol", "bucket_ts"])
    assert _rows(ident, cols) == _rows(t, cols)


@given(events=event_frames())
@SETTINGS
def test_cascade_equals_direct(spark, events):
    e = spark.createDataFrame(events)
    fine = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=300)
    cascaded = cascade_rollup(fine, ["event_type"], 300, 3600)
    direct = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600)
    cols = ["event_type", "bucket_ts", "open", "high", "low", "close",
            "trade_count"]
    assert _rows(cascaded, cols) == _rows(direct, cols)


def test_interval_registry_matches_reference():
    """The reference registers 14 caggs (004_continuous_aggregates.sql:
    67-81); we carry all of them plus the 1m base table."""
    from tradecat_spark.operators.rollup import INTERVALS

    assert set(INTERVALS) == {
        "1m", "3m", "5m", "15m", "30m", "1h", "2h", "4h", "6h", "8h",
        "12h", "1d", "3d", "1w", "1M",
    }
    assert INTERVALS["1M"] == "month"
    # week buckets anchor on TimescaleDB's Monday origin
    from tradecat_spark.operators.rollup import BUCKET_ORIGIN
    import datetime

    d = datetime.datetime.fromtimestamp(
        BUCKET_ORIGIN, tz=datetime.timezone.utc
    )
    assert d.weekday() == 0 and (d.hour, d.minute, d.second) == (0, 0, 0)


@given(events=event_frames())
@SETTINGS
def test_month_cascade_equals_direct(spark, events):
    """1d→1M calendar cascade ≡ direct month rollup of raw."""
    from tradecat_spark.operators.rollup import bucket_ts_any

    e = spark.createDataFrame(events)
    day = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=86400)
    cascaded = cascade_rollup(day, ["event_type"], 86400, "month")
    direct = (
        e.groupBy("event_type", bucket_ts_any("ts", "month").alias("bucket_ts"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("trade_count"),
        )
    )
    cols = ["event_type", "bucket_ts", "open", "high", "low", "close",
            "trade_count"]
    assert _rows(cascaded, cols) == _rows(direct, cols)


@given(events=event_frames(), horizon_sec=st.integers(0, 7200))
@SETTINGS
def test_realtime_view_equals_direct(spark, events, horizon_sec):
    e = spark.createDataFrame(events)
    horizon = F.lit(T0 + pd.Timedelta(seconds=horizon_sec))
    materialized = ohlcv_rollup(
        e.filter(F.col("ts") < horizon), ["event_type"], "ts", "value",
        interval_sec=300,
    )
    view = realtime_view(
        materialized, e, ["event_type"], "ts", "value",
        interval_sec=300, refresh_horizon=horizon,
    )
    direct = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=300)
    cols = ["event_type", "bucket_ts", "open", "high", "low", "close",
            "trade_count"]
    assert _rows(view, cols) == _rows(direct, cols)


@given(events=event_frames())
@SETTINGS
def test_multi_interval_rollup_equals_per_interval(spark, events):
    """bars_multi_interval (single explode+aggregate stage) must equal
    the N independent per-interval rollups it replaces, for every
    interval — the fusion is a physical rewrite, not a semantic one."""
    from tradecat_spark.indicators.engine import bars_from_events, bars_multi_interval

    e = spark.createDataFrame(events)
    intervals = {"5m": 300, "1h": 3600}
    fused = bars_multi_interval(e, "event_type", intervals)
    cols = ["event_type", "bucket_ts", "open", "high", "low", "close",
            "volume", "trade_count"]

    def _norm(df):
        # volume is a plain double SUM, so its bit pattern depends on
        # the partial-aggregation order of the physical plan; compare it
        # at DECIMAL(18,8) (the repo's decimal-sum discipline) while
        # keeping OHLC/count checks exact.
        return df.withColumn(
            "volume", F.col("volume").cast("decimal(18,8)")
        )

    for lbl, sec in intervals.items():
        one = _norm(fused.filter(F.col("interval") == lbl))
        ref = _norm(bars_from_events(e, "event_type", sec))
        assert _rows(one, cols) == _rows(ref, cols), lbl


# ---------------------------------------------------------------------------
# Streaming fold specs vs the pandas kernels — pure-Python property test
# (no Spark: the specs' step() math is what applyInPandasWithState runs)
# ---------------------------------------------------------------------------
# unique=True matters: pandas' ewma kernel carries a constant-series
# guard (it skips the update entirely when the incoming value EXACTLY
# equals the register, preserving the old bit pattern), while the
# specs use the guard-free fold law that every SQL oracle in the repo
# encodes. The two agree except at exact register == value collisions,
# which repeated inputs manufacture (e.g. two equal closes at the
# seed) and distinct floats make measure-zero.
_prices = st.lists(
    st.floats(min_value=0.01, max_value=1e5, allow_nan=False,
              allow_infinity=False, width=64),
    min_size=1, max_size=60, unique=True,
)


def _fold(spec, frame: pd.DataFrame) -> pd.DataFrame:
    state = spec.init_state()
    rows = []
    for r in frame.itertuples(index=False):
        state, out = spec.step(state, r)
        rows.append(out)
    names = [f.strip().split()[0] for f in spec.out_schema.split(",")]
    return pd.DataFrame(rows, columns=names)


def _bitwise_eq(a: pd.Series, b: pd.Series) -> bool:
    return all(
        (pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(a, b)
    )


@given(closes=_prices)
@settings(max_examples=40, deadline=None)
def test_macd_fold_matches_pandas(closes):
    from tradecat_spark.streaming.incremental import MacdSpec

    pdf = pd.DataFrame({"close": closes})
    got = _fold(MacdSpec(), pdf)
    ef = pdf["close"].ewm(span=12, adjust=False).mean()
    es = pdf["close"].ewm(span=26, adjust=False).mean()
    macd = ef - es
    sig = macd.ewm(span=9, adjust=False).mean()
    assert _bitwise_eq(got["ema_fast"], ef)
    assert _bitwise_eq(got["ema_slow"], es)
    assert _bitwise_eq(got["signal_line"], sig)
    assert _bitwise_eq(got["hist"], macd - sig)


@given(closes=_prices)
@settings(max_examples=40, deadline=None)
def test_atr_kdj_folds_match_pandas(closes):
    from tradecat_spark.streaming.incremental import AtrSpec, KdjSpec

    rng = np.random.default_rng(len(closes))
    c = pd.Series(closes)
    # strictly widen the bar (h > c > lo) so RSV stays inside (0, 100)
    # and never manufactures an exact register == value collision (see
    # the _prices note on pandas' constant-series guard)
    h = c * (1 + 0.001 + rng.random(len(c)) * 0.01)
    lo = c * (1 - 0.001 - rng.random(len(c)) * 0.01)
    pdf = pd.DataFrame({"high": h, "low": lo, "close": c})

    got = _fold(AtrSpec(), pdf)
    prev = c.shift(1)
    tr = pd.concat(
        [(h - lo).abs(), (h - prev).abs(), (lo - prev).abs()], axis=1
    ).max(axis=1)
    atr = tr.ewm(alpha=1 / 14, adjust=False, min_periods=14).mean()
    assert _bitwise_eq(got["atr"], atr)

    got_k = _fold(KdjSpec(), pdf)
    low_n = lo.rolling(9, min_periods=9).min()
    high_n = h.rolling(9, min_periods=9).max()
    rsv = (c - low_n) / (high_n - low_n) * 100
    # The spec skips NaN RSVs without touching the registers — pandas'
    # ignore_na=True. (The default ignore_na=False only differs when a
    # NaN lands BETWEEN observations, i.e. a zero-range 9-bar window
    # mid-series; on real bars NaNs are confined to the warmup prefix,
    # where the two agree — that case is pinned by test_streaming and
    # the streaming_kdj_parity oracle.)
    k = rsv.ewm(alpha=1 / 3, adjust=False, min_periods=3,
                ignore_na=True).mean()
    d = k.ewm(alpha=1 / 3, adjust=False, min_periods=3,
              ignore_na=True).mean()
    assert _bitwise_eq(got_k["kdj_k"], k)
    assert _bitwise_eq(got_k["kdj_d"], d)


# ---------------------------------------------------------------------------
# Sessionization law
# ---------------------------------------------------------------------------
_ts_lists = st.lists(
    st.integers(min_value=0, max_value=200_000),
    min_size=1, max_size=40, unique=True,
)


@given(secs=_ts_lists)
@SETTINGS
def test_sessionize_partitions_by_gap_law(spark, secs):
    """Sessions must partition a key's events: consecutive events in
    one session are < GAP apart, consecutive sessions are >= GAP
    apart, and indices are 1..n_sessions in time order."""
    from tradecat_spark.plans.q_sessions import sessionize

    gap = 3600
    pdf = pd.DataFrame({
        "k": "u",
        "ts": [pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=s)
               for s in secs],
    })
    out = (
        sessionize(spark.createDataFrame(pdf), ["k"], "ts", gap)
        .orderBy("ts")
        .toPandas()
    )
    sids = out["session_idx"].tolist()
    tss = out["ts"].tolist()
    assert sids[0] == 1
    for i in range(1, len(out)):
        delta = (tss[i] - tss[i - 1]).total_seconds()
        if sids[i] == sids[i - 1]:
            assert delta < gap
        else:
            assert sids[i] == sids[i - 1] + 1
            assert delta >= gap


@given(
    pts=st.lists(st.integers(0, 5000), min_size=1, max_size=30,
                 unique=True),
    ivs=st.lists(st.tuples(st.integers(0, 5000), st.integers(0, 2000)),
                 min_size=1, max_size=10),
)
@SETTINGS
def test_bin_range_join_equals_between_join(spark, pts, ivs):
    """bin_range_join must equal the plain BETWEEN join for arbitrary
    (overlapping, nested, empty-coverage) intervals."""
    from tradecat_spark.operators.rangejoin import bin_range_join

    p = spark.createDataFrame(pd.DataFrame({
        "k": "a",
        "ts": [T0 + pd.Timedelta(seconds=s) for s in pts],
    }))
    iv = spark.createDataFrame(pd.DataFrame({
        "k": "a",
        "iv_id": range(len(ivs)),
        "s_start": [T0 + pd.Timedelta(seconds=s) for s, _ in ivs],
        "s_end": [T0 + pd.Timedelta(seconds=s + d) for s, d in ivs],
    }))
    got = bin_range_join(p, iv, ["k"], "ts", "s_start", "s_end",
                         bin_sec=600)
    plain = p.join(iv, "k").filter(
        (F.col("ts") >= F.col("s_start")) & (F.col("ts") <= F.col("s_end"))
    )
    cols = ["k", "ts", "iv_id"]
    assert _rows(got, cols) == _rows(plain, cols)


# ---------------------------------------------------------------------------
# As-of join directions vs pandas merge_asof
# ---------------------------------------------------------------------------
@given(
    lsec=st.lists(st.integers(0, 3000), min_size=1, max_size=25,
                  unique=True),
    rsec=st.lists(st.integers(0, 3000), min_size=1, max_size=25,
                  unique=True),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@SETTINGS
def test_asof_directions_match_pandas(spark, lsec, rsec, direction):
    """asof_join must agree with pandas merge_asof on the matched
    instant for every direction — including nearest's equidistant
    ties, which pandas resolves backward."""
    from tradecat_spark.operators.asof import asof_join

    lp = pd.DataFrame({
        "k": "a",
        "ts": [T0 + pd.Timedelta(seconds=s) for s in sorted(lsec)],
    })
    rp = pd.DataFrame({
        "k": "a",
        "rts": [T0 + pd.Timedelta(seconds=s) for s in sorted(rsec)],
        "v": [float(s) for s in sorted(rsec)],
    })
    expected = pd.merge_asof(
        lp, rp.rename(columns={"rts": "ts"}), on="ts", by="k",
        direction=direction,
    )
    got = asof_join(
        spark.createDataFrame(lp),
        spark.createDataFrame(rp),
        ["k"], "ts", "rts", ["v"],
        direction=direction,
    ).orderBy("ts").toPandas()
    exp_ts = expected["v"].tolist()  # v == epoch offset of matched rts
    got_v = got["asof_v"].tolist()
    assert len(exp_ts) == len(got_v)
    for e_v, g_v in zip(exp_ts, got_v):
        if pd.isna(e_v):
            assert pd.isna(g_v)
        else:
            assert e_v == g_v


@given(closes=_prices)
@settings(max_examples=25, deadline=None)
def test_emagc_obv_cvd_folds_match_pandas(closes):
    from tradecat_spark.streaming.incremental import (
        CvdSpec,
        EmaGcSpec,
        ObvSpec,
    )

    c = pd.Series(closes)
    got = _fold(EmaGcSpec(), pd.DataFrame({"close": c}))
    for n in (7, 25, 99):
        exp = c.ewm(span=n, adjust=False).mean()
        assert _bitwise_eq(got[f"ema{n}"], exp)

    vol = (c * 0.25).abs()
    pdf = pd.DataFrame({"close": c, "volume": vol})
    got_obv = _fold(ObvSpec(), pdf)
    direction = np.sign(c.diff()).fillna(0)
    assert _bitwise_eq(got_obv["obv"], (direction * vol).cumsum())

    buy = vol * 0.75
    pdf2 = pd.DataFrame({"volume": vol, "taker_buy_volume": buy})
    got_cvd = _fold(CvdSpec(), pdf2)
    sell = (vol - buy).clip(lower=0.0)
    assert _bitwise_eq(got_cvd["cvd"], (buy - sell).cumsum())


@given(
    big_rows=st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 1000)),
        min_size=1, max_size=40,
    ),
    small_keys=st.sets(st.integers(1, 8), min_size=1, max_size=8),
    how=st.sampled_from(["inner", "left"]),
)
@SETTINGS
def test_salted_join_equals_plain_join(spark, big_rows, small_keys, how):
    """salted_join ≡ plain join for arbitrary key overlap, duplicate
    big rows, unmatched keys, and both join types."""
    from tradecat_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        pd.DataFrame(big_rows, columns=["k", "v"])
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": sorted(small_keys),
                      "tag": [f"t{k}" for k in sorted(small_keys)]})
    )
    got = salted_join(big, small, ["k"], salts=4, how=how)
    plain = big.join(small, "k", how)
    cols = ["k", "v", "tag"]
    assert _rows(got, cols) == _rows(plain, cols)


# ---------------------------------------------------------------------------
# rankcut.value_cb vs brute force — the exact-count-below histogram that
# replaced every corpus-global percent_rank window (r5 verdict item 1)
# ---------------------------------------------------------------------------
@given(
    vals=st.lists(
        st.integers(min_value=-30_000, max_value=30_000),
        min_size=1,
        max_size=60,
    ),
    bucket=st.sampled_from([1, 7, 100, 10_000]),
)
@SETTINGS
def test_value_cb_matches_brute_force(spark, vals, bucket):
    """cb(v) must equal the brute count of rows strictly below v for
    ANY value multiset and bucket width (negative values exercise the
    floor-division bucketing; bucket=1 degenerates to one value per
    bucket, large buckets to one global bucket)."""
    from tradecat_spark.plans.rankcut import value_cb

    df = spark.createDataFrame(
        [(int(v),) for v in vals], schema="x long"
    ).repartition(4)
    got = {
        r["x"]: (r["cnt"], r["cb"])
        for r in value_cb(df, "x", bucket).collect()
    }
    assert set(got) == set(vals)
    for v in set(vals):
        want_cnt = sum(1 for u in vals if u == v)
        want_cb = sum(1 for u in vals if u < v)
        assert got[v] == (want_cnt, want_cb), (v, bucket, got[v])


# ---------------------------------------------------------------------------
# Misra-Gries candidate superset law — heavy_hitters_exact's pass 1
# guarantees its candidate union covers every true heavy hitter for
# ANY split of the stream into partitions and batches
# ---------------------------------------------------------------------------
@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=25),
        min_size=1,
        max_size=400,
    ),
    k=st.sampled_from([1, 2, 3, 5, 8]),
    cuts=st.lists(
        st.integers(min_value=0, max_value=400), max_size=6
    ),
)
@SETTINGS
def test_mg_candidates_superset(toks, k, cuts):
    """Union of per-partition capacity-k MG summaries must contain
    every token with global count*k > n, however the stream is cut
    into partitions (each partition further batch-merged one element
    at a time — the worst case for the trim)."""
    from tradecat_spark.plans.q_text import mg_update

    bounds = sorted({0, len(toks), *[c % (len(toks) + 1) for c in cuts]})
    cands: set[int] = set()
    for lo, hi in zip(bounds, bounds[1:]):
        summ = pd.Series(dtype="int64")
        for t in toks[lo:hi]:
            summ = mg_update(summ, pd.Series({t: 1}), k)
        cands |= set(summ.index)
    n = len(toks)
    for t in set(toks):
        if toks.count(t) * k > n:
            assert t in cands, (t, k, bounds)


def test_merge_null_open_takes_law_branch(spark):
    """A matched row whose open is legitimately NULL must still resolve
    through the merge law (row presence = _t/_s flags, never payload
    nullness): closed target with NULL open vs partial source keeps the
    NULL (t.open wins); NULL-open partial source over an open target
    overwrites with NULL (s.open wins). Regression for the r6 review
    finding that the oracle's payload-COALESCE fallback diverged here."""
    cols = ["symbol", "bucket_ts", *MERGE_COLS]
    t = spark.createDataFrame(
        pd.DataFrame(
            [
                dict(symbol="A", bucket_ts=T0, open=None, high=5.0,
                     low=1.0, close=2.0, trade_count=3, is_closed=True),
                dict(symbol="B", bucket_ts=T0, open=100.0, high=5.0,
                     low=1.0, close=2.0, trade_count=3, is_closed=False),
            ],
            columns=cols,
        )
    )
    s = spark.createDataFrame(
        pd.DataFrame(
            [
                dict(symbol="A", bucket_ts=T0, open=7.0, high=6.0,
                     low=2.0, close=3.0, trade_count=4, is_closed=False),
                dict(symbol="B", bucket_ts=T0, open=None, high=6.0,
                     low=2.0, close=3.0, trade_count=4, is_closed=False),
            ],
            columns=cols,
        )
    )
    got = {
        r["symbol"]: r["open"]
        for r in merge_candles(t, s, ["symbol", "bucket_ts"]).collect()
    }
    assert got["A"] is None   # closed target + partial source -> t.open
    assert got["B"] is None   # matched -> s.open even when NULL


# ---------------------------------------------------------------------------
# exact_quantiles law — the factored selection helper must agree with
# the brute sorted-order statistic for ANY value multiset
# ---------------------------------------------------------------------------
@given(
    vals=st.lists(
        st.integers(min_value=-5_000, max_value=5_000),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_exact_quantiles_matches_brute(spark, vals):
    from tradecat_spark.plans.rankcut import exact_quantiles, value_cb

    quants = (("p25", 1, 4), ("p50", 1, 2), ("p99", 99, 100))
    df = spark.createDataFrame([(int(v),) for v in vals], schema="x long")
    got = {
        r["quantile"]: (r["k"], r["value"], r["n"])
        for r in exact_quantiles(
            value_cb(df, "x", 100), [], "x", quants, "value"
        ).collect()
    }
    srt, n = sorted(vals), len(vals)
    for lbl, num, den in quants:
        k = (num * (n - 1)) // den
        assert got[lbl] == (k, srt[k], n), (lbl, vals)


def test_sq8_reconstruction_bound(spark):
    """The SQ8 code/reconstruction law on a hand-built vector + bounds
    row: every xhat lies inside [lo, hi] and within one quantization
    step (span/510, i.e. half of span/255) plus the reconstruction
    half-up of the CLIPPED value — integer form:
    |xhat - clip(m)| * 510 <= span + 510. Degenerate span (hi == lo)
    must pin xhat to lo without evaluating a zero division (ANSI)."""
    from tradecat_spark.plans.q_similarity import _sq8_xhat

    import pandas as pd

    vec = [0.0, 1.0, -1.0, 0.123456, 2.5, -2.5, 0.9999995]
    lo = [-1_000_000] * 6 + [500_000]
    hi = [1_000_000] * 6 + [500_000]  # last component degenerate
    df = spark.createDataFrame(
        pd.DataFrame({"vec": [vec], "los": [lo], "his": [hi]})
    )
    out = df.select(
        _sq8_xhat(F.col("vec"), F.col("los"), F.col("his")).alias("xh")
    ).collect()[0]["xh"]
    for x, l, h, xh in zip(vec, lo, hi, out):
        m = round(x * 1_000_000)
        mc = min(max(m, l), h)
        span = h - l
        assert l <= xh <= h, (x, xh)
        assert abs(xh - mc) * 510 <= span + 510, (x, xh, mc)
    assert out[-1] == 500_000  # degenerate span pins to lo


def test_mg_update_preserves_int64():
    """Series.add(fill_value=0) over disjoint indexes upcasts to
    float64 — mg_update must cast back so the summary counts stay
    integer-exact (r6 advice; exactness above 2^53 depends on it)."""
    from tradecat_spark.plans.q_text import mg_update

    a = pd.Series([5, 3], index=["a", "b"], dtype="int64")
    b = pd.Series([2, 7], index=["c", "d"], dtype="int64")
    merged = mg_update(a, b, k=10)          # no-trim path
    assert merged.dtype == "int64"
    trimmed = mg_update(a, b, k=3)          # trim path
    assert trimmed.dtype == "int64"
    assert (trimmed > 0).all()


def test_pq_codes_argmin_law(spark, sf_dir):
    """Map-side PQ encoding must pick, per subspace, the centroid with
    the minimal ROUND(d2, 6), lowest code on ties — verified against a
    numpy recompute from the SAME trained codebook on sf0.001."""
    import numpy as np

    from tradecat_spark.plans.q_similarity import (
        PQ_DSUB,
        PQ_KS,
        PQ_M,
        _emb,
        _pq_codebook_row,
        _pq_codes_col,
        _pq_train,
    )

    e = _emb(spark, sf_dir).limit(40)
    cent = _pq_train(_emb(spark, sf_dir)).collect()
    cb = {(r["sub"], r["cid"]): np.array(r["cv"]) for r in cent}
    brow = _pq_codebook_row(_pq_train(_emb(spark, sf_dir)))
    got = (
        e.crossJoin(F.broadcast(brow))
        .select(
            "vec_id",
            "vec",
            _pq_codes_col(F.col("vec"), F.col("cb")).alias("z"),
        )
        .collect()
    )
    assert got, "no vectors"
    for row in got:
        v = np.array(row["vec"])
        assert len(row["z"]) == PQ_M
        for z in row["z"]:
            s = z["sub"]
            sv = v[s * PQ_DSUB:(s + 1) * PQ_DSUB]
            def d2seq(c):
                # sequential left-to-right adds — the fold's (and the
                # oracle list_reduce's) exact order, NOT numpy pairwise
                acc = 0.0
                for t in sv - cb[(s, c)]:
                    acc += float(t) * float(t)
                return round(acc, 6)

            best = min(
                (d2seq(c), c) for c in range(PQ_KS) if (s, c) in cb
            )
            assert (z["code"], z["d2r"]) == (best[1], best[0]), (
                row["vec_id"], s, z, best,
            )


def test_ivfadc_recall_beats_raw_pq_lane(spark, sf_dir):
    """The POINT of the residual upgrade (Jegou 2011 SIII): residual
    encoding + nprobe>1 must reach at least the raw-vector
    full-corpus ADC lane's recall on the same queries (0.30 vs 0.24
    at sf0.001, 0.34 vs 0.30 at sf0.01)."""
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    ivf = specs["ann_ivfadc_recall"].fn(spark, sf_dir).toPandas()
    raw = specs["ann_pq_recall"].fn(spark, sf_dir).toPandas()
    assert len(ivf) == len(raw) > 0
    assert ivf.recall.mean() >= raw.recall.mean()


def test_ivfadc_sim_matches_numpy_reconstruction(spark, sf_dir):
    """End-to-end ADC decomposition law: for every scored pair, the
    similarity must equal the DIRECT cosine-analog of the micro-int
    query against the micro-int reconstruction c + r_hat — i.e. the
    qcd + LUT split of the numerator and the c2 + 2ccr + rs2 split of
    the norm are exact int64 identities, not approximations."""
    import numpy as np

    from tradecat_spark.plans.q_similarity import (
        PQ_DSUB,
        _emb,
        _ivf_centroids,
        _ivfadc_sims,
        _pq_codebook_row,
        _pq_codes_col,
        _pq_train,
        _residuals,
    )

    e = _emb(spark, sf_dir)
    cent = _ivf_centroids(e)
    er = _residuals(e, cent)
    rbrow = _pq_codebook_row(_pq_train(er))

    cm = {
        r["label"]: np.round(np.array(r["cv"]) * 1_000_000).astype(np.int64)
        for r in cent.collect()
    }
    cell_of = {r["vec_id"]: r["label"] for r in er.collect()}
    cvm = {
        k: np.round(np.array(v) * 1_000_000).astype(np.int64)
        for k, v in rbrow.collect()[0]["cb"].items()
    }
    codes = {}
    enc = er.crossJoin(F.broadcast(rbrow)).select(
        "vec_id", _pq_codes_col(F.col("vec"), F.col("cb")).alias("z")
    )
    for r in enc.collect():
        codes[r["vec_id"]] = [(z["sub"], z["code"]) for z in r["z"]]
    qm = {
        r["vec_id"]: np.round(
            np.array(r["vec"]) * 1_000_000
        ).astype(np.int64)
        for r in e.filter(F.col("vec_id") < 10).collect()
    }

    got = _ivfadc_sims(spark, sf_dir).collect()
    assert got, "no scored pairs"
    for r in got[:200]:
        xhat = cm[cell_of[r["neighbor_id"]]].copy()
        for sub, code in codes[r["neighbor_id"]]:
            lo = sub * PQ_DSUB
            xhat[lo:lo + PQ_DSUB] += cvm[sub * 16 + code]
        q = qm[r["query_id"]]
        want = round(
            float(int(q @ xhat))
            / np.sqrt(float(int(q @ q)) * float(int(xhat @ xhat))),
            6,
        )
        assert r["adc_sim"] == want, (r, want)


@given(
    st.sets(st.integers(min_value=0, max_value=40), max_size=12),
    st.sets(st.integers(min_value=0, max_value=40), max_size=4),
)
def test_live_batch_vals_coverage_invariants(b_idx, c_idx):
    """Coverage rule over arbitrary partial/base index sets: at most
    one base survives (the newest), exactly the partials newer than it
    survive, and the rule is idempotent (live of live = live)."""
    from tradecat_spark.streaming.ingest import live_batch_vals

    vals = [f"b{i}" for i in sorted(b_idx)] + [f"c{i}" for i in sorted(c_idx)]
    live = live_batch_vals(vals)
    cs = [v for v in live if v.startswith("c")]
    bs = [v for v in live if v.startswith("b")]
    if c_idx:
        assert cs == [f"c{max(c_idx)}"]
        assert sorted(int(v[1:]) for v in bs) == sorted(
            i for i in b_idx if i > max(c_idx)
        )
    else:
        assert not cs and sorted(int(v[1:]) for v in bs) == sorted(b_idx)
    assert sorted(live_batch_vals(live)) == sorted(live)


def _greedy_ref(toks: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def test_bpe_greedy_fold_matches_reference_on_random_sequences(spark):
    """_bpe_apply_col over random token sequences and random merge
    pairs (including a==b overlap runs) must equal the sequential
    while-loop — batched through ONE Spark job so the property sweep
    stays fast."""
    import random

    from pyspark.sql import functions as F

    from tradecat_spark.plans.q_text import _bpe_apply_col

    rng = random.Random(20260817)
    cases = []
    for _ in range(300):
        toks = [rng.choice("ab") for _ in range(rng.randint(0, 12))]
        a, b = rng.choice("ab"), rng.choice("ab")
        cases.append((toks, a, b))
    df = spark.createDataFrame(
        [(i, t, a, b) for i, (t, a, b) in enumerate(cases)],
        "i int, toks array<string>, a string, b string",
    )
    got = {
        r["i"]: list(r["m"])
        for r in df.select(
            "i",
            _bpe_apply_col(F.col("toks"), F.col("a"), F.col("b"))
            .alias("m"),
        ).collect()
    }
    for i, (toks, a, b) in enumerate(cases):
        assert got[i] == _greedy_ref(toks, a, b), (toks, a, b)
