"""Reduced hash-oracles ("checksum twins") for the Python-surface
queries (r4 verdict item 2).

The driver cannot SQL-oracle ``applyInPandas`` outputs directly, so
``indicator_surface_1h`` / ``indicator_batch_150x7`` /
``signal_rule_events`` historically got only rows-only checks. These
twins close the loop: each runs the SAME Python surface, then projects
the subset of output columns whose math is expressible exactly in
DuckDB — selections (OHLC picks, rolling max/min), integer-derived
stats (counts, runs, percentile ranks), and sequential float folds
(EMA / Wilder / MACD / RSI recurrences), where pandas
``ewm(adjust=False)`` and the explicit ``list_reduce`` fold run the
same op sequence (the plain ``acc*(1-a) + x*a`` recurrence reproduces
pandas bit-for-bit in pure Python for every span used here; DuckDB may
contract the fold step into an FMA, drifting ~1 ulp/step on some
series — the twins' ROUND(·,6) absorbs that, and
tests/test_checksums.py pins the tolerance at 1e-9).

Reference anchors: the surfaces mirror the scheduled indicator batch
(services/trading-service/src/core/engine.py:121-255) and the signal
scan loop (services/signal-service/src/engines/sqlite_engine.py:215-333).

Engineering rules for exactness (see also plans/exact.py):
- only columns whose pre-round doubles are bit-equal across engines are
  included (no order-dependent float SUM/AVG/STDDEV);
- all oracle literals are ``CAST('<repr>' AS DOUBLE)`` of the same
  Python doubles the pandas code uses;
- the engine's ``min_data`` placeholder semantics (NULL below the
  threshold) are replicated per-column from the indicator registry;
- NaN outputs are normalized to NULL on the Spark side (Arrow carries
  NaN through; DuckDB produces NULL from the same guards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import tradecat_spark.indicators.library  # noqa: F401 — populates the registry
from tradecat_spark.indicators.base import REGISTRY as IND_REGISTRY
from tradecat_spark.plans.registry import query

# ---------------------------------------------------------------------------
# fold-lambda SQL generation (shared by both indicator twins)
# ---------------------------------------------------------------------------


def _d(x: float) -> str:
    """A double literal rendered exactly (repr round-trips float64)."""
    return f"CAST({x!r} AS DOUBLE)"


def _ema_spans() -> dict[str, int]:
    return {"e5": 5, "e13": 13, "e7": 7, "e25": 25, "e34": 34, "e99": 99,
            "e12": 12, "e26": 26}


#: 1-based accumulator slots for the DOUBLE[] fold. A LIST-typed
#: accumulator is the only reliable multi-value fold in DuckDB 1.0:
#: struct_pack lambdas evaluate in-place over shared vectors, so any
#: field reading another computed field's acc value gets UNDEFINED
#: old/new mixtures (observed: removing two unused struct fields changed
#: the EMA results). List construction reads the old acc list correctly.
_SLOT = {name: i + 1 for i, name in enumerate(
    ["c", "h", "l",
     "e5", "e13", "e7", "e25", "e34", "e99", "e12", "e26", "sig",
     "atr", "amx", "amn",
     "g7", "l7", "g14", "l14", "g21", "l21"]
)}


def _a(name: str, var: str = "acc") -> str:
    return f"{var}[{_SLOT[name]}]"


def _seed_lambda() -> str:
    """Element transform: every bar becomes an accumulator-typed list.

    Only the FIRST element's fold slots matter (list_reduce seeds with
    it): EMAs seed with the first close, MACD signal with 0.0 (line[0]
    is exactly c0-c0=0), ATR with the first TR = high-low (numpy fmax
    ignores the NaN prev-close), RSI gain/loss with 0.0 (the prepended
    NaN diff is zero-filled), and the running ATR max/min with ATR[0].
    """
    vals = {"c": "b.c", "h": "b.h", "l": "b.l", "sig": _d(0.0),
            "atr": "b.h - b.l", "amx": "b.h - b.l", "amn": "b.h - b.l"}
    for f in _ema_spans():
        vals[f] = "b.c"
    for p in (7, 14, 21):
        vals[f"g{p}"] = _d(0.0)
        vals[f"l{p}"] = _d(0.0)
    ordered = sorted(_SLOT, key=_SLOT.get)
    return "b -> [" + ", ".join(vals[n] for n in ordered) + "]"


def _fold_lambda() -> str:
    """One list fold advances every recurrence a bar at a time, in the
    exact float op order pandas uses (acc*(1-a) + x*a)."""
    new: dict[str, str] = {
        "c": "x[1]", "h": "x[2]", "l": "x[3]",
    }
    ema_exprs: dict[str, str] = {}
    for f, span in _ema_spans().items():
        al = 2.0 / (span + 1)
        ema_exprs[f] = f"{_a(f)} * {_d(1.0 - al)} + x[1] * {_d(al)}"
        new[f] = ema_exprs[f]
    line = f"({ema_exprs['e12']}) - ({ema_exprs['e26']})"
    a9 = 2.0 / 10.0
    new["sig"] = f"{_a('sig')} * {_d(1.0 - a9)} + ({line}) * {_d(a9)}"
    aw = 1.0 / 14.0
    tr = f"GREATEST(x[2] - x[3], ABS(x[2] - {_a('c')}), ABS(x[3] - {_a('c')}))"
    atr = f"{_a('atr')} * {_d(1.0 - aw)} + ({tr}) * {_d(aw)}"
    new["atr"] = atr
    new["amx"] = f"GREATEST({_a('amx')}, {atr})"
    new["amn"] = f"LEAST({_a('amn')}, {atr})"
    gain = f"CASE WHEN x[1] - {_a('c')} > 0 THEN x[1] - {_a('c')} ELSE {_d(0.0)} END"
    loss = f"CASE WHEN x[1] - {_a('c')} < 0 THEN {_a('c')} - x[1] ELSE {_d(0.0)} END"
    for p in (7, 14, 21):
        ap = 1.0 / p
        new[f"g{p}"] = f"{_a(f'g{p}')} * {_d(1.0 - ap)} + ({gain}) * {_d(ap)}"
        new[f"l{p}"] = f"{_a(f'l{p}')} * {_d(1.0 - ap)} + ({loss}) * {_d(ap)}"
    ordered = sorted(_SLOT, key=_SLOT.get)
    return "(acc, x) -> [" + ", ".join(new[n] for n in ordered) + "]"


def _rsi_expr(p: int) -> str:
    """The RSI edge-case ladder over the folded gain/loss state."""
    g, l = _a(f"g{p}", "a"), _a(f"l{p}", "a")
    return (
        f"CASE WHEN {g} + {l} = 0 THEN {_d(50.0)} "
        f"WHEN {l} = 0 THEN {_d(100.0)} "
        f"ELSE {_d(100.0)} - {_d(100.0)} / ({_d(1.0)} + {g} / {l}) END"
    )


def _checksum_cols() -> list[tuple[str, str, bool, int]]:
    """(name, oracle SQL over fin f / acc a / run r / pr p, round6?,
    min_data) — ONE list drives the Spark projection, the oracle SELECT,
    and the min_data guards, so the two sides cannot drift."""
    md = {n: IND_REGISTRY[n].min_data for n in IND_REGISTRY}
    ae = lambda n: _a(n, "a")  # noqa: E731
    line = f"({ae('e12')} - {ae('e26')})"
    sig = ae("sig")
    atr_pct = f"CASE WHEN f.c <> 0 THEN {ae('atr')} / f.c * {_d(100.0)} END"
    span_a = "((f.tenkan + f.kijun) / 2)"
    cloud_hi = f"GREATEST({span_a}, f.spanb)"
    cloud_lo = f"LEAST({span_a}, f.spanb)"
    r7, r14, r21 = _rsi_expr(7), _rsi_expr(14), _rsi_expr(21)
    rsi_avg = f"(({r7}) + ({r14}) + ({r21})) / {_d(3.0)}"
    atr_norm = (f"(({ae('atr')} - {ae('amn')}) / "
                f"(({ae('amx')} - {ae('amn')}) + {_d(1e-10)}))")
    vf = f"({_d(1.0)} + ({atr_norm} - {_d(0.5)}) * {_d(0.2)})"
    ob = f"LEAST({_d(80.0)}, {_d(70.0)} * {vf})"
    osv = f"GREATEST({_d(20.0)}, {_d(30.0)} / {vf})"
    n_os = (f"((CASE WHEN ({r7}) < ({osv}) THEN 1 ELSE 0 END)"
            f" + (CASE WHEN ({r14}) < ({osv}) THEN 1 ELSE 0 END)"
            f" + (CASE WHEN ({r21}) < ({osv}) THEN 1 ELSE 0 END))")
    n_ob = (f"((CASE WHEN ({r7}) > ({ob}) THEN 1 ELSE 0 END)"
            f" + (CASE WHEN ({r14}) > ({ob}) THEN 1 ELSE 0 END)"
            f" + (CASE WHEN ({r21}) > ({ob}) THEN 1 ELSE 0 END))")
    bullish = f"f.c > {ae('e34')}"
    return [
        # base_data — selections of raw bar values
        ("last_open", "f.o", False, md["base_data"]),
        ("last_high", "f.h", False, md["base_data"]),
        ("last_low", "f.l", False, md["base_data"]),
        ("last_close", "f.c", False, md["base_data"]),
        ("change_pct",
         f"CASE WHEN f.pc IS NOT NULL AND f.pc <> 0 "
         f"THEN (f.c - f.pc) / f.pc * {_d(100.0)} END",
         True, md["base_data"]),
        ("amplitude", "CASE WHEN f.c <> 0 THEN (f.h - f.l) / f.c END",
         True, md["base_data"]),
        ("amplitude_pct",
         f"CASE WHEN f.c <> 0 THEN (f.h - f.l) / f.c * {_d(100.0)} END",
         True, md["base_data"]),
        # donchian / ichimoku / williams — rolling extreme selections
        ("don_high", "f.dh", False, md["donchian"]),
        ("don_mid", "(f.dh + f.dl) / 2", False, md["donchian"]),
        ("don_low", "f.dl", False, md["donchian"]),
        ("tenkan", "f.tenkan", False, md["ichimoku"]),
        ("kijun", "f.kijun", False, md["ichimoku"]),
        ("span_a", span_a, False, md["ichimoku"]),
        ("span_b", "f.spanb", False, md["ichimoku"]),
        ("cloud_signal",
         f"CASE WHEN f.c > {cloud_hi} THEN 'above_cloud' "
         f"WHEN f.c < {cloud_lo} THEN 'below_cloud' "
         f"ELSE 'in_cloud' END", False, md["ichimoku"]),
        ("ichi_signal",
         f"CASE WHEN f.c > {cloud_hi} AND f.tenkan > f.kijun THEN 'buy' "
         f"WHEN f.c < {cloud_lo} AND f.tenkan < f.kijun THEN 'sell' "
         f"ELSE 'neutral' END", False, md["ichimoku"]),
        ("wr",
         f"CASE WHEN f.hh14 <> f.ll14 "
         f"THEN (f.hh14 - f.c) / (f.hh14 - f.ll14) * {_d(-100.0)} END",
         True, md["williams_r"]),
        # data_monitor / stats_agg — integer-derived
        ("bar_count", "CAST(f.n AS DOUBLE)", False, md["data_monitor"]),
        ("completeness", f"LEAST(f.n / {_d(500.0)}, {_d(1.0)})",
         False, md["data_monitor"]),
        ("pctl_rank", "p.pctl", False, md["stats_agg"]),
        ("up_run", "CAST(f.n - COALESCE(r.last_bad, 1) AS DOUBLE)",
         False, md["stats_agg"]),
        # EMA folds
        ("ema7", ae("e7"), True, md["ema_gc"]),
        ("ema25", ae("e25"), True, md["ema_gc"]),
        ("ema99", ae("e99"), True, md["ema_gc"]),
        ("regime",
         f"CASE WHEN {ae('e7')} > {ae('e25')} AND {ae('e25')} > {ae('e99')} "
         f"THEN 'bull_stack' "
         f"WHEN {ae('e7')} < {ae('e25')} AND {ae('e25')} < {ae('e99')} "
         f"THEN 'bear_stack' "
         "ELSE 'tangled' END", False, md["ema_gc"]),
        ("scalp_fast", ae("e5"), True, md["scalping"]),
        ("scalp_slow", ae("e13"), True, md["scalping"]),
        ("scalp_signal",
         f"CASE WHEN {ae('e5')} > {ae('e13')} THEN 'long' ELSE 'short' END",
         False, md["scalping"]),
        # MACD fold (prev state from the second fold, ap)
        ("macd_line", line, True, md["macd"]),
        ("macd_signal", sig, True, md["macd"]),
        ("macd_hist", f"{line} - {sig}", True, md["macd"]),
        ("macd_cross",
         f"CASE WHEN (({_a('e12', 'ap')} - {_a('e26', 'ap')}) - "
         f"{_a('sig', 'ap')}) <= 0 "
         f"AND ({line} - {sig}) > 0 THEN 'golden' "
         f"WHEN (({_a('e12', 'ap')} - {_a('e26', 'ap')}) - "
         f"{_a('sig', 'ap')}) >= 0 "
         f"AND ({line} - {sig}) < 0 THEN 'death' "
         "ELSE 'none' END", False, md["macd"]),
        # Wilder ATR fold (engine seeding: TR[0] = high-low)
        ("atr14", ae("atr"), True, md["atr_scan"]),
        ("atr_pct", atr_pct, True, md["atr_scan"]),
        ("atr_upper", f"f.c + 2 * {ae('atr')}", True, md["atr_scan"]),
        ("atr_lower", f"f.c - 2 * {ae('atr')}", True, md["atr_scan"]),
        ("vol_class",
         f"CASE WHEN ({atr_pct}) IS NULL THEN 'low' "
         f"WHEN ({atr_pct}) < {_d(1.0)} THEN 'low' "
         f"WHEN ({atr_pct}) < {_d(2.5)} THEN 'mid' "
         f"WHEN ({atr_pct}) < {_d(5.0)} THEN 'high' "
         f"ELSE 'extreme' END", False, md["atr_scan"]),
        # smart RSI folds + adaptive thresholds
        ("rsi7", r7, True, md["smart_rsi"]),
        ("rsi14", r14, True, md["smart_rsi"]),
        ("rsi21", r21, True, md["smart_rsi"]),
        ("rsi_avg", rsi_avg, True, md["smart_rsi"]),
        ("rsi_state",
         f"CASE WHEN {bullish} THEN "
         f"(CASE WHEN {n_os} >= 2 THEN 'oversold' "
         f"WHEN {n_ob} >= 2 THEN 'overbought' ELSE 'neutral' END) "
         f"ELSE (CASE WHEN {n_ob} >= 2 THEN 'overbought' "
         f"WHEN {n_os} >= 2 THEN 'oversold' ELSE 'neutral' END) END",
         False, md["smart_rsi"]),
        ("rsi_trend",
         f"CASE WHEN {bullish} THEN 'bullish' ELSE 'bearish' END",
         False, md["smart_rsi"]),
        ("ob_threshold", ob, True, md["smart_rsi"]),
        ("os_threshold", osv, True, md["smart_rsi"]),
    ]


def _surface_chain(bars_sql: str, keys: list[str], px: str = "") -> str:
    """CTE chain (prefix ``px``) ending in ``{px}out``: keys + n_bars +
    RAW min_data-guarded field values (no rounding — callers round for
    the hash projection, or compare raw for rule replays)."""
    k = ", ".join(keys)
    selects = []
    for name, expr, _r6, min_data in _checksum_cols():
        selects.append(
            f"  CASE WHEN f.n >= {min_data} THEN ({expr}) END AS {name}"
        )
    sel = ",\n".join(selects)
    key_sel = ", ".join(f"f.{c} AS {c}" for c in keys)
    return f"""{px}base AS ({bars_sql}),
{px}tb AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {k} ORDER BY bucket_ts DESC) AS rnd
  FROM {px}base
),
{px}bars AS (SELECT * FROM {px}tb WHERE rnd <= 500),
{px}wn AS (
  SELECT *,
    ROW_NUMBER() OVER pk AS rn,
    COUNT(*) OVER (PARTITION BY {k}) AS n,
    LAG(c) OVER pk AS pc,
    MAX(h) OVER (pk ROWS 19 PRECEDING) AS dh,
    MIN(l) OVER (pk ROWS 19 PRECEDING) AS dl,
    (MAX(h) OVER (pk ROWS 8 PRECEDING) + MIN(l) OVER (pk ROWS 8 PRECEDING)) / 2 AS tenkan,
    (MAX(h) OVER (pk ROWS 25 PRECEDING) + MIN(l) OVER (pk ROWS 25 PRECEDING)) / 2 AS kijun,
    (MAX(h) OVER (pk ROWS 51 PRECEDING) + MIN(l) OVER (pk ROWS 51 PRECEDING)) / 2 AS spanb,
    MAX(h) OVER (pk ROWS 13 PRECEDING) AS hh14,
    MIN(l) OVER (pk ROWS 13 PRECEDING) AS ll14
  FROM {px}bars
  WINDOW pk AS (PARTITION BY {k} ORDER BY bucket_ts)
),
{px}fin AS (SELECT * FROM {px}wn WHERE rn = n),
{px}run AS (
  SELECT {k}, MAX(CASE WHEN c - pc <= 0 THEN rn END) AS last_bad
  FROM {px}wn WHERE rn >= 2 GROUP BY {k}
),
{px}pr AS (
  SELECT b.*, f2.c AS last_c, f2.n AS grp_n
  FROM {px}bars b JOIN {px}fin f2 USING ({k})
),
{px}prr AS (
  SELECT {k},
    CAST(SUM(CASE WHEN c <= last_c THEN 1 ELSE 0 END) AS DOUBLE)
      / ANY_VALUE(grp_n) AS pctl
  FROM {px}pr GROUP BY {k}
),
{px}folds AS (
  SELECT {k},
    list(struct_pack(o := o, h := h, l := l, c := c) ORDER BY bucket_ts) AS bs
  FROM {px}bars GROUP BY {k}
),
-- The two folds MUST evaluate in separate (materialized) scans:
-- DuckDB 1.0 executes lambda bodies in-place over shared vectors, and
-- two list_reduce calls in one projection corrupt each other's state
-- (observed: macd_hist scaled wrong the moment ap was added inline).
{px}accs AS MATERIALIZED (
  SELECT {k},
    list_reduce(list_transform(bs, {_seed_lambda()}), {_fold_lambda()}) AS a
  FROM {px}folds
),
{px}accsp AS MATERIALIZED (
  SELECT {k},
    CASE WHEN len(bs) >= 2 THEN
      list_reduce(
        list_transform(list_slice(bs, 1, len(bs) - 1), {_seed_lambda()}),
        {_fold_lambda()})
    END AS ap
  FROM {px}folds
),
{px}out AS (
  SELECT
    {key_sel},
    f.n AS n_bars,
{sel}
  FROM {px}fin f
  JOIN {px}accs USING ({k})
  JOIN {px}accsp USING ({k})
  LEFT JOIN {px}run r USING ({k})
  JOIN {px}prr p USING ({k})
)"""


def _indicator_oracle(bars_sql: str, keys: list[str]) -> str:
    """Full oracle: tail-500 per key, window selections, the list fold,
    and the rounded hash projection over the raw surface chain."""
    selects = []
    for name, _expr, r6, _md in _checksum_cols():
        if r6:
            # + 0.0 normalizes -0.0 → +0.0, matching Spark's F.round
            # (BigDecimal drops the sign of zero; DuckDB ROUND keeps it)
            selects.append(f"  ROUND({name}, 6) + 0.0 AS {name}")
        else:
            selects.append(f"  {name}")
    sel = ",\n".join(selects)
    key_sel = ", ".join(keys)
    return f"""
WITH {_surface_chain(bars_sql, keys)}
SELECT
  {key_sel},
  n_bars,
{sel}
FROM out
"""


def _checksum_select(surface: DataFrame, keys: list[str]) -> DataFrame:
    """Spark-side projection: same columns, NaN→NULL, same rounding."""
    cols = [F.col(c) for c in keys] + [F.col("n_bars")]
    for name, _expr, r6, _md in _checksum_cols():
        c = F.col(name)
        dtype = dict(surface.dtypes)[name]
        if dtype == "double":
            c = F.when(F.isnan(c) | c.isNull(), F.lit(None)).otherwise(c)
            if r6:
                c = F.round(c, 6)
        cols.append(c.alias(name))
    return surface.select(*cols)


_SURFACE_BARS_SQL = """
  SELECT event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS o, MAX(value) AS h,
    MIN(value) AS l, max_by(value, ts) AS c
  FROM events GROUP BY 1, 2
"""

_BATCH_INTERVALS = {"5m": 300, "15m": 900, "30m": 1800, "1h": 3600,
                    "2h": 7200, "4h": 14400, "1d": 86400}

_BATCH_BARS_SQL = f"""
  SELECT e.user_id, iv.iv_label AS "interval",
    time_bucket(iv.width, e.ts) AS bucket_ts,
    min_by(e.value, e.ts) AS o, MAX(e.value) AS h,
    MIN(e.value) AS l, max_by(e.value, e.ts) AS c
  FROM events e
  JOIN (
    SELECT user_id FROM events GROUP BY user_id
    ORDER BY SUM(ABS(value)) DESC, user_id LIMIT 150
  ) hot USING (user_id)
  CROSS JOIN (VALUES {", ".join(
      f"('{lbl}', INTERVAL '{sec} seconds')"
      for lbl, sec in _BATCH_INTERVALS.items()
  )}) AS iv(iv_label, width)
  GROUP BY 1, 2, 3
"""


@query(
    "indicator_surface_checksum",
    survey="§2.9 checksum twin of indicator_surface_1h (r4 verdict item "
    "2): the applyInPandas surface's exactly-SQL-expressible columns "
    "(selections, counts, EMA/Wilder/MACD/RSI folds) hash-checked "
    "against DuckDB (engine.py:121-255 parity evidence)",
    description="Driver-hashable projection of the 1h indicator surface",
    oracle=_indicator_oracle(_SURFACE_BARS_SQL, ["event_type"]),
)
def indicator_surface_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL Python engine (same plan as indicator_surface_1h),
    then projects the checksum columns. A hash-green row here is value-
    level driver evidence for the pandas surface math itself."""
    from tradecat_spark.catalog import load_table
    from tradecat_spark.indicators.engine import bars_from_events, compute_all

    e = load_table(spark, sf_dir, "events")
    bars = bars_from_events(e, "event_type", 3600)
    surf = compute_all(bars, ["event_type"], tail=500)
    return _checksum_select(surf, ["event_type"])


def _signal_events_oracle() -> str:
    """Full SQL replay of signal_rule_events, reduced per (event_type,
    rule): the 6h snapshot fields are window expressions, the 8
    DEFAULT_RULES conditions come from ``condition_sql`` (the same
    compiler the Spark side mirrors), and the anchored 2-day cooldown —
    the one Python stage in evaluate_rules — is a sequential list-fold
    over candidate fire times (state [last_us, kept, first_us];
    reference cooldown law: storage/cooldown.py semantics)."""
    from tradecat_spark.signals.rules import DEFAULT_RULES, condition_sql

    cands = "\nUNION ALL\n".join(
        f"SELECT event_type, snap_ts, '{r.name}' AS rule "
        f"FROM lagged WHERE {condition_sql(r)}"
        for r in DEFAULT_RULES
    )
    cd_us = 172_800 * 1_000_000
    return f"""
WITH bars AS (
  SELECT event_type,
    time_bucket(INTERVAL '21600 seconds', ts) AS snap_ts,
    MAX(value) AS high, MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
snap AS (
  SELECT event_type, snap_ts,
    AVG(close) OVER (pk ROWS 4 PRECEDING) AS macd_line,
    AVG(close) OVER w20 AS macd_signal,
    (close - MIN(low) OVER w20)
      / NULLIF(MAX(high) OVER w20 - MIN(low) OVER w20, 0) * 100 AS rsi14,
    CASE WHEN close > AVG(close) OVER w20 THEN 'bull_stack'
         ELSE 'tangled' END AS regime,
    'bull' AS zl_state,
    (close - MIN(low) OVER w20)
      / NULLIF(MAX(high) OVER w20 - MIN(low) OVER w20, 0) * 100 AS kdj_k,
    (close - (AVG(close) OVER w20 - 2 * STDDEV_SAMP(close) OVER w20))
      / NULLIF(4 * STDDEV_SAMP(close) OVER w20, 0) AS bb_pct
  FROM bars
  WINDOW pk AS (PARTITION BY event_type ORDER BY snap_ts),
         w20 AS (PARTITION BY event_type ORDER BY snap_ts
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
lagged AS (
  SELECT *,
    LAG(macd_line) OVER pk AS prev_macd_line,
    LAG(macd_signal) OVER pk AS prev_macd_signal,
    LAG(rsi14) OVER pk AS prev_rsi14,
    LAG(regime) OVER pk AS prev_regime,
    LAG(zl_state) OVER pk AS prev_zl_state,
    LAG(kdj_k) OVER pk AS prev_kdj_k,
    LAG(bb_pct) OVER pk AS prev_bb_pct
  FROM snap
  WINDOW pk AS (PARTITION BY event_type ORDER BY snap_ts)
),
cands AS (
{cands}
),
folded AS (
  SELECT event_type, rule,
    list_reduce(
      list_transform(
        list(epoch_us(snap_ts) ORDER BY snap_ts),
        t -> [t, CAST(1 AS BIGINT), t]),
      -- field-level CASE only: a whole-list "ELSE acc" pass-through is
      -- corrupted across vectorized groups in DuckDB 1.0 (observed:
      -- non-deterministic counts the moment >1 group folds per batch)
      (acc, x) -> [
        CASE WHEN x[1] - acc[1] >= {cd_us} THEN x[1] ELSE acc[1] END,
        acc[2] + CASE WHEN x[1] - acc[1] >= {cd_us} THEN 1 ELSE 0 END,
        acc[3]
      ]
    ) AS st
  FROM cands GROUP BY 1, 2
)
SELECT event_type, rule,
  st[2] AS n_fired,
  make_timestamp(st[3]) AS first_fired,
  make_timestamp(st[1]) AS last_fired
FROM folded
"""


@query(
    "signal_rule_events_checksum",
    survey="§2.10 checksum twin of signal_rule_events (r4 verdict item "
    "2): per-(key, rule) accepted-firing counts and first/last fire "
    "times — incl. the anchored-cooldown state machine — hash-checked "
    "(sqlite_engine.py:215-333, storage/cooldown.py parity evidence)",
    description="Per-rule accepted firing stats of the default rule pack",
    oracle=_signal_events_oracle(),
)
def signal_rule_events_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL evaluate_rules pipeline (Python cooldown scan
    included), then reduces to driver-hashable per-rule stats."""
    from tradecat_spark.plans.registry import REGISTRY

    events = REGISTRY["signal_rule_events"].fn(spark, sf_dir)
    return events.groupBy("event_type", "rule").agg(
        F.count(F.lit(1)).alias("n_fired"),
        F.min("fired_at").alias("first_fired"),
        F.max("fired_at").alias("last_fired"),
    )


@query(
    "indicator_batch_checksum",
    survey="§6 checksum twin of indicator_batch_150x7 (r4 verdict item "
    "2): hot-150 × 7-interval surface, exact columns hash-checked",
    description="Driver-hashable projection of the 150×7 indicator batch",
    oracle=_indicator_oracle(_BATCH_BARS_SQL, ["user_id", '"interval"']),
)
def indicator_batch_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same 150-key × 7-interval workload as indicator_batch_150x7
    (hot selection + one multi-interval aggregation + one Arrow stage),
    reduced to the exactly-checkable columns."""
    from tradecat_spark.catalog import load_table
    from tradecat_spark.indicators.engine import bars_multi_interval, compute_all

    e = load_table(spark, sf_dir, "events")
    hot = (
        e.groupBy("user_id")
        .agg(F.sum(F.abs("value")).alias("flow"))
        .orderBy(F.desc("flow"), "user_id")
        .limit(150)
        .select("user_id")
    )
    e = e.join(F.broadcast(hot), "user_id")
    all_bars = bars_multi_interval(e, "user_id", _BATCH_INTERVALS)
    surf = compute_all(all_bars, ["user_id", "interval"], tail=500)
    return _checksum_select(surf, ["user_id", "interval"])


def _pack_subset_rules():
    """The pack rules whose condition fields all live in the exact
    checksum column set — replayable in SQL over the curr/prev surface
    chains with zero tolerance."""
    from tradecat_spark.signals.pack import ALL_RULES
    from tradecat_spark.signals.rules import condition_fields, condition_sql

    avail = {n for n, _, _, _ in _checksum_cols()}
    return [
        r for r in ALL_RULES
        if condition_fields(r) <= avail and condition_sql(r) is not None
    ]


def _pack_subset_oracle() -> str:
    """curr = surface over all 1h bars; prev = surface over bars at or
    before the GLOBAL latest bucket minus one hour (exactly the
    horizon signal_rule_pack_129 broadcasts); every subset rule replays
    via condition_sql over <field>/prev_<field>."""
    from tradecat_spark.signals.rules import condition_sql

    fields = [n for n, _, _, _ in _checksum_cols()]
    prev_bars = f"""
  SELECT * FROM ({_SURFACE_BARS_SQL}) b
  WHERE bucket_ts <= (
    SELECT MAX(bucket_ts) - INTERVAL 1 HOUR FROM ({_SURFACE_BARS_SQL})
  )"""
    prev_cols = ",\n".join(f"    p.{n} AS prev_{n}" for n in fields)
    curr_cols = ",\n".join(f"    c.{n}" for n in fields)
    cands = "\n  UNION ALL\n".join(
        f"  SELECT event_type, '{r.name}' AS rule, "
        f"'{r.category}' AS category, '{r.direction}' AS direction, "
        f"CAST({r.strength} AS BIGINT) AS strength "
        f"FROM snap WHERE {condition_sql(r)}"
        for r in _pack_subset_rules()
    )
    return f"""
WITH {_surface_chain(_SURFACE_BARS_SQL, ["event_type"], "c_")},
{_surface_chain(prev_bars, ["event_type"], "p_")},
snap AS (
  SELECT c.event_type,
{curr_cols},
{prev_cols}
  FROM c_out c JOIN p_out p USING (event_type)
)
{cands}
"""


@query(
    "signal_pack_subset_checksum",
    survey="§2.10 checksum twin of signal_rule_pack_129 (r4 verdict "
    "item 2): the pack rules whose fields are exactly SQL-derivable "
    "replayed over curr/prev Python surfaces and hash-checked "
    "(engines/sqlite_engine.py:215-333 prev/curr comparison law)",
    description="Exact-field subset of the 129-rule pack over real "
    "prev/curr indicator surfaces",
    oracle=_pack_subset_oracle(),
)
def signal_pack_subset_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL signal_rule_pack_129 pipeline — two applyInPandas
    surface snapshots + all 129 compiled conditions — then keeps the
    rules whose fields the checksum column set derives exactly, so the
    driver hashes actual prev/curr rule firings end-to-end."""
    from tradecat_spark.plans.registry import REGISTRY

    names = [r.name for r in _pack_subset_rules()]
    fired = REGISTRY["signal_rule_pack_129"].fn(spark, sf_dir)
    return fired.filter(F.col("rule").isin(names))
