"""The 129-rule signal pack over snapshots (SURVEY.md §2.10).

Two evaluation paths:

- ``signal_pack_sql_rules`` — every rule whose condition fields are
  derivable with window SQL + bounded per-row EWM scans over the 1h
  bars (ALL 129) evaluated as ONE wide projection: the snapshot
  computes ~43 indicator fields (CCI, Williams %R, MFI, Bollinger,
  Donchian, Keltner, VWAP, OBV/CVD change, volume/taker ratios, OI
  z-score/streak, candle labels, and the recursive family — RSI 7/14/21
  + state, MACD line/signal/hist, KDJ cross labels, SMMA200 cloud side,
  EMA7/25/99 regime, the 18-EMA Madrid ribbon state, Ichimoku signal —
  as O(n) per-row full-prefix append-scans),
  lags every field once for prev/curr semantics, then fires rules via
  ``array_compact(array(when(cond, name)…)) → explode``. The DuckDB
  oracle is GENERATED from the same rule configs via ``condition_sql``
  — one source of truth, hash-checked by the driver.

- ``signal_rule_pack_129`` — the FULL pack over the applyInPandas
  indicator surface: two as-of snapshots (latest bar vs one hour
  earlier) provide prev/curr, all 129 compiled Column conditions
  evaluate in one projection. Fields come from Python indicator code,
  so this is a rows-only check (no SQL oracle can replicate the
  surface) — the SQL query above is the hash gate for the compiler.

Scale: the snapshot is one window partitioning (event_type ORDER BY
bucket_ts) — every frame/lag/cumsum shares a single exchange+sort; rule
evaluation is pure whole-stage-codegen column algebra, so 129 rules
cost one projection, not 129 passes. Reference: the 60 s signal loop in
services/signal-service/src/engine.py evaluates the same pack per
snapshot pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.registry import query
from tradecat_spark.signals.pack import ALL_RULES
from tradecat_spark.signals.rules import (
    SignalRule,
    compile_condition,
    condition_fields,
    condition_sql,
)

DEC = "decimal(18,8)"
DECC = "decimal(20,0)"

#: fields the SQL snapshot derives (current-row names; prev_ lags added)
SNAPSHOT_FIELDS = [
    "last_close", "change_pct", "amplitude_pct", "turnover", "money_flow",
    "taker_ratio", "vol_ratio", "cci", "wr", "mfi14",
    "bb_upper", "bb_lower", "bb_pct", "bb_width",
    "don_high", "don_low", "kc_upper", "kc_lower", "vol_class",
    "sup_dist_pct", "res_dist_pct", "vwap_dev_pct",
    "obv_chg30", "cvd_chg", "ls_ratio", "taker_ls_ratio",
    "oi_zscore", "oi_streak", "risk_score", "pattern",
    "sent_diff", "flip_signal", "fib_state", "liq_level", "scalp_signal",
    "adx", "st_state", "zl_state", "pt_state", "pt_strength",
    "ls_signal", "harmonic_score",
    "smc_bias", "struct_event", "smc_score", "rsi_divergence", "tl_state",
    "price_pos",
    # EWM-fold family (per-row prefix scans, see _FOLDS_SQL): the
    # recursive-indicator fields the r2 snapshot could not derive
    "rsi7", "rsi14", "rsi21", "rsi_avg", "rsi_state",
    "macd_line", "macd_signal", "macd_hist", "kdj_signal",
    "cloud_side", "regime", "ribbon_state", "ichi_signal",
]


#: Madrid ribbon EMA ladder (batch/tv_volume_signal.py:6) — 18 periods.
_MADRID = (5, 10, 15, 20, 25, 30, 35, 40, 45, 50, 55, 60, 65, 70, 75,
           80, 90, 100)

#: name -> (source array, alpha); computed as per-row prefix scans.
_EMA_SCANS = {
    "e12s": ("cl", 2.0 / 13.0), "e26s": ("cl", 2.0 / 27.0),
    "smmas": ("cl", 1.0 / 200.0),
    "ema7s": ("cl", 2.0 / 8.0), "ema25s": ("cl", 2.0 / 26.0),
    "ema99s": ("cl", 2.0 / 100.0),
    **{f"rb{j:02d}s": ("cl", 2.0 / (p + 1.0))
       for j, p in enumerate(_MADRID, 1)},
    "ag7s": ("gains", 1.0 / 7.0), "al7s": ("losses", 1.0 / 7.0),
    "ag14s": ("gains", 1.0 / 14.0), "al14s": ("losses", 1.0 / 14.0),
    "ag21s": ("gains", 1.0 / 21.0), "al21s": ("losses", 1.0 / 21.0),
    # scalping EMA5/EMA13 (batch/scalping.py; same alphas as
    # ind_scalping_emas)
    "scfs": ("cl", 2.0 / 6.0), "scss": ("cl", 2.0 / 14.0),
    # harmonic: Wilder gain/loss registers for every RSI period 2..33
    # (batch/harmonic.py — mean of RSI(2..33)); 7/14/21 already exist
    **{
        f"{kind}{p}s": (src, 1.0 / p)
        for p in range(2, 34)
        if p not in (7, 14, 21)
        for kind, src in (("ag", "gains"), ("al", "losses"))
    },
}

#: RSI periods averaged by the harmonic score.
_HARM_PS = tuple(range(2, 34))


def _sql_scan(src: str, alpha: float) -> str:
    """Per-row FULL-prefix EWM scan (pandas ``ewm(adjust=False)`` over
    the available series, evaluated at every position) as an O(n)
    append-scan: the accumulator is the growing scan list seeded by the
    first value — identical recurrence on both engines, hash-safe, and
    O(n) instead of the O(bound x n) per-position re-folds."""
    a = repr(alpha)
    return (
        f"list_reduce(list_transform({src}, v -> [v]), "
        f"(acc, x) -> list_append(acc, "
        f"acc[-1] * (1.0::DOUBLE - {a}::DOUBLE)"
        f" + x[1] * {a}::DOUBLE))"
    )


def _sql_prefix_scan(src: str, alpha: float) -> str:
    """Per-row FULL-prefix EWM scan (the path-dependent family's law —
    their ind_* twins fold the whole tail, so the snapshot mirrors
    that, not the windowed-seed convention of _sql_scan). O(n): the
    accumulator is the growing scan list, seeded by the first value."""
    a = repr(alpha)
    return (
        f"list_reduce(list_transform({src}, v -> [v]), "
        f"(acc, x) -> list_append(acc, "
        f"acc[-1] * (1.0::DOUBLE - {a}::DOUBLE)"
        f" + x[1] * {a}::DOUBLE))"
    )


#: ZLEMA lag for the zero-lag / precision-trend family (period 70).
_ZLAG = (70 - 1) // 2  # 34
_ZL_A = repr(2.0 / 71.0)
_ATR70_A = repr(1.0 / 70.0)

# ADX(14) and SuperTrend(10, 3.0) per-row state scans — the same
# order-stable struct folds as ind_adx_di / ind_supertrend_fold
# (q_indicators.py), evaluated at every prefix position.
_AX_A, _AX_1MA = repr(1.0 / 14.0), repr(1.0 - 1.0 / 14.0)
_SP_ = (
    "(acc.sp * {m}::DOUBLE + (CASE WHEN (x.h - acc.h) > (acc.l - x.l)"
    " AND (x.h - acc.h) > 0 THEN x.h - acc.h ELSE 0.0::DOUBLE END)"
    " * {a}::DOUBLE)"
).format(a=_AX_A, m=_AX_1MA)
_SM_ = (
    "(acc.sm * {m}::DOUBLE + (CASE WHEN (acc.l - x.l) > (x.h - acc.h)"
    " AND (acc.l - x.l) > 0 THEN acc.l - x.l ELSE 0.0::DOUBLE END)"
    " * {a}::DOUBLE)"
).format(a=_AX_A, m=_AX_1MA)
_ST_ = (
    "(acc.st * {m}::DOUBLE + greatest(x.h - x.l, abs(x.h - acc.c),"
    " abs(x.l - acc.c)) * {a}::DOUBLE)"
).format(a=_AX_A, m=_AX_1MA)

# NOTE on shape: these run as ONE O(n) append-scan per key — the
# accumulator is the growing list of states (acc[-1] = previous state,
# x = [current seed row]). Nesting a STRUCT-accumulator list_reduce
# inside list_transform (the per-position re-fold shape) corrupts state
# when the outer vector carries more than one group row (observed on
# DuckDB 1.x; the scalar-accumulator scans in _sql_scan are unaffected),
# so the scan list form is both the fast and the correct one.
def _lamz(s: str) -> str:
    return s.replace("acc.", "acc[-1].").replace("x.", "x[1].")


_SQL_ADX_SCAN = f"""
    list_transform(list_reduce(list_transform(advals, s -> [s]),
      (acc, x) -> list_append(acc, struct_pack(
        adx := acc[-1].adx * {_AX_1MA}::DOUBLE
               + (CASE WHEN {_lamz(_ST_)} = 0 THEN 0.0::DOUBLE
                       WHEN 100 * {_lamz(_SP_)} / {_lamz(_ST_)}
                            + 100 * {_lamz(_SM_)} / {_lamz(_ST_)} = 0
                         THEN 0.0::DOUBLE
                       ELSE 100 * abs(100 * {_lamz(_SP_)} / {_lamz(_ST_)}
                                      - 100 * {_lamz(_SM_)} / {_lamz(_ST_)})
                            / (100 * {_lamz(_SP_)} / {_lamz(_ST_)}
                               + 100 * {_lamz(_SM_)} / {_lamz(_ST_)})
                  END) * {_AX_A}::DOUBLE,
        sp := {_lamz(_SP_)}, sm := {_lamz(_SM_)}, st := {_lamz(_ST_)},
        h := x[1].h, l := x[1].l, c := x[1].c
      ))), s -> s.adx)
"""

_SG_A, _SG_1MA = repr(1.0 / 10.0), repr(1.0 - 1.0 / 10.0)
_NATR_ = (
    "(acc.atr * {m}::DOUBLE + greatest(x.h - x.l, abs(x.h - acc.c),"
    " abs(x.l - acc.c)) * {a}::DOUBLE)"
).format(a=_SG_A, m=_SG_1MA)
_NFU_ = (
    "(CASE WHEN ((x.h + x.l) / 2 + 3.0 * {natr}) < acc.fu"
    " OR acc.c > acc.fu THEN ((x.h + x.l) / 2 + 3.0 * {natr})"
    " ELSE acc.fu END)"
).format(natr=_NATR_)
_NFL_ = (
    "(CASE WHEN ((x.h + x.l) / 2 - 3.0 * {natr}) > acc.fl"
    " OR acc.c < acc.fl THEN ((x.h + x.l) / 2 - 3.0 * {natr})"
    " ELSE acc.fl END)"
).format(natr=_NATR_)

_SQL_ST_SCAN = f"""
    list_transform(list_reduce(list_transform(stvals, s -> [s]),
      (acc, x) -> list_append(acc, struct_pack(
        dir := CASE WHEN x[1].c > {_lamz(_NFU_)} THEN 1.0::DOUBLE
                    WHEN x[1].c < {_lamz(_NFL_)} THEN -1.0::DOUBLE
                    ELSE acc[-1].dir END,
        fu := {_lamz(_NFU_)}, fl := {_lamz(_NFL_)}, atr := {_lamz(_NATR_)},
        h := x[1].h, l := x[1].l, c := x[1].c
      ))), s -> s.dir)
"""

# Smoothed Heikin-Ashi (ind_heikin_long_short law): EMA(10) registers +
# recursive HA pair + EMA(10)-smoothed outputs, per row.
_HA_AA = repr(2.0 / 11.0)
_HA_E = "acc[-1].{r} * (1.0::DOUBLE - {a}::DOUBLE) + x[1].{r} * {a}::DOUBLE"
_HA_NEW_C = (
    "(("
    + " + ".join(_HA_E.format(r=r, a=_HA_AA) for r in ("eo", "eh", "el", "ec"))
    + ") / 4)"
)
_SQL_HA_SCAN = f"""
    list_reduce(list_transform(havals, s -> [s]),
      (acc, x) -> list_append(acc, struct_pack(
        so := acc[-1].so * (1.0::DOUBLE - {_HA_AA}::DOUBLE)
              + ((acc[-1].ha_o + acc[-1].ha_c) / 2) * {_HA_AA}::DOUBLE,
        sc := acc[-1].sc * (1.0::DOUBLE - {_HA_AA}::DOUBLE)
              + {_HA_NEW_C} * {_HA_AA}::DOUBLE,
        ha_o := (acc[-1].ha_o + acc[-1].ha_c) / 2,
        ha_c := {_HA_NEW_C},
        eo := {_HA_E.format(r="eo", a=_HA_AA)},
        eh := {_HA_E.format(r="eh", a=_HA_AA)},
        el := {_HA_E.format(r="el", a=_HA_AA)},
        ec := {_HA_E.format(r="ec", a=_HA_AA)}
      )))
"""


def _sql_rsi(p: int) -> str:
    ag, al = f"ag{p}s", f"al{p}s"
    return (
        f"CASE WHEN i <= {p} THEN NULL "
        f"WHEN {al}[i - 1] = 0 THEN 100.0 "
        f"ELSE ROUND(100.0 - 100.0 / (1.0 + {ag}[i - 1] / {al}[i - 1]), 6)"
        f" + 0.0 END"
    )


def _sql_ribbon_state() -> str:
    bull = " + ".join(
        f"(CASE WHEN rb{j:02d}s[i] > rb18s[i]"
        f" AND rb{j:02d}s[i] > rb{j:02d}s[i - 1] THEN 1 ELSE 0 END)"
        for j in range(1, 19)
    )
    bear = " + ".join(
        f"(CASE WHEN rb{j:02d}s[i] < rb18s[i]"
        f" AND rb{j:02d}s[i] < rb{j:02d}s[i - 1] THEN 1 ELSE 0 END)"
        for j in range(1, 19)
    )
    return (
        "CASE WHEN i = 1 THEN 'mixed' "
        f"WHEN ({bull}) >= 13 THEN 'bull' "
        f"WHEN ({bear}) >= 13 THEN 'bear' "
        "WHEN cl[i] > rb18s[i] THEN 'bull' ELSE 'bear' END"
    )


def _sql_divergence() -> str:
    """Per-row ±5-bar pivot divergence over the trailing 50 bars — the
    ind_smart_rsi law evaluated at every position, RSI series from the
    snapshot's own bounded rsi14 scans."""
    h50 = "list_slice(hgh, i - 49, i)"
    l50 = "list_slice(lws, i - 49, i)"
    r50 = "list_slice(rsi14s, i - 49, i)"
    php = (
        f"list_filter(range(6, 46), p -> {h50}[CAST(p AS INT)] = "
        f"list_aggregate(list_slice({h50}, p - 5, p + 5), 'max'))"
    )
    plp = (
        f"list_filter(range(6, 46), p -> {l50}[CAST(p AS INT)] = "
        f"list_aggregate(list_slice({l50}, p - 5, p + 5), 'min'))"
    )
    bear = (
        f"{h50}[CAST({php}[len({php})] AS INT)]"
        f" > {h50}[CAST({php}[len({php}) - 1] AS INT)]"
        f" AND {r50}[CAST({php}[len({php})] AS INT)]"
        f" < {r50}[CAST({php}[len({php}) - 1] AS INT)]"
    )
    bull = (
        f"{l50}[CAST({plp}[len({plp})] AS INT)]"
        f" < {l50}[CAST({plp}[len({plp}) - 1] AS INT)]"
        f" AND {r50}[CAST({plp}[len({plp})] AS INT)]"
        f" > {r50}[CAST({plp}[len({plp}) - 1] AS INT)]"
    )
    return (
        f"CASE WHEN i >= 50 AND len({php}) >= 2 AND len({plp}) >= 2"
        f" AND ({bear}) THEN 'bearish_div' "
        f"WHEN i >= 50 AND len({php}) >= 2 AND len({plp}) >= 2"
        f" AND ({bull}) THEN 'bullish_div' "
        f"ELSE 'none' END"
    )


def _sql_tl_state() -> str:
    """Per-row trend-line state — the ind_trend_line slope law (centered
    OLS over the trailing <=50 closes) evaluated at every position."""
    ys = "list_slice(cl, greatest(1, i - 49), i)"
    m = "least(50, i)"
    ysum = f"list_reduce({ys}, (acc, v) -> acc + v)"
    num = (
        f"list_reduce(list_transform(range(1, {m} + 1), "
        f"t -> (CAST(t - 1 AS DOUBLE) - ({m} - 1) / 2.0)"
        f" * ({ys}[CAST(t AS INT)] - {ysum} / {m})), (acc, v) -> acc + v)"
    )
    den = (
        f"list_reduce(list_transform(range(1, {m} + 1), "
        f"t -> (CAST(t - 1 AS DOUBLE) - ({m} - 1) / 2.0)"
        f" * (CAST(t - 1 AS DOUBLE) - ({m} - 1) / 2.0)), (acc, v) -> acc + v)"
    )
    return (
        f"CASE WHEN i < 2 THEN 'down' "
        f"WHEN {num} / {den} > 0 THEN 'up' ELSE 'down' END"
    )


def _folds_sql() -> str:
    """The fold CTE chain: per-key ordered arrays -> named prefix-scan
    arrays -> one row per (event_type, rn) with the recursive fields."""
    scan_cols = ",\n    ".join(
        f"{_sql_scan(src, alpha)} AS {name}"
        for name, (src, alpha) in _EMA_SCANS.items()
    )
    kdj_sig = (
        "CASE WHEN i < 10 THEN 'continue' "
        "WHEN ks[i - 9] <= ds[i - 9] AND ks[i - 8] > ds[i - 8] "
        "THEN 'golden_cross' "
        "WHEN ks[i - 9] >= ds[i - 9] AND ks[i - 8] < ds[i - 8] "
        "THEN 'death_cross' "
        "WHEN 3.0 * ks[i - 8] - 2.0 * ds[i - 8] > 100.0 "
        "THEN 'j_overbought' "
        "WHEN 3.0 * ks[i - 8] - 2.0 * ds[i - 8] < 0.0 THEN 'j_oversold' "
        "ELSE 'continue' END"
    )
    fields = {
        "rsi7": "rsi7s[i]", "rsi14": "rsi14s[i]", "rsi21": "rsi21s[i]",
        "rsi_avg": (
            "CASE WHEN rsi7s[i] IS NULL OR rsi14s[i] IS NULL "
            "OR rsi21s[i] IS NULL THEN NULL "
            "ELSE ROUND((rsi7s[i] + rsi14s[i] + rsi21s[i]) / 3.0, 6) END"
        ),
        "rsi_state": (
            "CASE WHEN rsi14s[i] IS NULL THEN 'neutral' "
            "WHEN rsi14s[i] > 70 THEN 'overbought' "
            "WHEN rsi14s[i] < 30 THEN 'oversold' ELSE 'neutral' END"
        ),
        "macd_line": "ROUND(macds[i], 6) + 0.0",
        "macd_signal": "ROUND(sigs[i], 6) + 0.0",
        "macd_hist": "ROUND(macds[i] - sigs[i], 6) + 0.0",
        "kdj_signal": kdj_sig,
        "cloud_side": (
            "CASE WHEN cl[i] >= smmas[i] THEN 'above' ELSE 'below' END"
        ),
        "regime": (
            "CASE WHEN ema7s[i] > ema25s[i] AND ema25s[i] > ema99s[i] "
            "THEN 'bull_stack' "
            "WHEN ema7s[i] < ema25s[i] AND ema25s[i] < ema99s[i] "
            "THEN 'bear_stack' ELSE 'tangled' END"
        ),
        "ribbon_state": _sql_ribbon_state(),
        "scalp_signal": (
            "CASE WHEN scfs[i] > scss[i] THEN 'long' ELSE 'short' END"
        ),
        "zl_val": f"CASE WHEN i > {_ZLAG} THEN zlps[i - {_ZLAG}] END",
        "atr70_val": "atr70s[i]",
        "adx": "ROUND(adxs[i], 6)",
        "st_state": "CASE WHEN stds[i] > 0 THEN 'up' ELSE 'down' END",
        "ls_signal": (
            "CASE WHEN hasts[i].sc >= hasts[i].so"
            " THEN 'long' ELSE 'short' END"
        ),
        "rsi_divergence": _sql_divergence(),
        "tl_state": _sql_tl_state(),
        "harmonic_score": (
            "CASE WHEN i <= 33 THEN NULL ELSE ROUND(("
            + " + ".join(
                f"(CASE WHEN al{p}s[i - 1] = 0 THEN 100.0::DOUBLE "
                f"ELSE 100.0 - 100.0 / (1.0 + ag{p}s[i - 1] / al{p}s[i - 1])"
                f" END)"
                for p in _HARM_PS
            )
            + ") / 32.0, 6) END"
        ),
    }
    unnests = ",\n    ".join(
        f"unnest(list_transform(range(1, len(cl) + 1), i -> {expr}))"
        f" AS {name}"
        for name, expr in fields.items()
    )
    return f"""
series AS (
  SELECT event_type,
    list(close ORDER BY bucket_ts) AS cl,
    list(high ORDER BY bucket_ts) AS hgh,
    list(low ORDER BY bucket_ts) AS lws,
    list(open ORDER BY bucket_ts) AS opn,
    list(tc ORDER BY bucket_ts) AS tcs
  FROM bars GROUP BY event_type
),
sc1 AS (
  SELECT *,
    list_transform(range(2, len(cl) + 1),
                   i -> GREATEST(cl[i] - cl[i - 1], 0.0)) AS gains,
    list_transform(range(2, len(cl) + 1),
                   i -> GREATEST(cl[i - 1] - cl[i], 0.0)) AS losses,
    list_transform(range(1, len(cl) + 1), i ->
      CASE WHEN i < 9 THEN NULL
           WHEN list_max(list_slice(hgh, i - 8, i))
                = list_min(list_slice(lws, i - 8, i)) THEN 50.0
           ELSE (cl[i] - list_min(list_slice(lws, i - 8, i)))
                / (list_max(list_slice(hgh, i - 8, i))
                   - list_min(list_slice(lws, i - 8, i))) * 100.0
      END) AS rsvs_full
  FROM series
),
sc2 AS (
  SELECT *,
    {scan_cols}
  FROM sc1
),
sc3 AS (
  SELECT *,
    list_transform(range(1, len(cl) + 1), i -> e12s[i] - e26s[i])
      AS macds,
    list_slice(rsvs_full, 9, len(cl)) AS rsvs,
    list_transform(range(1, len(cl) + 1), i -> {_sql_rsi(7)}) AS rsi7s,
    list_transform(range(1, len(cl) + 1), i -> {_sql_rsi(14)}) AS rsi14s,
    list_transform(range(1, len(cl) + 1), i -> {_sql_rsi(21)}) AS rsi21s
  FROM sc2
),
sc4 AS (
  SELECT *,
    {_sql_scan("macds", 2.0 / 10.0)} AS sigs,
    {_sql_scan("rsvs", 1.0 / 3.0)} AS ks
  FROM sc3
),
sc5 AS (
  SELECT *, {_sql_scan("ks", 1.0 / 3.0)} AS ds FROM sc4
),
sc6 AS (
  SELECT *,
    list_transform(range(1, len(cl) + 1), k ->
      CASE WHEN k = 1 THEN hgh[1] - lws[1]
           ELSE greatest(hgh[k] - lws[k], abs(hgh[k] - cl[k - 1]),
                         abs(lws[k] - cl[k - 1])) END) AS trs,
    list_transform(range({_ZLAG} + 1, len(cl) + 1),
                   k -> 2 * cl[k] - cl[k - {_ZLAG}]) AS delag,
    list_transform(range(1, len(cl) + 1), k -> struct_pack(
      adx := 0.0::DOUBLE, sp := 0.0::DOUBLE, sm := 0.0::DOUBLE,
      st := hgh[k] - lws[k], h := hgh[k], l := lws[k], c := cl[k]
    )) AS advals,
    list_transform(range(1, len(cl) + 1), k -> struct_pack(
      dir := 1.0::DOUBLE,
      fu := (hgh[k] + lws[k]) / 2 + 3.0 * (hgh[k] - lws[k]),
      fl := (hgh[k] + lws[k]) / 2 - 3.0 * (hgh[k] - lws[k]),
      atr := hgh[k] - lws[k], h := hgh[k], l := lws[k], c := cl[k]
    )) AS stvals,
    list_transform(range(1, len(cl) + 1), k -> struct_pack(
      so := (opn[k] + cl[k]) / 2,
      sc := (opn[k] + hgh[k] + lws[k] + cl[k]) / 4,
      ha_o := (opn[k] + cl[k]) / 2,
      ha_c := (opn[k] + hgh[k] + lws[k] + cl[k]) / 4,
      eo := opn[k], eh := hgh[k], el := lws[k], ec := cl[k]
    )) AS havals
  FROM sc5
),
sc7 AS (
  SELECT *,
    {_sql_prefix_scan("trs", 1.0 / 70.0)} AS atr70s,
    {_sql_prefix_scan("delag", 2.0 / 71.0)} AS zlps,
    {_SQL_ADX_SCAN} AS adxs,
    {_SQL_ST_SCAN} AS stds,
    {_SQL_HA_SCAN} AS hasts
  FROM sc6
),
folds0 AS (
  SELECT event_type, cl, tcs,
    unnest(range(1, len(cl) + 1)) AS rn,
    {unnests}
  FROM sc7
),
foldsA AS (
  -- per-row VPVR inputs: trailing-200 window, 48 floor-buckets
  -- (ta.volume_profile law with the snapshot's floor bucketing)
  SELECT *,
    cl[CAST(rn AS INT)] AS cur_c,
    list_min(list_slice(cl, greatest(1, CAST(rn AS INT) - 199),
                        CAST(rn AS INT))) AS lov,
    list_max(list_slice(cl, greatest(1, CAST(rn AS INT) - 199),
                        CAST(rn AS INT))) AS hiv
  FROM folds0
),
foldsB AS (
  SELECT *,
    list_transform(range(0, 48), k -> list_reduce(
      list_prepend(0.0::DOUBLE,
        list_transform(range(greatest(1, CAST(rn AS INT) - 199),
                             CAST(rn AS INT) + 1), e ->
          CASE WHEN (CASE WHEN hiv <= lov THEN 0
                          ELSE least(47, greatest(0, CAST(floor(
                            (cl[CAST(e AS INT)] - lov) / (hiv - lov) * 48)
                            AS INT))) END) = k
               THEN CAST(tcs[CAST(e AS INT)] AS DOUBLE)
               ELSE 0.0::DOUBLE END)),
      (a, v) -> a + v)) AS vols
  FROM foldsA
),
foldsC AS (
  SELECT *,
    CAST(list_position(vols, list_max(vols)) - 1 AS DOUBLE) AS poc0,
    list_reduce(vols, (a, v) -> a + v) AS vtotal
  FROM foldsB
),
foldsD AS (
  -- 70% value-area expansion around POC: one list-accumulator fold per
  -- row ([a, b, covered]; list literals read only the pre-step state,
  -- unlike struct_pack under the mutating regime)
  SELECT *,
    list_reduce(
      list_prepend([poc0, poc0, vols[CAST(poc0 AS INT) + 1]],
                   list_transform(range(1, 48), q -> [0.0, 0.0, 0.0])),
      (acc, x) ->
        CASE WHEN acc[3] >= 0.7 * vtotal OR (acc[1] = 0 AND acc[2] = 47)
             THEN [acc[1], acc[2], acc[3]]
             WHEN (CASE WHEN acc[2] < 47
                        THEN vols[CAST(acc[2] AS INT) + 2]
                        ELSE -1.0::DOUBLE END)
                  >= (CASE WHEN acc[1] > 0
                           THEN vols[CAST(acc[1] AS INT)]
                           ELSE -1.0::DOUBLE END)
             THEN [acc[1], acc[2] + 1.0,
                   acc[3] + vols[CAST(acc[2] AS INT) + 2]]
             ELSE [acc[1] - 1.0, acc[2],
                   acc[3] + vols[CAST(acc[1] AS INT)]]
        END) AS vexp
  FROM foldsC
),
folds AS (
  SELECT * EXCLUDE (cl, tcs, cur_c, lov, hiv, vols, poc0, vtotal, vexp),
    CASE WHEN hiv <= lov THEN 'in_va'
         WHEN cur_c > lov + (vexp[2] + 1) * (hiv - lov) / 48
           THEN 'above_va'
         WHEN cur_c < lov + vexp[1] * (hiv - lov) / 48
           THEN 'below_va'
         ELSE 'in_va' END AS price_pos
  FROM foldsD
)"""


def pack_sql_rules() -> list[SignalRule]:
    """The subset of the 129-rule pack the SQL snapshot can evaluate."""
    avail = set(SNAPSHOT_FIELDS)
    return [
        r for r in ALL_RULES
        if condition_fields(r) <= avail and condition_sql(r) is not None
    ]


# ---------------------------------------------------------------------------
# snapshot — DuckDB side (CTE chain; every field ROUND(·,6) so the
# predicate inputs are hash-identical across engines)
# ---------------------------------------------------------------------------
#: Snapshot series are clamped to this many trailing bars per key —
#: the repo-wide fold-tail convention (q_indicators.py EWM tails).
#: The prefix scans append into an array, and array append in BOTH
#: engines copies the accumulator (O(tail²) element copies per scan),
#: so an unclamped series would grow quadratically with history; the
#: clamp makes the per-key cost a constant regardless of corpus age.
SNAP_TAIL = 500

_SNAPSHOT_SQL = f"""
WITH bars_all AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close,
    CAST(COUNT(*) AS BIGINT) AS tc
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT event_type, bucket_ts, open, high, low, close, tc FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY bucket_ts DESC) AS rnd
    FROM bars_all
  ) WHERE rnd <= {SNAP_TAIL}
),""" + """
b0 AS (
  SELECT *,
    (high + low + close) / 3 AS tp,
    LAG(close) OVER w AS pc,
    LAG((high + low + close) / 3) OVER w AS prev_tp,
    LAG(open) OVER w AS p_open,
    LAG(close) OVER w AS p_close,
    CASE WHEN CAST(tc AS DOUBLE) > CAST(LAG(tc) OVER w AS DOUBLE) THEN 1
         WHEN CAST(tc AS DOUBLE) < CAST(LAG(tc) OVER w AS DOUBLE) THEN -1
         ELSE 0 END AS s,
    ROUND((high - low) / close * 100, 6) AS amplitude_pct,
    -- SMC 2-radius swing pivots (ind_smc_structure law); a pivot at k
    -- confirms two bars later, when both leads are known
    high > LAG(high, 1) OVER w AND high > LAG(high, 2) OVER w
      AND high > LEAD(high, 1) OVER w AND high > LEAD(high, 2) OVER w
      AS is_ph,
    low < LAG(low, 1) OVER w AND low < LAG(low, 2) OVER w
      AND low < LEAD(low, 1) OVER w AND low < LEAD(low, 2) OVER w
      AS is_pl
  FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
),
b1 AS (
  SELECT *,
    GREATEST(high - low, ABS(high - pc), ABS(low - pc)) AS tr,
    CASE WHEN close >= open THEN tc ELSE 0 END AS up_tc,
    CASE WHEN close < open THEN tc ELSE 0 END AS dn_tc,
    CASE WHEN close > pc THEN CAST(tc AS DECIMAL(20,0))
         WHEN close < pc THEN -CAST(tc AS DECIMAL(20,0))
         ELSE CAST(0 AS DECIMAL(20,0)) END AS obv_step,
    CASE WHEN close >= open THEN CAST(tc AS DECIMAL(20,0))
         ELSE -CAST(tc AS DECIMAL(20,0)) END AS cvd_step,
    CASE WHEN tp > prev_tp THEN CAST(tp * tc AS DECIMAL(18,8))
         ELSE CAST(0 AS DECIMAL(18,8)) END AS pos_mf,
    CASE WHEN tp < prev_tp THEN CAST(tp * tc AS DECIMAL(18,8))
         ELSE CAST(0 AS DECIMAL(18,8)) END AS neg_mf,
    CASE WHEN LAG(is_ph, 2) OVER w THEN LAG(high, 2) OVER w END AS conf_ph,
    CASE WHEN LAG(is_pl, 2) OVER w THEN LAG(low, 2) OVER w END AS conf_pl
  FROM b0 WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
),
b2 AS (
  SELECT event_type, bucket_ts, open, high, low, close, tc, tp, s,
    amplitude_pct, p_open, p_close,
    SUM(up_tc) OVER w20 AS up20, SUM(dn_tc) OVER w20 AS dn20,
    SUM(up_tc) OVER w30 AS up30, SUM(dn_tc) OVER w30 AS dn30,
    SUM(up_tc) OVER w10 AS up10, SUM(dn_tc) OVER w10 AS dn10,
    AVG(CAST(tc AS DOUBLE)) OVER w20x AS vol_avg20,
    AVG(tp) OVER w20 AS sma_tp20,
    list(tp) OVER w20 AS tps,
    MAX(high) OVER w14 AS hi14, MIN(low) OVER w14 AS lo14,
    CAST(SUM(pos_mf) OVER w14 AS DOUBLE) AS pos14,
    CAST(SUM(neg_mf) OVER w14 AS DOUBLE) AS neg14,
    AVG(close) OVER w20 AS bb_mid, STDDEV_SAMP(close) OVER w20 AS bb_sd,
    MAX(high) OVER w20x AS don_hi, MIN(low) OVER w20x AS don_lo,
    AVG(tr) OVER w10 AS atr10_sma,
    AVG(tr / close * 100) OVER w14 AS atr_pct_sma,
    MIN(low) OVER w40x AS support, MAX(high) OVER w40x AS resistance,
    CAST(SUM(CAST(tp * tc AS DECIMAL(18,8))) OVER w20 AS DOUBLE) AS vwap_num,
    CAST(SUM(CAST(tc AS DECIMAL(20,0))) OVER w20 AS DOUBLE) AS vwap_den,
    SUM(obv_step) OVER wc AS obv,
    SUM(cvd_step) OVER wc AS cvd,
    AVG(CAST(tc AS DOUBLE)) OVER w30 AS tc_avg30,
    STDDEV_SAMP(CAST(tc AS DOUBLE)) OVER w30 AS tc_sd30,
    (MAX(high) OVER w9 + MIN(low) OVER w9) / 2 AS tenkan,
    (MAX(high) OVER w26 + MIN(low) OVER w26) / 2 AS kijun,
    (MAX(high) OVER w52 + MIN(low) OVER w52) / 2 AS spanb,
    CAST(SUM(CAST(close AS DECIMAL(18,6)) * CAST(tc AS DECIMAL(18,6)))
         OVER w200 AS DOUBLE) AS fib_num,
    CAST(SUM(CAST(tc AS DECIMAL(18,6))) OVER w200 AS DOUBLE) AS fib_den,
    ROUND(close / NULLIF(p_close, 0) - 1, 6) AS liq_ret,
    ROUND(ABS(close / NULLIF(p_close, 0) - 1)
          / NULLIF(close * CAST(tc AS DOUBLE), 0) * 1e6, 6) AS amihud,
    conf_ph,
    LAST_VALUE(conf_ph IGNORE NULLS) OVER wc AS last_ph_c,
    LAST_VALUE(conf_ph IGNORE NULLS) OVER wc1 AS ph_prev_c,
    LAST_VALUE(conf_pl IGNORE NULLS) OVER wc AS last_pl_c,
    ROW_NUMBER() OVER w AS rn,
    ROW_NUMBER() OVER (PARTITION BY event_type, s ORDER BY bucket_ts) AS rns,
    PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY amplitude_pct)
      AS amp_pr
  FROM b1
  WINDOW
    w    AS (PARTITION BY event_type ORDER BY bucket_ts),
    w9   AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
    w26  AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
    w52  AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 51 PRECEDING AND CURRENT ROW),
    wc   AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wc1  AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    w10  AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
    w14  AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
    w20  AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
    w20x AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING),
    w30  AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
    w40x AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 40 PRECEDING AND 1 PRECEDING),
    w200 AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
),
b3 AS (
  SELECT *,
    LAG(obv, 30) OVER w AS obv30,
    LAG(cvd, 30) OVER w AS cvd30,
    s * COUNT(*) OVER (PARTITION BY event_type, s, rn - rns
                       ORDER BY bucket_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS streak,
    ROUND(close - ROUND(fib_num / NULLIF(fib_den, 0), 6), 6) AS fib_diff,
    ROUND(STDDEV_SAMP(ROUND(close - ROUND(fib_num / NULLIF(fib_den, 0), 6),
                            6)) OVER w200 * 3.0, 6) AS fib_dev,
    ROUND((amihud - AVG(amihud) OVER w200)
          / NULLIF(STDDEV_SAMP(amihud) OVER w200, 0), 4) AS liq_z,
    ROUND(STDDEV_SAMP(liq_ret) OVER w200, 4) AS liq_vol,
    LAST_VALUE(CASE WHEN conf_ph IS NOT NULL THEN ph_prev_c END
               IGNORE NULLS) OVER w AS ph2_c
  FROM b2 WINDOW
    w AS (PARTITION BY event_type ORDER BY bucket_ts),
    w200 AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
),{folds_sql}
,
snap AS (
  SELECT event_type, bucket_ts,
    rsi7, rsi14, rsi21, rsi_avg, rsi_state,
    macd_line, macd_signal, macd_hist, kdj_signal,
    cloud_side, regime, ribbon_state, scalp_signal, adx, st_state,
    ls_signal, harmonic_score, rsi_divergence, tl_state, price_pos,
    CASE WHEN zl_val IS NOT NULL
              AND close > zl_val + MAX(atr70_val) OVER w210 * 1.2
         THEN 'bull'
         WHEN zl_val IS NOT NULL
              AND close < zl_val - MAX(atr70_val) OVER w210 * 1.2
         THEN 'bear'
         ELSE 'range' END AS zl_state,
    CASE WHEN zl_val IS NOT NULL
              AND close > zl_val + MAX(atr70_val) OVER w210 * 1.2
         THEN 'bull'
         WHEN zl_val IS NOT NULL
              AND close < zl_val - MAX(atr70_val) OVER w210 * 1.2
         THEN 'bear' END AS pt_sig,
    ROUND(CASE WHEN zl_val IS NULL THEN NULL
               WHEN MAX(atr70_val) OVER w210 * 1.2 <> 0
               THEN LEAST(100.0::DOUBLE,
                          ABS(close - zl_val)
                          / (MAX(atr70_val) OVER w210 * 1.2) * 100.0)
               ELSE 0.0::DOUBLE END, 6) AS pt_strength,
    CASE WHEN last_ph_c IS NOT NULL AND close > last_ph_c THEN 'bullish'
         WHEN last_pl_c IS NOT NULL AND close < last_pl_c THEN 'bearish'
         ELSE 'neutral' END AS smc_bias,
    CASE WHEN last_ph_c IS NOT NULL AND close > last_ph_c THEN
           (CASE WHEN ph2_c IS NOT NULL AND last_ph_c >= ph2_c
                 THEN 'BOS_up' ELSE 'CHoCH_up' END)
         WHEN last_pl_c IS NOT NULL AND close < last_pl_c THEN
           (CASE WHEN NOT (ph2_c IS NOT NULL AND last_ph_c >= ph2_c)
                 THEN 'BOS_down' ELSE 'CHoCH_down' END)
         ELSE 'none' END AS struct_event,
    ROUND(CASE WHEN (CASE WHEN last_ph_c IS NOT NULL AND close > last_ph_c
                          THEN 1
                          WHEN last_pl_c IS NOT NULL AND close < last_pl_c
                          THEN -1 ELSE 0 END) <> 0
                AND last_ph_c IS NOT NULL AND last_pl_c IS NOT NULL
                AND last_ph_c - last_pl_c > 0
           THEN LEAST(100.0::DOUBLE,
                      50.0 + (CASE WHEN close > last_ph_c
                                   THEN close - last_ph_c
                                   ELSE last_pl_c - close END)
                             / (last_ph_c - last_pl_c) * 100.0)
           ELSE 0.0::DOUBLE END, 6) AS smc_score,
    CASE WHEN close > GREATEST((tenkan + kijun) / 2, spanb)
              AND tenkan > kijun THEN 'buy'
         WHEN close < LEAST((tenkan + kijun) / 2, spanb)
              AND tenkan < kijun THEN 'sell'
         ELSE 'neutral' END AS ichi_signal,
    ROUND(close, 6) AS last_close,
    ROUND((close - p_close) / NULLIF(p_close, 0) * 100, 6) AS change_pct,
    amplitude_pct,
    ROUND(close * tc, 6) AS turnover,
    ROUND(CASE WHEN close >= open THEN close * tc ELSE -close * tc END, 6)
      AS money_flow,
    ROUND(CAST(up20 AS DOUBLE) / NULLIF(CAST(dn20 AS DOUBLE), 0), 6)
      AS taker_ratio,
    ROUND(CAST(tc AS DOUBLE) / NULLIF(vol_avg20, 0), 6) AS vol_ratio,
    ROUND((tp - sma_tp20) / NULLIF(
        0.015 * (list_reduce(list_transform(tps, y -> abs(y - sma_tp20)),
                             (a, b) -> a + b) / len(tps)), 0), 6) AS cci,
    ROUND((close - hi14) / NULLIF(hi14 - lo14, 0) * 100, 6) + 0.0 AS wr,
    ROUND(100 * pos14 / NULLIF(pos14 + neg14, 0), 6) AS mfi14,
    ROUND(bb_mid + 2 * bb_sd, 6) AS bb_upper,
    ROUND(bb_mid - 2 * bb_sd, 6) AS bb_lower,
    ROUND((close - (bb_mid - 2 * bb_sd)) / NULLIF(4 * bb_sd, 0), 6)
      AS bb_pct,
    ROUND(4 * bb_sd / NULLIF(bb_mid, 0) * 100, 6) AS bb_width,
    ROUND(don_hi, 6) AS don_high,
    ROUND(don_lo, 6) AS don_low,
    ROUND(bb_mid + 2 * atr10_sma, 6) AS kc_upper,
    ROUND(bb_mid - 2 * atr10_sma, 6) AS kc_lower,
    CASE WHEN atr_pct_sma IS NULL THEN 'low'
         WHEN atr_pct_sma < 1.0 THEN 'low'
         WHEN atr_pct_sma < 2.5 THEN 'mid'
         WHEN atr_pct_sma < 5.0 THEN 'high'
         ELSE 'extreme' END AS vol_class,
    ROUND((close - support) / close * 100, 6) AS sup_dist_pct,
    ROUND((resistance - close) / close * 100, 6) AS res_dist_pct,
    ROUND((close - vwap_num / NULLIF(vwap_den, 0))
          / NULLIF(vwap_num / NULLIF(vwap_den, 0), 0) * 100, 6)
      AS vwap_dev_pct,
    ROUND((CAST(obv AS DOUBLE) - CAST(obv30 AS DOUBLE))
          / NULLIF(ABS(CAST(obv30 AS DOUBLE)), 0) * 100, 6) AS obv_chg30,
    ROUND((CAST(cvd AS DOUBLE) - CAST(cvd30 AS DOUBLE))
          / NULLIF(ABS(CAST(cvd30 AS DOUBLE)), 0) * 100, 6) AS cvd_chg,
    ROUND(CAST(up30 AS DOUBLE) / NULLIF(CAST(dn30 AS DOUBLE), 0), 6)
      AS ls_ratio,
    ROUND(CAST(up10 AS DOUBLE) / NULLIF(CAST(dn10 AS DOUBLE), 0), 6)
      AS taker_ls_ratio,
    ROUND((CAST(tc AS DOUBLE) - tc_avg30) / NULLIF(tc_sd30, 0), 6)
      AS oi_zscore,
    CAST(streak AS DOUBLE) AS oi_streak,
    ROUND(amp_pr * 100, 6) AS risk_score,
    ROUND(ROUND(CAST(up10 AS DOUBLE) / NULLIF(CAST(dn10 AS DOUBLE), 0), 6)
          - ROUND(CAST(up30 AS DOUBLE) / NULLIF(CAST(dn30 AS DOUBLE), 0), 6),
          6) AS sent_diff,
    CASE
      WHEN LAG(ROUND(CAST(up10 AS DOUBLE)
                     / NULLIF(CAST(dn10 AS DOUBLE), 0), 6)) OVER w < 1
           AND ROUND(CAST(up10 AS DOUBLE)
                     / NULLIF(CAST(dn10 AS DOUBLE), 0), 6) > 1
        THEN 'bull_flip'
      WHEN LAG(ROUND(CAST(up10 AS DOUBLE)
                     / NULLIF(CAST(dn10 AS DOUBLE), 0), 6)) OVER w > 1
           AND ROUND(CAST(up10 AS DOUBLE)
                     / NULLIF(CAST(dn10 AS DOUBLE), 0), 6) < 1
        THEN 'bear_flip'
      ELSE 'none' END AS flip_signal,
    CASE WHEN ROUND(fib_diff / NULLIF(fib_dev, 0), 6) >= 0
         THEN 'up' ELSE 'down' END AS fib_state,
    CASE
      WHEN ROUND(100 / (1 + exp(-(0.5 * (-liq_z) - liq_vol))), 6) >= 75
        THEN 'excellent'
      WHEN ROUND(100 / (1 + exp(-(0.5 * (-liq_z) - liq_vol))), 6) >= 50
        THEN 'good'
      WHEN ROUND(100 / (1 + exp(-(0.5 * (-liq_z) - liq_vol))), 6) >= 25
        THEN 'fair'
      ELSE 'poor' END AS liq_level,
    CASE
      WHEN COALESCE(p_close < p_open AND close > open
                    AND close >= p_open AND open <= p_close, FALSE)
        THEN 'bullish_engulfing'
      WHEN COALESCE(p_close > p_open AND close < open
                    AND close <= p_open AND open >= p_close, FALSE)
        THEN 'bearish_engulfing'
      WHEN ABS(close - open) < 0.1 * (high - low) THEN 'doji'
      WHEN (LEAST(open, close) - low) > 2 * ABS(close - open)
           AND (high - GREATEST(open, close)) < ABS(close - open)
        THEN 'hammer'
      WHEN (high - GREATEST(open, close)) > 2 * ABS(close - open)
           AND (LEAST(open, close) - low) < ABS(close - open)
        THEN 'shooting_star'
      ELSE 'none' END AS pattern
  FROM b3 JOIN folds USING (event_type, rn)
  WINDOW
    w AS (PARTITION BY event_type ORDER BY bucket_ts),
    w210 AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 209 PRECEDING AND CURRENT ROW)
),
snap2 AS (
  SELECT *,
    COALESCE(LAST_VALUE(pt_sig IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY bucket_ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'range')
      AS pt_state
  FROM snap
),
snapp AS MATERIALIZED (
  SELECT *,
    {prev_cols}
  FROM snap2 WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
)
"""

_PREV_SQL = ",\n    ".join(
    f"LAG({f}) OVER w AS prev_{f}" for f in SNAPSHOT_FIELDS
)


def _pack_oracle() -> str:
    rules = pack_sql_rules()
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT event_type, bucket_ts, '{r.name}' AS rule, "
        f"'{r.direction}' AS direction, {r.strength} AS strength "
        f"FROM snapp WHERE {condition_sql(r)}"
        for r in rules
    )
    return (
        _SNAPSHOT_SQL.replace("{prev_cols}", _PREV_SQL)
        .replace("{folds_sql}", _folds_sql())
        + f"""
SELECT event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  rule, direction, CAST(strength AS BIGINT) AS strength
FROM (
  {unions}
) fired
"""
    )


# ---------------------------------------------------------------------------
# snapshot — Spark side (same derivations, one window partitioning)
# ---------------------------------------------------------------------------
def _scan_col(src: str, alpha: float) -> Column:
    """Per-row full-prefix EWM scan (Column twin of ``_sql_scan``):
    O(n) append-scan over the named array column. Built as ONE
    F.expr string — ~90 scans built lambda-by-lambda through py4j cost
    >10 s of driver time per query; Spark SQL parses the same
    higher-order expression in one call. Double literals carry the D
    suffix (bare decimals parse as DECIMAL) and repr round-trips the
    exact alpha."""
    a, m = repr(alpha), repr(1.0 - alpha)
    return F.expr(
        f"aggregate(slice({src}, 2, greatest(size({src}) - 1, 0)), "
        f"array(cast(element_at({src}, 1) as double)), "
        f"(acc, v) -> concat(acc, array("
        f"element_at(acc, -1) * {m}D + v * {a}D)))"
    )


def _divergence_col(i: Column) -> Column:
    """Column twin of ``_sql_divergence`` (evaluated in the rows frame
    where hgh/lws/rsi14s arrays are in scope). Array access is
    try_element_at: the i >= 50 guard cannot stop Spark evaluating the
    pivot filters on the short head-slices, where a plain element_at
    raises (DuckDB returns NULL there, and the guard discards both)."""
    el = F.try_element_at
    # start clamped to 1: rows with i < 50 produce a short window the
    # i >= 50 guard discards, but slice(…, 0, …) would raise first
    st50 = F.greatest(i - 49, F.lit(1))
    h50 = F.slice(F.col("hgh"), st50, F.lit(50))
    l50 = F.slice(F.col("lws"), st50, F.lit(50))
    r50 = F.slice(F.col("rsi14s"), st50, F.lit(50))
    php = F.filter(
        F.sequence(F.lit(6), F.lit(45)),
        lambda p: el(h50, p) == F.array_max(F.slice(h50, p - 5, F.lit(11))),
    )
    plp = F.filter(
        F.sequence(F.lit(6), F.lit(45)),
        lambda p: el(l50, p) == F.array_min(F.slice(l50, p - 5, F.lit(11))),
    )
    nh, nl = F.size(php), F.size(plp)
    # clamp indices away from 0 — when nh/nl < 2 the guard discards the
    # branch, but Spark still evaluates the indexing and element_at(0)
    # raises; the clamped probe just yields NULL comparisons instead
    nh2, nl2 = F.greatest(nh, F.lit(2)), F.greatest(nl, F.lit(2))
    bear = (
        (el(h50, el(php, nh2)) > el(h50, el(php, nh2 - 1)))
        & (el(r50, el(php, nh2)) < el(r50, el(php, nh2 - 1)))
    )
    bull = (
        (el(l50, el(plp, nl2)) < el(l50, el(plp, nl2 - 1)))
        & (el(r50, el(plp, nl2)) > el(r50, el(plp, nl2 - 1)))
    )
    has = (i >= 50) & (nh >= 2) & (nl >= 2)
    return (
        F.when(has & bear, "bearish_div")
        .when(has & bull, "bullish_div")
        .otherwise("none")
    )


def _tl_state_col(i: Column) -> Column:
    """Column twin of ``_sql_tl_state``."""
    el = F.element_at
    ys = F.slice(F.col("cl"), F.greatest(i - 49, F.lit(1)), F.lit(50))
    m = F.least(F.lit(50), i)
    ysum = F.aggregate(ys, F.lit(0.0), lambda a, v: a + v)
    xc = lambda t: (t - 1).cast("double") - (m - 1) / 2.0  # noqa: E731
    num = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), m), lambda t: xc(t) * (el(ys, t) - ysum / m)
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    den = F.aggregate(
        F.transform(F.sequence(F.lit(1), m), lambda t: xc(t) * xc(t)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return F.when(i < 2, "down").when(num / den > 0, "up").otherwise("down")


def _build_folds(bars: DataFrame) -> DataFrame:
    """The recursive-field rows (event_type, rn, 12 fields) — per-key
    ordered arrays, named prefix scans, then one explode. Column twin of
    ``_folds_sql``; every arithmetic shape matches the oracle exactly."""
    el = F.element_at
    series = (
        bars.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("bucket_ts", "close", "high", "low", "open",
                             "tc")
                )
            ).alias("p")
        )
        .select(
            "event_type",
            F.transform("p", lambda r: r["close"]).alias("cl"),
            F.transform("p", lambda r: r["high"]).alias("hgh"),
            F.transform("p", lambda r: r["low"]).alias("lws"),
            F.transform("p", lambda r: r["open"]).alias("opn"),
            F.transform("p", lambda r: r["tc"]).alias("tcs"),
        )
    )
    n = F.size("cl")
    hi9 = lambda i: F.array_max(F.slice("hgh", i - 8, 9))  # noqa: E731
    lo9 = lambda i: F.array_min(F.slice("lws", i - 8, 9))  # noqa: E731
    sc1 = series.select(
        "*",
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.greatest(el("cl", i) - el("cl", i - 1), F.lit(0.0)),
        ).alias("gains"),
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.greatest(el("cl", i - 1) - el("cl", i), F.lit(0.0)),
        ).alias("losses"),
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(i < 9, F.lit(None).cast("double"))
            .when(hi9(i) == lo9(i), F.lit(50.0))
            .otherwise((el("cl", i) - lo9(i)) / (hi9(i) - lo9(i)) * 100.0),
        ).alias("rsvs_full"),
    )
    sc2 = sc1.select(
        "*",
        *[
            _scan_col(src, alpha).alias(name)
            for name, (src, alpha) in _EMA_SCANS.items()
        ],
    )

    def rsi_arr(p: int) -> Column:
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(i <= p, F.lit(None).cast("double"))
            .when(el(f"al{p}s", i - 1) == 0, F.lit(100.0))
            .otherwise(
                F.round(
                    100.0
                    - 100.0
                    / (1.0 + el(f"ag{p}s", i - 1) / el(f"al{p}s", i - 1)),
                    6,
                )
                + F.lit(0.0)
            ),
        )

    sc3 = sc2.select(
        "*",
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: el("e12s", i) - el("e26s", i),
        ).alias("macds"),
        F.slice(
            "rsvs_full", 9, F.greatest(n - 8, F.lit(0))
        ).alias("rsvs"),
        rsi_arr(7).alias("rsi7s"),
        rsi_arr(14).alias("rsi14s"),
        rsi_arr(21).alias("rsi21s"),
    )
    sc4 = sc3.select(
        "*",
        _scan_col("macds", 2.0 / 10.0).alias("sigs"),
        _scan_col("rsvs", 1.0 / 3.0).alias("ks"),
    )
    sc5 = sc4.select(
        "*", _scan_col("ks", 1.0 / 3.0).alias("ds")
    )

    # --- path-dependent per-row state scans (full-prefix law, like the
    # ind_adx_di / ind_supertrend_fold / ind_precision_trend twins).
    # Spark side: O(n) append-scans — each step extends the scan array
    # by one folded value instead of re-folding the prefix.
    hgc, lwc, clc = F.col("hgh"), F.col("lws"), F.col("cl")
    trs = F.transform(
        F.sequence(F.lit(1), n),
        lambda k: F.when(
            k == 1, el(hgc, 1) - el(lwc, 1)
        ).otherwise(
            F.greatest(
                el(hgc, k) - el(lwc, k),
                F.abs(el(hgc, k) - el(clc, k - 1)),
                F.abs(el(lwc, k) - el(clc, k - 1)),
            )
        ),
    )
    delag = F.transform(
        F.sequence(F.lit(_ZLAG + 1), n),
        lambda k: 2 * el(clc, k) - el(clc, k - _ZLAG),
    )
    bar_structs = F.transform(
        F.sequence(F.lit(1), n),
        lambda k: F.struct(
            el(hgc, k).alias("h"), el(lwc, k).alias("l"),
            el(clc, k).alias("c"),
        ),
    )

    zero = F.lit(0.0)
    ax_a = 1.0 / 14.0
    ax_1m, ax_al = F.lit(1.0 - ax_a), F.lit(ax_a)

    def adx_step(acc, x):
        up = x["h"] - acc["h"]
        dn = acc["l"] - x["l"]
        pdm = F.when((up > dn) & (up > 0), up).otherwise(zero)
        mdm = F.when((dn > up) & (dn > 0), dn).otherwise(zero)
        tr = F.greatest(
            x["h"] - x["l"], F.abs(x["h"] - acc["c"]), F.abs(x["l"] - acc["c"])
        )
        nsp = acc["sp"] * ax_1m + pdm * ax_al
        nsm = acc["sm"] * ax_1m + mdm * ax_al
        nst = acc["st"] * ax_1m + tr * ax_al
        pdi, mdi = 100 * nsp / nst, 100 * nsm / nst
        dx = (
            F.when(nst == 0, zero)
            .when(pdi + mdi == 0, zero)
            .otherwise(100 * F.abs(pdi - mdi) / (pdi + mdi))
        )
        return F.struct(
            (acc["adx"] * ax_1m + dx * ax_al).alias("adx"),
            nsp.alias("sp"), nsm.alias("sm"), nst.alias("st"),
            x["h"].alias("h"), x["l"].alias("l"), x["c"].alias("c"),
        )

    st_a = 1.0 / 10.0
    st_1m, st_al = F.lit(1.0 - st_a), F.lit(st_a)

    def st_step(acc, x):
        tr = F.greatest(
            x["h"] - x["l"], F.abs(x["h"] - acc["c"]), F.abs(x["l"] - acc["c"])
        )
        natr = acc["atr"] * st_1m + tr * st_al
        mid = (x["h"] + x["l"]) / 2
        upper, lower = mid + 3.0 * natr, mid - 3.0 * natr
        nfu = F.when(
            (upper < acc["fu"]) | (acc["c"] > acc["fu"]), upper
        ).otherwise(acc["fu"])
        nfl = F.when(
            (lower > acc["fl"]) | (acc["c"] < acc["fl"]), lower
        ).otherwise(acc["fl"])
        ndir = (
            F.when(x["c"] > nfu, F.lit(1.0))
            .when(x["c"] < nfl, F.lit(-1.0))
            .otherwise(acc["dir"])
        )
        return F.struct(
            ndir.alias("dir"), nfu.alias("fu"), nfl.alias("fl"),
            natr.alias("atr"),
            x["h"].alias("h"), x["l"].alias("l"), x["c"].alias("c"),
        )

    def _struct_scan_arr(elems, seed, step):
        return F.aggregate(
            F.slice(elems, 2, F.greatest(F.size(elems) - 1, F.lit(0))),
            F.array(seed),
            lambda acc, x: F.concat(
                acc, F.array(step(F.element_at(acc, -1), x))
            ),
        )

    def _struct_scan(elems, seed, step, field):
        return F.transform(
            _struct_scan_arr(elems, seed, step), lambda s: s[field]
        )

    def _append_scan(src, alpha):
        return F.aggregate(
            F.slice(src, 2, F.greatest(F.size(src) - 1, F.lit(0))),
            F.array(F.element_at(src, 1).cast("double")),
            lambda acc, v: F.concat(
                acc,
                F.array(
                    F.element_at(acc, -1) * F.lit(1.0 - alpha)
                    + v * F.lit(alpha)
                ),
            ),
        )

    ha_a = 2.0 / 11.0
    ha_1m, ha_al = F.lit(1.0 - ha_a), F.lit(ha_a)

    def ha_step(acc, x):
        neo = acc["eo"] * ha_1m + x["eo"] * ha_al
        neh = acc["eh"] * ha_1m + x["eh"] * ha_al
        nel = acc["el"] * ha_1m + x["el"] * ha_al
        nec = acc["ec"] * ha_1m + x["ec"] * ha_al
        nha_o = (acc["ha_o"] + acc["ha_c"]) / 2
        nha_c = (neo + neh + nel + nec) / 4
        return F.struct(
            (acc["so"] * ha_1m + nha_o * ha_al).alias("so"),
            (acc["sc"] * ha_1m + nha_c * ha_al).alias("sc"),
            nha_o.alias("ha_o"), nha_c.alias("ha_c"),
            neo.alias("eo"), neh.alias("eh"), nel.alias("el"),
            nec.alias("ec"),
        )

    opc = F.col("opn")
    ha_structs = F.transform(
        F.sequence(F.lit(1), n),
        lambda k: F.struct(
            ((el(opc, k) + el(clc, k)) / 2).alias("so"),
            ((el(opc, k) + el(hgc, k) + el(lwc, k) + el(clc, k)) / 4)
            .alias("sc"),
            ((el(opc, k) + el(clc, k)) / 2).alias("ha_o"),
            ((el(opc, k) + el(hgc, k) + el(lwc, k) + el(clc, k)) / 4)
            .alias("ha_c"),
            el(opc, k).alias("eo"), el(hgc, k).alias("eh"),
            el(lwc, k).alias("el"), el(clc, k).alias("ec"),
        ),
    )

    b1s = el(bar_structs, 1)
    adx_seed = F.struct(
        zero.alias("adx"), zero.alias("sp"), zero.alias("sm"),
        (b1s["h"] - b1s["l"]).alias("st"),
        b1s["h"].alias("h"), b1s["l"].alias("l"), b1s["c"].alias("c"),
    )
    st_seed = F.struct(
        F.lit(1.0).alias("dir"),
        ((b1s["h"] + b1s["l"]) / 2 + 3.0 * (b1s["h"] - b1s["l"])).alias("fu"),
        ((b1s["h"] + b1s["l"]) / 2 - 3.0 * (b1s["h"] - b1s["l"])).alias("fl"),
        (b1s["h"] - b1s["l"]).alias("atr"),
        b1s["h"].alias("h"), b1s["l"].alias("l"), b1s["c"].alias("c"),
    )
    sc6 = sc5.select(
        "*",
        _struct_scan(bar_structs, adx_seed, adx_step, "adx").alias("adxs"),
        _struct_scan(bar_structs, st_seed, st_step, "dir").alias("stds"),
        _struct_scan_arr(ha_structs, el(ha_structs, 1), ha_step)
        .alias("hasts"),
        _append_scan(trs, 1.0 / 70.0).alias("atr70s"),
        _append_scan(delag, 2.0 / 71.0).alias("zlps"),
    )

    rows = sc6.select(
        "*", F.explode(F.sequence(F.lit(1), n)).alias("rn")
    )
    # NOTE: parallelism here is per KEY (the scan arrays live one row
    # per key until the explode). A row-level repartition after the
    # explode was measured at sf0.01 (5 keys): no wall-clock gain — the
    # cost is split between Column-tree construction and the scan stage
    # — while at production symbol counts it would shuffle rows x
    # per-key arrays (O(n^2) doubles per key), so key parallelism is
    # the right physical shape.
    # per-row VPVR price position (staged columns mirror the
    # foldsA..foldsD oracle chain; try_element_at because the guarded
    # branches still evaluate their indexing)
    ii = F.col("rn")
    # window ends AT row ii: length = min(ii, 200), not a fixed 200
    w_len = F.least(ii, F.lit(200))
    sub_c = F.slice(F.col("cl"), F.greatest(ii - 199, F.lit(1)), w_len)
    sub_v = F.slice(F.col("tcs"), F.greatest(ii - 199, F.lit(1)), w_len)
    rows = rows.withColumns({
        "cur_c": F.element_at(F.col("cl"), ii),
        "lov": F.array_min(sub_c),
        "hiv": F.array_max(sub_c),
    })
    lov, hiv = F.col("lov"), F.col("hiv")

    def _bucket(cc):
        return F.when(hiv <= lov, F.lit(0)).otherwise(
            F.least(
                F.lit(47),
                F.greatest(
                    F.lit(0),
                    F.floor((cc - lov) / (hiv - lov) * 48).cast("int"),
                ),
            )
        )

    # NOTE: _bucket re-evaluates inside each of the 48 per-bucket passes;
    # hoisting it into a precomputed (bucket, vol) struct column was
    # tried and measured — Catalyst's CollapseProject inlines the
    # once-referenced column straight back into the transform, so the
    # rewrite changed nothing physically. Leave the direct form.
    rows = rows.withColumn(
        "vols",
        F.transform(
            F.sequence(F.lit(0), F.lit(47)),
            lambda k: F.aggregate(
                F.zip_with(
                    sub_c, sub_v,
                    lambda cc, vv: F.when(
                        _bucket(cc) == k, vv.cast("double")
                    ).otherwise(F.lit(0.0)),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
        ),
    )
    vols = F.col("vols")
    rows = rows.withColumns({
        "poc0": (F.array_position(vols, F.array_max(vols)) - 1)
        .cast("double"),
        "vtotal": F.aggregate(vols, F.lit(0.0), lambda a, v: a + v),
    })
    tel = F.try_element_at
    poc0, vtotal = F.col("poc0"), F.col("vtotal")

    def _exp_step(acc, _x):
        a_, b_, cov = F.element_at(acc, 1), F.element_at(acc, 2), \
            F.element_at(acc, 3)
        nxt_a = F.when(a_ > 0, tel(vols, a_.cast("int"))).otherwise(
            F.lit(-1.0)
        )
        nxt_b = F.when(b_ < 47, tel(vols, b_.cast("int") + 2)).otherwise(
            F.lit(-1.0)
        )
        return (
            F.when((cov >= 0.7 * vtotal) | ((a_ == 0) & (b_ == 47)), acc)
            .when(
                nxt_b >= nxt_a,
                F.array(a_, b_ + 1.0, cov + tel(vols, b_.cast("int") + 2)),
            )
            .otherwise(
                F.array(a_ - 1.0, b_, cov + tel(vols, a_.cast("int")))
            )
        )

    rows = rows.withColumn(
        "vexp",
        F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(47)), lambda q: q),
            F.array(poc0, poc0, F.element_at(vols, poc0.cast("int") + 1)),
            _exp_step,
        ),
    )
    vexp = F.col("vexp")
    price_pos = (
        F.when(hiv <= lov, "in_va")
        .when(
            F.col("cur_c")
            > lov + (F.element_at(vexp, 2) + 1) * (hiv - lov) / 48,
            "above_va",
        )
        .when(
            F.col("cur_c") < lov + F.element_at(vexp, 1) * (hiv - lov) / 48,
            "below_va",
        )
        .otherwise("in_va")
    )
    i = F.col("rn")
    rsi7 = el("rsi7s", i)
    rsi14 = el("rsi14s", i)
    rsi21 = el("rsi21s", i)
    kj = 3.0 * el("ks", i - 8) - 2.0 * el("ds", i - 8)
    bull_cnt = sum(
        F.when(
            (el(f"rb{j:02d}s", i) > el("rb18s", i))
            & (el(f"rb{j:02d}s", i) > el(f"rb{j:02d}s", i - 1)),
            1,
        ).otherwise(0)
        for j in range(1, 19)
    )
    bear_cnt = sum(
        F.when(
            (el(f"rb{j:02d}s", i) < el("rb18s", i))
            & (el(f"rb{j:02d}s", i) < el(f"rb{j:02d}s", i - 1)),
            1,
        ).otherwise(0)
        for j in range(1, 19)
    )
    return rows.select(
        "event_type",
        "rn",
        rsi7.alias("rsi7"),
        rsi14.alias("rsi14"),
        rsi21.alias("rsi21"),
        F.when(
            rsi7.isNull() | rsi14.isNull() | rsi21.isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round((rsi7 + rsi14 + rsi21) / 3.0, 6))
        .alias("rsi_avg"),
        F.when(rsi14.isNull(), "neutral")
        .when(rsi14 > 70, "overbought")
        .when(rsi14 < 30, "oversold")
        .otherwise("neutral")
        .alias("rsi_state"),
        (F.round(el("macds", i), 6) + F.lit(0.0)).alias("macd_line"),
        (F.round(el("sigs", i), 6) + F.lit(0.0)).alias("macd_signal"),
        (F.round(el("macds", i) - el("sigs", i), 6) + F.lit(0.0)).alias(
            "macd_hist"
        ),
        F.when(i < 10, "continue")
        .when(
            (el("ks", i - 9) <= el("ds", i - 9))
            & (el("ks", i - 8) > el("ds", i - 8)),
            "golden_cross",
        )
        .when(
            (el("ks", i - 9) >= el("ds", i - 9))
            & (el("ks", i - 8) < el("ds", i - 8)),
            "death_cross",
        )
        .when(kj > 100.0, "j_overbought")
        .when(kj < 0.0, "j_oversold")
        .otherwise("continue")
        .alias("kdj_signal"),
        F.when(el("cl", i) >= el("smmas", i), "above")
        .otherwise("below")
        .alias("cloud_side"),
        F.when(
            (el("ema7s", i) > el("ema25s", i))
            & (el("ema25s", i) > el("ema99s", i)),
            "bull_stack",
        )
        .when(
            (el("ema7s", i) < el("ema25s", i))
            & (el("ema25s", i) < el("ema99s", i)),
            "bear_stack",
        )
        .otherwise("tangled")
        .alias("regime"),
        F.when(i == 1, "mixed")
        .when(bull_cnt >= 13, "bull")
        .when(bear_cnt >= 13, "bear")
        .when(el("cl", i) > el("rb18s", i), "bull")
        .otherwise("bear")
        .alias("ribbon_state"),
        F.when(el("scfs", i) > el("scss", i), "long")
        .otherwise("short")
        .alias("scalp_signal"),
        F.round(el("adxs", i), 6).alias("adx"),
        F.when(el("stds", i) > 0, "up").otherwise("down").alias("st_state"),
        F.when(i > _ZLAG, el("zlps", i - _ZLAG)).alias("zl_val"),
        el("atr70s", i).alias("atr70_val"),
        F.when(
            el("hasts", i)["sc"] >= el("hasts", i)["so"], "long"
        ).otherwise("short").alias("ls_signal"),
        _divergence_col(i).alias("rsi_divergence"),
        _tl_state_col(i).alias("tl_state"),
        price_pos.alias("price_pos"),
        F.when(i <= 33, F.lit(None).cast("double")).otherwise(
            F.round(
                sum(
                    F.when(
                        el(f"al{p}s", i - 1) == 0, F.lit(100.0)
                    ).otherwise(
                        100.0
                        - 100.0
                        / (1.0 + el(f"ag{p}s", i - 1) / el(f"al{p}s", i - 1))
                    )
                    for p in _HARM_PS
                )
                / 32.0,
                6,
            )
        ).alias("harmonic_score"),
    )


def build_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-expressible indicator snapshot with prev_ lags — the
    Column-algebra twin of ``_SNAPSHOT_SQL``."""
    from tradecat_spark.operators.rollup import ohlcv_rollup

    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    bars = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600)
    bars = bars.withColumnRenamed("trade_count", "tc")
    # SNAP_TAIL clamp — see the constant's docstring (keeps the prefix
    # scans' O(tail²) append cost constant as history grows)
    wdesc = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    bars = (
        bars.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= SNAP_TAIL)
        .drop("_rnd")
    )

    w = Window.partitionBy("event_type").orderBy("bucket_ts")

    def fr(a, b_):
        return w.rowsBetween(a, b_)

    o, h, lo, c = F.col("open"), F.col("high"), F.col("low"), F.col("close")
    tc = F.col("tc")
    tp = (h + lo + c) / 3
    tcd = tc.cast("double")
    b0 = bars.select(
        "event_type", "bucket_ts", "open", "high", "low", "close", "tc",
        tp.alias("tp"),
        F.lag("close").over(w).alias("pc"),
        F.lag(tp).over(w).alias("prev_tp"),
        F.lag("open").over(w).alias("p_open"),
        F.lag("close").over(w).alias("p_close"),
        F.when(tcd > F.lag(tcd).over(w), 1)
        .when(tcd < F.lag(tcd).over(w), -1)
        .otherwise(0)
        .alias("s"),
        F.round((h - lo) / c * 100, 6).alias("amplitude_pct"),
        (
            (h > F.lag("high", 1).over(w)) & (h > F.lag("high", 2).over(w))
            & (h > F.lead("high", 1).over(w))
            & (h > F.lead("high", 2).over(w))
        ).alias("is_ph"),
        (
            (lo < F.lag("low", 1).over(w)) & (lo < F.lag("low", 2).over(w))
            & (lo < F.lead("low", 1).over(w))
            & (lo < F.lead("low", 2).over(w))
        ).alias("is_pl"),
    )
    pc, ptp = F.col("pc"), F.col("prev_tp")
    tr = F.greatest(h - lo, F.abs(h - pc), F.abs(lo - pc))
    zero8, zero20 = F.lit(0).cast(DEC), F.lit(0).cast(DECC)
    b1 = b0.select(
        "*",
        tr.alias("tr"),
        F.when(c >= o, tc).otherwise(F.lit(0)).alias("up_tc"),
        F.when(c < o, tc).otherwise(F.lit(0)).alias("dn_tc"),
        F.when(c > pc, tc.cast(DECC))
        .when(c < pc, -tc.cast(DECC))
        .otherwise(zero20)
        .alias("obv_step"),
        F.when(c >= o, tc.cast(DECC)).otherwise(-tc.cast(DECC)).alias("cvd_step"),
        F.when(F.col("tp") > ptp, (F.col("tp") * tc).cast(DEC))
        .otherwise(zero8)
        .alias("pos_mf"),
        F.when(F.col("tp") < ptp, (F.col("tp") * tc).cast(DEC))
        .otherwise(zero8)
        .alias("neg_mf"),
        F.when(F.lag("is_ph", 2).over(w), F.lag("high", 2).over(w))
        .alias("conf_ph"),
        F.when(F.lag("is_pl", 2).over(w), F.lag("low", 2).over(w))
        .alias("conf_pl"),
    )
    wc = fr(Window.unboundedPreceding, Window.currentRow)
    b2 = b1.select(
        "event_type", "bucket_ts", "open", "high", "low", "close", "tc",
        "tp", "s", "amplitude_pct", "p_open", "p_close",
        F.sum("up_tc").over(fr(-19, 0)).alias("up20"),
        F.sum("dn_tc").over(fr(-19, 0)).alias("dn20"),
        F.sum("up_tc").over(fr(-29, 0)).alias("up30"),
        F.sum("dn_tc").over(fr(-29, 0)).alias("dn30"),
        F.sum("up_tc").over(fr(-9, 0)).alias("up10"),
        F.sum("dn_tc").over(fr(-9, 0)).alias("dn10"),
        F.avg(tcd).over(fr(-20, -1)).alias("vol_avg20"),
        F.avg("tp").over(fr(-19, 0)).alias("sma_tp20"),
        F.collect_list("tp").over(fr(-19, 0)).alias("tps"),
        F.max("high").over(fr(-13, 0)).alias("hi14"),
        F.min("low").over(fr(-13, 0)).alias("lo14"),
        F.sum("pos_mf").over(fr(-13, 0)).cast("double").alias("pos14"),
        F.sum("neg_mf").over(fr(-13, 0)).cast("double").alias("neg14"),
        F.avg("close").over(fr(-19, 0)).alias("bb_mid"),
        F.stddev_samp("close").over(fr(-19, 0)).alias("bb_sd"),
        F.max("high").over(fr(-20, -1)).alias("don_hi"),
        F.min("low").over(fr(-20, -1)).alias("don_lo"),
        F.avg("tr").over(fr(-9, 0)).alias("atr10_sma"),
        F.avg(F.col("tr") / c * 100).over(fr(-13, 0)).alias("atr_pct_sma"),
        F.min("low").over(fr(-40, -1)).alias("support"),
        F.max("high").over(fr(-40, -1)).alias("resistance"),
        F.sum((F.col("tp") * tc).cast(DEC)).over(fr(-19, 0)).cast("double")
        .alias("vwap_num"),
        F.sum(tc.cast(DECC)).over(fr(-19, 0)).cast("double").alias("vwap_den"),
        F.sum("obv_step").over(wc).alias("obv"),
        F.sum("cvd_step").over(wc).alias("cvd"),
        F.avg(tcd).over(fr(-29, 0)).alias("tc_avg30"),
        F.stddev_samp(tcd).over(fr(-29, 0)).alias("tc_sd30"),
        ((F.max("high").over(fr(-8, 0)) + F.min("low").over(fr(-8, 0))) / 2)
        .alias("tenkan"),
        ((F.max("high").over(fr(-25, 0)) + F.min("low").over(fr(-25, 0))) / 2)
        .alias("kijun"),
        ((F.max("high").over(fr(-51, 0)) + F.min("low").over(fr(-51, 0))) / 2)
        .alias("spanb"),
        F.sum((c.cast("decimal(18,6)") * tc.cast("decimal(18,6)")))
        .over(fr(-199, 0)).cast("double").alias("fib_num"),
        F.sum(tc.cast("decimal(18,6)")).over(fr(-199, 0)).cast("double")
        .alias("fib_den"),
        F.round(c / F.nullif(F.col("p_close"), F.lit(0)) - 1, 6)
        .alias("liq_ret"),
        F.round(
            F.abs(c / F.nullif(F.col("p_close"), F.lit(0)) - 1)
            / F.nullif(c * tcd, F.lit(0)) * 1e6, 6
        ).alias("amihud"),
        "conf_ph",
        F.last("conf_ph", ignorenulls=True).over(wc).alias("last_ph_c"),
        F.last("conf_ph", ignorenulls=True)
        .over(fr(Window.unboundedPreceding, -1)).alias("ph_prev_c"),
        F.last("conf_pl", ignorenulls=True).over(wc).alias("last_pl_c"),
        F.row_number().over(w).alias("rn"),
        F.row_number()
        .over(Window.partitionBy("event_type", "s").orderBy("bucket_ts"))
        .alias("rns"),
        F.percent_rank()
        .over(Window.partitionBy("event_type").orderBy("amplitude_pct"))
        .alias("amp_pr"),
    )
    grp_w = (
        Window.partitionBy("event_type", "s", F.col("rn") - F.col("rns"))
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w200 = fr(-199, 0)
    vwma6 = F.round(
        F.col("fib_num") / F.nullif(F.col("fib_den"), F.lit(0)), 6
    )
    b3 = b2.select(
        "*",
        F.lag("obv", 30).over(w).alias("obv30"),
        F.lag("cvd", 30).over(w).alias("cvd30"),
        (F.col("s") * F.count(F.lit(1)).over(grp_w)).alias("streak"),
        F.round(F.col("close") - vwma6, 6).alias("fib_diff"),
        F.round(
            F.stddev_samp(F.round(F.col("close") - vwma6, 6)).over(w200)
            * 3.0, 6
        ).alias("fib_dev"),
        F.round(
            (F.col("amihud") - F.avg("amihud").over(w200))
            / F.nullif(F.stddev_samp("amihud").over(w200), F.lit(0)), 4
        ).alias("liq_z"),
        F.round(F.stddev_samp("liq_ret").over(w200), 4).alias("liq_vol"),
        F.last(
            F.when(F.col("conf_ph").isNotNull(), F.col("ph_prev_c")),
            ignorenulls=True,
        ).over(fr(Window.unboundedPreceding, 0)).alias("ph2_c"),
    )
    b3 = b3.join(F.broadcast(_build_folds(bars)), ["event_type", "rn"])
    bb_up = F.col("bb_mid") + 2 * F.col("bb_sd")
    bb_lo = F.col("bb_mid") - 2 * F.col("bb_sd")
    vwap = F.col("vwap_num") / F.nullif(F.col("vwap_den"), F.lit(0))
    mad = (
        F.aggregate(
            F.transform("tps", lambda y: F.abs(y - F.col("sma_tp20"))),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.size("tps")
    )
    body = F.abs(c - o)
    upper_sh = h - F.greatest(o, c)
    lower_sh = F.least(o, c) - lo
    po, pcl = F.col("p_open"), F.col("p_close")
    pattern = (
        F.when(
            F.coalesce(
                (pcl < po) & (c > o) & (c >= po) & (o <= pcl), F.lit(False)
            ),
            "bullish_engulfing",
        )
        .when(
            F.coalesce(
                (pcl > po) & (c < o) & (c <= po) & (o >= pcl), F.lit(False)
            ),
            "bearish_engulfing",
        )
        .when(body < 0.1 * (h - lo), "doji")
        .when((lower_sh > 2 * body) & (upper_sh < body), "hammer")
        .when((upper_sh > 2 * body) & (lower_sh < body), "shooting_star")
        .otherwise("none")
    )
    obv_d, obv30_d = F.col("obv").cast("double"), F.col("obv30").cast("double")
    cvd_d, cvd30_d = F.col("cvd").cast("double"), F.col("cvd30").cast("double")
    # sentiment proxies: taker (10-bar) vs global (30-bar) ratio, both
    # 6dp-rounded before the diff / flip comparisons (mirrors the SQL)
    tlr10 = F.round(
        F.col("up10").cast("double")
        / F.nullif(F.col("dn10").cast("double"), F.lit(0)), 6
    )
    lr30 = F.round(
        F.col("up30").cast("double")
        / F.nullif(F.col("dn30").cast("double"), F.lit(0)), 6
    )
    liq_score6 = F.round(
        100 / (1 + F.exp(-(0.5 * (-F.col("liq_z")) - F.col("liq_vol")))), 6
    )
    zl_band = F.max("atr70_val").over(fr(-209, 0)) * 1.2
    zlv = F.col("zl_val")
    bull_break = F.col("last_ph_c").isNotNull() & (c > F.col("last_ph_c"))
    bear_break = F.col("last_pl_c").isNotNull() & (c < F.col("last_pl_c"))
    trend_up = F.col("ph2_c").isNotNull() & (
        F.col("last_ph_c") >= F.col("ph2_c")
    )
    smc_bias = (
        F.when(bull_break, "bullish")
        .when(bear_break, "bearish")
        .otherwise("neutral")
    )
    snap = b3.select(
        "event_type", "bucket_ts",
        "rsi7", "rsi14", "rsi21", "rsi_avg", "rsi_state",
        "macd_line", "macd_signal", "macd_hist", "kdj_signal",
        "cloud_side", "regime", "ribbon_state", "scalp_signal",
        "adx", "st_state", "ls_signal", "harmonic_score",
        "rsi_divergence", "tl_state", "price_pos",
        F.when(zlv.isNotNull() & (c > zlv + zl_band), "bull")
        .when(zlv.isNotNull() & (c < zlv - zl_band), "bear")
        .otherwise("range")
        .alias("zl_state"),
        F.when(zlv.isNotNull() & (c > zlv + zl_band), "bull")
        .when(zlv.isNotNull() & (c < zlv - zl_band), "bear")
        .alias("pt_sig"),
        F.round(
            F.when(zlv.isNull(), F.lit(None).cast("double"))
            .when(
                zl_band != 0,
                F.least(
                    F.lit(100.0), F.abs(c - zlv) / zl_band * 100.0
                ),
            )
            .otherwise(F.lit(0.0)),
            6,
        ).alias("pt_strength"),
        smc_bias.alias("smc_bias"),
        F.when(
            bull_break,
            F.when(trend_up, "BOS_up").otherwise("CHoCH_up"),
        )
        .when(
            bear_break,
            F.when(~trend_up, "BOS_down").otherwise("CHoCH_down"),
        )
        .otherwise("none")
        .alias("struct_event"),
        F.round(
            F.when(
                (bull_break | bear_break)
                & F.col("last_ph_c").isNotNull()
                & F.col("last_pl_c").isNotNull()
                & (F.col("last_ph_c") - F.col("last_pl_c") > 0),
                F.least(
                    F.lit(100.0),
                    50.0
                    + F.when(
                        c > F.col("last_ph_c"), c - F.col("last_ph_c")
                    ).otherwise(F.col("last_pl_c") - c)
                    / (F.col("last_ph_c") - F.col("last_pl_c"))
                    * 100.0,
                ),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("smc_score"),
        F.when(
            (c > F.greatest((F.col("tenkan") + F.col("kijun")) / 2,
                            F.col("spanb")))
            & (F.col("tenkan") > F.col("kijun")),
            "buy",
        )
        .when(
            (c < F.least((F.col("tenkan") + F.col("kijun")) / 2,
                         F.col("spanb")))
            & (F.col("tenkan") < F.col("kijun")),
            "sell",
        )
        .otherwise("neutral")
        .alias("ichi_signal"),
        F.round(c, 6).alias("last_close"),
        F.round((c - pcl) / F.nullif(pcl, F.lit(0)) * 100, 6).alias("change_pct"),
        "amplitude_pct",
        F.round(c * tc, 6).alias("turnover"),
        F.round(F.when(c >= o, c * tc).otherwise(-c * tc), 6).alias("money_flow"),
        F.round(
            F.col("up20").cast("double")
            / F.nullif(F.col("dn20").cast("double"), F.lit(0)), 6
        ).alias("taker_ratio"),
        F.round(tcd / F.nullif(F.col("vol_avg20"), F.lit(0)), 6).alias("vol_ratio"),
        F.round(
            (F.col("tp") - F.col("sma_tp20"))
            / F.nullif(0.015 * mad, F.lit(0)), 6
        ).alias("cci"),
        (
            F.round(
                (c - F.col("hi14"))
                / F.nullif(F.col("hi14") - F.col("lo14"), F.lit(0)) * 100, 6
            )
            + F.lit(0.0)
        ).alias("wr"),
        F.round(
            100 * F.col("pos14")
            / F.nullif(F.col("pos14") + F.col("neg14"), F.lit(0)), 6
        ).alias("mfi14"),
        F.round(bb_up, 6).alias("bb_upper"),
        F.round(bb_lo, 6).alias("bb_lower"),
        F.round((c - bb_lo) / F.nullif(4 * F.col("bb_sd"), F.lit(0)), 6)
        .alias("bb_pct"),
        F.round(
            4 * F.col("bb_sd") / F.nullif(F.col("bb_mid"), F.lit(0)) * 100, 6
        ).alias("bb_width"),
        F.round(F.col("don_hi"), 6).alias("don_high"),
        F.round(F.col("don_lo"), 6).alias("don_low"),
        F.round(F.col("bb_mid") + 2 * F.col("atr10_sma"), 6).alias("kc_upper"),
        F.round(F.col("bb_mid") - 2 * F.col("atr10_sma"), 6).alias("kc_lower"),
        F.when(F.col("atr_pct_sma").isNull(), "low")
        .when(F.col("atr_pct_sma") < 1.0, "low")
        .when(F.col("atr_pct_sma") < 2.5, "mid")
        .when(F.col("atr_pct_sma") < 5.0, "high")
        .otherwise("extreme")
        .alias("vol_class"),
        F.round((c - F.col("support")) / c * 100, 6).alias("sup_dist_pct"),
        F.round((F.col("resistance") - c) / c * 100, 6).alias("res_dist_pct"),
        F.round((c - vwap) / F.nullif(vwap, F.lit(0)) * 100, 6)
        .alias("vwap_dev_pct"),
        F.round(
            (obv_d - obv30_d) / F.nullif(F.abs(obv30_d), F.lit(0)) * 100, 6
        ).alias("obv_chg30"),
        F.round(
            (cvd_d - cvd30_d) / F.nullif(F.abs(cvd30_d), F.lit(0)) * 100, 6
        ).alias("cvd_chg"),
        F.round(
            F.col("up30").cast("double")
            / F.nullif(F.col("dn30").cast("double"), F.lit(0)), 6
        ).alias("ls_ratio"),
        F.round(
            F.col("up10").cast("double")
            / F.nullif(F.col("dn10").cast("double"), F.lit(0)), 6
        ).alias("taker_ls_ratio"),
        F.round(
            (tcd - F.col("tc_avg30")) / F.nullif(F.col("tc_sd30"), F.lit(0)), 6
        ).alias("oi_zscore"),
        F.col("streak").cast("double").alias("oi_streak"),
        F.round(F.col("amp_pr") * 100, 6).alias("risk_score"),
        pattern.alias("pattern"),
        F.round(tlr10 - lr30, 6).alias("sent_diff"),
        F.when((F.lag(tlr10).over(w) < 1) & (tlr10 > 1), "bull_flip")
        .when((F.lag(tlr10).over(w) > 1) & (tlr10 < 1), "bear_flip")
        .otherwise("none")
        .alias("flip_signal"),
        F.when(
            F.round(
                F.col("fib_diff") / F.nullif(F.col("fib_dev"), F.lit(0)), 6
            ) >= 0,
            "up",
        )
        .otherwise("down")
        .alias("fib_state"),
        F.when(liq_score6 >= 75, "excellent")
        .when(liq_score6 >= 50, "good")
        .when(liq_score6 >= 25, "fair")
        .otherwise("poor")
        .alias("liq_level"),
    )
    snap2 = snap.withColumn(
        "pt_state",
        F.coalesce(
            F.last("pt_sig", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            F.lit("range"),
        ),
    )
    return snap2.select(
        "*", *[F.lag(f).over(w).alias(f"prev_{f}") for f in SNAPSHOT_FIELDS]
    )


@query(
    "signal_pack_sql_rules",
    survey="§2.10 rule pack + condition compiler "
    "(rules/{core,momentum,volatility,volume,futures,pattern,misc}; "
    "compiler rules/base.py:47-160) — the full 129-rule pack "
    "as one wide projection; oracle GENERATED from the same configs",
    description="All 129 pack rules fired over 1h snapshots",
    oracle=_pack_oracle(),
)
def signal_pack_sql_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One projection fires every rule: ``array(when(cond_i, name_i))``
    → ``array_compact`` → ``explode``. 129 boolean Columns over one
    shared window partitioning — a single exchange, whole-stage codegen
    end-to-end, and the rule count scales the projection width, not the
    number of passes."""
    rules = pack_sql_rules()
    snap = build_snapshot(spark, sf_dir)
    fired = F.array_compact(
        F.array(
            *[
                F.when(
                    compile_condition(r),
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.lit(r.direction).alias("direction"),
                        F.lit(r.strength).cast("long").alias("strength"),
                    ),
                )
                for r in rules
            ]
        )
    )
    return (
        snap.select(
            "event_type",
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            F.explode(fired).alias("f"),
        )
        .select(
            "event_type", "bucket_ts",
            F.col("f.rule").alias("rule"),
            F.col("f.direction").alias("direction"),
            F.col("f.strength").alias("strength"),
        )
    )


@query(
    "signal_rule_pack_129",
    survey="§2.10 the FULL 129-rule pack over the applyInPandas "
    "indicator surface (reference engine.py 60s loop; counts match "
    "rules/__init__.py: 8 categories, 129 rules)",
    description="All 129 pack rules over prev/curr indicator surface snapshots",
)
def signal_rule_pack_129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two as-of surface snapshots (≤ latest-1h vs ≤ latest bar) joined
    per key give prev/curr; all 129 compiled conditions evaluate in one
    projection over the wide surface. Python appears only inside the
    Arrow-batched indicator engine — rule evaluation itself is Column
    algebra."""
    from tradecat_spark.indicators.engine import bars_from_events, compute_all

    e = load_table(spark, sf_dir, "events")
    bars = bars_from_events(e, "event_type", 3600)
    horizon = bars.agg(
        F.max("bucket_ts").alias("mx")
    ).select(F.expr("mx - INTERVAL 1 HOUR").alias("cut"))
    prev_bars = bars.join(F.broadcast(horizon)).where(
        F.col("bucket_ts") <= F.col("cut")
    ).drop("cut")
    curr = compute_all(bars, ["event_type"], tail=500)
    prev = compute_all(prev_bars, ["event_type"], tail=500)
    pcols = [c for c in prev.columns if c != "event_type"]
    prev_r = prev.select(
        "event_type", *[F.col(c).alias(f"prev_{c}") for c in pcols]
    )
    snap = curr.join(prev_r, "event_type", "inner")
    fired = F.array_compact(
        F.array(
            *[
                F.when(
                    compile_condition(r),
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.lit(r.category).alias("category"),
                        F.lit(r.direction).alias("direction"),
                        F.lit(r.strength).cast("long").alias("strength"),
                    ),
                )
                for r in ALL_RULES
            ]
        )
    )
    return snap.select("event_type", F.explode(fired).alias("f")).select(
        "event_type",
        F.col("f.rule").alias("rule"),
        F.col("f.category").alias("category"),
        F.col("f.direction").alias("direction"),
        F.col("f.strength").alias("strength"),
    )
