"""Trend pack — SuperTrend, precision trend, Ichimoku, zero-lag, trend
cloud, trend line, long/short, volume bias, EMA-GC regime. Mirrors
rules/trend/__init__.py (19 rules)."""

from __future__ import annotations

from tradecat_spark.signals.pack._shared import R
from tradecat_spark.signals.rules import ConditionType as CT

S = CT.STATE_CHANGE


def _flip(name, ref, table, sub, field, down_states, up_states, strength,
          priority="high"):
    return [
        R(f"{name}_flips_long", f"{ref}翻多", table, "trend", sub, "BUY",
          strength, S, {"field": field, "from": down_states, "to": up_states},
          priority=priority),
        R(f"{name}_flips_short", f"{ref}翻空", table, "trend", sub, "SELL",
          strength, S, {"field": field, "from": up_states, "to": down_states},
          priority=priority),
    ]


TREND_RULES = (
    _flip("supertrend", "SuperTrend", "supertrend", "supertrend",
          "st_state", ["down"], ["up"], 70)
    + _flip("precision_trend", "精准趋势", "precision_trend", "precise",
            "pt_state", ["bear"], ["bull"], 75)
    + [
        R("precision_trend_strength_break", "精准趋势强度突破",
          "precision_trend", "trend", "precise", "ALERT", 65,
          CT.THRESHOLD_CROSS_UP, {"field": "pt_strength", "threshold": 80}),
    ]
    + [
        R("ichimoku_buy_signal", "Ichimoku买入信号", "ichimoku",
          "trend", "ichimoku", "BUY", 70, S,
          {"field": "ichi_signal", "from": ["sell", "neutral"],
           "to": ["buy"]},
          priority="high"),
        R("ichimoku_sell_signal", "Ichimoku卖出信号", "ichimoku",
          "trend", "ichimoku", "SELL", 70, S,
          {"field": "ichi_signal", "from": ["buy", "neutral"],
           "to": ["sell"]},
          priority="high"),
    ]
    + _flip("zero_lag_trend", "零延迟趋势", "zero_lag_trend", "zerolag",
            "zl_state", ["bear"], ["bull"], 70)
    + _flip("trend_cloud", "趋势云", "trend_cloud", "cloud",
            "cloud_side", ["below"], ["above"], 70)
    + _flip("trend_line", "趋势线", "trend_line", "trendline",
            "tl_state", ["down"], ["up"], 65, priority="medium")
    + _flip("long_short_signal", "多空信号", "long_short", "ha",
            "ls_signal", ["short"], ["long"], 65, priority="medium")
    + _flip("volume_bias", "量能偏向", "ma_ribbon", "volume_trend",
            "ribbon_state", ["bear"], ["bull"], 60, priority="medium")
    + _flip("gc_regime", "GC点趋势", "ema_gc", "gc",
            "regime", ["bear_stack"], ["bull_stack"], 65, priority="medium")
)
