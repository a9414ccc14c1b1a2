"""Volatility pack — Bollinger, ATR regime, Donchian, Keltner, S/R,
VWAP. Mirrors rules/volatility/__init__.py (15 rules)."""

from __future__ import annotations

from tradecat_spark.signals.pack._shared import R
from tradecat_spark.signals.rules import ConditionType as CT

S, C = CT.STATE_CHANGE, CT.CUSTOM

VOLATILITY_RULES = [
    # Bollinger (volatility/__init__.py:7-81); band breaks are strict
    R("bb_break_upper", "突破布林上轨", "bollinger",
      "volatility", "bollinger", "SELL", 60, C,
      {"expr": "cross_field_up", "field_a": "last_close",
       "field_b": "bb_upper", "strict": True}),
    R("bb_break_lower", "跌破布林下轨", "bollinger",
      "volatility", "bollinger", "BUY", 60, C,
      {"expr": "cross_field_down", "field_a": "last_close",
       "field_b": "bb_lower", "strict": True}),
    R("bb_squeeze", "布林带收窄", "bollinger",
      "volatility", "bollinger", "ALERT", 55, C,
      {"expr": "drop_through", "field": "bb_width", "high": 5, "low": 3},
      priority="low"),
    R("bb_expansion", "布林带扩张", "bollinger",
      "volatility", "bollinger", "ALERT", 55, C,
      {"expr": "jump_through", "field": "bb_width", "low": 5, "high": 8},
      priority="low"),
    R("bb_pct_overbought", "布林%b超买", "bollinger",
      "volatility", "bollinger", "SELL", 55, CT.THRESHOLD_CROSS_UP,
      {"field": "bb_pct", "threshold": 1.0}, priority="low"),
    # ATR volatility regime (:83-114)
    R("volatility_spike", "波动率突增", "atr_scan",
      "volatility", "atr", "ALERT", 70, S,
      {"field": "vol_class", "from": ["low", "mid"],
       "to": ["high", "extreme"]},
      priority="high"),
    R("volatility_collapse", "波动率骤降", "atr_scan",
      "volatility", "atr", "ALERT", 60, S,
      {"field": "vol_class", "from": ["high", "extreme"], "to": ["low"]}),
    # Donchian / Keltner breaks are inclusive (:116-188)
    R("donchian_break_upper", "突破Donchian上轨", "donchian",
      "volatility", "donchian", "BUY", 65, C,
      {"expr": "cross_field_up", "field_a": "last_close",
       "field_b": "don_high", "strict": False}),
    R("donchian_break_lower", "跌破Donchian下轨", "donchian",
      "volatility", "donchian", "SELL", 65, C,
      {"expr": "cross_field_down", "field_a": "last_close",
       "field_b": "don_low", "strict": False}),
    R("keltner_break_upper", "突破Keltner上轨", "keltner",
      "volatility", "keltner", "BUY", 60, C,
      {"expr": "cross_field_up", "field_a": "last_close",
       "field_b": "kc_upper", "strict": False}),
    R("keltner_break_lower", "跌破Keltner下轨", "keltner",
      "volatility", "keltner", "SELL", 60, C,
      {"expr": "cross_field_down", "field_a": "last_close",
       "field_b": "kc_lower", "strict": False}),
    # near support/resistance, stateless (:190-217)
    R("near_support", "接近支撑位", "support_resistance",
      "volatility", "sr", "BUY", 60, C,
      {"expr": "lt", "field": "sup_dist_pct", "threshold": 1.5}),
    R("near_resistance", "接近阻力位", "support_resistance",
      "volatility", "sr", "SELL", 60, C,
      {"expr": "lt", "field": "res_dist_pct", "threshold": 1.5}),
    # VWAP deviation sign flips (:219-246)
    R("vwap_cross_above", "突破VWAP上方", "vwap",
      "volatility", "vwap", "BUY", 55, C,
      {"expr": "sign_flip_up", "field": "vwap_dev_pct"}, priority="low"),
    R("vwap_cross_below", "跌破VWAP下方", "vwap",
      "volatility", "vwap", "SELL", 55, C,
      {"expr": "sign_flip_down", "field": "vwap_dev_pct"}, priority="low"),
]
