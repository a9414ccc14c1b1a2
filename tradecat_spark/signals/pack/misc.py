"""Misc pack — liquidity, scalping, base data. Mirrors
rules/misc/__init__.py (8 rules)."""

from __future__ import annotations

from tradecat_spark.signals.pack._shared import R
from tradecat_spark.signals.rules import ConditionType as CT

S, C = CT.STATE_CHANGE, CT.CUSTOM

MISC_RULES = [
    R("liquidity_improving", "流动性改善", "liquidity",
      "misc", "liquidity", "ALERT", 55, S,
      {"field": "liq_level", "from": ["poor", "fair"],
       "to": ["good", "excellent"]},
      priority="low"),
    R("liquidity_deteriorating", "流动性恶化", "liquidity",
      "misc", "liquidity", "ALERT", 65, S,
      {"field": "liq_level", "from": ["good", "excellent"],
       "to": ["poor", "fair"]}),
    R("scalping_long_signal", "剥头皮多头信号", "scalping",
      "misc", "scalping", "BUY", 60, S,
      {"field": "scalp_signal", "from": ["short"], "to": ["long"]},
      timeframes=("1h",)),
    R("scalping_short_signal", "剥头皮空头信号", "scalping",
      "misc", "scalping", "SELL", 60, S,
      {"field": "scalp_signal", "from": ["long"], "to": ["short"]},
      timeframes=("1h",)),
    R("turnover_explosion", "成交额暴增", "base_data",
      "misc", "basic", "ALERT", 70, C,
      {"expr": "ratio_vs_prev_gt", "field": "turnover", "mult": 3},
      priority="high"),
    R("amplitude_anomaly", "振幅异常", "base_data",
      "misc", "basic", "ALERT", 65, CT.THRESHOLD_CROSS_UP,
      {"field": "amplitude_pct", "threshold": 10}),
    R("taker_ratio_extreme_long", "买卖比极端看多", "base_data",
      "misc", "basic", "BUY", 65, CT.THRESHOLD_CROSS_UP,
      {"field": "taker_ratio", "threshold": 1.5}),
    R("taker_ratio_extreme_short", "买卖比极端看空", "base_data",
      "misc", "basic", "SELL", 65, C,
      {"expr": "leave_above", "field": "taker_ratio", "threshold": 0.67}),
]
