"""Volume pack — MACD, OBV, CVD, volume ratio, taker ratio. Mirrors
rules/volume/__init__.py (13 rules)."""

from __future__ import annotations

from tradecat_spark.signals.pack._shared import R
from tradecat_spark.signals.rules import ConditionType as CT

C = CT.CUSTOM

VOLUME_RULES = [
    R("macd_golden_cross", "MACD金叉", "macd",
      "volume", "macd", "BUY", 65, CT.CROSS_UP,
      {"fast": "macd_line", "slow": "macd_signal"}),
    R("macd_death_cross", "MACD死叉", "macd",
      "volume", "macd", "SELL", 65, CT.CROSS_DOWN,
      {"fast": "macd_line", "slow": "macd_signal"}),
    R("macd_hist_turns_positive", "MACD柱状转正", "macd",
      "volume", "macd", "BUY", 55, C,
      {"expr": "sign_flip_up", "field": "macd_hist"}, priority="low"),
    R("macd_hist_turns_negative", "MACD柱状转负", "macd",
      "volume", "macd", "SELL", 55, C,
      {"expr": "sign_flip_down", "field": "macd_hist"}, priority="low"),
    R("macd_zero_line_cross_up", "MACD零轴上穿", "macd",
      "volume", "macd", "BUY", 60, CT.THRESHOLD_CROSS_UP,
      {"field": "macd_line", "threshold": 0}),
    R("obv_surge_up", "OBV大幅上升", "obv",
      "volume", "obv", "BUY", 60, C,
      {"expr": "gt", "field": "obv_chg30", "threshold": 20}),
    R("obv_surge_down", "OBV大幅下降", "obv",
      "volume", "obv", "SELL", 60, C,
      {"expr": "lt", "field": "obv_chg30", "threshold": -20}),
    R("cvd_surge_up", "CVD大幅上升", "cvd",
      "volume", "cvd", "BUY", 60, C,
      {"expr": "gt", "field": "cvd_chg", "threshold": 30}),
    R("cvd_surge_down", "CVD大幅下降", "cvd",
      "volume", "cvd", "SELL", 60, C,
      {"expr": "lt", "field": "cvd_chg", "threshold": -30}),
    R("volume_ratio_elevated", "量比放大", "volume_ratio",
      "volume", "ratio", "ALERT", 65, CT.THRESHOLD_CROSS_UP,
      {"field": "vol_ratio", "threshold": 2.0}),
    R("volume_ratio_extreme", "量比极度放大", "volume_ratio",
      "volume", "ratio", "ALERT", 80, CT.THRESHOLD_CROSS_UP,
      {"field": "vol_ratio", "threshold": 5.0}, priority="high"),
    R("taker_buy_extreme", "主动买盘极端", "buy_sell_ratio",
      "volume", "taker", "BUY", 70, CT.THRESHOLD_CROSS_UP,
      {"field": "taker_ratio", "threshold": 1.5}, priority="high"),
    R("taker_sell_extreme", "主动卖盘极端", "buy_sell_ratio",
      "volume", "taker", "SELL", 70, C,
      {"expr": "leave_above", "field": "taker_ratio", "threshold": 0.67},
      priority="high"),
]
