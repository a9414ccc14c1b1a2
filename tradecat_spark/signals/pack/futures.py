"""Futures sentiment pack. Mirrors rules/futures/__init__.py (11 rules)."""

from __future__ import annotations

from tradecat_spark.signals.pack._shared import R
from tradecat_spark.signals.rules import ConditionType as CT

S, C = CT.STATE_CHANGE, CT.CUSTOM

FUTURES_RULES = [
    R("whale_extreme_long", "大户极度看多", "futures_sentiment",
      "futures", "sentiment", "ALERT", 75, CT.THRESHOLD_CROSS_UP,
      {"field": "ls_ratio", "threshold": 2.0}, priority="high"),
    R("whale_extreme_short", "大户极度看空", "futures_sentiment",
      "futures", "sentiment", "ALERT", 75, C,
      {"expr": "leave_above", "field": "ls_ratio", "threshold": 0.5},
      priority="high"),
    R("futures_taker_buy_extreme", "主动买盘极端", "futures_sentiment",
      "futures", "sentiment", "BUY", 70, CT.THRESHOLD_CROSS_UP,
      {"field": "taker_ls_ratio", "threshold": 1.5}, priority="high"),
    R("futures_taker_sell_extreme", "主动卖盘极端", "futures_sentiment",
      "futures", "sentiment", "SELL", 70, C,
      {"expr": "leave_above", "field": "taker_ls_ratio", "threshold": 0.67},
      priority="high"),
    R("sentiment_flip_bull", "情绪翻转看多", "futures_sentiment",
      "futures", "sentiment", "BUY", 80, S,
      {"field": "flip_signal", "from": ["none", "bear_flip"],
       "to": ["bull_flip"]},
      priority="high"),
    R("sentiment_flip_bear", "情绪翻转看空", "futures_sentiment",
      "futures", "sentiment", "SELL", 80, S,
      {"field": "flip_signal", "from": ["none", "bull_flip"],
       "to": ["bear_flip"]},
      priority="high"),
    R("risk_score_high", "风险分高位", "futures_sentiment",
      "futures", "sentiment", "ALERT", 70, CT.THRESHOLD_CROSS_UP,
      {"field": "risk_score", "threshold": 80}, priority="high"),
    R("oi_streak_building", "OI连续增仓", "futures_sentiment",
      "futures", "sentiment", "ALERT", 65, CT.THRESHOLD_CROSS_UP,
      {"field": "oi_streak", "threshold": 5}),
    R("oi_streak_unwinding", "OI连续减仓", "futures_sentiment",
      "futures", "sentiment", "ALERT", 65, C,
      {"expr": "leave_above", "field": "oi_streak", "threshold": -5}),
    R("oi_zscore_high", "持仓Z分数异常高", "futures_sentiment",
      "futures", "sentiment", "ALERT", 70, CT.THRESHOLD_CROSS_UP,
      {"field": "oi_zscore", "threshold": 2.0}, priority="high"),
    R("oi_zscore_low", "持仓Z分数异常低", "futures_sentiment",
      "futures", "sentiment", "ALERT", 70, C,
      {"expr": "leave_above", "field": "oi_zscore", "threshold": -2},
      priority="high"),
]
