"""Momentum pack — RSI, KDJ, CCI, WilliamsR, MFI, ADX, harmonic.
Mirrors rules/momentum/{rsi,kdj,others}.py (27 rules)."""

from __future__ import annotations

from tradecat_spark.signals.pack._shared import R
from tradecat_spark.signals.rules import ConditionType as CT

S, C = CT.STATE_CHANGE, CT.CUSTOM

RSI_RULES = [
    R("rsi_enters_overbought", "RSI进入超买区", "smart_rsi",
      "momentum", "rsi", "SELL", 60, S,
      {"field": "rsi_state", "from": ["neutral", "oversold"],
       "to": ["overbought"]}),
    R("rsi_enters_oversold", "RSI进入超卖区", "smart_rsi",
      "momentum", "rsi", "BUY", 60, S,
      {"field": "rsi_state", "from": ["neutral", "overbought"],
       "to": ["oversold"]}),
    R("rsi_leaves_overbought", "RSI离开超买区", "smart_rsi",
      "momentum", "rsi", "BUY", 70, S,
      {"field": "rsi_state", "from": ["overbought"],
       "to": ["neutral", "oversold"]},
      priority="high"),
    R("rsi_leaves_oversold", "RSI离开超卖区", "smart_rsi",
      "momentum", "rsi", "SELL", 70, S,
      {"field": "rsi_state", "from": ["oversold"],
       "to": ["neutral", "overbought"]},
      priority="high"),
    R("rsi_bearish_divergence", "RSI顶背离", "smart_rsi",
      "momentum", "rsi", "SELL", 80, S,
      {"field": "rsi_divergence", "from": ["none", "bullish_div"],
       "to": ["bearish_div"]},
      priority="high", cooldown=7200),
    R("rsi_bullish_divergence", "RSI底背离", "smart_rsi",
      "momentum", "rsi", "BUY", 80, S,
      {"field": "rsi_divergence", "from": ["none", "bearish_div"],
       "to": ["bullish_div"]},
      priority="high", cooldown=7200),
    R("rsi7_golden_cross_rsi21", "RSI7金叉RSI21", "smart_rsi",
      "momentum", "rsi", "BUY", 55, CT.CROSS_UP,
      {"fast": "rsi7", "slow": "rsi21"}, priority="low"),
    R("rsi7_death_cross_rsi21", "RSI7死叉RSI21", "smart_rsi",
      "momentum", "rsi", "SELL", 55, CT.CROSS_DOWN,
      {"fast": "rsi7", "slow": "rsi21"}, priority="low"),
]

KDJ_RULES = [
    R("kdj_golden_cross", "KDJ金叉", "kdj",
      "momentum", "kdj", "BUY", 65, S,
      {"field": "kdj_signal",
       "from": ["continue", "death_cross", "j_oversold", "j_overbought"],
       "to": ["golden_cross"]}),
    R("kdj_death_cross", "KDJ死叉", "kdj",
      "momentum", "kdj", "SELL", 65, S,
      {"field": "kdj_signal",
       "from": ["continue", "golden_cross", "j_oversold", "j_overbought"],
       "to": ["death_cross"]}),
    R("kdj_j_oversold_extreme", "J值超卖极值", "kdj",
      "momentum", "kdj", "BUY", 75, S,
      {"field": "kdj_signal",
       "from": ["continue", "golden_cross", "death_cross", "j_overbought"],
       "to": ["j_oversold"]},
      priority="high"),
    R("kdj_j_overbought_extreme", "J值超买极值", "kdj",
      "momentum", "kdj", "SELL", 75, S,
      {"field": "kdj_signal",
       "from": ["continue", "golden_cross", "death_cross", "j_oversold"],
       "to": ["j_overbought"]},
      priority="high"),
]

CCI_RULES = [
    R("cci_enters_overbought", "CCI进入超买", "cci",
      "momentum", "cci", "SELL", 55, CT.THRESHOLD_CROSS_UP,
      {"field": "cci", "threshold": 100}, priority="low"),
    R("cci_enters_oversold", "CCI进入超卖", "cci",
      "momentum", "cci", "BUY", 55, CT.THRESHOLD_CROSS_DOWN,
      {"field": "cci", "threshold": -100}, priority="low"),
    R("cci_leaves_overbought", "CCI离开超买", "cci",
      "momentum", "cci", "BUY", 65, C,
      {"expr": "leave_above", "field": "cci", "threshold": 100}),
    R("cci_leaves_oversold", "CCI离开超卖", "cci",
      "momentum", "cci", "SELL", 65, C,
      {"expr": "leave_below", "field": "cci", "threshold": -100}),
]

WR_RULES = [
    R("wr_enters_overbought", "WR进入超买", "williams_r",
      "momentum", "williams", "SELL", 55, CT.THRESHOLD_CROSS_UP,
      {"field": "wr", "threshold": -20}, priority="low"),
    R("wr_enters_oversold", "WR进入超卖", "williams_r",
      "momentum", "williams", "BUY", 55, CT.THRESHOLD_CROSS_DOWN,
      {"field": "wr", "threshold": -80}, priority="low"),
    R("wr_leaves_overbought", "WR离开超买", "williams_r",
      "momentum", "williams", "BUY", 65, C,
      {"expr": "leave_above", "field": "wr", "threshold": -20}),
    R("wr_leaves_oversold", "WR离开超卖", "williams_r",
      "momentum", "williams", "SELL", 65, C,
      {"expr": "leave_below", "field": "wr", "threshold": -80}),
]

MFI_RULES = [
    R("mfi_overbought", "MFI超买", "mfi",
      "momentum", "mfi", "SELL", 60, CT.THRESHOLD_CROSS_UP,
      {"field": "mfi14", "threshold": 80}),
    R("mfi_oversold", "MFI超卖", "mfi",
      "momentum", "mfi", "BUY", 60, CT.THRESHOLD_CROSS_DOWN,
      {"field": "mfi14", "threshold": 20}),
    R("mfi_leaves_overbought", "MFI离开超买", "mfi",
      "momentum", "mfi", "BUY", 65, C,
      {"expr": "leave_above", "field": "mfi14", "threshold": 80}),
    R("mfi_leaves_oversold", "MFI离开超卖", "mfi",
      "momentum", "mfi", "SELL", 65, C,
      {"expr": "leave_below", "field": "mfi14", "threshold": 20}),
]

ADX_RULES = [
    R("adx_trend_strengthening", "ADX趋势增强", "adx",
      "momentum", "adx", "ALERT", 60, CT.THRESHOLD_CROSS_UP,
      {"field": "adx", "threshold": 25}),
    R("adx_trend_weakening", "ADX趋势减弱", "adx",
      "momentum", "adx", "ALERT", 55, C,
      {"expr": "leave_above", "field": "adx", "threshold": 25},
      priority="low"),
]

HARMONIC_RULES = [
    R("harmonic_signal_appears", "谐波信号出现", "harmonic",
      "momentum", "harmonic", "ALERT", 70, C,
      {"expr": "abs_gt", "field": "harmonic_score", "threshold": 0.5}),
]

MOMENTUM_RULES = (
    RSI_RULES + KDJ_RULES + CCI_RULES + WR_RULES + MFI_RULES + ADX_RULES
    + HARMONIC_RULES
)
