"""The full 129-rule signal pack as config data.

Mirrors /root/reference/services/signal-service/src/rules/__init__.py:
eight category modules aggregated into ``ALL_RULES`` with by-category
and by-table indexes. Every rule's ``ref_name`` preserves the reference
rule's original name; ``condition_config`` is declarative (CUSTOM rules
reference named expression shapes in ``signals.custom``, never opaque
lambdas), so the entire pack compiles to Column expressions and
evaluates as one wide projection per snapshot — no per-rule Python in
the batch path.

Category counts match the reference exactly:
core 20, momentum 27, trend 19, volatility 15, volume 13, futures 11,
pattern 16, misc 8 → 129.
"""

from __future__ import annotations

from tradecat_spark.signals.pack.core import CORE_RULES
from tradecat_spark.signals.pack.futures import FUTURES_RULES
from tradecat_spark.signals.pack.misc import MISC_RULES
from tradecat_spark.signals.pack.momentum import MOMENTUM_RULES
from tradecat_spark.signals.pack.pattern import PATTERN_RULES
from tradecat_spark.signals.pack.trend import TREND_RULES
from tradecat_spark.signals.pack.volatility import VOLATILITY_RULES
from tradecat_spark.signals.pack.volume import VOLUME_RULES
from tradecat_spark.signals.rules import SignalRule

ALL_RULES: list[SignalRule] = (
    CORE_RULES
    + MOMENTUM_RULES
    + TREND_RULES
    + VOLATILITY_RULES
    + VOLUME_RULES
    + FUTURES_RULES
    + PATTERN_RULES
    + MISC_RULES
)

RULES_BY_CATEGORY: dict[str, list[SignalRule]] = {
    "core": CORE_RULES,
    "momentum": MOMENTUM_RULES,
    "trend": TREND_RULES,
    "volatility": VOLATILITY_RULES,
    "volume": VOLUME_RULES,
    "futures": FUTURES_RULES,
    "pattern": PATTERN_RULES,
    "misc": MISC_RULES,
}

RULES_BY_TABLE: dict[str, list[SignalRule]] = {}
for _r in ALL_RULES:
    RULES_BY_TABLE.setdefault(_r.table, []).append(_r)

RULE_COUNT = len(ALL_RULES)

__all__ = [
    "ALL_RULES",
    "RULES_BY_CATEGORY",
    "RULES_BY_TABLE",
    "RULE_COUNT",
]
