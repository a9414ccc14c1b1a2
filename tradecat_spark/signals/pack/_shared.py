"""Shared constructor for the rule pack.

The reference's pack fields (rules/base.py:27-45) map as: direction
BUY→long / SELL→short / ALERT→alert; priority high→8 / medium→5 /
low→2; cooldown seconds carried verbatim; ``ref_name`` preserves the
reference rule's original name so parity can be audited rule-by-rule.
"""

from __future__ import annotations

from tradecat_spark.signals.rules import ConditionType, SignalRule

_DIR = {"BUY": "long", "SELL": "short", "ALERT": "alert"}
_PRI = {"high": 8, "medium": 5, "low": 2}


def R(
    name: str,
    ref_name: str,
    table: str,
    category: str,
    subcategory: str,
    direction: str,
    strength: int,
    ct: ConditionType,
    cfg: dict,
    priority: str = "medium",
    cooldown: int = 3600,
    min_volume: float = 100000,
    timeframes: tuple[str, ...] = ("1h", "4h", "1d"),
) -> SignalRule:
    return SignalRule(
        name=name,
        table=table,
        condition_type=ct,
        condition_config=cfg,
        direction=_DIR[direction],
        strength=strength,
        priority=_PRI[priority],
        timeframes=timeframes,
        cooldown_sec=cooldown,
        min_volume=min_volume,
        category=category,
        subcategory=subcategory,
        ref_name=ref_name,
    )
