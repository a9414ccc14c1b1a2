"""Signal rule schema and condition compiler.

Reference: ``SignalRule`` dataclass and the 8 declarative condition
types evaluated over (prev, curr) row snapshots —
/root/reference/services/signal-service/src/rules/base.py:13-160.

Spark-first design: instead of Python dict comparisons per symbol, each
condition type compiles to a Column expression over a row that carries
``<field>`` (current) and ``prev_<field>`` (previous) columns — produced
by a single ``lag()`` window in batch, or by the stateful stream op.
The whole 129-rule surface therefore evaluates as one wide projection,
inside whole-stage codegen, per snapshot — no per-rule Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class ConditionType(str, Enum):
    STATE_CHANGE = "state_change"          # label transitions to target
    THRESHOLD_CROSS_UP = "threshold_cross_up"    # prev <= θ < curr
    THRESHOLD_CROSS_DOWN = "threshold_cross_down"  # prev >= θ > curr
    CROSS_UP = "cross_up"                  # field a crosses above field b
    CROSS_DOWN = "cross_down"              # field a crosses below field b
    CONTAINS = "contains"                  # substring match (any/all)
    RANGE_ENTER = "range_enter"            # value enters [lo, hi]
    RANGE_EXIT = "range_exit"              # value leaves [lo, hi]
    CUSTOM = "custom"                      # named expr from signals.custom


@dataclass
class SignalRule:
    """Mirror of rules/base.py:28-45 (engine-relevant fields)."""

    name: str
    table: str                      # indicator table the rule reads
    condition_type: ConditionType
    condition_config: dict
    direction: str = "neutral"      # long / short / neutral
    strength: int = 1
    priority: int = 5
    timeframes: tuple[str, ...] = ("1h",)
    cooldown_sec: int = 3600
    min_volume: float = 0.0
    category: str = "core"
    subcategory: str = ""
    ref_name: str = ""              # the reference pack's original rule name
    extra: dict = field(default_factory=dict)


def _prev(f: str) -> Column:
    return F.col(f"prev_{f}")


def compile_condition(rule: SignalRule) -> Column:
    """Compile one rule's condition to a boolean Column.

    Field references resolve against ``<field>`` / ``prev_<field>``
    columns; evaluation semantics match rules/base.py:47-160.
    """
    cfg = rule.condition_config
    ct = rule.condition_type
    if ct == ConditionType.STATE_CHANGE:
        f, target = cfg["field"], cfg["to"]
        from_any = cfg.get("from")  # optional source-state restriction
        if isinstance(target, (list, tuple)):
            # reference form (rules/base.py:56-64): membership on both
            # sides — prev in from_values AND curr in to_values
            targets = list(target)
            cond = F.col(f).isin(targets)
            if from_any is not None:
                cond &= _prev(f).isin(list(from_any))
            else:
                cond &= ~_prev(f).isin(targets)
            return cond
        cond = (_prev(f) != target) & (F.col(f) == target)
        if from_any is not None:
            cond &= _prev(f).isin(list(from_any))
        return cond
    if ct == ConditionType.THRESHOLD_CROSS_UP:
        f, th = cfg["field"], float(cfg["threshold"])
        return (_prev(f) <= th) & (F.col(f) > th)
    if ct == ConditionType.THRESHOLD_CROSS_DOWN:
        f, th = cfg["field"], float(cfg["threshold"])
        return (_prev(f) >= th) & (F.col(f) < th)
    if ct == ConditionType.CROSS_UP:
        a, b = cfg["fast"], cfg["slow"]
        return (_prev(a) <= _prev(b)) & (F.col(a) > F.col(b))
    if ct == ConditionType.CROSS_DOWN:
        a, b = cfg["fast"], cfg["slow"]
        return (_prev(a) >= _prev(b)) & (F.col(a) < F.col(b))
    if ct == ConditionType.CONTAINS:
        f, needles = cfg["field"], cfg["values"]
        mode = cfg.get("mode", "any")
        hits = [F.col(f).contains(n) for n in needles]
        out = hits[0]
        for h in hits[1:]:
            out = (out & h) if mode == "all" else (out | h)
        return out
    if ct == ConditionType.RANGE_ENTER:
        f, lo, hi = cfg["field"], float(cfg["low"]), float(cfg["high"])
        inside = F.col(f).between(lo, hi)
        was_out = ~_prev(f).between(lo, hi)
        return was_out & inside
    if ct == ConditionType.RANGE_EXIT:
        f, lo, hi = cfg["field"], float(cfg["low"]), float(cfg["high"])
        was_in = _prev(f).between(lo, hi)
        outside = ~F.col(f).between(lo, hi)
        return was_in & outside
    if ct == ConditionType.CUSTOM:
        from tradecat_spark.signals.custom import get_custom

        return get_custom(cfg["expr"]).column(cfg)
    raise ValueError(f"unknown condition type {ct}")


#: condition_config keys that name a snapshot field, per condition shape
_FIELD_KEYS = (
    "field", "fast", "slow", "field_a", "field_b", "turnover",
    "change_field", "taker", "flow", "streak_field", "mean",
    "state_field", "event_field", "bias_field", "score_field",
)


def condition_fields(rule: SignalRule) -> set[str]:
    """Snapshot fields a rule's condition reads (current-row names; the
    prev_ twin is implied). Used to select which rules a given snapshot
    schema can evaluate."""
    return {
        v for k, v in rule.condition_config.items() if k in _FIELD_KEYS
    }


def _sql_in(vals) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


def condition_sql(rule: SignalRule) -> str | None:
    """ANSI-SQL rendering of a rule's condition — the DuckDB oracle form.

    Same field-naming convention as ``compile_condition``: a snapshot
    row exposes ``<field>`` and ``prev_<field>`` columns. Returns None
    when the condition is not SQL-expressible (CUSTOM exprs without a
    registered sql form).
    """
    cfg = rule.condition_config
    ct = rule.condition_type
    if ct == ConditionType.STATE_CHANGE:
        f, target = cfg["field"], cfg["to"]
        from_any = cfg.get("from")
        if isinstance(target, (list, tuple)):
            cond = f"{f} IN {_sql_in(target)}"
            if from_any is not None:
                cond += f" AND prev_{f} IN {_sql_in(from_any)}"
            else:
                cond += f" AND NOT prev_{f} IN {_sql_in(target)}"
            return f"({cond})"
        cond = f"prev_{f} <> '{target}' AND {f} = '{target}'"
        if from_any is not None:
            cond += f" AND prev_{f} IN {_sql_in(from_any)}"
        return f"({cond})"
    if ct == ConditionType.THRESHOLD_CROSS_UP:
        f, th = cfg["field"], float(cfg["threshold"])
        return f"(prev_{f} <= {th} AND {f} > {th})"
    if ct == ConditionType.THRESHOLD_CROSS_DOWN:
        f, th = cfg["field"], float(cfg["threshold"])
        return f"(prev_{f} >= {th} AND {f} < {th})"
    if ct == ConditionType.CROSS_UP:
        a, b = cfg["fast"], cfg["slow"]
        return f"(prev_{a} <= prev_{b} AND {a} > {b})"
    if ct == ConditionType.CROSS_DOWN:
        a, b = cfg["fast"], cfg["slow"]
        return f"(prev_{a} >= prev_{b} AND {a} < {b})"
    if ct == ConditionType.CONTAINS:
        f, needles = cfg["field"], cfg["values"]
        op = " AND " if cfg.get("mode", "any") == "all" else " OR "
        return "(" + op.join(f"contains({f}, '{n}')" for n in needles) + ")"
    if ct == ConditionType.RANGE_ENTER:
        f, lo, hi = cfg["field"], float(cfg["low"]), float(cfg["high"])
        return (
            f"(NOT (prev_{f} BETWEEN {lo} AND {hi}) "
            f"AND {f} BETWEEN {lo} AND {hi})"
        )
    if ct == ConditionType.RANGE_EXIT:
        f, lo, hi = cfg["field"], float(cfg["low"]), float(cfg["high"])
        return (
            f"((prev_{f} BETWEEN {lo} AND {hi}) "
            f"AND NOT ({f} BETWEEN {lo} AND {hi}))"
        )
    if ct == ConditionType.CUSTOM:
        from tradecat_spark.signals.custom import get_custom

        expr = get_custom(cfg["expr"])
        return expr.sql(cfg) if expr.sql is not None else None
    raise ValueError(f"unknown condition type {ct}")


# ---------------------------------------------------------------------------
# A representative rule pack over the indicator surface — one per
# condition type family, mirroring the reference's core/momentum packs
# (rules/core/__init__.py, rules/momentum/*). The full 129-rule pack is
# config data, not engine code; these exercise every compiler branch.
# ---------------------------------------------------------------------------
DEFAULT_RULES: list[SignalRule] = [
    SignalRule(
        "rsi_oversold_cross", "smart_rsi", ConditionType.THRESHOLD_CROSS_DOWN,
        {"field": "rsi14", "threshold": 30.0}, direction="long",
        category="momentum", subcategory="rsi",
    ),
    SignalRule(
        "rsi_overbought_cross", "smart_rsi", ConditionType.THRESHOLD_CROSS_UP,
        {"field": "rsi14", "threshold": 70.0}, direction="short",
        category="momentum", subcategory="rsi",
    ),
    SignalRule(
        "macd_golden_cross", "macd", ConditionType.CROSS_UP,
        {"fast": "macd_line", "slow": "macd_signal"}, direction="long",
        category="momentum", subcategory="macd",
    ),
    SignalRule(
        "macd_death_cross", "macd", ConditionType.CROSS_DOWN,
        {"fast": "macd_line", "slow": "macd_signal"}, direction="short",
        category="momentum", subcategory="macd",
    ),
    SignalRule(
        "regime_turns_bull", "ema_gc", ConditionType.STATE_CHANGE,
        {"field": "regime", "to": "bull_stack"}, direction="long",
        category="trend",
    ),
    SignalRule(
        "cloud_state_bull", "zero_lag_trend", ConditionType.CONTAINS,
        {"field": "zl_state", "values": ["bull"]}, direction="long",
        category="trend",
    ),
    SignalRule(
        "kdj_enters_oversold", "kdj", ConditionType.RANGE_ENTER,
        {"field": "kdj_k", "low": 0.0, "high": 20.0}, direction="long",
        category="momentum", subcategory="kdj",
    ),
    SignalRule(
        "bb_exits_band", "bollinger", ConditionType.RANGE_EXIT,
        {"field": "bb_pct", "low": 0.0, "high": 1.0}, direction="neutral",
        category="volatility",
    ),
]


def eval_condition_py(rule: SignalRule, prev: dict, curr: dict) -> bool:
    """Python-side evaluation of a rule over (prev, curr) row dicts —
    the reference's own evaluation shape (rules/base.py:47-160), used by
    the stateful streaming engine where rows arrive one snapshot at a
    time. Semantics MUST match ``compile_condition``; tests assert the
    two agree on randomized snapshots.

    SQL three-valued logic: any comparison against a missing/None field
    is False (Column semantics), so both paths drop first-snapshot rows.
    """
    cfg = rule.condition_config
    ct = rule.condition_type

    def p(f):
        return prev.get(f) if prev else None

    def c(f):
        return curr.get(f)

    def ok(*vals):
        return all(v is not None for v in vals)

    if ct == ConditionType.STATE_CHANGE:
        f, target = cfg["field"], cfg["to"]
        if not ok(p(f), c(f)):
            return False
        if isinstance(target, (list, tuple)):
            if c(f) not in target:
                return False
            from_any = cfg.get("from")
            if from_any is not None:
                return p(f) in from_any
            return p(f) not in target
        if p(f) == target or c(f) != target:
            return False
        from_any = cfg.get("from")
        return from_any is None or p(f) in from_any
    if ct == ConditionType.THRESHOLD_CROSS_UP:
        f, th = cfg["field"], float(cfg["threshold"])
        return ok(p(f), c(f)) and p(f) <= th < c(f)
    if ct == ConditionType.THRESHOLD_CROSS_DOWN:
        f, th = cfg["field"], float(cfg["threshold"])
        return ok(p(f), c(f)) and p(f) >= th > c(f)
    if ct == ConditionType.CROSS_UP:
        a, b = cfg["fast"], cfg["slow"]
        return (
            ok(p(a), p(b), c(a), c(b)) and p(a) <= p(b) and c(a) > c(b)
        )
    if ct == ConditionType.CROSS_DOWN:
        a, b = cfg["fast"], cfg["slow"]
        return (
            ok(p(a), p(b), c(a), c(b)) and p(a) >= p(b) and c(a) < c(b)
        )
    if ct == ConditionType.CONTAINS:
        f, needles = cfg["field"], cfg["values"]
        if c(f) is None:
            return False
        hits = [n in c(f) for n in needles]
        return all(hits) if cfg.get("mode", "any") == "all" else any(hits)
    if ct == ConditionType.RANGE_ENTER:
        f, lo, hi = cfg["field"], float(cfg["low"]), float(cfg["high"])
        return (
            ok(p(f), c(f)) and not (lo <= p(f) <= hi) and lo <= c(f) <= hi
        )
    if ct == ConditionType.RANGE_EXIT:
        f, lo, hi = cfg["field"], float(cfg["low"]), float(cfg["high"])
        return (
            ok(p(f), c(f)) and lo <= p(f) <= hi and not (lo <= c(f) <= hi)
        )
    if ct == ConditionType.CUSTOM:
        from tradecat_spark.signals.custom import get_custom

        return bool(get_custom(cfg["expr"]).py(cfg, prev, curr))
    raise ValueError(f"unknown condition type {ct}")
