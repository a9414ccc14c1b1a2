"""Declarative signal-rule engine (reference §2.10 parity)."""

from tradecat_spark.signals.rules import (  # noqa: F401
    ConditionType,
    SignalRule,
    compile_condition,
)
from tradecat_spark.signals.engine import evaluate_rules  # noqa: F401
