"""Batch signal evaluation: prev/curr snapshots + rule compilation +
cooldown dedupe.

Reference loop (engines/sqlite_engine.py:215-333): per (table,
timeframe) load the latest row per symbol, compare to the previous
snapshot dict, fire rules, enforce per-(rule, symbol, timeframe)
cooldowns from a KV store.

Spark-first shape: the "previous snapshot" is ``lag()`` over snapshot
time per key — one window, then every rule is a boolean column and the
result unpivots to an event stream. Cooldown = per-(rule, key) event
spacing, enforced relationally with a self-lag on fire time — the batch
analog of the streaming keyed-state timeout (see streaming/ for that
form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tradecat_spark.signals.rules import SignalRule, compile_condition


def with_prev(snapshots: DataFrame, keys: list[str], ts: str) -> DataFrame:
    """Attach ``prev_<col>`` for every non-key column via one lag window."""
    w = Window.partitionBy(*keys).orderBy(ts)
    others = [c for c in snapshots.columns if c not in keys]
    out = snapshots
    for c in others:
        out = out.withColumn(f"prev_{c}", F.lag(c).over(w))
    return out


def evaluate_rules(
    snapshots: DataFrame,
    rules: list[SignalRule],
    keys: list[str],
    ts: str,
    cooldown_sec: int | None = None,
    volume_col: str | None = None,
) -> DataFrame:
    """Evaluate every rule against consecutive snapshots.

    Returns an event DataFrame (keys..., ts, rule, direction, category)
    with per-(rule, key) cooldown applied: a firing within
    ``cooldown_sec`` of the previous *accepted* firing of the same rule
    on the same key is suppressed. The suppression uses the reference's
    semantics (cooldown anchored on the last accepted fire,
    storage/cooldown.py) — implemented with a per-partition running
    scan, exact because firings per (rule, key) are few.
    """
    prev = with_prev(snapshots, keys, ts)
    fired = []
    for rule in rules:
        cond = compile_condition(rule)
        if volume_col is not None and rule.min_volume > 0:
            cond &= F.col(volume_col) >= rule.min_volume
        fired.append(
            prev.filter(cond).select(
                *keys,
                F.col(ts).alias("fired_at"),
                F.lit(rule.name).alias("rule"),
                F.lit(rule.direction).alias("direction"),
                F.lit(rule.category).alias("category"),
                F.lit(rule.strength).alias("strength"),
            )
        )
    if not fired:
        return snapshots.sparkSession.createDataFrame(
            [], "rule string, fired_at timestamp"
        )
    events = fired[0]
    for f_df in fired[1:]:
        events = events.unionByName(f_df)

    if cooldown_sec is None:
        return events

    # anchored cooldown via per-group ordered scan (groups are tiny)
    import pandas as pd

    def _cooldown(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("fired_at")
        keep, last = [], None
        for t in pdf["fired_at"]:
            if last is None or (t - last).total_seconds() >= cooldown_sec:
                keep.append(True)
                last = t
            else:
                keep.append(False)
        return pdf[pd.Series(keep, index=pdf.index)]

    return events.groupBy("rule", *keys).applyInPandas(_cooldown, events.schema)
