"""Stateful streaming signal detection — keyed prev/curr state + cooldown.

Reference loop (engines/sqlite_engine.py:215-333): every 60 s, compare
each symbol's latest indicator row against the previous snapshot held in
a baseline dict, fire declarative rules, and suppress refires within a
per-(rule, symbol, timeframe) cooldown persisted in a KV store.

Spark mapping (SURVEY.md §2.11): ``applyInPandasWithState`` — the
baseline dict and the cooldown KV store become ONE keyed state value per
group, checkpointed by the engine; the 60 s poll becomes the micro-batch
trigger. Batch parity: ``signals.engine.evaluate_rules`` runs the same
rules via ``lag()`` — tests drive both over the same snapshots and
assert identical firings.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tradecat_spark.signals.rules import SignalRule, eval_condition_py

STATE_SCHEMA = "prev_json string, cooldowns_json string"


def _out_schema(stream: DataFrame, keys: list[str]) -> str:
    key_fields = ", ".join(
        f"{k} {stream.schema[k].dataType.simpleString()}" for k in keys
    )
    return (
        f"{key_fields}, fired_at timestamp, rule string, direction string, "
        "category string, strength int"
    )


def streaming_signals(
    stream: DataFrame,
    rules: list[SignalRule],
    keys: list[str],
    ts: str,
    cooldown_sec: int | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Evaluate ``rules`` over a stream of per-key snapshot rows.

    State per key: the previous snapshot (baseline dict) and the last
    accepted fire time per rule (cooldown store). Rows inside one batch
    are processed in event-time order, so intra-batch transitions fire
    exactly as they would have across batches — the engine is
    trigger-cadence invariant.
    """
    if watermark is not None:
        stream = stream.withWatermark(ts, watermark)
    out_schema = _out_schema(stream, keys)
    value_cols = [c for c in stream.columns if c not in keys]
    cd = cooldown_sec

    def _proc(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev_json, cd_json = state.get
            prev = json.loads(prev_json) if prev_json else None
            cooldowns = json.loads(cd_json) if cd_json else {}
        else:
            prev, cooldowns = None, {}

        fired: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts)
            for _, row in pdf.iterrows():
                curr = {c: row[c] for c in value_cols}
                t = row[ts]
                epoch = pd.Timestamp(t).timestamp()
                for rule in rules:
                    if not eval_condition_py(rule, prev or {}, curr):
                        continue
                    last = cooldowns.get(rule.name)
                    if cd is not None and last is not None and epoch - last < cd:
                        continue
                    cooldowns[rule.name] = epoch
                    fired.append(
                        dict(
                            zip(keys, key),
                            fired_at=t,
                            rule=rule.name,
                            direction=rule.direction,
                            category=rule.category,
                            strength=rule.strength,
                        )
                    )
                # JSON-serializable baseline (timestamps → isoformat)
                prev = {
                    c: (v.isoformat() if isinstance(v, pd.Timestamp) else v)
                    for c, v in curr.items()
                }

        state.update((json.dumps(prev, default=str), json.dumps(cooldowns)))
        if fired:
            yield pd.DataFrame(fired)

    return stream.groupBy(*keys).applyInPandasWithState(
        _proc,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
