"""Streaming incremental indicators — per-key numeric recurrences as
keyed state.

The reference's ``incremental/`` indicator family (macd.py:6-12,
ema_gc.py:9-59, buy_sell_ratio.py, futures_sentiment.py) updates each
symbol's EMA/MACD state in O(1) per new bar instead of recomputing the
window. The Spark mapping is ``applyInPandasWithState``: the recurrence
registers (e_fast, e_slow, e_signal, n) are ONE keyed state tuple,
checkpointed by the engine, advanced in event-time order per
micro-batch.

Parity contract: the recurrence is the exact ``ewm(adjust=False)`` fold
the batch side uses (plans/q_charts.py chart_macd_series, the oracle's
list_reduce) — a stream fed the same bars in any micro-batch slicing
produces bit-identical outputs, asserted in tests/test_streaming.py.

Scale: state is four scalars per (symbol, interval) key — at 615
symbols × 14 intervals the whole state store is a few hundred KB; the
bottleneck is the per-batch shuffle by key, same as any keyed stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "e_fast double, e_slow double, e_sig double, n long"


def streaming_macd(
    stream: DataFrame,
    keys: list[str],
    ts: str,
    price: str,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    watermark: str | None = None,
) -> DataFrame:
    """Per-bar MACD(fast, slow, signal) over a keyed bar stream.

    Emits one row per input bar with the recurrence registers after
    consuming it. Seeding matches ``ewm(adjust=False)``: the first bar
    seeds both EMAs with its price and the signal line with the first
    MACD value (reference incremental/macd.py:6-12).
    """
    a_f, a_s, a_g = (
        2.0 / (fast + 1), 2.0 / (slow + 1), 2.0 / (signal + 1),
    )
    if watermark is not None:
        stream = stream.withWatermark(ts, watermark)
    key_fields = ", ".join(
        f"{k} {stream.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, {ts} timestamp, close double, ema_fast double, "
        "ema_slow double, macd double, signal_line double, hist double"
    )
    cols = [*keys, ts, "close", "ema_fast", "ema_slow", "macd",
            "signal_line", "hist"]

    def _proc(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            e_f, e_s, e_g, n = state.get
        else:
            e_f = e_s = e_g = None
            n = 0
        rows: list[tuple] = []
        # Materialize the whole group before sorting: Arrow delivers a
        # key's micro-batch as MULTIPLE chunks once it exceeds
        # maxRecordsPerBatch, and folding chunk-by-chunk would apply the
        # recurrence out of global event-time order.
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts)
            for _, r in pdf.iterrows():
                x = float(r[price])
                if n == 0:
                    e_f = e_s = x
                else:
                    e_f = e_f * (1.0 - a_f) + x * a_f
                    e_s = e_s * (1.0 - a_s) + x * a_s
                macd = e_f - e_s
                e_g = macd if n == 0 else e_g * (1.0 - a_g) + macd * a_g
                n += 1
                rows.append(
                    (*key, r[ts], x, e_f, e_s, macd, e_g, macd - e_g)
                )
        state.update((e_f, e_s, e_g, n))
        yield pd.DataFrame(rows, columns=cols)

    return stream.groupBy(*keys).applyInPandasWithState(
        _proc,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
