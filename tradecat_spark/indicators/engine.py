"""Indicator compute engine — the Spark replacement for the reference's
scheduler/cache/process-pool pipeline (SURVEY.md §3.2).

The reference pulls ≤500-bar tails per (symbol, interval) into a
process pool and runs 38 indicator classes per task
(core/engine.py:121-255). Here the same workload is ONE Spark job:

    tail_bars.mapInPandas(_compute_partition, schema)

- one shuffle partitions the bars by key (hash-repartition below
  guarantees every group's rows land in one partition);
- each TASK evaluates the whole registered surface for ALL of its
  partition's groups in one Python call — the per-group work is the
  same ``_compute_group`` an applyInPandas would run, but the
  JVM<->Python round trip happens once per partition instead of once
  per group (guide §4: fewer, larger batches across the boundary;
  measured 3.77 -> 2.85 s min at sf0.1, values bit-identical across
  the 1050x154 surface);
- the output is one wide row per key — the gold "indicator snapshot"
  table, MERGE-able by key.

Scale: 150 symbols × 7 intervals is 1050 groups — trivially parallel;
at 100 TB the bars input is the silver rollup table (already ~1e6×
smaller than raw ticks), and the tail-limit keeps per-group memory
bounded exactly like the reference's window cache (db/cache.py:33).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tradecat_spark.indicators.base import IndicatorMeta, active_indicators
from tradecat_spark.operators.latest import topn_per_group

BAR_COLS = ("open", "high", "low", "close", "volume")


def _output_schema(bars: DataFrame, keys: list[str], metas: dict[str, IndicatorMeta]) -> str:
    key_fields = ", ".join(f"{k} {bars.schema[k].dataType.simpleString()}" for k in keys)
    ind_fields = ", ".join(
        f"{col} {typ}" for meta in metas.values() for col, typ in meta.outputs
    )
    return f"{key_fields}, ts timestamp, n_bars long, {ind_fields}"


def compute_all(
    bars: DataFrame,
    keys: list[str],
    ts: str = "bucket_ts",
    tail: int = 500,
    metas: dict[str, IndicatorMeta] | None = None,
) -> DataFrame:
    """Run every active indicator over each key's bar tail.

    ``bars`` needs columns ``keys + [ts] + open/high/low/close/volume``.
    Insufficient-data groups emit placeholder rows with NULL outputs
    (reference behavior, core/engine.py:83-97), so downstream serving
    always sees every key.
    """
    metas = metas or active_indicators()
    schema_str = _output_schema(bars, keys, metas)
    meta_items = list(metas.items())

    def _compute_group(pdf: pd.DataFrame) -> dict:
        # rows arrive time-sorted (partition-level stable sort below)
        pdf = pdf.tail(tail)
        row: dict[str, object] = {k: pdf[k].iat[-1] for k in keys}
        row["ts"] = pdf[ts].iat[-1]
        row["n_bars"] = len(pdf)
        b = pdf[list(BAR_COLS)].astype("float64").reset_index(drop=True)
        for name, meta in meta_items:
            cols = [c for c, _ in meta.outputs]
            if len(pdf) < meta.min_data:
                row.update({c: None for c in cols})  # placeholder row
                continue
            try:
                out = meta.fn(b)
                row.update({c: out.get(c) for c in cols})
            except Exception:
                row.update({c: None for c in cols})
        return row

    def _compute_partition(batches):
        # One Python call per TASK: concatenate the partition's Arrow
        # batches (a group may span batch boundaries — maxRecordsPerBatch
        # cuts at 10k rows), then run the per-group computation on each
        # key group. dropna=False mirrors Spark's groupBy null-key
        # semantics; sort=False keeps pandas from re-ordering groups
        # (output row order is unordered either way). Partition memory
        # is bounded: groups-per-partition x tail rows.
        #
        # r15 (guide §1.2 per-task work, profiled): ONE stable
        # partition-level time sort replaces a quicksort per group
        # (bucket_ts is unique per group — every rollup producing bars
        # groups by it — so any sort yields the same per-group
        # sequence, and stability makes ties deterministic anyway), and
        # the output is ONE DataFrame built from plain row dicts
        # instead of a concat of 1050 one-row frames (~8 s of the 32 s
        # single-thread stage was that construction overhead).
        dfs = list(batches)
        if not dfs:
            return
        pdf = pd.concat(dfs, ignore_index=True) if len(dfs) > 1 else dfs[0]
        if pdf.empty:
            return
        pdf = pdf.sort_values(ts, kind="stable", ignore_index=True)
        yield pd.DataFrame(
            [
                _compute_group(g)
                for _, g in pdf.groupby(list(keys), sort=False, dropna=False)
            ]
        )

    # Explicit hash-repartition by the grouping keys with a pinned partition
    # count: the bar tails are tiny (groups × tail rows), so AQE would
    # coalesce the shuffle to 1-2 partitions and serialize the EXPENSIVE
    # Python stage (measured 60 s vs 7 s at sf0.1). A REPARTITION_BY_NUM
    # exchange is exempt from AQE coalescing, and hash(keys) is what makes
    # the mapInPandas stage CORRECT — it guarantees every group's rows
    # land in exactly one partition (mapInPandas itself imposes no
    # clustering requirement; this repartition is the contract). The count
    # is deliberately 2n+1: if it EQUALS spark.sql.shuffle.partitions,
    # Catalyst elides the repartition as redundant with the upstream window
    # exchange, and that ENSURE_REQUIREMENTS exchange IS coalescible.
    #
    # Placed BEFORE the tail window (r14): hash(keys, 2n+1) also satisfies
    # the window's ClusteredDistribution(keys), so the tail's
    # ENSURE_REQUIREMENTS exchange is elided and ONE AQE-exempt shuffle
    # serves window + Python stage (guide §2.4: operations keyed the same
    # way share one exchange). Row placement is keyed either way — the
    # window's per-key ordering and the group contents are unchanged.
    # (r14: partition-count sweep at sf0.1 — 2n+1 / 4n+1 / 8n+1 read
    # 2.83 / 3.15 / 4.40 s min; finer balance never repaid the extra
    # task scheduling, so 2n+1 stays.)
    nparts = 2 * bars.sparkSession.sparkContext.defaultParallelism + 1
    tail_bars = topn_per_group(bars.repartition(nparts, *keys), keys, ts, tail)
    return tail_bars.mapInPandas(_compute_partition, schema_str)


def bars_from_events(
    events: DataFrame,
    key: str,
    interval_sec: int,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """OHLCV bars for the indicator engine from the raw events stream,
    using value as price and |value| as volume proxy."""
    from tradecat_spark.operators.rollup import ohlcv_rollup

    bars = ohlcv_rollup(
        events, [key], "ts", "value",
        volume=F.abs(F.col("value")), interval_sec=interval_sec,
        bucket_col=bucket_col,
    )
    return bars


def bars_multi_interval(
    events: DataFrame,
    key: str,
    intervals: dict[str, int],
    ts: str = "ts",
    price: str = "value",
) -> DataFrame:
    """All interval rollups in ONE aggregation stage.

    Building N interval rollups as N separate ``groupBy`` branches costs
    N scan+shuffle stages whose fixed latencies dominate at benchmark
    scale (and whose scans re-read the source N times at 100 TB). Here
    each event row explodes to N (interval, bucket) pairs and ONE
    hash-aggregate produces every interval's bars: map-side partial
    aggregation collapses the exploded rows to the same combined shuffle
    volume the N separate rollups would carry — one stage, one scan.
    """
    from tradecat_spark.operators.rollup import bucket_ts

    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("interval"),
                bucket_ts(ts, sec).alias("bucket_ts"),
            )
            for lbl, sec in intervals.items()
        ]
    )
    x = events.select(
        key,
        F.col(ts).alias("_ts"),
        F.col(price).alias("_p"),
        F.abs(F.col(price)).alias("_v"),
        F.explode(pairs).alias("iv"),
    )
    return x.groupBy(
        key, F.col("iv.interval").alias("interval"),
        F.col("iv.bucket_ts").alias("bucket_ts"),
    ).agg(
        F.min_by("_p", "_ts").alias("open"),
        F.max("_p").alias("high"),
        F.min("_p").alias("low"),
        F.max_by("_p", "_ts").alias("close"),
        F.sum("_v").alias("volume"),
        F.count(F.lit(1)).alias("trade_count"),
    )


def recompute_dirty(
    bars: DataFrame,
    cached_surface: DataFrame,
    dirty_keys: DataFrame,
    keys: list[str],
    ts: str = "bucket_ts",
    tail: int = 500,
    metas: dict[str, IndicatorMeta] | None = None,
) -> DataFrame:
    """Incremental surface maintenance — the reference's scheduler only
    recomputes (symbol, interval) tasks whose candles changed
    (core/engine.py:121-255 walks the dirty task queue, not the world);
    this is that behavior as one declarative plan:

    - dirty side: LEFT SEMI join prunes the bars scan to changed keys
      (broadcast — a trigger's dirty set is symbols × intervals, tiny)
      and recomputes their tails with the same ``compute_all``;
    - clean side: LEFT ANTI join keeps the cached surface rows.

    Maintenance law (pinned by tests/test_indicators.py): if
    ``cached_surface`` was a full compute of the previous bar state and
    only ``dirty_keys``' bars have since changed, the union equals
    ``compute_all`` over the full current bars — so a 100 TB serving
    surface is maintained by work proportional to the CHANGE, never a
    full recompute per trigger."""
    fresh = compute_all(
        bars.join(F.broadcast(dirty_keys), keys, "semi"),
        keys, ts=ts, tail=tail, metas=metas,
    )
    kept = cached_surface.join(F.broadcast(dirty_keys), keys, "anti")
    return kept.unionByName(fresh)
