#!/usr/bin/env python
"""Headline-query benchmark.

Runs the bench-flagged queries from the tradecat_spark registry against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Calibration normalization (r10 verdict item 3): the
``calibration_fixed`` row is a pinned CPU-only workload whose true
cost cannot change round-over-round. Its idle-window reading of
**0.188 s min** (measured r10, this box, in the quiet-window control
run) is the normalization denominator of record: to compare a query
row across rounds, divide it by (calibration_min_that_round / 0.188)
first — r10's official artifact, for example, was taken in a ~19%
slow window (calibration 0.224). Rows dominated by I/O or shuffle can
legitimately move MORE than the CPU-only calibration ratio in a
loaded window; calibration separates box drift from code drift, it
does not bound it.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from tradecat_spark.plans.registry import load_all
from tradecat_spark.session import get_spark


def _warm_python_workers(spark) -> None:
    """Warm the Python worker pool before timing.

    The reference's baseline numbers come from long-running services
    (warm process pools, `core/engine.py` keeps its pool alive); the
    Spark equivalent is long-lived executors with reused Python workers
    (`spark.python.worker.reuse`, default on). A cold `applyInPandas`
    stage pays ~0.9 s/worker of pandas+library import — measured 32
    simultaneous cold imports add 5-10 s of wall to the FIRST Python
    stage only, pure startup, not query work. One throwaway stage with
    >= one partition per core removes that from every timed number."""
    nparts = 2 * spark.sparkContext.defaultParallelism

    def _touch(it):
        import tradecat_spark.indicators.library  # noqa: F401

        yield from it

    spark.range(0, nparts, 1, nparts).mapInPandas(_touch, "id long").count()


def _bench_streaming(spark, n_symbols: int = 600) -> dict[str, float]:
    """End-to-end streaming freshness at the reference's burst shape.

    BASELINE targets: 1m ingest→queryable < 5 s (600 symbols closing per
    minute), rollup freshness < 10 s. Measures one full micro-batch
    cycle of the real machinery: file source → foreachBatch merge-upsert
    store, and the watermarked 5m rollup of the same bars. The FIRST
    call of a session pays stream-query planning/state-store init and
    is reported as the cold number; later calls are steady state.
    """
    import tempfile

    import pandas as pd

    from tradecat_spark.streaming.ingest import start_candle_ingest
    from tradecat_spark.streaming.rollup import streaming_ohlcv

    base = tempfile.mkdtemp(prefix="tc_bench_stream_")
    src, store = f"{base}/src", f"{base}/store"
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    rows = [
        dict(
            symbol=f"S{i:03d}", bucket_ts=t0 + pd.Timedelta(minutes=m),
            # explicit arrival order (exchange event time): the ingest
            # fold resolves intra-batch duplicates by this, never by
            # partition-dependent proxies (r4 verdict item 3)
            event_ts=t0 + pd.Timedelta(minutes=m, seconds=30),
            open=1.0 + i, high=2.0 + i, low=0.5 + i, close=1.5 + i,
            trade_count=10, is_closed=True,
        )
        for i in range(n_symbols)
        for m in range(5)
    ]
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out: dict[str, float] = {}

    t = time.perf_counter()
    q = start_candle_ingest(
        spark.readStream.schema(schema).parquet(src),
        store, ["symbol", "bucket_ts"], f"{base}/ckpt_ingest",
        available_now=True,
    )
    q.awaitTermination(120)
    q.stop()
    assert spark.read.parquet(store).count() == len(rows)
    out["streaming_ingest_600sym"] = round(time.perf_counter() - t, 3)

    # r15: the rollup's state-store layout is sized by stream volume
    # (expected_keys) instead of inheriting the session's core-derived
    # shuffle setting — see streaming/rollup.py::state_partitions_for
    # for the measurements. The session conf is restored right after
    # this block so every other bench row runs in the same environment
    # as before; the timed region and methodology are unchanged.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    t = time.perf_counter()
    rolled = streaming_ohlcv(
        spark.readStream.schema(schema).parquet(src),
        ["symbol"], "bucket_ts", "close", interval="5 minutes",
        watermark="1 minute", expected_keys=n_symbols,
    )
    q = (
        rolled.writeStream.format("parquet")
        .option("path", f"{base}/rollup")
        .option("checkpointLocation", f"{base}/ckpt_rollup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    spark.read.parquet(f"{base}/rollup").count()
    out["streaming_rollup_600sym"] = round(time.perf_counter() - t, 3)
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    # streaming-store READ path after compaction (r8 verdict item 7):
    # build a CMS counter store of 8 per-batch partials directly via
    # the foreachBatch body (setup, untimed), compact the first 6 into
    # a base, then time read_cms — the coverage-rule partition
    # resolution + pruned scan + partial sum. A store-layout or
    # coverage regression (reading dead debris, losing the base,
    # scanning all history) moves this number.
    from pyspark.sql import functions as F

    from tradecat_spark.streaming.sketch import (
        compact_cms,
        read_cms,
        update_cms,
    )

    cms_store = f"{base}/cms_store"
    for b in range(8):
        ev = spark.range(20_000).select(
            F.lit("bench").alias("event_type"),
            ((F.col("id") * 37 + b * 101) % 5000).alias("user_id"),
        )
        update_cms(spark, ev, b, cms_store)
    compact_cms(spark, cms_store, 5)
    t = time.perf_counter()
    read_cms(spark, cms_store).write.format("noop").mode("overwrite").save()
    out["streaming_cms_read_compacted"] = round(time.perf_counter() - t, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("tradecat-bench", cpus=cpus, shuffle_partitions=max(cpus, 16))
    specs = load_all()
    bench_specs = {n: s for n, s in specs.items() if s.bench}

    # warm the JVM (codegen, session state) and the Python worker pool
    # with THROWAWAY work only — warming with a benched query would
    # pre-heat its page cache and make its "cold" number warm
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    _warm_python_workers(spark)

    # Two numbers per query, so round-over-round comparisons are
    # self-describing and a regression can't hide behind the min
    # (round-3 methodology finding):
    #   cold   = the FIRST run after process warm-up — no shuffle-stage
    #            or page-cache reuse from a prior run of the same plan;
    #   steady = min over N runs, the warm-service regime BASELINE.md's
    #            reference numbers come from (single-run numbers on this
    #            box carry multi-second cold-page-cache I/O noise —
    #            measured ann_cosine_topk 1.15 s vs 5.7 s back-to-back).
    # default raised 3 → 4 in r6 (r5 verdict item 7): publishing
    # median+min+n per query makes a real regression distinguishable
    # from single-run VM noise without a dedicated re-measure round
    # (r4's flagged trio and r5's ingest delta both needed one)
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "4"))
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}

    # CALIBRATION row (r9 verdict item 2b): a pinned synthetic workload
    # whose true cost cannot change round-over-round — no I/O, no
    # shuffle, no Python, one codegen'd scan+agg over a fixed range —
    # so session/machine drift (r9 saw +10-21% on 9 of 14 rows with no
    # code change) is measurable and per-query regressions become
    # separable from box variance: normalize any suspect row by
    # (calibration_r10 / calibration_rN) before adjudicating. Excluded
    # from the headline total so `value` stays comparable to r<=9.
    cal_runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        spark.range(0, 400_000_000, 1, 64).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()
        cal_runs.append(time.perf_counter() - t0)
    cold["calibration_fixed"] = round(cal_runs[0], 3)
    timings["calibration_fixed"] = round(min(cal_runs), 3)
    stats["calibration_fixed"] = {
        "min": round(min(cal_runs), 3),
        "median": round(statistics.median(cal_runs), 3),
        "n": len(cal_runs),
    }

    for name, spec in bench_specs.items():
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        cold[name] = round(runs[0], 3)
        timings[name] = round(min(runs), 3)
        stats[name] = {
            "min": round(min(runs), 3),
            "median": round(statistics.median(runs), 3),
            "n": len(runs),
        }

    # streaming: the first cycle (no prior stream on this session) IS
    # the cold number — it pays stream-query planning + state-store
    # init; later cycles are the long-running service's steady state
    stream_runs = [_bench_streaming(spark)]
    for _ in range(repeats - 1):
        stream_runs.append(_bench_streaming(spark))
    for k in stream_runs[0]:
        cold[k] = stream_runs[0][k]
        # mirror the batch path: with repeats=1 steady falls back to
        # the single (cold) run instead of forcing a second cycle
        warm = stream_runs[1:] or stream_runs
        timings[k] = min(r[k] for r in warm)
        stats[k] = {
            "min": round(min(r[k] for r in warm), 3),
            "median": round(statistics.median(r[k] for r in warm), 3),
            "n": len(warm),
        }

    total = round(
        sum(v for k, v in timings.items() if k != "calibration_fixed"), 3
    )
    # ONE compact JSON line, printed first and last (nothing else goes
    # to stdout). r6's line grew past the driver's tail-capture window
    # (BENCH_r06 landed parsed:null) because methodology/noise prose
    # lived inside it — that prose now lives in README.md §"Bench
    # methodology"; the line carries only the numbers the record needs:
    # steady min per query, per-query {min, median, n}, colds, total.
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_stats": stats,
        "value_cold": round(
            sum(v for k, v in cold.items() if k != "calibration_fixed"), 3
        ),
        "queries_cold": cold,
        "sf": sf,
        "note": "methodology: README.md#bench-methodology",
    }
    line = json.dumps(payload, separators=(",", ":"))
    # hard guard: the driver keeps only the LAST 2000 chars of stdout
    # and parses the JSON line out of that window — if the line ever
    # outgrows it again, shed the secondary sections (colds first,
    # then per-query stats) rather than lose the whole record
    dropped = []
    for drop in ("queries_cold", "queries_stats"):
        if len(line) <= 1900:
            break
        payload.pop(drop, None)
        dropped.append(drop)
        # ACCUMULATE the shed record — overwriting would erase both the
        # earlier drop and the methodology pointer from the artifact
        payload["note"] = (
            f"{'+'.join(dropped)} dropped to fit driver window; "
            "methodology: README.md#bench-methodology"
        )
        line = json.dumps(payload, separators=(",", ":"))
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
