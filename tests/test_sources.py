"""Source adapters: CSV backfill normalization/merge and order-book
projections (SURVEY §2.1 S7/S12)."""

from __future__ import annotations

import pandas as pd
import pytest

from tradecat_spark.sources import (
    backfill_merge,
    depth_bands,
    l1_projection,
    load_vision_csv,
)


@pytest.fixture()
def vision_csv(tmp_path):
    # two 1m bars in Binance Vision layout (headerless, 12 cols)
    rows = [
        "1735689600000,100.0,105.0,99.0,104.0,12.5,1735689659999,1300.0,42,7.0,730.0,0",
        "1735689660000,104.0,106.0,103.0,105.5,8.0,1735689719999,850.0,30,4.0,420.0,0",
    ]
    p = tmp_path / "BTCUSDT-1m-2025-01-01.csv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_load_vision_csv(spark, vision_csv):
    df = load_vision_csv(spark, vision_csv, "BTCUSDT").sort("bucket_ts")
    rows = df.collect()
    assert len(rows) == 2
    r = rows[0]
    assert r["symbol"] == "BTCUSDT" and r["exchange"] == "binance"
    assert str(r["bucket_ts"]) == "2025-01-01 00:00:00"
    assert (r["open"], r["high"], r["low"], r["close"]) == (100.0, 105.0, 99.0, 104.0)
    assert r["trade_count"] == 42 and r["is_closed"] is True
    # minute alignment law
    assert all(x["bucket_ts"].second == 0 for x in rows)


def test_backfill_merge_repairs_partial_bars(spark, tmp_path, vision_csv):
    store = str(tmp_path / "bronze")
    # a pre-existing PARTIAL bar for the first minute (live ingest got cut)
    partial = spark.createDataFrame(
        pd.DataFrame([
            dict(exchange="binance", symbol="BTCUSDT",
                 bucket_ts=pd.Timestamp("2025-01-01 00:00:00"),
                 open=100.2, high=101.0, low=100.0, close=100.9,
                 trade_count=5, is_closed=False),
        ])
    )
    partial.write.parquet(store)
    incoming = load_vision_csv(spark, vision_csv, "BTCUSDT")
    merged = backfill_merge(spark, store, incoming)
    got = {str(r["bucket_ts"]): r for r in merged.collect()}
    assert len(got) == 2
    bar = got["2025-01-01 00:00:00"]
    # archive bar is authoritative: high=max, low=min, close=archive, closed
    assert bar["high"] == 105.0 and bar["low"] == 99.0
    assert bar["close"] == 104.0 and bar["is_closed"] is True
    # partial bar was open → archive open wins
    assert bar["open"] == 100.0


def test_l1_projection_and_depth_bands(spark):
    ticks = spark.createDataFrame(
        pd.DataFrame([
            dict(ts=1, bid_price=99.0, ask_price=101.0, bid_qty=30.0, ask_qty=10.0),
            dict(ts=2, bid_price=100.0, ask_price=100.0, bid_qty=0.0, ask_qty=0.0),
        ])
    )
    out = {r["ts"]: r for r in l1_projection(ticks).collect()}
    t1 = out[1]
    assert t1["mid"] == 100.0 and t1["spread"] == 2.0
    assert t1["spread_bps"] == pytest.approx(200.0)
    assert t1["imbalance"] == pytest.approx(0.5)
    assert t1["microprice"] == pytest.approx((101 * 30 + 99 * 10) / 40)
    # zero-qty tick: imbalance/microprice NULL, not div-by-zero
    assert out[2]["imbalance"] is None and out[2]["microprice"] is None

    levels = spark.createDataFrame(
        pd.DataFrame([
            dict(snap_id=1, mid=100.0, side="bid", price=99.8, qty=5.0),
            dict(snap_id=1, mid=100.0, side="bid", price=99.0, qty=7.0),
            dict(snap_id=1, mid=100.0, side="ask", price=100.3, qty=2.0),
            dict(snap_id=1, mid=100.0, side="ask", price=103.0, qty=9.0),
        ])
    )
    bands = depth_bands(levels).collect()[0]
    assert bands["bid_depth_0_5pct"] == 5.0          # only 99.8 within ±0.5%
    assert bands["bid_depth_1_0pct"] == 12.0         # 99.8 + 99.0
    assert bands["ask_depth_0_5pct"] == 2.0
    assert bands["ask_depth_2_0pct"] == 2.0          # 103 is outside ±2%


def test_snapshot_depth_stats_truncates_and_counts(spark):
    from tradecat_spark.sources.orderbook import snapshot_depth_stats

    # book: bid levels at 100-i, ask at 100+i, qty=1 each, 10 levels;
    # mid = 100 (from level 1 at 99/101... use tight L1)
    bids = [(100.0 - 0.1 * i, 1.0) for i in range(1, 11)]
    asks = [(100.0 + 0.1 * i, 1.0) for i in range(1, 11)]
    snaps = spark.createDataFrame(
        [(1, bids, asks)], "snap_id int, bids array<struct<price:double,qty:double>>, asks array<struct<price:double,qty:double>>"
    )
    full = snapshot_depth_stats(snaps, bands_pct=(1.0, 5.0)).collect()[0]
    assert full["mid"] == 100.0
    assert full["bid1_price"] == 99.9 and full["ask1_price"] == 100.1
    # ±1% of 100 = ±1.0 → levels 1..10 all within (0.1..1.0)
    assert full["bid_depth_1pct"] == 10 and full["ask_depth_1pct"] == 10
    assert full["imbalance"] == 0.0

    # truncation: only the first 3 levels count when max_levels=3
    trunc = snapshot_depth_stats(snaps, max_levels=3).collect()[0]
    assert trunc["bid_depth_1pct"] == 3 and trunc["ask_depth_1pct"] == 3
    assert trunc["bid_notional_1pct"] == pytest.approx(99.9 + 99.8 + 99.7)


def test_backfill_closes_planned_gaps_end_to_end(spark, tmp_path):
    """The full repair loop: gap scan finds under-filled days → Vision
    CSVs for exactly those days are loaded and merged → re-scan reports
    the calendar complete (S5 plan feeding S7 backfill, the reference's
    re-scan loop backfill.py:133-189)."""
    from tradecat_spark.operators.gaps import calendar_gaps

    per_day = 24 * 60
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    # store: 4 calendar days, but day 2 is empty and day 3 half-filled
    rows = []
    for d in range(4):
        if d == 1:
            continue
        n = per_day // 2 if d == 2 else per_day
        for i in range(n):
            ts = t0 + pd.Timedelta(days=d, minutes=i)
            rows.append(
                dict(exchange="binance", symbol="BTCUSDT", bucket_ts=ts,
                     open=1.0, high=2.0, low=0.5, close=1.5,
                     trade_count=1, is_closed=True)
            )
    store = str(tmp_path / "bronze")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(store)

    gaps = calendar_gaps(
        spark.read.parquet(store), ["symbol"], "bucket_ts", per_day
    ).filter("n_rows < expected_rows")
    bad_days = sorted(str(r["day"]) for r in gaps.collect())
    assert bad_days == ["2025-01-02", "2025-01-03"]

    # Vision archives for the planned days (full 1440-bar dailies)
    for day in bad_days:
        day_t0 = pd.Timestamp(day)
        lines = []
        for i in range(per_day):
            ms = int((day_t0 + pd.Timedelta(minutes=i)).timestamp() * 1000)
            lines.append(
                f"{ms},1.0,2.0,0.5,1.5,1.0,{ms + 59999},1.5,1,0.5,0.75,0"
            )
        (tmp_path / f"BTCUSDT-1m-{day}.csv").write_text(
            "\n".join(lines) + "\n"
        )
    incoming = load_vision_csv(
        spark, str(tmp_path / "BTCUSDT-1m-*.csv"), "BTCUSDT"
    )
    merged = backfill_merge(spark, store, incoming)
    merged.write.mode("overwrite").parquet(str(tmp_path / "bronze2"))

    rescan = calendar_gaps(
        spark.read.parquet(str(tmp_path / "bronze2")),
        ["symbol"], "bucket_ts", per_day,
    ).filter("n_rows < expected_rows")
    assert rescan.count() == 0


def test_compact_rewrites_only_fragmented_partitions(spark, tmp_path):
    """3 dates x 8 files + 1 date x 1 file: compaction must merge the
    fragmented dates to one file each, leave the healthy date's file
    untouched (same physical file), and preserve the row set."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from tradecat_spark.operators.storage import compact_time_partitions

    store = str(tmp_path / "store")
    rows = pd.DataFrame({
        "id": range(3000),
        "part_date": [f"2025-01-0{1 + i % 3}" for i in range(3000)],
    })
    (
        spark.createDataFrame(rows).repartition(8)
        .write.partitionBy("part_date").parquet(store)
    )
    healthy = pd.DataFrame({"id": [9999], "part_date": ["2025-01-09"]})
    (
        spark.createDataFrame(healthy).coalesce(1)
        .write.mode("append").partitionBy("part_date").parquet(store)
    )

    def files(d):
        p = os.path.join(store, f"part_date={d}")
        return sorted(
            f for f in os.listdir(p) if f.endswith(".parquet")
        )

    before_healthy = files("2025-01-09")
    assert len(files("2025-01-01")) == 8

    before = sorted(
        map(tuple, spark.read.parquet(store).select("id").collect())
    )
    rewritten = compact_time_partitions(spark, store)
    assert rewritten == ["2025-01-01", "2025-01-02", "2025-01-03"]
    for d in rewritten:
        assert len(files(d)) == 1
    assert files("2025-01-09") == before_healthy  # untouched
    after = sorted(
        map(tuple, spark.read.parquet(store).select("id").collect())
    )
    assert after == before
    # idempotent: a second pass finds nothing fragmented
    assert compact_time_partitions(spark, store) == []


def test_compact_max_files_spreads_output(spark, tmp_path):
    """max_files > 1 must actually produce parallel output files (the
    second repartition split key), not collapse each date to one."""
    import os

    import pandas as pd

    from tradecat_spark.operators.storage import compact_time_partitions

    store = str(tmp_path / "store")
    rows = pd.DataFrame({
        "id": range(5000), "part_date": ["2025-02-01"] * 5000,
    })
    (
        spark.createDataFrame(rows).repartition(16)
        .write.partitionBy("part_date").parquet(store)
    )
    assert compact_time_partitions(
        spark, store, max_files=4
    ) == ["2025-02-01"]
    files = [
        f for f in os.listdir(os.path.join(store, "part_date=2025-02-01"))
        if f.endswith(".parquet")
    ]
    assert 1 < len(files) <= 4
    assert spark.read.parquet(store).count() == 5000


def test_compact_unescapes_hive_partition_values(spark, tmp_path):
    """Hive URL-escapes partition directory names (space → %20, ':'
    → %3A); the value filter must use the UNESCAPED value or escaped
    partitions are rewritten with zero matching rows (r3 advice)."""
    import os

    import pandas as pd
    import pytest

    from tradecat_spark.operators.storage import compact_time_partitions

    store = str(tmp_path / "store")
    rows = pd.DataFrame({
        "id": range(2000),
        "part_date": ["2025-03-01 10:00"] * 1000 + ["plain"] * 1000,
    })
    (
        spark.createDataFrame(rows).repartition(6)
        .write.partitionBy("part_date").parquet(store)
    )
    escaped = [
        e for e in os.listdir(store) if e.startswith("part_date=")
    ]
    assert any("%" in e for e in escaped)  # precondition: Hive-escaped

    before = sorted(
        map(tuple, spark.read.parquet(store).select("id").collect())
    )
    assert compact_time_partitions(spark, store) == [
        "2025-03-01 10:00", "plain",
    ]
    after = sorted(
        map(tuple, spark.read.parquet(store).select("id").collect())
    )
    assert after == before
    for e in escaped:
        n = sum(
            1 for f in os.listdir(os.path.join(store, e))
            if f.endswith(".parquet")
        )
        assert n == 1, e

    with pytest.raises(ValueError, match="local paths"):
        compact_time_partitions(spark, "s3://bucket/store")
