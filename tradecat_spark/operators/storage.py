"""Bucketed silver-table storage — co-located joins and shuffle-free
group-bys at 100 TB.

The reference pins its hot path to TimescaleDB hypertables chunked by
time and indexed by (symbol, bucket_ts) (001_timescaledb.sql:9-35), so
every per-symbol read is a local index range scan. The Spark analog for
"data pre-organized by the key the workload groups/joins on" is
Hive-style **bucketing**: `bucketBy(N, keys)` at write time hashes rows
into N files per partition, and every later `groupBy(keys)` /
equi-join on the same keys reads that distribution straight off the
scan — no Exchange, which at 100 TB is the difference between a
metadata read and re-shuffling the whole store every indicator cycle.

Usage shape (the silver candle store):

    write_bucketed(bars, "silver_bars_1m", ["symbol"], path=...)
    bars = spark.table("silver_bars_1m")
    bars.groupBy("symbol", ...).agg(...)     # no Exchange
    bars.join(other_bucketed, "symbol")      # no Exchange either side

`tests/test_plans.py` pins both properties against the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a parquet table bucketed (and in-bucket sorted) by
    ``keys``.

    ``buckets`` should match the downstream parallelism target — at
    cluster scale, a few × total executor cores; bucket counts must
    agree between tables meant to join shuffle-free. ``path`` makes the
    table external (data lives at ``path``, only metadata in the
    metastore/catalog).
    """
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*(sort_cols or keys))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket distribution visible to the
    planner (a plain ``spark.read.parquet(path)`` would discard it)."""
    return spark.table(table)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts: str,
    sort_keys: list[str] | None = None,
    partition_col: str = "part_date",
) -> None:
    """Write a fact table partitioned by calendar date with rows sorted
    by ``sort_keys`` inside each file — the hypertable layout
    (1-day chunks + (symbol, ts) index, 001_timescaledb.sql:9-35).

    Date partitions give O(1) partition pruning for the time-range
    predicates every serving query carries (SURVEY §2.2 P2); the
    in-file sort clusters each symbol's rows so parquet row-group
    min/max statistics prune within the partition too.
    """
    from pyspark.sql import functions as F

    out = df.withColumn(partition_col, F.to_date(F.col(ts)))
    (
        out.repartition(partition_col)
        .sortWithinPartitions(*(sort_keys or []), ts)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def compact_time_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "part_date",
    max_files: int = 1,
) -> list[str]:
    """Rewrite date partitions that have fragmented into more than
    ``max_files`` parquet files (the inevitable residue of micro-batch
    ingest — each 3s trigger leaves a file per touched partition, and a
    day of triggers leaves thousands of tiny files that wreck scan
    throughput at 100 TB).

    Only fragmented partitions are read and rewritten
    (``partitionOverwriteMode=dynamic``) — healthy partitions' files
    are never touched, so the job's cost tracks fragmentation, not
    store size. Returns the rewritten partition values.

    Concurrency contract: read-snapshot + overwrite is NOT atomic
    against writers. Run between ingest triggers (the micro-batch loop
    has natural gaps) or on partitions past the ingest watermark; a
    file appended to a fragmented partition mid-compaction would be
    replaced by the pre-append snapshot. A transaction log
    (DeltaTable OPTIMIZE, see streaming/ingest.py's Delta path) is the
    always-safe variant where delta-spark exists.

    NULL-valued partitions (``__HIVE_DEFAULT_PARTITION__``) are left
    alone — a NULL key can't round-trip through the value filter.

    Directory enumeration uses ``os.listdir``, so this operator only
    handles LOCAL paths (``/...`` or ``file:``) — for object stores,
    list via the transaction log (Delta OPTIMIZE) instead; a non-local
    URI raises rather than silently finding zero partitions. Directory
    names are Hive URL-escaped (space → ``%20``, ``:``/``%`` likewise),
    so values are unquoted before the ``isin`` filter — otherwise such
    partitions would be "rewritten" with zero matching rows (r3 advice
    item 5).
    """
    import os
    from urllib.parse import unquote

    if "://" in path and not path.startswith("file:"):
        raise ValueError(
            f"compact_time_partitions lists via os.listdir and only "
            f"supports local paths, got {path!r}"
        )
    local = path[len("file:"):] if path.startswith("file:") else path

    frag = []
    for entry in os.listdir(local):
        if not entry.startswith(f"{partition_col}="):
            continue
        val = unquote(entry.split("=", 1)[1])
        if val == "__HIVE_DEFAULT_PARTITION__":
            continue
        n = sum(
            1 for f in os.listdir(os.path.join(local, entry))
            if f.endswith(".parquet")
        )
        if n > max_files:
            frag.append(val)
    if not frag:
        return []
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).filter(
        F.col(partition_col).isin([*frag])
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # second split key spreads each date across up to max_files
        # tasks (hash on partition_col alone would collapse every date
        # to one task no matter what max_files asks for)
        (
            df.repartition(
                max_files * len(frag),
                F.col(partition_col),
                F.pmod(F.hash(*df.columns), F.lit(max_files)),
            )
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
    return sorted(frag)
