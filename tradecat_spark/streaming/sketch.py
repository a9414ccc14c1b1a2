"""Streaming HLL register maintenance: a persisted distinct-count
sketch updated per micro-batch.

Each arriving events micro-batch folds to its own (event_type, bucket,
reg) registers (`operators.hll.registers` — the SAME integer algebra
the batch queries use) and max-merges into a tiny persisted register
store through the generic idempotent upsert
(`streaming.ingest.upsert_partitions`, one store partition per event
type). MAX is associative, commutative, and IDEMPOTENT, so any
crash/replay/at-least-once interleaving converges to exactly the batch
registers over all delivered events — the registry query
`streaming_hll_registers` hash-checks that equality against the DuckDB
register SQL, and `tests/test_streaming.py` drives the crash seam.

Scale posture: per-trigger work is one map-side-combinable max
aggregate over the batch (partial aggregation IS the sketch merge);
the store read/merge/rewrite is O(|event_types| x 256), independent of
history length. This is what keeps "distinct users ever" queryable at
100 TB without ever running a count-distinct over the full history:
the stream maintains the sketch, `plans/q_sketch.hll_estimate`'s
estimator algebra reads it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.operators.hll import max_merge, registers
from tradecat_spark.streaming.ingest import (
    batch_partition_vals,
    drop_batch_partition,
    live_batch_vals,
    read_batch_partitions,
    PART_COL,
    read_store,
    start_foreach_batch,
    store_has_data,
    upsert_partitions,
)

REG_KEYS = ["event_type", "bucket"]


def upsert_registers(
    spark: SparkSession, regs: DataFrame, store_path: str
) -> None:
    """Max-merge one batch's register rows into the store. Partitioned
    by event type: a trigger touches exactly the types it carries, and
    the merge reads only those partitions (each 256 rows)."""

    def _merge(existing: DataFrame | None, f: DataFrame) -> DataFrame:
        if existing is None:
            return f.select(*REG_KEYS, "reg")
        return max_merge(existing, f)

    upsert_partitions(
        spark, regs, regs, store_path, REG_KEYS, _merge,
        part_expr=F.col("event_type"),
    )


def update_registers(
    spark: SparkSession, batch: DataFrame, store_path: str
) -> None:
    """The foreachBatch body, exposed for tests: fold the batch to its
    registers, max-merge into the store. No batch-id bookkeeping is
    needed — idempotence comes from the merge itself. The fold is
    materialized ONCE (localCheckpoint, types x 256 rows) so the empty
    probe, the partition probe, and the staging write don't each
    re-run the distinct-heavy register aggregation."""
    regs = registers(batch).localCheckpoint()
    if regs.isEmpty():
        return
    upsert_registers(spark, regs, store_path)


def read_registers(spark: SparkSession, store_path: str) -> DataFrame:
    """(event_type, bucket, reg) currently persisted."""
    return read_store(spark, store_path).select(
        "event_type", F.col("bucket").cast("bigint").alias("bucket"),
        F.col("reg").cast("bigint").alias("reg"),
    )


#: layout knowledge single-sourced in ingest.store_has_data
store_exists = store_has_data


# ---------------------------------------------------------------------------
# CMS counter maintenance — the ADDITIVE sketch, so the durability
# design inverts: addition is not idempotent, so the store holds one
# PARTIAL sketch per batch (overwriting your own batch partition is
# idempotent under replay) and readers SUM over partitions. Contrast
# with the HLL store above, whose MAX merge lets replays re-merge.
# ---------------------------------------------------------------------------
CMS_KEYS = ["d", "bucket"]


def update_cms(
    spark: SparkSession, batch: DataFrame, batch_id: int, store_path: str
) -> None:
    """foreachBatch body: fold the batch to its partial counter grid
    and commit it as the batch's own store partition. A replay
    recomputes the identical partial and overwrites — never adds."""
    from tradecat_spark.operators.cms import cms_counts

    # one materialization (4 x 512 rows max) — see update_registers
    part = cms_counts(batch).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    ).localCheckpoint()
    if part.isEmpty():
        return

    def _merge(existing: DataFrame | None, f: DataFrame) -> DataFrame:
        # same-batch replay: REPLACE, never sum — the partial is a
        # deterministic function of the batch
        return f.select(*CMS_KEYS, "cnt", "batch_id")

    upsert_partitions(
        spark, part, part, store_path, CMS_KEYS, _merge,
        part_expr=F.concat(F.lit("b"), F.col("batch_id").cast("string")),
    )


#: partition listing / coverage rule / partition reads / drops are
#: single-sourced in ingest (shared with the ANN code store)
_cms_partition_vals = batch_partition_vals


_cms_live_vals = live_batch_vals


_cms_read_vals = read_batch_partitions


def read_cms(spark: SparkSession, store_path: str) -> DataFrame:
    """The merged sketch: SUM of the LIVE partitions — the newest
    compacted base plus every partial it doesn't cover. Deliveries are
    disjoint by construction (one partition per checkpointed batch;
    coverage excludes anything a base already folded), so the sum is
    the exactly-once grid. A never-written (or empty) store yields an
    empty grid rather than an unreadable zero-path parquet scan, the
    same contract ``store_has_data`` gives the HLL/dedup readers."""
    live = _cms_live_vals(_cms_partition_vals(store_path))
    if not live:
        return spark.createDataFrame([], "d int, bucket bigint, cnt bigint")
    return (
        _cms_read_vals(spark, store_path, live)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .select(
            F.col("d").cast("int").alias("d"),
            F.col("bucket").cast("bigint").alias("bucket"),
            "cnt",
        )
    )


def compact_cms(
    spark: SparkSession, store_path: str, upto_batch: int
) -> None:
    """Fold every live partition with index <= ``upto_batch`` into one
    ``c<upto_batch>`` base partition, then delete what it covers.

    Crash-safe by ordering + the coverage rule: the base publishes
    through the same staged atomic swap as any partition, and from
    that instant the reader ignores the covered partials — a crash
    before any delete leaves only dead debris, and re-running the
    compaction folds the (already published) base alone into an
    identical base and finishes the deletes. A covered batch id that
    gets REPLAYED after compaction writes a ``b<j>`` the reader
    ignores (j <= k), so even checkpoint rollback cannot double-count.
    Only pass batch ids the stream's checkpoint has committed.

    This closes the 'store is batches x grid until compaction' growth
    caveat: a long-running stream's read cost stays O(grid + partials
    since the last compaction), not O(all history)."""
    vals = _cms_live_vals(_cms_partition_vals(store_path))
    src = [v for v in vals if int(v[1:]) <= upto_batch]
    if not src:
        return
    base = (
        _cms_read_vals(spark, store_path, src)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .withColumn("batch_id", F.lit(upto_batch).cast("long"))
    )

    def _merge(existing: DataFrame | None, f: DataFrame) -> DataFrame:
        # re-compaction recomputes the identical base: REPLACE
        return f.select(*CMS_KEYS, "cnt", "batch_id")

    # literal partition value: a 1-row probe avoids re-scanning the
    # folded partials just to discover 'c<k>' (r8 review finding)
    upsert_partitions(
        spark, spark.range(1), base, store_path, CMS_KEYS, _merge,
        part_expr=F.lit(f"c{upto_batch}"),
    )
    # the base is live — everything it covers is now dead debris
    for v in _cms_partition_vals(store_path):
        if v == f"c{upto_batch}" or int(v[1:]) > upto_batch:
            continue
        _drop_cms_partition(store_path, v)


_drop_cms_partition = drop_batch_partition


def start_cms_maintenance(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    trigger_sec: int = 3,
    available_now: bool = False,
):
    """Start counter maintenance over an events stream (needs a
    user_id column)."""
    spark = stream.sparkSession

    def _sink(batch: DataFrame, batch_id: int) -> None:
        update_cms(spark, batch, batch_id, store_path)

    return start_foreach_batch(
        stream, _sink, checkpoint, trigger_sec, available_now
    )


def start_hll_maintenance(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    trigger_sec: int = 3,
    available_now: bool = False,
):
    """Start register maintenance over an events stream (needs
    event_type + user_id columns)."""
    spark = stream.sparkSession

    def _sink(batch: DataFrame, batch_id: int) -> None:
        update_registers(spark, batch, store_path)

    return start_foreach_batch(
        stream, _sink, checkpoint, trigger_sec, available_now
    )
