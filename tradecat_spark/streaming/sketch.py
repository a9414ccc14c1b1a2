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


def read_cms(spark: SparkSession, store_path: str) -> DataFrame:
    """The merged sketch: SUM of the per-batch partials — disjoint
    deliveries by construction (one partition per checkpointed batch),
    so the sum is the exactly-once grid."""
    return (
        read_store(spark, store_path)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .select(
            F.col("d").cast("int").alias("d"),
            F.col("bucket").cast("bigint").alias("bucket"),
            "cnt",
        )
    )


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
