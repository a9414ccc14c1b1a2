"""HyperLogLog register algebra shared by the batch sketch queries
(`plans/q_sketch.py`: hll_register_law / hll_estimate / hll_error_eval)
and the streaming register maintenance (`streaming/sketch.py`) — one
home so the persisted store and the batch estimator can never drift.

Register definition (Flajolet 2007): bucket = first 2 hex digits of
md5(user_id) (256 registers), x = the next 48 bits, rank =
49 - bitlen(x) (leading zeros + 1; x = 0 capped at 49 — pure integer
algebra both engines render identically). The register value is the
MAX rank per (group, bucket): associative, commutative, IDEMPOTENT —
which is what makes the sketch a map-side combiner at 100 TB and a
crash-replay-safe streaming store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_BUCKETS = 256  # 2 hex digits of the hash pick the register


def event_ranks(e: DataFrame) -> DataFrame:
    """(event_type, user_id, ...) events -> per-distinct-user
    (event_type, shard, bucket, rank) rows. ``shard = user_id % 8``
    rides along for the merge-law query; callers that don't shard just
    drop the column."""
    e = e.filter(F.col("user_id").isNotNull())
    md = F.md5(F.col("user_id").cast("string"))
    h = e.select(
        "event_type",
        (F.col("user_id") % 8).alias("shard"),
        F.conv(F.substring(md, 1, 2), 16, 10).cast("bigint")
        .alias("bucket"),
        F.conv(F.substring(md, 3, 12), 16, 10).cast("bigint").alias("x"),
    ).distinct()
    rank = F.when(F.col("x") == 0, F.lit(49)).otherwise(
        F.lit(49) - F.length(F.bin(F.col("x")))
    )
    return h.select("event_type", "shard", "bucket", rank.alias("rank"))


def registers(e: DataFrame) -> DataFrame:
    """Events -> (event_type, bucket, reg) register rows — the rows the
    streaming store persists; bounded by |event_types| x 256."""
    return (
        event_ranks(e)
        .groupBy("event_type", "bucket")
        .agg(F.max("rank").cast("bigint").alias("reg"))
    )


def max_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """The HLL merge: per-(event_type, bucket) MAX over both register
    sets. Idempotent, so at-least-once redelivery is a no-op."""
    return (
        a.select("event_type", "bucket", "reg")
        .unionByName(b.select("event_type", "bucket", "reg"))
        .groupBy("event_type", "bucket")
        .agg(F.max("reg").cast("bigint").alias("reg"))
    )
