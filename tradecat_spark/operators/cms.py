"""Count-Min sketch algebra shared by the batch law query
(`plans/q_sketch.cms_frequency_law`) and the streaming counter
maintenance (`streaming/sketch.py`).

Grid: D=4 hash rows x W=512 buckets; bucket(d, key) = first 8 hex
digits of md5('d_' || key) mod W — pure integer algebra both engines
render identically. The sketch merges by ADDITION: order-independent
and map-side combinable, but NOT idempotent — a replayed batch added
twice double-counts. The streaming store therefore partitions BY
BATCH (each trigger overwrites its own partial-sketch partition, which
IS idempotent) and readers SUM over partitions; contrast with the HLL
register store (operators/hll.py), whose MAX merge lets the store hold
one merged copy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4    # hash rows
CMS_W = 512  # buckets per row


def bucket(d: int, key: Column) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{d}_"), key.cast("string"))),
                1, 8,
            ), 16, 10,
        ).cast("bigint") % CMS_W
    )


def cms_counts(e: DataFrame) -> DataFrame:
    """Events with a user_id column -> (d, bucket, cnt) counter rows;
    the conditional-count grid aggregates map-side (partial aggregation
    IS the sketch merge)."""
    rows = (
        e.filter(F.col("user_id").isNotNull())
        .select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        bucket(d, F.col("user_id")).alias("bucket"),
                    )
                    for d in range(CMS_D)
                ])
            ).alias("x")
        )
        .select("x.d", "x.bucket")
    )
    return rows.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def add_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """The CMS merge: per-(d, bucket) SUM. Correct for combining
    sketches of DISJOINT deliveries only — never re-add a replay."""
    return (
        a.select("d", "bucket", "cnt")
        .unionByName(b.select("d", "bucket", "cnt"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
