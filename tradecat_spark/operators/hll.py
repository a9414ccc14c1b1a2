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


#: alpha_m * m^2 * 2^49 precomputed in Python and embedded as the SAME
#: double literal in both engines (Flajolet 2007 §4 bias correction
#: for m >= 128: alpha_m = 0.7213 / (1 + 1.079 / m))
HLL_C = 0.7213 / (1 + 1.079 / HLL_BUCKETS) * HLL_BUCKETS * HLL_BUCKETS * 2.0**49


def estimate_from_registers(reg: DataFrame) -> DataFrame:
    """(event_type, bucket, reg) register rows -> per-event_type HLL
    estimate — the algebra `plans/q_sketch.hll_estimate` publishes and
    the streaming store consumer reads: integer-exact harmonic sum
    (empty registers contribute 2^49), ONE double divide, linear-
    counting branch below 2.5m with empty registers."""
    m = HLL_BUCKETS
    two49 = 1 << 49
    ag = reg.groupBy("event_type").agg(
        (F.lit(m) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), "
                         "cast(49 - reg as int))"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(two49)
        ).cast("bigint").alias("z_scaled"),
    )
    raw = F.lit(HLL_C) / F.col("z_scaled")
    lc = (raw <= 2.5 * m) & (F.col("v_zero") > 0)
    est = F.when(
        lc,
        F.lit(m) * F.log(F.lit(float(m)) / F.col("v_zero")),
    ).otherwise(raw)
    return ag.select(
        "event_type", "v_zero", "z_scaled",
        F.round(raw, 6).alias("raw6"),
        lc.alias("linear_counting"),
        F.round(est, 6).alias("est6"),
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
