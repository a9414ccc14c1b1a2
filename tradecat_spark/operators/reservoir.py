"""Two-level deterministic per-group top-k (min-k reservoir).

A single rank window per group materializes the WHOLE group in one
task — the classic giant-group failure at 100 TB (one hot key = one
straggler/OOM). The two-level form bounds every task:

  level 1: rank within (group, shard) — shard is a deterministic hash
           bucket of the row, so each partition holds ~1/S of the
           group — and keep k rows per shard;
  level 2: rank the surviving <= S*k rows per group and keep k.

Because the ordering is a TOTAL order, every global top-k row is
necessarily a top-k row of its own shard, so the pre-filter loses
nothing and the result is IDENTICAL to the one-pass window — only the
execution shape changes. The shard assignment itself never affects the
output (any partition of the rows works), so it can be any
deterministic hash.

Used by ``sample_per_group_reservoir`` (SURVEY north-star curation)
and available to any per-group top-k at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_topk(
    df: DataFrame,
    groups: list[str],
    order_cols: list[str | Column],
    k: int,
    shards: int = 8,
) -> DataFrame:
    """Top-k rows per group under a total order, giant-group-safe.

    ``order_cols`` must be a total order of the group's rows (include a
    unique tiebreaker), else ties at the k boundary are nondeterministic
    in BOTH the one-pass and two-level forms. Output = input columns +
    ``rk`` (1-based rank within the group).
    """
    shard = F.pmod(
        F.xxhash64(*[F.col(g) for g in groups], *order_cols),
        F.lit(shards),
    )
    w1 = Window.partitionBy(*groups, "_shard").orderBy(*order_cols)
    w2 = Window.partitionBy(*groups).orderBy(*order_cols)
    return (
        df.withColumn("_shard", shard)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("_shard", "_rk1")
    )
