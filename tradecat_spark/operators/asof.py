"""As-of (point-in-time) join.

Reference J5: metrics are aligned to candles at coarser buckets via
``last(value, time)`` within the bucket — a bucketed as-of join
(/root/reference/libs/database/db/schema/006_candles_meta_views.sql:53-67).
This module provides the true as-of join as a reusable operator.

Spark-first design: Spark has no native ASOF JOIN, but the classic
union-and-backfill formulation expresses it with one shuffle and no
row-pairing explosion: tag both sides, union, and carry the most recent
right-side payload forward with ``last(..., ignorenulls=True)`` over a
(key, ts)-ordered window. Cost is a single sort per key — the same as a
merge-asof — and it scales linearly; a range-join (ts BETWEEN) version
would be quadratic per key. For bucketed as-of semantics, compose
``metrics_rollup`` (max_by within bucket) + an equi-join instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts within the same key (pandas ``merge_asof``
    semantics, direction='backward').
    """
    lcols = left.columns
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_r_{v}")
          for v in right_vals],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(v).alias(f"_r_{v}") for v in right_vals],
        F.col(right_ts).alias("_r_ts"),
    ).select(*l.columns)  # align column order for union

    # right rows sort before left rows at identical ts → a left row at
    # exactly t sees a right row at t (inclusive backward as-of).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "*",
        *[F.last(f"_r_{v}", ignorenulls=True).over(w).alias(f"_f_{v}")
          for v in right_vals],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_f_ts"),
    )
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance_sec is not None:
        within = (
            F.col("_ts").cast("double") - F.col("_f_ts").cast("double")
        ) <= F.lit(tolerance_sec)
        out = out.select(
            *lcols,
            *[F.when(within, F.col(f"_f_{v}")).alias(f"asof_{v}")
              for v in right_vals],
            F.when(within, F.col("_f_ts")).alias("asof_ts"),
        )
    else:
        out = out.select(
            *lcols,
            *[F.col(f"_f_{v}").alias(f"asof_{v}") for v in right_vals],
            F.col("_f_ts").alias("asof_ts"),
        )
    return out
