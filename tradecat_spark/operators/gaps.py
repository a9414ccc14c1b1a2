"""Data-completeness / gap-detection operators.

Reference:
- S6 LEAD-based gap detector — adjacent-row gap beyond threshold
  (/root/reference/services/data-service/src/adapters/timescale.py:215-225).
- S5 calendar gap scanner — per-(symbol, day) observed vs expected counts
  (services/data-service/src/collectors/backfill.py:56-110).
- A7/"数据监控" completeness aggregates
  (services/trading-service/src/indicators/batch/data_monitor.py).

Scale notes: the LEAD pass is one shuffle sorted by (key, ts) — at 100 TB
the input should be bucketed by key so the window avoids a full exchange.
The calendar scan generates the expected day spine with ``sequence()`` per
key (no driver-side loop) and LEFT-joins observed counts onto it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lead_gaps(
    df: DataFrame, keys: list[str], ts: str, threshold_sec: int
) -> DataFrame:
    """Rows whose distance to the next row in the same key exceeds the
    threshold. Returns (keys..., gap_start, gap_end, gap_sec)."""
    w = Window.partitionBy(*keys).orderBy(ts)
    nxt = F.lead(ts).over(w)
    gap = nxt.cast("double") - F.col(ts).cast("double")
    return (
        df.select(*keys, F.col(ts).alias("gap_start"), nxt.alias("gap_end"),
                  gap.alias("gap_sec"))
        .filter(F.col("gap_sec") > threshold_sec)
    )


def calendar_gaps(
    df: DataFrame,
    keys: list[str],
    ts: str,
    expected_per_day: int,
) -> DataFrame:
    """Per (key, day): observed row count vs expectation, over the full
    per-key [min(day), max(day)] span — days with zero rows included.
    """
    observed = df.groupBy(*keys, F.to_date(ts).alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    span = df.groupBy(*keys).agg(
        F.min(F.to_date(ts)).alias("d0"), F.max(F.to_date(ts)).alias("d1")
    )
    spine = span.select(
        *keys, F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return (
        spine.join(observed, [*keys, "day"], "left")
        .select(
            *keys,
            "day",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.lit(expected_per_day).alias("expected_rows"),
        )
        .withColumn("is_complete", F.col("n_rows") >= F.col("expected_rows"))
    )
