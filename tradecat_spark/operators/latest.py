"""Latest-row-per-group and top-N-per-group scans.

These are the reference's workhorse read patterns:
- ``DISTINCT ON (symbol) ... ORDER BY symbol, t DESC`` (SURVEY §2.4 A3,
  /root/reference/services/trading-service/src/core/async_full_engine.py:86-95)
- ``ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY ts DESC) <= N``
  (SURVEY §2.5 W1, services/trading-service/src/db/cache.py:68-81)

Scale notes: latest-per-group is expressed as ``max_by(struct(...))`` —
a hash aggregate with map-side partial combine, strictly cheaper than a
window sort at high key cardinality. Top-N-per-group keeps the window
form, which recent Catalyst rewrites to a group-limit
(InferWindowGroupLimit) so each shuffle partition only retains N rows
per key before the final sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(df: DataFrame, keys: list[str], ts: str) -> DataFrame:
    """One row per key: the row with max ts. Aggregate form (no sort)."""
    payload = [c for c in df.columns if c not in keys]
    packed = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), ts).alias("_row")
    )
    return packed.select(*keys, *[F.col(f"_row.{c}").alias(c) for c in payload])


def topn_per_group(
    df: DataFrame, keys: list[str], ts: str, n: int, desc: bool = True
) -> DataFrame:
    """Last/first N rows per key (the ≤500-bar window cache scan).

    Clustering contract (load-bearing for ``indicators.engine``):
    the row_number Window requires ClusteredDistribution(keys), so the
    OUTPUT stays hash-clustered by ``keys`` — when the input is already
    an explicit ``repartition(m, *keys)``, that single exchange serves
    both this window and any downstream per-key stage.
    ``engine.compute_all`` relies on exactly that: its ``mapInPandas``
    stage is only correct because every group's rows land whole in one
    partition. Do NOT add a round-robin repartition, coalesce, or
    differently-keyed exchange between this operator and such a
    consumer (tests/test_indicators.py::
    test_compute_all_groups_never_split_across_partitions pins it)."""
    order = F.col(ts).desc() if desc else F.col(ts).asc()
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def latest_batch_filter(df: DataFrame, ts: str) -> DataFrame:
    """Keep only rows belonging to the globally-latest snapshot timestamp.

    Reference P7: consistent-snapshot reads of indicator tables
    (services/telegram-service/src/cards/data_provider.py:412-450).
    Implemented as a scalar-aggregate semi-filter; Catalyst runs the max()
    as a separate tiny job and broadcasts the single value.
    """
    mx = df.agg(F.max(ts).alias("mx"))
    return df.join(F.broadcast(mx), on=df[ts] == mx["mx"], how="inner").drop("mx")
