"""Table catalog over the driver's parquet test data.

Mirrors the reference's storage layer (TimescaleDB hypertables,
SURVEY.md §1.1) as partition-prunable parquet scans. At 100 TB these
tables would be date-partitioned and sorted within partitions by
(key, ts); the loaders below only declare scans + column pruning and
leave physical pruning to Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): read as int64 (legacy conf) and
    # floor-truncate to micros — the same conversion DuckDB applies, so
    # timestamps agree with the oracle bit-for-bit. Integer division: going
    # through double would lose precision above 2^53 ns.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        cols = [
            F.timestamp_micros(F.expr("ts div 1000")).alias("ts") if c == "ts" else F.col(c)
            for c in df.columns
        ]
        df = df.select(*cols)
    return df


def spread_if_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition IFF the frame's scan under-parallelizes
    (guide §2.5 "input skew: one huge unsplittable file … repartition
    immediately after the read").

    The driver's test tables are single-row-group parquet files, so a
    scan is irreducibly ONE task and every map-side chain above it —
    decimal partial aggregation, broadcast-join probes — serializes on
    one core however many are idle. The branch is data-adaptive, not a
    local-mode constant: it fires only when the scan yields fewer
    partitions than ``defaultParallelism`` (the _gram carve-out
    precedent), so at corpus scale — where inputs already carry ≥
    cores splits — it never moves a byte. Callers must be
    placement-insensitive above it (keyed joins/aggregates, decimal or
    integer sums); order-sensitive double folds keep the raw scan.
    2n+1 partitions: AQE-coalesce-exempt, never equal to
    spark.sql.shuffle.partitions (the engine.py collision note)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(2 * sc.defaultParallelism + 1)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
