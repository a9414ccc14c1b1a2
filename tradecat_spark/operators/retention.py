"""Retention enforcement — the serving-store row budget as operators.

The reference trims each serving table after every write: keep the
latest N rows per (symbol, interval), N from the per-interval RETENTION
dict (trading-service db/reader.py:298-332), and drops raw chunks past
a time horizon (TimescaleDB retention policies,
001_timescaledb.sql:121+). Two Spark forms:

- :func:`trim_to_retention` — the row-budget law as a plan: rank per
  key newest-first, keep ``rn <= cap``. Used when rewriting a compact
  serving table; the audit query ``retention_policy_plan`` hashes the
  same law against the DuckDB oracle.
- :func:`drop_expired_partitions` — the horizon law as a partition-level
  metadata operation on a date-partitioned store (the ingest layout):
  deleting directories is O(expired partitions), never a data rewrite —
  the Spark analogue of dropping TimescaleDB chunks.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def trim_to_retention(
    df: DataFrame,
    keys: list[str],
    ts: str,
    cap: Column | int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the newest ``cap`` rows per key (the DELETE's complement).

    ``cap`` may be a literal or a Column derived from the row (e.g. the
    policy cap joined per interval). The rank is a single window sort
    per key — at scale this runs partition-local when the store is
    bucketed by key, and the result overwrites only touched partitions.
    """
    order = [F.desc(ts), *[F.desc(c) for c in (tiebreak or [])]]
    rn = F.row_number().over(Window.partitionBy(*keys).orderBy(*order))
    cap_col = F.lit(cap) if isinstance(cap, int) else cap
    return (
        df.withColumn("_rn", rn)
        .filter(F.col("_rn") <= cap_col)
        .drop("_rn")
    )


def expired_partition_values(
    spark, store_path: str, horizon_date: str, part_col: str = "_part"
) -> list[str]:
    """Date-partition values strictly older than ``horizon_date``
    (YYYY-MM-DD), from the store's directory listing — no data read."""
    horizon = _dt.date.fromisoformat(horizon_date)
    out = []
    prefix = f"{part_col}="
    for entry in os.listdir(store_path):
        if not entry.startswith(prefix):
            continue
        try:
            d = _dt.date.fromisoformat(entry[len(prefix):])
        except ValueError:
            continue  # hash-bucketed layout — no date to expire
        if d < horizon:
            out.append(entry[len(prefix):])
    return sorted(out)


def drop_expired_partitions(
    spark, store_path: str, horizon_date: str, part_col: str = "_part"
) -> list[str]:
    """Drop store partitions strictly older than the horizon.

    Returns the dropped partition values. Pure directory removal — the
    TimescaleDB drop_chunks analogue; readers never see a partial
    partition because each directory is removed atomically.
    """
    expired = expired_partition_values(
        spark, store_path, horizon_date, part_col
    )
    for value in expired:
        entry = f"{part_col}={value}"
        path = os.path.join(store_path, entry)
        if os.path.islink(path):
            # symlink-swap store layout (streaming.ingest): remove the
            # published link first (atomic disappearance for readers)
            os.unlink(path)
        else:
            shutil.rmtree(path, ignore_errors=True)
        # then EVERY retired version of the partition — the current
        # target plus grace-parked older versions (.v*/.old-*), which
        # nothing else will ever reclaim once the partition stops being
        # committed (the disk-leak the review found)
        for stale in os.listdir(store_path):
            if stale.startswith(".") and stale.endswith(f"-{entry}"):
                stale_path = os.path.join(store_path, stale)
                if os.path.islink(stale_path):
                    try:
                        os.unlink(stale_path)
                    except OSError:
                        pass
                else:
                    shutil.rmtree(stale_path, ignore_errors=True)
    return expired
