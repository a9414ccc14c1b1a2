"""Bin-bucketed range join — point-in-interval at shuffle-join cost.

Spark plans a ``p.ts BETWEEN i.start AND i.end`` join as a (broadcast)
nested loop: O(|points| × |intervals|) comparisons, the classic range-
join cliff. The standard fix is binning: every interval explodes to the
fixed-width time bins it covers, every point maps to its single bin,
and the join becomes an equi-join on (keys, bin) followed by the exact
BETWEEN filter — O(|points| + |intervals| × len/bin) shuffled rows.

Law: ``bin_range_join(p, i, …) ≡ p ⋈_{BETWEEN} i`` row-for-row; the
bin column is invisible in the output. The hash-gated query checks the
law against DuckDB's plain BETWEEN join.

Choosing ``bin_sec``: ~the median interval length. Too small multiplies
the interval fan-out; too large degrades toward per-bin mini nested
loops. Both ends stay correct — only the constant moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    pt: str,
    start: str,
    end: str,
    bin_sec: int,
) -> DataFrame:
    """Inner-join ``points`` to the ``intervals`` rows whose
    ``[start, end]`` (inclusive) contains ``pt``, sharing ``keys``."""
    p = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(pt)) / bin_sec)
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / bin_sec),
                F.floor(F.unix_timestamp(F.col(end)) / bin_sec),
            )
        ),
    )
    return (
        p.join(iv, [*keys, "__bin"])
        .filter((F.col(pt) >= F.col(start)) & (F.col(pt) <= F.col(end)))
        .drop("__bin")
    )
