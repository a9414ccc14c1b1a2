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

BIN_COL = "__tc_bin"


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
    for side, df in (("points", points), ("intervals", intervals)):
        if BIN_COL in df.columns:
            raise ValueError(
                f"{side} input already has reserved column {BIN_COL!r}"
            )
    p = points.withColumn(
        BIN_COL, F.floor(F.unix_timestamp(F.col(pt)) / bin_sec)
    )
    iv = intervals.withColumn(
        BIN_COL,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / bin_sec),
                F.floor(F.unix_timestamp(F.col(end)) / bin_sec),
            )
        ),
    )
    return (
        p.join(iv, [*keys, BIN_COL])
        .filter((F.col(pt) >= F.col(start)) & (F.col(pt) <= F.col(end)))
        .drop(BIN_COL)
    )
