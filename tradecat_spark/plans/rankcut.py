"""Distributed exact percent-rank cutoffs without a global window.

Problem (r5 verdict item 1): flagging the bottom decile / top quartile
of a corpus with ``percent_rank() OVER (ORDER BY score)`` funnels the
ENTIRE corpus through one single-partition WindowExec sort — the exact
shape that dies first at 100 TB.

Fix: percent-rank flags are a pure function of the row's SCORE (plus a
bounded tie-break inside at most one boundary value group), so they can
be computed from a per-distinct-value histogram:

1. ``value_cb``: group the corpus by the (integer) score → one
   distributed hash aggregate, then a TWO-LEVEL cumulative count:
   within-bucket windows partitioned by ``floor(score / bucket_width)``
   (each partition holds at most ``bucket_width`` distinct values by
   construction) and one tiny window over the per-bucket totals (row
   count = number of non-empty buckets — proportional to the VALUE
   RANGE, never to the corpus). Result: per distinct value ``v``,
   ``cb(v)`` = number of corpus rows strictly below ``v`` — i.e. the
   0-based ``rank()-1`` every row of that value shares.
2. The flag ``fl(cb / (N-1)) <= p`` (or ``>= p``) is evaluated per
   HISTOGRAM row with the same IEEE double division both engines use
   for ``percent_rank``, so the result is bit-identical to the oracle's
   ``PERCENT_RANK() OVER (ORDER BY score)`` — ties share cb exactly as
   ties share a rank.
3. The corpus-side flag is then one broadcast scalar comparison
   (monotonicity: cb is non-decreasing in the score, so the flagged
   set is a value prefix/suffix).

For UNIQUE orderings (``ORDER BY score, doc_id``) the boundary value
group — the single group the cutoff rank lands inside — is resolved by
ranking only the rows OF THAT ONE VALUE (a broadcast-filtered tie set),
never the corpus. See ``sample_dsir_importance`` for the usage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_value_cb(
    scored: DataFrame, groups: list[str], col: str, bucket_width: int
) -> DataFrame:
    """Per-(group, distinct value) histogram with exact count-below.

    Input: any DataFrame with grouping columns and an integer-valued
    ``col``. Output: one row per (group, DISTINCT value) with columns
    ``(*groups, col, cnt, cb)`` where ``cnt`` = group rows carrying the
    value and ``cb`` = group rows strictly below it.

    Scale shape: one hash aggregate on (groups, col) (map-side
    combining), then windows whose partitions are bounded by
    ``bucket_width`` distinct values (within-bucket) and by the value
    range divided by ``bucket_width`` (per-group bucket totals) — no
    corpus-sized partition anywhere. Pick ``bucket_width`` so
    range/bucket_width stays in the thousands for the score's domain.
    """
    hist = scored.groupBy(*groups, col).agg(F.count(F.lit(1)).alias("cnt"))
    # floor-division bucketing (works for negative values: floor, not
    # truncation); at most `bucket_width` distinct col values per bucket
    hist = hist.withColumn(
        "bkt", F.floor(F.col(col) / F.lit(bucket_width)).cast("long")
    )
    w_in = (
        Window.partitionBy(*groups, "bkt")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn(
        "cb_in", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
    )
    btot = hist.groupBy(*groups, "bkt").agg(F.sum("cnt").alias("btot"))
    # the ONLY per-group-unpartitioned window: |non-empty buckets| rows
    # per group — value-range-proportional, corpus-size-independent
    w_b = (
        Window.partitionBy(*groups)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    btot = btot.withColumn(
        "cb_bkt", F.coalesce(F.sum("btot").over(w_b), F.lit(0))
    )
    return hist.join(
        btot.select(*groups, "bkt", "cb_bkt"), [*groups, "bkt"]
    ).select(
        *groups,
        col,
        "cnt",
        (F.col("cb_bkt") + F.col("cb_in")).cast("long").alias("cb"),
    )


def value_cb(scored: DataFrame, col: str, bucket_width: int) -> DataFrame:
    """Ungrouped ``group_value_cb``: one histogram over the whole
    input; the bucket-totals window is then the single unpartitioned
    window whose input is bounded by the value range."""
    return group_value_cb(scored, [], col, bucket_width)


def pct_of(cb: Column, n: Column) -> Column:
    """The exact double ``percent_rank`` both engines compute for a row
    whose 0-based rank is ``cb`` out of ``n`` rows: ``cb / (n - 1)`` in
    IEEE doubles. Total by construction: n == 1 returns 0.0 — the
    engines' defined percent_rank of a single row — via a lazy CASE
    branch, so ANSI mode (Spark 4 default) can never see the 0/0
    division a bare quotient would evaluate."""
    return F.when(
        n > 1, cb.cast("double") / (n - F.lit(1)).cast("double")
    ).otherwise(F.lit(0.0))


def exact_quantiles(
    hist: DataFrame,
    groups: list[str],
    col: str,
    quants: tuple,
    value_alias: str,
) -> DataFrame:
    """Exact order statistics off a ``value_cb``/``group_value_cb``
    histogram — the ONE rendering of the selection law ``k = (num *
    (N-1)) div den; value = max(v : cb(v) <= k)`` (cb is monotone, so
    the max lands on the unique value whose [cb, cb+cnt) rank block
    contains k). ``quants`` is a tuple of (label, num, den).

    Output: ``(*groups, quantile, k, <value_alias>, n)`` — one row per
    (group, quantile). Scale shape: one grouped aggregate over the
    bounded histogram plus a per-group explode of |quants| structs;
    nothing corpus-sized after the histogram.
    """
    if groups:
        nrow = hist.groupBy(*groups).agg(
            F.sum("cnt").cast("long").alias("n")
        )
        hb = hist.join(nrow, groups)
    else:
        nrow = hist.agg(F.sum("cnt").cast("long").alias("n"))
        hb = hist.join(F.broadcast(nrow))

    def kq(num: int, den: int) -> Column:
        return F.call_function("div", (F.col("n") - 1) * num, F.lit(den))

    scal = hb.groupBy(*groups).agg(
        F.max("n").alias("n"),
        *[
            F.max(F.when(F.col("cb") <= kq(num, den), F.col(col)))
            .alias(f"v_{lbl}")
            for lbl, num, den in quants
        ],
    )
    rows = scal.select(
        *groups,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lbl).alias("quantile"),
                        kq(num, den).cast("bigint").alias("k"),
                        F.col(f"v_{lbl}").cast("bigint")
                        .alias(value_alias),
                        F.col("n").alias("n"),
                    )
                    for lbl, num, den in quants
                ]
            )
        ).alias("q"),
    )
    return rows.select(
        *groups, "q.quantile", "q.k", f"q.{value_alias}", "q.n"
    )
