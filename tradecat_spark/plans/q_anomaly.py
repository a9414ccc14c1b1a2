"""Structural time-series monitoring — CUSUM drift, AMOC changepoint,
seasonal-profile anomalies.

Beyond-reference family: the reference's quality schema logs THRESHOLD
anomalies (price/volume spikes, stale closes, gaps —
`quality_anomaly_log`, reference 08_quality.sql:64-86), but a market
data platform at 100 TB also needs STRUCTURAL monitors: has the level
of a series drifted (CUSUM, Page 1954), where did it shift (at-most-
one-changepoint via the CUSUM contrast argmax), and is a bar abnormal
for its hour-of-day (seasonal-naive residuals)? All three are pure
window/aggregate algebra — one shuffle on the (symbol, bucket) key,
no UDFs, no iteration.

Exactness design: bar closes are converted ONCE to integer micro-units
(round(close·1e6), the plans/exact.py discipline), so every cumulative
sum, running minimum, threshold compare, argmax and division in the
family is integer-exact and bit-identical in DuckDB. The CUSUM
recursion S_t = max(0, S_{t-1} + x_t) is evaluated in closed form
S_t = cum_t − min(0, min_{j≤t} cum_j) — two ordered window passes, no
recursion (the same prefix-extrema trick gapfill/drawdown lanes use).
Scale constants derive from the data as exact integers: mad = mean
absolute bar-to-bar delta (integer division; every sum in the family
is non-negative because the driver's `value` is non-negative — pinned
by test, since Spark's `div` truncates toward zero while DuckDB's `//`
floors and they diverge on negatives), k = mad div 2 (drift
allowance), h = 6·mad (alarm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.operators.rollup import bucket_ts
from tradecat_spark.plans.exact import ratio6, ratio6_sql
from tradecat_spark.plans.registry import query

TS_FMT = "yyyy-MM-dd HH:mm:ss"

K_DIV = 2          # drift allowance k = mad div K_DIV
H_MULT = 6         # alarm threshold h = H_MULT * mad
SEASONAL_MULT = 4  # hour-of-day anomaly: |residual| > SEASONAL_MULT * scale

_BARS_CTE = """bars AS (
  SELECT event_type,
    time_bucket(INTERVAL '5 minutes', ts) AS b5,
    CAST(ROUND(max_by(value, ts) * 1000000) AS BIGINT) AS cm
  FROM events GROUP BY 1, 2
)"""


def _bars_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5m bars with the close in exact integer micro-units."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", bucket_ts("ts", 300).alias("b5")
    ).agg(
        F.round(F.max_by("value", "ts") * 1_000_000)
        .cast("long")
        .alias("cm")
    )


def _cusum_stat(cum: Column, w: Window) -> Column:
    """Closed form of S_t = max(0, S_{t-1} + x_t): the running sum
    minus the (0-floored) running minimum of itself."""
    return cum - F.least(F.lit(0).cast("long"), F.min(cum).over(w))


@query(
    "ts_cusum_drift",
    survey="beyond §2 (structural monitoring): two-sided CUSUM drift "
    "detector (Page 1954) over 5m-bar closes — the standard "
    "change-detection statistic the reference's threshold anomaly log "
    "cannot express; closed-form prefix-extrema evaluation, exact "
    "integer micro-units end to end",
    description="CUSUM alarm rows + per-symbol max statistic, both "
    "directions, thresholds derived from the mean absolute delta",
    oracle=f"""
WITH {_BARS_CTE},
d AS (
  SELECT event_type, b5, cm,
    cm - lag(cm) OVER (PARTITION BY event_type ORDER BY b5) AS delta
  FROM bars
),
dd AS (SELECT * FROM d WHERE delta IS NOT NULL),
st AS (
  SELECT event_type,
    CAST(SUM(ABS(delta)) AS BIGINT) // COUNT(*) AS mad
  FROM dd GROUP BY 1
),
c AS (
  SELECT dd.event_type, dd.b5,
    {H_MULT} * st.mad AS h,
    SUM(dd.delta - st.mad // {K_DIV}) OVER
      (PARTITION BY dd.event_type ORDER BY dd.b5
       ROWS UNBOUNDED PRECEDING) AS cum_up,
    SUM(-dd.delta - st.mad // {K_DIV}) OVER
      (PARTITION BY dd.event_type ORDER BY dd.b5
       ROWS UNBOUNDED PRECEDING) AS cum_dn
  FROM dd JOIN st USING (event_type)
),
s AS (
  SELECT event_type, b5, h,
    CAST(cum_up - LEAST(0, MIN(cum_up) OVER
      (PARTITION BY event_type ORDER BY b5 ROWS UNBOUNDED PRECEDING))
      AS BIGINT) AS sp,
    CAST(cum_dn - LEAST(0, MIN(cum_dn) OVER
      (PARTITION BY event_type ORDER BY b5 ROWS UNBOUNDED PRECEDING))
      AS BIGINT) AS sm
  FROM c
),
alarms AS (
  SELECT 'alarm' AS kind, event_type AS symbol,
    strftime(b5, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
    'up' AS direction, sp / 1000000.0 AS stat6, h / 1000000.0 AS thresh6
  FROM s WHERE sp > h
  UNION ALL
  SELECT 'alarm', event_type, strftime(b5, '%Y-%m-%d %H:%M:%S'),
    'down', sm / 1000000.0, h / 1000000.0
  FROM s WHERE sm > h
),
peaks AS (
  SELECT 'max' AS kind, event_type AS symbol, '' AS bucket_ts,
    'up' AS direction, CAST(MAX(sp) AS BIGINT) / 1000000.0 AS stat6,
    MAX(h) / 1000000.0 AS thresh6
  FROM s GROUP BY event_type
  UNION ALL
  SELECT 'max', event_type, '', 'down',
    CAST(MAX(sm) AS BIGINT) / 1000000.0, MAX(h) / 1000000.0
  FROM s GROUP BY event_type
)
SELECT * FROM alarms UNION ALL SELECT * FROM peaks
""",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bar aggregate, one lag pass, one tiny per-symbol stats
    join (broadcast), two ordered window passes over the SAME
    (symbol, b5) partitioning — every Exchange after the bar rollup
    is on the symbol key, so the whole detector is one shuffle wide.
    Alarm rows persist while the statistic stays above h (no reset —
    the one-pass closed form); the per-symbol 'max' rows make the
    lane's value surface non-empty even on drift-free data."""
    bars = _bars_micro(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("b5")
    dd = bars.select(
        "event_type", "b5",
        (F.col("cm") - F.lag("cm").over(w)).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    st = dd.groupBy("event_type").agg(
        F.call_function(
            "div",
            F.sum(F.abs("delta")).cast("long"),
            F.count(F.lit(1)),
        ).alias("mad")
    )
    k = F.call_function("div", F.col("mad"), F.lit(K_DIV).cast("long"))
    cw = w.rowsBetween(Window.unboundedPreceding, 0)
    c = dd.join(F.broadcast(st), "event_type").select(
        "event_type", "b5",
        (F.lit(H_MULT) * F.col("mad")).alias("h"),
        F.sum(F.col("delta") - k).over(cw).alias("cum_up"),
        F.sum(-F.col("delta") - k).over(cw).alias("cum_dn"),
    )
    s = c.select(
        "event_type", "b5", "h",
        _cusum_stat(F.col("cum_up"), cw).alias("sp"),
        _cusum_stat(F.col("cum_dn"), cw).alias("sm"),
    )
    kind_a = F.lit("alarm").alias("kind")
    sym = F.col("event_type").alias("symbol")
    bts = F.date_format("b5", TS_FMT).alias("bucket_ts")
    h6 = (F.col("h") / F.lit(1_000_000.0)).alias("thresh6")
    up = s.filter(F.col("sp") > F.col("h")).select(
        kind_a, sym, bts, F.lit("up").alias("direction"),
        (F.col("sp") / F.lit(1_000_000.0)).alias("stat6"), h6,
    )
    dn = s.filter(F.col("sm") > F.col("h")).select(
        kind_a, sym, bts, F.lit("down").alias("direction"),
        (F.col("sm") / F.lit(1_000_000.0)).alias("stat6"), h6,
    )

    def _peak(col: str, direction: str) -> DataFrame:
        return s.groupBy("event_type").agg(
            F.max(col).alias("mx"), F.max("h").alias("mh")
        ).select(
            F.lit("max").alias("kind"),
            F.col("event_type").alias("symbol"),
            F.lit("").alias("bucket_ts"),
            F.lit(direction).alias("direction"),
            (F.col("mx") / F.lit(1_000_000.0)).alias("stat6"),
            (F.col("mh") / F.lit(1_000_000.0)).alias("thresh6"),
        )

    return up.unionByName(dn).unionByName(
        _peak("sp", "up")
    ).unionByName(_peak("sm", "down"))


@query(
    "ts_level_shift",
    survey="beyond §2 (structural monitoring): at-most-one-changepoint "
    "level-shift estimate per symbol — argmax of the integer-scaled "
    "CUSUM contrast |n·prefix_t − t·total| (the AMOC estimator), with "
    "exact before/after means via ratio6",
    description="Per-symbol most-likely changepoint: index, bucket, "
    "before/after means, shift",
    oracle=f"""
WITH {_BARS_CTE},
r AS (
  SELECT event_type, b5, cm,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b5) AS t,
    SUM(cm) OVER (PARTITION BY event_type ORDER BY b5
                  ROWS UNBOUNDED PRECEDING) AS pre
  FROM bars
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cm) AS BIGINT) AS total
  FROM bars GROUP BY 1
),
con AS (
  SELECT r.event_type, r.b5, CAST(r.t AS BIGINT) AS t,
    CAST(r.pre AS BIGINT) AS pre, tot.n, tot.total,
    ABS(CAST(tot.n AS HUGEINT) * r.pre
        - CAST(r.t AS HUGEINT) * tot.total) AS contrast
  FROM r JOIN tot USING (event_type)
  WHERE r.t < tot.n
),
cp AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      ORDER BY contrast DESC, t ASC) AS rk
    FROM con
  ) WHERE rk = 1
)
SELECT event_type AS symbol, t AS cp_index,
  strftime(b5, '%Y-%m-%d %H:%M:%S') AS cp_ts,
  {ratio6_sql('pre', 't')} AS before_mean6,
  {ratio6_sql('total - pre', 'n - t')} AS after_mean6,
  ({ratio6_sql('total - pre', 'n - t')})
    - ({ratio6_sql('pre', 't')}) AS shift6
FROM cp
""",
)
def ts_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AMOC scan is one ranked window over the prefix sums: the
    contrast |n·prefix − t·total| is the integer-scaled distance of
    the prefix mean from the global mean (DECIMAL(38,0)/HUGEINT so a
    100 TB-sized symbol cannot overflow it), its argmax is the
    least-squares single changepoint, and the split means publish
    through the exact ratio6 path. Symbols with one bar have no
    interior split point and are absent by construction."""
    bars = _bars_micro(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("b5")
    cw = w.rowsBetween(Window.unboundedPreceding, 0)
    r = bars.select(
        "event_type", "b5", "cm",
        F.row_number().over(w).cast("long").alias("t"),
        F.sum("cm").over(cw).cast("long").alias("pre"),
    )
    tot = bars.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cm").cast("long").alias("total"),
    )
    dec = "decimal(38,0)"
    con = (
        r.join(F.broadcast(tot), "event_type")
        .filter(F.col("t") < F.col("n"))
        .withColumn(
            "contrast",
            F.abs(
                F.col("n").cast(dec) * F.col("pre").cast(dec)
                - F.col("t").cast(dec) * F.col("total").cast(dec)
            ),
        )
    )
    rw = Window.partitionBy("event_type").orderBy(
        F.desc("contrast"), F.asc("t")
    )
    cp = con.withColumn("rk", F.row_number().over(rw)).filter(
        F.col("rk") == 1
    )
    before6 = ratio6(F.col("pre"), F.col("t"))
    after6 = ratio6(F.col("total") - F.col("pre"), F.col("n") - F.col("t"))
    return cp.select(
        F.col("event_type").alias("symbol"),
        F.col("t").alias("cp_index"),
        F.date_format("b5", TS_FMT).alias("cp_ts"),
        before6.alias("before_mean6"),
        after6.alias("after_mean6"),
        (after6 - before6).alias("shift6"),
    )


@query(
    "ts_seasonal_hour_profile",
    survey="beyond §2 (structural monitoring): hour-of-day seasonal "
    "baseline + seasonal-naive anomaly counts per (symbol, hour) — "
    "the 'is this bar abnormal FOR ITS HOUR' monitor the flat "
    "threshold log cannot express; exact integer baselines and "
    "residual scales",
    description="Per (symbol, hour-of-day): bar count, exact mean "
    "close, anomalies beyond 4x the mean absolute residual",
    oracle=f"""
WITH {_BARS_CTE},
hb AS (
  SELECT event_type, b5, cm,
    CAST((epoch_us(b5) // 3600000000) % 24 AS BIGINT) AS hod
  FROM bars
),
prof AS (
  SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_bars,
    CAST(SUM(cm) AS BIGINT) // COUNT(*) AS base_micro
  FROM hb GROUP BY 1, 2
),
res AS (
  SELECT hb.event_type, hb.hod, prof.n_bars, prof.base_micro,
    ABS(hb.cm - prof.base_micro) AS ares
  FROM hb JOIN prof USING (event_type, hod)
),
sc AS (
  SELECT event_type,
    CAST(SUM(ares) AS BIGINT) // COUNT(*) AS scale
  FROM res GROUP BY 1
)
SELECT r.event_type AS symbol, r.hod,
  MAX(r.n_bars) AS n_bars,
  MAX(r.base_micro) / 1000000.0 AS hour_mean6,
  MAX(sc.scale) / 1000000.0 AS scale6,
  CAST(SUM(CASE WHEN r.ares > {SEASONAL_MULT} * sc.scale
           THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM res r JOIN sc USING (event_type)
GROUP BY 1, 2
""",
)
def ts_seasonal_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hash aggregates (the (symbol, hour) profile and the
    per-symbol residual scale — both map-side-combining) around one
    profile join; the hour-of-day derives from integer epoch
    arithmetic (identical in both engines, no timezone surface). The
    residual scale is the per-SYMBOL mean absolute residual, so an
    hour whose bars sit far from their own hour's baseline relative
    to the symbol's overall variability counts as anomalous."""
    bars = _bars_micro(spark, sf_dir)
    hb = bars.select(
        "event_type", "cm",
        F.expr("CAST((unix_micros(b5) div 3600000000) % 24 AS BIGINT)")
        .alias("hod"),
    )
    prof = hb.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n_bars"),
        F.call_function(
            "div", F.sum("cm").cast("long"), F.count(F.lit(1))
        ).alias("base_micro"),
    )
    res = hb.join(prof, ["event_type", "hod"]).select(
        "event_type", "hod", "n_bars", "base_micro",
        F.abs(F.col("cm") - F.col("base_micro")).alias("ares"),
    )
    sc = res.groupBy("event_type").agg(
        F.call_function(
            "div", F.sum("ares").cast("long"), F.count(F.lit(1))
        ).alias("scale")
    )
    return (
        res.join(F.broadcast(sc), "event_type")
        .groupBy("event_type", "hod")
        .agg(
            F.max("n_bars").alias("n_bars"),
            (F.max("base_micro") / F.lit(1_000_000.0)).alias("hour_mean6"),
            (F.max("scale") / F.lit(1_000_000.0)).alias("scale6"),
            F.sum(
                (F.col("ares") > F.lit(SEASONAL_MULT) * F.col("scale"))
                .cast("long")
            ).alias("n_anomalies"),
        )
        .select(
            F.col("event_type").alias("symbol"),
            "hod", "n_bars", "hour_mean6", "scale6", "n_anomalies",
        )
    )
