"""Time-series queries over the ``events`` table.

``events(event_id, ts, user_id, event_type, value, props)`` plays the
role of the reference's tick/candle stream: ``event_type`` ≈ symbol
(5 distinct), ``user_id`` ≈ account, ``value`` ≈ price, and the JSON
``props.k`` ≈ trade size. Every query here maps 1:1 to a SURVEY.md §2
operator; citations are to /root/reference/.

Determinism: ``ts`` is unique per key in the test data, so
``min_by/max_by(x, ts)`` are deterministic; sums that feed comparisons
are either exact (decimal/int) or rounded on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.operators.asof import asof_join
from tradecat_spark.operators.gaps import calendar_gaps, lead_gaps
from tradecat_spark.operators.latest import latest_per_group, topn_per_group
from tradecat_spark.operators.merge import merge_candles
from tradecat_spark.operators.rollup import (
    bucket_ts,
    cascade_rollup,
    ohlcv_rollup,
)
from tradecat_spark.plans.exact import cents, cents_sql, ratio6, ratio6_sql
from tradecat_spark.plans.registry import query

DEC = "decimal(18,8)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _k(col: str = "props"):
    """props is ``{"k": <int>}`` — extract the size field."""
    return F.get_json_object(F.col(col), "$.k").cast("double")


# ---------------------------------------------------------------------------
# Flagship: 24h ranking with %change (reference J2+A5+§2.6 — the
# priority-symbol / ranking-card core, async_full_engine.py:54-131)
# ---------------------------------------------------------------------------
@query(
    "flagship_rank_24h_change",
    survey="§2.3 J2 + §2.4 A5 + §2.6 top-K",
    description="Rank event types by trailing-24h flow with %change vs prior 24h",
    bench=True,
    oracle="""
WITH mx AS (SELECT MAX(ts) AS mx_ts FROM events),
agg AS (
  SELECT
    e.event_type,
    ROUND(CAST(SUM(CASE WHEN e.ts > mx.mx_ts - INTERVAL 24 HOUR
             THEN CAST(e.value AS DECIMAL(18,8)) END) AS DOUBLE), 6) AS cur_flow,
    ROUND(CAST(SUM(CASE WHEN e.ts <= mx.mx_ts - INTERVAL 24 HOUR
              AND e.ts >  mx.mx_ts - INTERVAL 48 HOUR
             THEN CAST(e.value AS DECIMAL(18,8)) END) AS DOUBLE), 6) AS prev_flow,
    COUNT(CASE WHEN e.ts > mx.mx_ts - INTERVAL 24 HOUR THEN 1 END) AS cur_events
  FROM events e, mx
  GROUP BY e.event_type
)
SELECT
  event_type, cur_flow, prev_flow, cur_events,
  PCT_CHANGE_EXPR AS pct_change
FROM agg
ORDER BY cur_flow DESC, event_type ASC
LIMIT 10
""".replace(
        "PCT_CHANGE_EXPR",
        ratio6_sql(
            f"({cents_sql('cur_flow')} - {cents_sql('prev_flow')}) * 100",
            cents_sql("prev_flow"),
        ),
    ),
)
def flagship_rank_24h_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two time-sliced conditional aggregates in ONE scan + one tiny
    scalar subquery for the anchor — no self-join (the reference does a
    DISTINCT ON self-join; conditional aggregation is the single-pass
    form that survives 100× data)."""
    e = _events(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("mx_ts"))
    j = e.join(F.broadcast(mx))
    cur = F.col("ts") > F.col("mx_ts") - F.expr("INTERVAL 24 HOURS")
    prev = (F.col("ts") <= F.col("mx_ts") - F.expr("INTERVAL 24 HOURS")) & (
        F.col("ts") > F.col("mx_ts") - F.expr("INTERVAL 48 HOURS")
    )
    agg = j.groupBy("event_type").agg(
        F.round(F.sum(F.when(cur, F.col("value").cast(DEC))).cast("double"), 6).alias("cur_flow"),
        F.round(F.sum(F.when(prev, F.col("value").cast(DEC))).cast("double"), 6).alias("prev_flow"),
        F.count(F.when(cur, 1)).alias("cur_events"),
    )
    return (
        agg.withColumn(
            "pct_change",
            ratio6(
                (cents(F.col("cur_flow")) - cents(F.col("prev_flow"))) * 100,
                cents(F.col("prev_flow")),
            ),
        )
        .orderBy(F.desc("cur_flow"), F.asc("event_type"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A1: OHLCV rollups (continuous-aggregate equivalent, 004:27-45)
# ---------------------------------------------------------------------------
_OHLCV_ORACLE = """
SELECT
  event_type,
  time_bucket(INTERVAL '{iv} seconds', ts) AS bucket_ts,
  min_by(value, ts) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  max_by(value, ts) AS close,
  COUNT(*) AS trade_count,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE), 6) AS volume
FROM events
GROUP BY event_type, bucket_ts
"""


@query(
    "ohlcv_rollup_5m",
    survey="§2.4 A1 (004_continuous_aggregates.sql:27-45)",
    description="5-minute OHLCV candles per event_type",
    bench=True,
    oracle=_OHLCV_ORACLE.format(iv=300),
)
def ohlcv_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return ohlcv_rollup(
        e, ["event_type"], "ts", "value",
        volume=F.col("value").cast(DEC), interval_sec=300,
    ).withColumn("volume", F.round(F.col("volume").cast("double"), 6))


@query(
    "ohlcv_cascade_1h",
    survey="§2.4 A1 cascade — coarse caggs built from fine ones (004:67-81)",
    description="1h candles derived from the 5m rollup (≡ direct rollup law)",
    oracle=_OHLCV_ORACLE.format(iv=3600),
)
def ohlcv_cascade_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle aggregates raw directly; the Spark side cascades
    5m → 1h, proving the rollup-composition law the reference relies on
    when chaining caggs. At 100 TB the cascade reads ~1/300th the bytes."""
    e = _events(spark, sf_dir)
    five = ohlcv_rollup(
        e, ["event_type"], "ts", "value",
        volume=F.col("value").cast(DEC), interval_sec=300,
    )
    hour = cascade_rollup(five, ["event_type"], 300, 3600)
    return hour.select(
        "event_type", "bucket_ts", "open", "high", "low", "close",
        "trade_count", F.round(F.col("volume").cast("double"), 6).alias("volume"),
    )


@query(
    "ohlcv_cascade_1M",
    survey="§2.4 A1 full 14-interval registry (004:67-81) — the "
    "non-multiple calendar cascade: 1d buckets → calendar months",
    description="Calendar-month candles cascaded from the 1d rollup",
    oracle="""
SELECT
  event_type,
  time_bucket(INTERVAL '1 month', ts) AS bucket_ts,
  min_by(value, ts) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  max_by(value, ts) AS close,
  COUNT(*) AS trade_count,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE), 6) AS volume
FROM events
GROUP BY event_type, bucket_ts
""",
)
def ohlcv_cascade_1M(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1M is the one interval a fixed-width bucket can't express —
    ``date_trunc('month')`` on the day rollup's bucket. The oracle
    aggregates raw directly, so a hash match proves the 1d→1M cascade
    law holds across a month boundary (every day belongs to exactly one
    month — lossless)."""
    e = _events(spark, sf_dir)
    day = ohlcv_rollup(
        e, ["event_type"], "ts", "value",
        volume=F.col("value").cast(DEC), interval_sec=86400,
    )
    month = cascade_rollup(day, ["event_type"], 86400, "month")
    return month.select(
        "event_type", "bucket_ts", "open", "high", "low", "close",
        "trade_count", F.round(F.col("volume").cast("double"), 6).alias("volume"),
    )


@query(
    "meta_join_1h",
    survey="§2.3 J1 + §1.1 candles_meta (006_candles_meta_views.sql:29-93)",
    description="1h candles LEFT JOIN 1h size-metrics + amplitude/vwap derived cols",
    bench=True,
    oracle="""
WITH candles AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS open,
    MAX(value) AS high,
    MIN(value) AS low,
    max_by(value, ts) AS close,
    COUNT(*) AS trade_count
  FROM events GROUP BY 1, 2
), metrics AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))
           * CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(18,2)))
         AS DOUBLE), 6) AS flow_k,
    ROUND(CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(18,2)))
         AS DOUBLE), 6) AS size_k,
    max_by(CAST(json_extract_string(props, '$.k') AS DOUBLE), ts) AS last_k
  FROM events GROUP BY 1, 2
)
SELECT
  c.event_type, c.bucket_ts, c.open, c.high, c.low, c.close, c.trade_count,
  m.flow_k, m.size_k, m.last_k,
  AMP_EXPR AS amplitude_ratio,
  VWAP_EXPR AS vwap
FROM candles c
LEFT JOIN metrics m
  ON c.event_type = m.event_type AND c.bucket_ts = m.bucket_ts
""".replace(
        "AMP_EXPR",
        ratio6_sql(
            "CAST(ROUND((c.high - c.low) * 100) AS BIGINT)",
            cents_sql("c.close"),
        ),
    ).replace(
        "VWAP_EXPR",
        ratio6_sql(cents_sql("m.flow_k"), "CAST(m.size_k AS BIGINT) * 100"),
    ),
)
def meta_join_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference VIEW is a LEFT JOIN of two 1h aggregates (the
    oracle keeps that form verbatim), but both sides group the SAME
    events scan by the SAME (event_type, bucket) keys — identical
    grouping sets, so every candle group joins exactly one metrics
    group and the join is row-for-row a single combined aggregation.
    Computing all eight aggregates in ONE groupBy (guide §2.4: two
    operations keyed the same way share one exchange — here they
    collapse outright) replaces 2 scans + 3 shuffles (two partial-agg
    exchanges + the join's) with 1 scan + 1 shuffle and no join; the
    derived columns mirror 006's amplitude_ratio and vwap exactly."""
    e = _events(spark, sf_dir)
    kdec = _k().cast("decimal(18,2)")
    return (
        e.groupBy("event_type", bucket_ts("ts", 3600).alias("bucket_ts"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("trade_count"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)") * kdec).cast("double"), 6).alias("flow_k"),
            F.round(F.sum(kdec).cast("double"), 6).alias("size_k"),
            F.max_by(_k(), "ts").alias("last_k"),
        )
        .withColumn(
            "amplitude_ratio",
            ratio6(
                F.round((F.col("high") - F.col("low")) * 100).cast("long"),
                cents(F.col("close")),
            ),
        )
        .withColumn(
            "vwap",
            ratio6(cents(F.col("flow_k")), F.col("size_k").cast("long") * 100),
        )
    )


# ---------------------------------------------------------------------------
# A3/W1: latest-per-group and top-N-per-group
# ---------------------------------------------------------------------------
@query(
    "latest_event_per_user",
    survey="§2.4 A3 DISTINCT ON (async_full_engine.py:86-95)",
    description="Latest event per user (aggregate form, no sort)",
    oracle="""
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return latest_per_group(e, ["user_id"], "ts").select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


@query(
    "top3_events_per_user",
    survey="§2.5 W1 top-N-per-group (db/cache.py:68-81)",
    description="Last 3 events per user — the ≤500-bar window-cache scan",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
  FROM events
) WHERE rn <= 3
""",
)
def top3_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return topn_per_group(e, ["user_id"], "ts", 3).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# S5/S6: gap detection
# ---------------------------------------------------------------------------
@query(
    "lead_gaps_10m",
    survey="§2.1 S6 LEAD gap detector (adapters/timescale.py:215-225)",
    description="Adjacent-event gaps > 10 minutes per event_type",
    oracle="""
SELECT event_type, gap_start, gap_end, ROUND(gap_sec_raw, 3) AS gap_sec
FROM (
  SELECT
    event_type,
    ts AS gap_start,
    LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts) AS gap_end,
    epoch(LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts)) - epoch(ts)
      AS gap_sec_raw
  FROM events
) WHERE gap_sec_raw > 600
""",
)
def lead_gaps_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    g = lead_gaps(e, ["event_type"], "ts", 600)
    return g.select(
        "event_type", "gap_start", "gap_end", F.round("gap_sec", 3).alias("gap_sec")
    )


@query(
    "calendar_completeness",
    survey="§2.1 S5 gap scanner vs calendar (backfill.py:56-110) + A7",
    description="Per (event_type, day): observed rows vs expected, zero-days included",
    oracle="""
WITH span AS (
  SELECT event_type, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY event_type
), spine AS (
  SELECT s.event_type, CAST(gs.d AS DATE) AS day
  FROM span s, LATERAL (SELECT unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS d) gs
), observed AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_rows
  FROM events GROUP BY 1, 2
)
SELECT
  sp.event_type, strftime(sp.day, '%Y-%m-%d') AS day,
  COALESCE(o.n_rows, 0) AS n_rows,
  250 AS expected_rows,
  COALESCE(o.n_rows, 0) >= 250 AS is_complete
FROM spine sp
LEFT JOIN observed o ON sp.event_type = o.event_type AND sp.day = o.day
""",
)
def calendar_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `day` rendered as 'yyyy-MM-dd' string: Spark DATE → python date vs
    # DuckDB DATE → datetime64 stringify differently in the driver's hash.
    e = _events(spark, sf_dir)
    g = calendar_gaps(e, ["event_type"], "ts", expected_per_day=250)
    return g.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


# ---------------------------------------------------------------------------
# J6: market share window
# ---------------------------------------------------------------------------
@query(
    "daily_market_share",
    survey="§2.3 J6 market share (engine.py:282-332 → one window expr)",
    description="Each event_type's share of total daily flow",
    oracle="""
WITH daily AS (
  SELECT
    event_type,
    CAST(ts AS DATE) AS day,
    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE), 6) AS flow
  FROM events GROUP BY 1, 2
)
SELECT
  event_type, strftime(day, '%Y-%m-%d') AS day, flow,
  SHARE_EXPR AS market_share
FROM daily
""".replace(
        "SHARE_EXPR",
        ratio6_sql(
            cents_sql("flow"),
            f"SUM({cents_sql('flow')}) OVER (PARTITION BY day)",
        ),
    ),
)
def daily_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 6).alias("flow")
    )
    w = Window.partitionBy("day")
    return daily.select(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"), "flow",
        ratio6(cents(F.col("flow")), F.sum(cents(F.col("flow"))).over(w))
        .alias("market_share"),
    )


# ---------------------------------------------------------------------------
# J5: as-of join
# ---------------------------------------------------------------------------
@query(
    "asof_purchase_context",
    survey="§2.3 J5 as-of alignment (006_candles_meta_views.sql:53-67)",
    description="Each purchase joined to the user's most recent prior non-purchase event",
    oracle="""
SELECT
  p.user_id, p.event_id, p.ts, p.value,
  o.value AS asof_value,
  o.ts AS asof_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') o
  ON p.user_id = o.user_id AND p.ts >= o.ts
""",
)
def asof_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark has no native ASOF JOIN; the union-and-backfill operator
    (operators/asof.py) expresses it with one (key, ts) sort and no
    pairwise explosion. The oracle uses DuckDB's native ASOF JOIN."""
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    others = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, others, ["user_id"], "ts", "ts", ["value"])
    return out.select(
        "user_id", "event_id", "ts", "value",
        F.col("asof_value"), F.col("asof_ts"),
    )


# ---------------------------------------------------------------------------
# S3: partial-bar upsert merge
# ---------------------------------------------------------------------------
@query(
    "partial_bar_merge",
    survey="§2.1 S3 upsert merge law (001_timescaledb.sql:106-119)",
    description="MERGE of a partial-bar batch into closed daily bars "
    "(GREATEST/LEAST/is_closed semantics)",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS mx_ts FROM events),
tgt AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 day', ts) AS bucket_ts,
    min_by(value, ts) AS open, MAX(value) AS high, MIN(value) AS low,
    max_by(value, ts) AS close, COUNT(*) AS trade_count,
    time_bucket(INTERVAL '1 day', ts) < (SELECT mx_ts FROM mx) - INTERVAL 12 DAY
      AS is_closed
  FROM events, mx
  WHERE ts < mx.mx_ts - INTERVAL 10 DAY
  GROUP BY 1, 2
),
src AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 day', ts) AS bucket_ts,
    min_by(value, ts) AS open, MAX(value) AS high, MIN(value) AS low,
    max_by(value, ts) AS close, COUNT(*) AS trade_count,
    FALSE AS is_closed
  FROM events, mx
  WHERE ts >= mx.mx_ts - INTERVAL 15 DAY
  GROUP BY 1, 2
)
SELECT
  COALESCE(t.event_type, s.event_type) AS event_type,
  COALESCE(t.bucket_ts, s.bucket_ts) AS bucket_ts,
  -- row presence = join-key nullness (bucket_ts is non-null in every
  -- real row), mirroring merge_candles' _t/_s flags exactly: a present
  -- row whose payload column is legitimately NULL must still take the
  -- merge-law branch, never a payload-COALESCE fallback
  CASE WHEN t.bucket_ts IS NOT NULL AND s.bucket_ts IS NOT NULL
       THEN CASE WHEN t.is_closed AND NOT s.is_closed
                 THEN t.open ELSE s.open END
       WHEN t.bucket_ts IS NOT NULL THEN t.open ELSE s.open END AS open,
  CASE WHEN t.bucket_ts IS NOT NULL AND s.bucket_ts IS NOT NULL
       THEN GREATEST(t.high, s.high)
       WHEN t.bucket_ts IS NOT NULL THEN t.high ELSE s.high END AS high,
  CASE WHEN t.bucket_ts IS NOT NULL AND s.bucket_ts IS NOT NULL
       THEN LEAST(t.low, s.low)
       WHEN t.bucket_ts IS NOT NULL THEN t.low ELSE s.low END AS low,
  CASE WHEN t.bucket_ts IS NOT NULL AND s.bucket_ts IS NOT NULL
       THEN s.close
       WHEN t.bucket_ts IS NOT NULL THEN t.close ELSE s.close END AS close,
  CASE WHEN t.bucket_ts IS NOT NULL AND s.bucket_ts IS NOT NULL
       THEN COALESCE(s.trade_count, t.trade_count)
       WHEN t.bucket_ts IS NOT NULL THEN t.trade_count
       ELSE s.trade_count END AS trade_count,
  CASE WHEN t.bucket_ts IS NOT NULL AND s.bucket_ts IS NOT NULL
       THEN t.is_closed OR s.is_closed
       WHEN t.bucket_ts IS NOT NULL THEN t.is_closed
       ELSE s.is_closed END AS is_closed
FROM tgt t
FULL OUTER JOIN src s
  ON t.event_type = s.event_type AND t.bucket_ts = s.bucket_ts
""",
)
def partial_bar_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target = daily bars older than (max_ts − 10d), closed once older
    than 12d; source = a re-ingest batch covering the last 15d (partial,
    open). The overlap window exercises every branch of the merge law.
    On Delta this is exactly ``MERGE INTO`` with the same expressions."""
    e = _events(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("mx_ts"))
    j = e.join(F.broadcast(mx))

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", bucket_ts("ts", 86400).alias("bucket_ts")
        ).agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("trade_count"),
        )

    tgt = daily(
        j.filter(F.col("ts") < F.col("mx_ts") - F.expr("INTERVAL 10 DAYS"))
    ).join(F.broadcast(mx)).withColumn(
        "is_closed",
        F.col("bucket_ts") < F.col("mx_ts") - F.expr("INTERVAL 12 DAYS"),
    ).drop("mx_ts")
    src = daily(
        j.filter(F.col("ts") >= F.col("mx_ts") - F.expr("INTERVAL 15 DAYS"))
    ).withColumn("is_closed", F.lit(False))
    return merge_candles(tgt, src, ["event_type", "bucket_ts"])


@query(
    "ind_tail_runs",
    survey="§2.4 A8 consecutive-run reductions (futures_aggregate.py:68-81): "
    "trailing run length + max run via gaps-and-islands",
    description="Per event_type: trailing and maximal consecutive up-bar runs (1h closes)",
    oracle="""
WITH bars AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
         max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT event_type, bucket_ts, close,
         LAG(close) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS pc
  FROM bars
),
s AS (
  SELECT event_type, bucket_ts,
         CASE WHEN close > pc THEN 1 ELSE 0 END AS up,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn,
         SUM(CASE WHEN close > pc THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY bucket_ts) AS ups
  FROM d WHERE pc IS NOT NULL
),
tail AS (
  SELECT event_type,
         CAST(COUNT(*) FILTER (WHERE up = 1 AND (t0 IS NULL OR bucket_ts > t0))
              AS BIGINT) AS tail_up_run,
         CAST(MAX(n) AS BIGINT) AS n_bars
  FROM (
    SELECT s.*, MAX(CASE WHEN up = 0 THEN bucket_ts END)
                  OVER (PARTITION BY event_type) AS t0,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM s
  ) GROUP BY event_type
),
runs AS (
  SELECT event_type, CAST(COALESCE(MAX(run_len), 0) AS BIGINT) AS max_up_run
  FROM (
    SELECT event_type, rn - ups AS grp, COUNT(*) AS run_len
    FROM s WHERE up = 1 GROUP BY event_type, rn - ups
  ) GROUP BY event_type
)
SELECT t.event_type, t.tail_up_run, r.max_up_run, t.n_bars
FROM tail t JOIN runs r USING (event_type)
""",
)
def ind_tail_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run lengths relationally: rn − cumulative(up) is constant inside a
    run of up-bars (gaps-and-islands), so max-run is a groupBy over that
    key and the trailing run counts up-bars after the last down-bar —
    window + aggregate only, no Python, scales to any key cardinality."""
    e = _events(spark, sf_dir)
    bars = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600)
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    d = bars.select(
        "event_type", "bucket_ts", "close",
        F.lag("close").over(w).alias("pc"),
    ).filter(F.col("pc").isNotNull())
    s = d.select(
        "event_type", "bucket_ts",
        F.when(F.col("close") > F.col("pc"), 1).otherwise(0).alias("up"),
        F.row_number().over(w).alias("rn"),
    ).withColumn("ups", F.sum("up").over(w))
    wp = Window.partitionBy("event_type")
    tail = (
        s.withColumn(
            "t0", F.max(F.when(F.col("up") == 0, F.col("bucket_ts"))).over(wp)
        )
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .groupBy("event_type")
        .agg(
            F.count(
                F.when(
                    (F.col("up") == 1)
                    & (F.col("t0").isNull() | (F.col("bucket_ts") > F.col("t0"))),
                    1,
                )
            ).alias("tail_up_run"),
            F.max("n").alias("n_bars"),
        )
    )
    runs = (
        s.filter(F.col("up") == 1)
        .groupBy("event_type", (F.col("rn") - F.col("ups")).alias("grp"))
        .count()
        .groupBy("event_type")
        .agg(F.coalesce(F.max("count"), F.lit(0)).alias("max_up_run"))
    )
    return tail.join(runs, "event_type").select(
        "event_type", "tail_up_run", "max_up_run", "n_bars"
    )


@query(
    "realtime_union_view",
    survey="§4 real-time continuous-aggregate view: materialized rollup "
    "UNION ALL agg-of-raw-tail (004:49-58 materialized_only=false) — "
    "must equal the direct rollup",
    description="5m candles via materialized-buckets ∪ fresh-tail path",
    oracle=_OHLCV_ORACLE.format(iv=300),
)
def realtime_union_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refresh watermark sits 2 h before max(ts): buckets older than
    it are served from the 'materialized' rollup, newer rows are
    re-aggregated on the fly (partition-pruned to the tail in a
    date-partitioned deployment). The law being graded: the union view
    is indistinguishable from a full rollup — the reference's
    correctness contract for materialized_only=false reads.

    The watermark is computed IN-PLAN: a one-row scalar aggregate
    broadcast-cross-joined onto both union branches (same pattern as
    the latest-bucket probe in q_serving). No driver action, one job,
    and the whole view stays composable as a single logical plan."""
    from tradecat_spark.operators.rollup import realtime_view

    e = _events(spark, sf_dir)
    hz = F.broadcast(
        e.agg(
            (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("_hz")
        )
    )
    ew = e.crossJoin(hz)
    materialized = ohlcv_rollup(
        ew.filter(F.col("ts") < F.col("_hz")),
        ["event_type"], "ts", "value",
        volume=F.col("value").cast(DEC), interval_sec=300,
    )
    view = realtime_view(
        materialized.crossJoin(hz), ew, ["event_type"], "ts", "value",
        interval_sec=300, refresh_horizon=F.col("_hz"),
        volume=F.col("value").cast(DEC),
    )
    return view.select(
        "event_type", "bucket_ts", "open", "high", "low", "close",
        "trade_count",
        F.round(F.col("volume").cast("double"), 6).alias("volume"),
    )


# ---------------------------------------------------------------------------
# §2.4 A2: metrics rollup — last-value OI + weighted long/short ratio
# ---------------------------------------------------------------------------
@query(
    "metrics_weighted_ratio_1h",
    survey="§2.4 A2 metrics cagg (007_metrics_cagg_from_5m.sql:92-107): "
    "last(oi, t) + SUM(numerator)/NULLIF(SUM(denominator),0) weighted "
    "ratio re-derived at the coarser bucket",
    description="1h last-value OI and weighted ratio from 5m-style rows",
    oracle="""
SELECT
  event_type,
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
    AS bucket_ts,
  max_by(value, ts) AS oi_last,
  ROUND(CAST(SUM(CASE WHEN user_id % 2 = 0
                 THEN CAST(ABS(value) AS DECIMAL(18,8)) END) AS DOUBLE)
        / NULLIF(CAST(SUM(CASE WHEN user_id % 2 = 1
                 THEN CAST(ABS(value) AS DECIMAL(18,8)) END) AS DOUBLE), 0),
        6) AS weighted_ratio
FROM events
GROUP BY 1, 2
""",
)
def metrics_weighted_ratio_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's metrics caggs keep ratio NUMERATORS and
    DENOMINATORS as separate sums so coarser buckets re-derive the
    weighted ratio instead of averaging averages. Same here: two exact
    decimal sums per bucket, ratio computed once at read time. The
    `last(oi, t)` ordered-aggregate is `max_by(value, ts)` — one shuffle
    for the whole rollup, and at 100 TB it cascades off the finest
    rollup exactly like A1 (cascade_rollup)."""
    e = _events(spark, sf_dir)
    dec_abs = F.abs("value").cast(DEC)
    num = F.sum(F.when(F.col("user_id") % 2 == 0, dec_abs)).cast("double")
    den = F.sum(F.when(F.col("user_id") % 2 == 1, dec_abs)).cast("double")
    return (
        e.groupBy("event_type", F.window("ts", "1 hour").start.alias("b"))
        .agg(
            F.max_by("value", "ts").alias("oi_last"),
            F.round(num / F.nullif(den, F.lit(0)), 6).alias("weighted_ratio"),
        )
        .select(
            "event_type",
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            "oi_last",
            "weighted_ratio",
        )
    )


# ---------------------------------------------------------------------------
# §2.1 S5→S7: gap islands → backfill task plan
# ---------------------------------------------------------------------------
@query(
    "backfill_plan_days",
    survey="§2.1 S5 gap scanner (backfill.py:56-110 count-vs-expected) "
    "feeding S7's backfill loop: under-filled days coalesced into "
    "contiguous [start, end] download tasks (gaps-and-islands)",
    description="Contiguous under-filled-day ranges per event_type (<60 events/day)",
    oracle="""
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
),
cal AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
c AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
f AS (
  SELECT t.event_type, cal.d, COALESCE(c.n, 0) AS n
  FROM types t CROSS JOIN cal
  LEFT JOIN c ON c.event_type = t.event_type AND c.d = cal.d
),
g AS (
  SELECT event_type, d,
    d - CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
             AS INTEGER) AS grp
  FROM f WHERE n < 60
)
SELECT event_type,
  strftime(MIN(d), '%Y-%m-%d') AS gap_start,
  strftime(MAX(d), '%Y-%m-%d') AS gap_end,
  CAST(COUNT(*) AS BIGINT) AS n_days
FROM g GROUP BY event_type, grp
""",
)
def backfill_plan_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar anti-join catches absent days, the count filter catches
    under-filled ones, and the rank-difference trick (day minus
    row_number is constant within a run) coalesces them into contiguous
    download tasks — the unit of work S7's ZIP backfiller consumes. The
    calendar is generated, never scanned; the only full-table pass is
    the per-day count, which at 100 TB is the date-partition manifest."""
    e = _events(spark, sf_dir)
    counts = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = e.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    types = e.select("event_type").distinct()
    full = types.crossJoin(F.broadcast(cal)).join(
        counts, ["event_type", "d"], "left"
    )
    gaps = full.filter(F.coalesce(F.col("n"), F.lit(0)) < 60)
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("d")
    )
    g = gaps.withColumn("grp", F.date_sub("d", rn))
    return (
        g.groupBy("event_type", "grp")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("gap_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("gap_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("grp")
    )


@query(
    "metrics_cascade_1d",
    survey="§2.4 A2 metrics cagg cascade (007_metrics_cagg_from_5m.sql "
    "registers 15m/1h/4h/1d/1w all re-aggregable because they keep "
    "last(oi) + ratio numerator/denominator sums): 1d derived FROM the "
    "1h rollup must equal 1d computed directly from raw",
    description="Daily last-value OI and weighted ratio cascaded from the 1h rollup",
    oracle="""
SELECT
  event_type,
  strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
  max_by(value, ts) AS oi_last,
  ROUND(CAST(SUM(CASE WHEN user_id % 2 = 0
                 THEN CAST(ABS(value) AS DECIMAL(18,8)) END) AS DOUBLE)
        / NULLIF(CAST(SUM(CASE WHEN user_id % 2 = 1
                 THEN CAST(ABS(value) AS DECIMAL(18,8)) END) AS DOUBLE), 0),
        6) AS weighted_ratio
FROM events
GROUP BY 1, 2
""",
)
def metrics_cascade_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cascade law for metrics rollups, verified cross-engine: the
    Spark side builds 1d FROM the 1h rollup (last-of-last via max_by on
    the finer bucket; DECIMAL numerator/denominator sums re-summed —
    associative, so cascade == direct), while the oracle computes 1d
    straight from raw. At 100 TB the 1h input is ~1e3× smaller than
    raw — the same re-aggregation chain the reference runs nightly."""
    from tradecat_spark.operators.rollup import bucket_ts, metrics_rollup

    e = _events(spark, sf_dir)
    dec_abs = F.abs("value").cast(DEC)
    h = metrics_rollup(
        e, ["event_type"], "ts", "value",
        num=F.when(F.col("user_id") % 2 == 0, dec_abs),
        den=F.when(F.col("user_id") % 2 == 1, dec_abs),
        interval_sec=3600,
    )
    d = h.groupBy(
        "event_type", bucket_ts("bucket_ts", 86400).alias("day")
    ).agg(
        F.max_by("last_value", "bucket_ts").alias("oi_last"),
        F.sum("num_sum").alias("num"),
        F.sum("den_sum").alias("den"),
    )
    return d.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "oi_last",
        F.round(
            F.col("num").cast("double")
            / F.nullif(F.col("den").cast("double"), F.lit(0.0)),
            6,
        ).alias("weighted_ratio"),
    )


@query(
    "asof_direction_variants",
    survey="§2.3 J5 as-of alignment, full merge_asof direction surface "
    "(operators/asof.py): backward / forward / nearest (ties prefer "
    "backward) — all three from the one union-and-fill pass",
    description="Each purchase aligned to prior / next / nearest other event",
    oracle="""
WITH p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
o AS (
  SELECT user_id, ts FROM events WHERE event_type <> 'purchase'
),
b AS (
  SELECT p.user_id, p.event_id, p.ts, o.ts AS b_ts
  FROM p ASOF LEFT JOIN o
    ON p.user_id = o.user_id AND p.ts >= o.ts
),
f AS (
  SELECT p.user_id, p.event_id, o.ts AS f_ts
  FROM p ASOF LEFT JOIN o
    ON p.user_id = o.user_id AND p.ts <= o.ts
)
SELECT b.user_id, b.event_id,
  epoch_us(b.ts) AS ts_us,
  epoch_us(b.b_ts) AS bwd_us,
  epoch_us(f.f_ts) AS fwd_us,
  CASE
    WHEN f.f_ts IS NULL THEN epoch_us(b.b_ts)
    WHEN b.b_ts IS NULL THEN epoch_us(f.f_ts)
    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
         <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN epoch_us(b.b_ts)
    ELSE epoch_us(f.f_ts)
  END AS nearest_us
FROM b JOIN f USING (user_id, event_id)
""",
)
def asof_direction_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward / forward / nearest alignments of each purchase against
    the user's other events. Only timestamps are emitted, so the result
    is tie-proof (a direction's chosen instant is unique even when
    several right rows share it); the oracle composes DuckDB's native
    ASOF in both directions plus the tie-prefers-backward CASE."""
    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    o = e.filter(F.col("event_type") != "purchase").select("user_id", "ts")
    b = asof_join(p, o, ["user_id"], "ts", "ts", []).select(
        "user_id", "event_id", "ts", F.col("asof_ts").alias("b_ts")
    )
    f = asof_join(
        p, o, ["user_id"], "ts", "ts", [], direction="forward"
    ).select("event_id", F.col("asof_ts").alias("f_ts"))
    n = asof_join(
        p, o, ["user_id"], "ts", "ts", [], direction="nearest"
    ).select("event_id", F.col("asof_ts").alias("n_ts"))
    out = b.join(f, "event_id").join(n, "event_id")
    return out.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("b_ts").alias("bwd_us"),
        F.unix_micros("f_ts").alias("fwd_us"),
        F.unix_micros("n_ts").alias("nearest_us"),
    )


@query(
    "gapfill_locf_1h",
    survey="§2.4 A7-adjacent: time_bucket_gapfill + locf — the "
    "TimescaleDB dense-calendar forward-fill "
    "(004_continuous_aggregates.sql consumers render gapless series), "
    "as a generated hourly spine + LAST_VALUE IGNORE NULLS",
    description="Dense hourly close series per event_type, LOCF-filled "
    "with fill provenance",
    oracle="""
WITH bars AS (
  SELECT event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
  FROM bars GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
    AS bucket_ts
  FROM bounds
),
joined AS (
  SELECT s.event_type, s.bucket_ts, b.close
  FROM spine s LEFT JOIN bars b USING (event_type, bucket_ts)
)
SELECT event_type, bucket_ts,
  LAST_VALUE(close IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY bucket_ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
  close IS NULL AS is_filled
FROM joined
""",
)
def gapfill_locf_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gapfill spine generates per-key (sequence between the key's
    own min and max bucket — no global calendar join), so spine size is
    O(span/interval) per key and the left join is co-keyed. The fill is
    one window pass with last_value(ignoreNulls=True); close values
    are selections (max_by), so the filled series is exact on both
    engines. ``is_filled`` keeps provenance — downstream consumers can
    tell observation from carry-forward (the locf contract)."""
    e = load_table(spark, sf_dir, "events")
    bars = ohlcv_rollup(
        e, ["event_type"], "ts", "value", interval_sec=3600
    ).select("event_type", "bucket_ts", "close")
    bounds = bars.groupBy("event_type").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket_ts"),
    )
    joined = spine.join(bars, ["event_type", "bucket_ts"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type", "bucket_ts",
        F.last("close", ignorenulls=True).over(w).alias("close_filled"),
        F.col("close").isNull().alias("is_filled"),
    )
