"""Serving-layer queries (SURVEY.md §3.1/§2.1 S14/S15, Phase 3).

The reference serves rankings/panels/REST responses by re-filtering the
SQLite indicator tables in Python per request (telegram-service cards,
api-service routers, ai-service fetcher). Each shape collapses to one
declarative Spark query here:

- ranking card  = latest-snapshot filter (P7) + period filter (P4) +
  broadcast base-data join (J3) + orderBy/limit (W10)
- single-token panel = J4 star-gather: one latest row from every
  "indicator table" for one key, UNION ALLed into a tall panel
- REST endpoints = time-range + DESC limit scans (S14)
- A4 global totals over latest-per-group, A6 percentile/stddev rollups

Scale notes: every query keys on low-cardinality dimensions with
partial aggregation; the serving join sides (latest snapshot, base
stats) are tiny and broadcast. Nothing here shuffles the raw fact table
more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.operators.latest import latest_per_group
from tradecat_spark.operators.rollup import ohlcv_rollup
from tradecat_spark.plans.registry import query

DEC = "decimal(18,8)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _flow6(col: str = "value") -> F.Column:
    """Exact decimal sum of |value| rendered as a 6dp double."""
    return F.round(F.sum(F.abs(F.col(col)).cast(DEC)).cast("double"), 6)


FLOW6_SQL = "ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6)"


# ---------------------------------------------------------------------------
# §3.1 ranking card: P7 latest snapshot + P4 period + J3 base join + W10 top-N
# ---------------------------------------------------------------------------
@query(
    "ranking_card_1h",
    survey="§3.1 ranking card: P7 latest-batch + P4 period filter + J3 base-data "
    "join + W10 top-N (cards/data_provider.py:412-543, 排行榜服务.py:146-168)",
    description="Top-10 user ranking card on the latest 1h snapshot, joined to base stats",
    oracle="""
WITH ind AS (  -- the "indicator table": per (user, 1h bucket) metrics
  SELECT
    user_id,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    max_by(value, ts) AS close,
    ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6) AS flow,
    COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
latest AS (  -- P7: consistent snapshot at the table-max bucket
  SELECT * FROM ind WHERE bucket_ts = (SELECT MAX(bucket_ts) FROM ind)
),
base AS (    -- J3 base-data table: whole-history per-user stats
  SELECT
    user_id,
    COUNT(*) AS total_events,
    ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6) AS total_flow
  FROM events GROUP BY user_id
)
SELECT
  l.user_id, strftime(l.bucket_ts, '%Y-%m-%d %H:%M:%S') AS snapshot_ts,
  l.close, l.flow, l.n_events,
  b.total_events, b.total_flow
FROM latest l JOIN base b USING (user_id)
ORDER BY l.flow DESC, l.user_id LIMIT 10
""",
)
def ranking_card_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot side after the P7 filter is ≤ |users| rows and the
    base side is an aggregate of the same scan — Catalyst broadcasts
    both ends of the join; the final top-10 is TakeOrderedAndProject."""
    e = _events(spark, sf_dir)
    ind = e.groupBy(
        "user_id", F.window("ts", "1 hour").start.alias("bucket_ts")
    ).agg(
        F.max_by("value", "ts").alias("close"),
        _flow6().alias("flow"),
        F.count(F.lit(1)).alias("n_events"),
    )
    mx = ind.agg(F.max("bucket_ts").alias("mx"))
    latest = ind.join(F.broadcast(mx), on=ind["bucket_ts"] == mx["mx"]).drop("mx")
    base = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        _flow6().alias("total_flow"),
    )
    return (
        latest.join(base, "user_id")
        .select(
            "user_id",
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("snapshot_ts"),
            "close", "flow", "n_events", "total_events", "total_flow",
        )
        .orderBy(F.desc("flow"), "user_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §3.1 single-token panel: J4 star-gather across "indicator tables"
# ---------------------------------------------------------------------------
@query(
    "single_token_panel",
    survey="§2.3 J4 all-tables gather for one symbol (sqlite_engine.py:193-200, "
    "bot/single_token_txt.py:334-430) — N point-lookups → one UNION ALL",
    description="Latest row of each interval 'indicator table' for event_type='purchase'",
    oracle="""
WITH src AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT * FROM (
  SELECT 'candles_1h' AS panel_table,
         strftime(MAX(time_bucket(INTERVAL '1 hour', ts)), '%Y-%m-%d %H:%M:%S') AS ts,
         max_by(value, ts) AS close,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM src WHERE time_bucket(INTERVAL '1 hour', ts)
    = (SELECT MAX(time_bucket(INTERVAL '1 hour', ts)) FROM src)
  UNION ALL
  SELECT 'candles_4h',
         strftime(MAX(time_bucket(INTERVAL '4 hours', ts)), '%Y-%m-%d %H:%M:%S'),
         max_by(value, ts), COUNT(*)
  FROM src WHERE time_bucket(INTERVAL '4 hours', ts)
    = (SELECT MAX(time_bucket(INTERVAL '4 hours', ts)) FROM src)
  UNION ALL
  SELECT 'candles_1d',
         strftime(MAX(time_bucket(INTERVAL '1 day', ts)), '%Y-%m-%d %H:%M:%S'),
         max_by(value, ts), COUNT(*)
  FROM src WHERE time_bucket(INTERVAL '1 day', ts)
    = (SELECT MAX(time_bucket(INTERVAL '1 day', ts)) FROM src)
)
""",
)
def single_token_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference does N SQLite point-lookups per panel; here each
    'table' is the latest bucket of an interval rollup for the one key,
    and the gather is a UNION ALL of 1-row aggregates — each branch
    prunes to the single filtered key before aggregating."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    parts = []
    for name, iv in [("candles_1h", "1 hour"), ("candles_4h", "4 hours"),
                     ("candles_1d", "1 day")]:
        bucketed = e.select(
            F.window("ts", iv).start.alias("b"), "ts", "value"
        )
        mx = bucketed.agg(F.max("b").alias("mx"))
        parts.append(
            bucketed.join(F.broadcast(mx), on=bucketed["b"] == mx["mx"])
            .agg(
                F.lit(name).alias("panel_table"),
                F.date_format(F.max("b"), "yyyy-MM-dd HH:mm:ss").alias("ts"),
                F.max_by("value", "ts").alias("close"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# §2.1 S14 REST shapes
# ---------------------------------------------------------------------------
@query(
    "rest_ohlc_history",
    survey="§2.1 S14 OHLC history endpoint (api-service routers/ohlc.py:37-55): "
    "time-range predicate + ORDER BY DESC LIMIT",
    description="Last 100 hourly OHLC bars for event_type='purchase'",
    oracle="""
SELECT
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  open, high, low, close, trade_count
FROM (
  SELECT
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close,
    CAST(COUNT(*) AS BIGINT) AS trade_count
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
) ORDER BY bucket_ts DESC LIMIT 100
""",
)
def rest_ohlc_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The symbol filter pushes into the parquet scan; the DESC limit is
    TakeOrderedAndProject over the (small) rollup output."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    bars = ohlcv_rollup(e, [], "ts", "value", interval_sec=3600)
    return (
        bars.orderBy(F.desc("bucket_ts"))
        .limit(100)
        .select(
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            "open", "high", "low", "close", "trade_count",
        )
    )


@query(
    "rest_supported_coins",
    survey="§2.1 S14 supported-coins DISTINCT endpoint (routers/coins.py:117)",
    description="Every event_type with row count, user count, first/last ts",
    oracle="""
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events GROUP BY event_type
""",
)
def rest_supported_coins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


@query(
    "rest_oi_history",
    survey="§2.1 S14 open-interest history (routers/open_interest.py:37-50) + "
    "§2.4 A2 last(value,t) metrics rollup (007_metrics_cagg_from_5m.sql:92-107)",
    description="Last 50 hourly last-value snapshots for event_type='view'",
    oracle="""
SELECT
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  last_value, n_samples
FROM (
  SELECT
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    max_by(value, ts) AS last_value,
    CAST(COUNT(*) AS BIGINT) AS n_samples
  FROM events WHERE event_type = 'view'
  GROUP BY 1
) ORDER BY bucket_ts DESC LIMIT 50
""",
)
def rest_oi_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    snap = e.groupBy(F.window("ts", "1 hour").start.alias("bucket_ts")).agg(
        F.max_by("value", "ts").alias("last_value"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    return (
        snap.orderBy(F.desc("bucket_ts"))
        .limit(50)
        .select(
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            "last_value", "n_samples",
        )
    )


# ---------------------------------------------------------------------------
# §2.4 A4 global totals over latest-per-group
# ---------------------------------------------------------------------------
@query(
    "global_totals_latest",
    survey="§2.4 A4 global totals over DISTINCT-ON latest rows "
    "(core/engine.py:294-315)",
    description="Per event_type: sum/count of each user's LATEST value",
    oracle="""
WITH latest AS (
  SELECT DISTINCT ON (event_type, user_id) event_type, user_id, value
  FROM events ORDER BY event_type, user_id, ts DESC
)
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE), 6) AS total_latest
FROM latest GROUP BY event_type
""",
)
def global_totals_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latest-per-group as a max_by aggregate (no window sort), then a
    second tiny aggregate — two map-combinable shuffles, no row explosion."""
    e = _events(spark, sf_dir)
    latest = latest_per_group(
        e.select("event_type", "user_id", "ts", "value"),
        ["event_type", "user_id"], "ts",
    )
    return latest.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 6).alias(
            "total_latest"
        ),
    )


# ---------------------------------------------------------------------------
# §2.4 A6 percentile / stddev rollup
# ---------------------------------------------------------------------------
@query(
    "stats_profile_by_type",
    survey="§2.4 A6 order-book style stats rollup (03_raw_crypto.sql:391-460): "
    "AVG/MAX/MIN, PERCENTILE, STDDEV — exact cross-engine formulation",
    description="Per event_type: count, exact mean/min/max, discrete p95, sample stddev",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
agg AS (
  SELECT
    event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
    CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS sq,
    MIN(cents) AS mn,
    MAX(cents) AS mx,
    quantile_disc(cents, 0.95) AS p95c
  FROM c GROUP BY event_type
)
SELECT
  event_type, n,
  ROUND(CAST(s AS DOUBLE) / n / 100.0, 6) AS mean_value,
  mn / 100.0 AS min_value,
  mx / 100.0 AS max_value,
  p95c / 100.0 AS p95_value,
  ROUND(sqrt((CAST(sq AS DOUBLE) * n - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * (n - 1))) / 100.0, 6) AS stddev_value
FROM agg
""",
)
def stats_profile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactness strategy: scale to integer cents so SUM/SUMSQ are exact
    in DECIMAL(38,0) regardless of partition order, then derive
    mean/stddev in double with a fixed operation sequence both engines
    share. p95 is the DISCRETE percentile (an actual data value at
    rank ceil(0.95 n)) — interpolated percentiles differ in ulps across
    engines, rank-based ones cannot."""
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long").alias("cents")
    c = e.select("event_type", cents)
    d38 = "decimal(38,0)"
    agg = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(d38)).cast(d38).alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).cast(d38).alias("sq"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        # discrete p95: smallest value whose rank >= ceil(0.95*n).
        # percentile(..., frequency) is interpolated in Spark, so sort the
        # exact integer multiset and index it — JVM-side, no UDF.
        F.element_at(
            F.array_sort(F.collect_list("cents")),
            F.ceil(F.count(F.lit(1)) * 0.95).cast("int"),
        ).alias("p95c"),
    )
    n = F.col("n")
    sd = F.col("s").cast("double")
    sqd = F.col("sq").cast("double")
    return agg.select(
        "event_type", "n",
        F.round(sd / n / 100.0, 6).alias("mean_value"),
        (F.col("mn") / 100.0).alias("min_value"),
        (F.col("mx") / 100.0).alias("max_value"),
        (F.col("p95c") / 100.0).alias("p95_value"),
        F.round(
            F.sqrt((sqd * n - sd * sd) / (n.cast("double") * (n - 1))) / 100.0, 6
        ).alias("stddev_value"),
    )


# ---------------------------------------------------------------------------
# §3.3 AI-context snapshot + P3 freshness gate
# ---------------------------------------------------------------------------
@query(
    "ai_context_snapshot",
    survey="§3.3 AI context assembly (ai-service/src/data/fetcher.py:53-353): "
    "per (symbol, interval) the latest rollup row via HAVING ts=MAX",
    description="Latest 1h/4h/1d bucket per event_type with close and flow",
    oracle="""
SELECT event_type, interval_label,
       strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts, close, flow
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type, interval_label ORDER BY bucket_ts DESC) AS rn
  FROM (
    SELECT event_type, '1h' AS interval_label,
           time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
           max_by(value, ts) AS close,
           ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6) AS flow
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT event_type, '4h',
           time_bucket(INTERVAL '4 hours', ts),
           max_by(value, ts),
           ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6)
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT event_type, '1d',
           time_bucket(INTERVAL '1 day', ts),
           max_by(value, ts),
           ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6)
    FROM events GROUP BY 1, 3
  )
) WHERE rn = 1
""",
)
def ai_context_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    parts = []
    for label, iv in [("1h", "1 hour"), ("4h", "4 hours"), ("1d", "1 day")]:
        parts.append(
            e.groupBy(
                "event_type", F.window("ts", iv).start.alias("bucket_ts")
            )
            .agg(F.max_by("value", "ts").alias("close"), _flow6().alias("flow"))
            .withColumn("interval_label", F.lit(label))
        )
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    latest = latest_per_group(allb, ["event_type", "interval_label"], "bucket_ts")
    return latest.select(
        "event_type", "interval_label",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "close", "flow",
    )


@query(
    "ai_context_assembly",
    survey="§3.3 AI context assembly, full shape "
    "(ai-service/src/data/fetcher.py:53-353): for EVERY (symbol, "
    "interval, indicator-table) the latest row — the reference's "
    "per-table `GROUP BY 周期 HAVING 数据时间=MAX(数据时间)` loop as ONE "
    "Spark pass (closes the r3 'multi-interval HAVING-max not "
    "registered' gap; ai_context_snapshot covers intervals only)",
    description="Latest row per (symbol, interval, indicator table): "
    "3 intervals × 3 tables matrix",
    oracle=f"""
WITH b AS (
  SELECT event_type, interval_label, bucket_ts, close, flow, hi, lo
  FROM (
    SELECT event_type, '1h' AS interval_label,
           time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
           max_by(value, ts) AS close, {FLOW6_SQL} AS flow,
           MAX(value) AS hi, MIN(value) AS lo
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT event_type, '4h',
           time_bucket(INTERVAL '4 hours', ts),
           max_by(value, ts), {FLOW6_SQL}, MAX(value), MIN(value)
    FROM events GROUP BY 1, 3
    UNION ALL
    SELECT event_type, '1d',
           time_bucket(INTERVAL '1 day', ts),
           max_by(value, ts), {FLOW6_SQL}, MAX(value), MIN(value)
    FROM events GROUP BY 1, 3
  )
),
latest AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY event_type, interval_label
      ORDER BY bucket_ts DESC) AS rn,
    CAST(COUNT(*) OVER (PARTITION BY event_type, interval_label)
      AS BIGINT) AS n_buckets
  FROM b
)
SELECT event_type, interval_label, t.panel_table,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS data_ts,
  CASE t.panel_table WHEN 'candles' THEN close
                     WHEN 'volume' THEN flow
                     ELSE hi - lo END AS main_value,
  n_buckets
FROM latest, (SELECT UNNEST(['candles', 'volume', 'range'])
              AS panel_table) t
WHERE rn = 1
""",
)
def ai_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference loops over every SQLite indicator table running
    ``GROUP BY 周期 HAVING 数据时间=MAX(...)`` per table (fetcher.py:
    116-129 of the shape cited above) — N tables × M intervals point
    queries. Spark-first that collapses to: one multi-interval rollup
    union, ONE window pass marking each (symbol, interval)'s latest
    bucket, then ``stack`` unpivots the indicator families into
    one-row-per-table — the same output contract (each table's latest
    row per interval) with a single scan of the fact table and no
    driver-side loop. Every value column is order-independent
    (max_by/decimal-sum/min/max), so the driver hash is stable."""
    e = _events(spark, sf_dir)
    parts = []
    for label, iv in [("1h", "1 hour"), ("4h", "4 hours"), ("1d", "1 day")]:
        parts.append(
            e.groupBy(
                "event_type", F.window("ts", iv).start.alias("bucket_ts")
            )
            .agg(
                F.max_by("value", "ts").alias("close"),
                _flow6().alias("flow"),
                F.max("value").alias("hi"),
                F.min("value").alias("lo"),
            )
            .withColumn("interval_label", F.lit(label))
        )
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    grp = Window.partitionBy("event_type", "interval_label")
    latest = (
        allb.withColumn(
            "n_buckets", F.count(F.lit(1)).over(grp).cast("bigint")
        )
        .withColumn(
            "rn",
            F.row_number().over(grp.orderBy(F.desc("bucket_ts"))),
        )
        .filter(F.col("rn") == 1)
    )
    return latest.selectExpr(
        "event_type", "interval_label",
        "stack(3, 'candles', close, 'volume', flow, 'range', hi - lo)"
        " AS (panel_table, main_value)",
        "date_format(bucket_ts, 'yyyy-MM-dd HH:mm:ss') AS data_ts",
        "n_buckets",
    ).select(
        "event_type", "interval_label", "panel_table", "data_ts",
        "main_value", "n_buckets",
    )


@query(
    "freshness_gate",
    survey="§2.2 P2/P3 freshness filter (sqlite_engine.py:138-147, "
    "pg_engine.py:510-519): drop rows older than 1.5× interval",
    description="Rows within 90 min of each type's max ts: count + flow",
    oracle="""
WITH mx AS (SELECT event_type, MAX(ts) AS max_ts FROM events GROUP BY event_type)
SELECT
  e.event_type,
  CAST(COUNT(*) AS BIGINT) AS fresh_rows,
  ROUND(CAST(SUM(CAST(ABS(e.value) AS DECIMAL(18,8))) AS DOUBLE), 6) AS fresh_flow
FROM events e JOIN mx ON e.event_type = mx.event_type
WHERE e.ts >= mx.max_ts - INTERVAL 90 MINUTE
GROUP BY e.event_type
""",
)
def freshness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The max-ts side is |types| rows — broadcast; the range predicate
    then prunes at the scan on a date-partitioned deployment."""
    e = _events(spark, sf_dir)
    mx = e.groupBy("event_type").agg(F.max("ts").alias("max_ts"))
    return (
        e.join(F.broadcast(mx), "event_type")
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 90 MINUTES"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("fresh_rows"),
            _flow6().alias("fresh_flow"),
        )
    )


@query(
    "orderbook_l1_stats",
    survey="§2.1 S12 order-book L1 projections (order_book.py:120-240) + "
    "§2.4 A6 hourly stats rollup (03_raw_crypto.sql:391-460)",
    description="Hourly spread/imbalance stats over a deterministic synthetic L1 book",
    oracle="""
WITH ticks AS (  -- deterministic book synthesized from the event stream
  SELECT
    event_type, ts,
    value - ABS(value) * 0.0001 * (1 + user_id % 3) AS bid_price,
    value + ABS(value) * 0.0001 * (1 + user_id % 5) AS ask_price,
    CAST(event_id % 7 + 1 AS DOUBLE) AS bid_qty,
    CAST(event_id % 5 + 1 AS DOUBLE) AS ask_qty
  FROM events
),
l1 AS (
  SELECT
    event_type, ts,
    (bid_price + ask_price) / 2 AS mid,
    ask_price - bid_price AS spread,
    -- per-row ROUND: engines may contract the mul/div chain into FMA,
    -- drifting single rows by an ulp; extremes mask it, the discrete
    -- median does not (found by the sf0.1 sweep)
    ROUND(CASE WHEN (bid_price + ask_price) / 2 > 0
         THEN (ask_price - bid_price) / ((bid_price + ask_price) / 2) * 10000
    END, 6) AS spread_bps,
    CASE WHEN bid_qty + ask_qty > 0
         THEN (bid_qty - ask_qty) / (bid_qty + ask_qty) END AS imbalance
  FROM ticks
)
SELECT
  event_type,
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  CAST(COUNT(*) AS BIGINT) AS n_ticks,
  MIN(spread_bps) AS min_spread_bps,
  MAX(spread_bps) AS max_spread_bps,
  quantile_disc(spread_bps, 0.5) AS med_spread_bps,
  MIN(imbalance) AS min_imbalance,
  MAX(imbalance) AS max_imbalance
FROM l1
GROUP BY 1, 2
""",
)
def orderbook_l1_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives sources.orderbook.l1_projection (the real ingest-time
    projection operator) over a synthesized book, then the A6 stats
    shape. Only order-independent aggregates (count/min/max/discrete
    median) so floats compare exactly across engines; interpolated
    percentiles and double-sum averages would not."""
    from tradecat_spark.sources.orderbook import l1_projection

    e = _events(spark, sf_dir)
    ticks = e.select(
        "event_type", "ts",
        (F.col("value") - F.abs("value") * 0.0001 * (1 + F.col("user_id") % 3))
        .alias("bid_price"),
        (F.col("value") + F.abs("value") * 0.0001 * (1 + F.col("user_id") % 5))
        .alias("ask_price"),
        (F.col("event_id") % 7 + 1).cast("double").alias("bid_qty"),
        (F.col("event_id") % 5 + 1).cast("double").alias("ask_qty"),
    )
    # per-row round BEFORE aggregating: FMA contraction can drift a
    # single row's spread by an ulp across engines; extremes mask it,
    # the discrete median does not (sf0.1 sweep finding)
    l1 = l1_projection(ticks).withColumn(
        "spread_bps", F.round("spread_bps", 6)
    )
    agg = l1.groupBy(
        "event_type", F.window("ts", "1 hour").start.alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.min("spread_bps").alias("min_spread_bps"),
        F.max("spread_bps").alias("max_spread_bps"),
        F.element_at(  # discrete median: element at rank ceil(n/2)
            F.array_sort(F.collect_list("spread_bps")),
            F.ceil(F.count(F.lit(1)) / 2).cast("int"),
        ).alias("med_spread_bps"),
        F.min("imbalance").alias("min_imbalance"),
        F.max("imbalance").alias("max_imbalance"),
    )
    return agg.select(
        "event_type",
        F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "n_ticks", "min_spread_bps", "max_spread_bps", "med_spread_bps",
        "min_imbalance", "max_imbalance",
    )


# ---------------------------------------------------------------------------
# §2.1 S9 retention trim / sliding-window retention
# ---------------------------------------------------------------------------
@query(
    "serving_retention_trim",
    survey="§2.1 S9 per-key retention trim (db/reader.py:298-332 retention "
    "dict) + §2.11 sliding-window retention (006_candles_meta_views.sql:"
    "153-174): keep last-N rows per key, report the delete set",
    description="Per-event_type retention audit: cap, rows kept/trimmed, horizon",
    oracle="""
WITH r AS (
  SELECT event_type, ts, event_id,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY ts DESC, event_id DESC) AS rn,
    60 + 20 * length(event_type) AS cap
  FROM events
)
SELECT
  event_type,
  CAST(MIN(cap) AS BIGINT) AS cap,
  CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(CASE WHEN rn > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
  strftime(MIN(CASE WHEN rn <= cap THEN ts END),
           '%Y-%m-%d %H:%M:%S') AS oldest_kept_ts
FROM r GROUP BY event_type
""",
)
def serving_retention_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference trims each serving table to a per-key row budget
    after every write (DELETE … NOT IN (SELECT … ORDER BY ts DESC LIMIT
    n)). Spark form: rank rows per key newest-first and everything past
    the cap is the delete set — here surfaced as an audit so the verify
    driver can hash it; the actual trim is `DELETE WHERE` on the same
    predicate (partition-drop for date-partitioned tables). The cap
    varies per key (the reference keeps 96-180 rows depending on
    interval) — modeled as a deterministic per-key budget."""
    e = _events(spark, sf_dir)
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    cap = 60 + 20 * F.length("event_type")
    r = e.select("event_type", "ts", rn.alias("rn"), cap.alias("cap"))
    return r.groupBy("event_type").agg(
        F.min("cap").cast("long").alias("cap"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("rn") > F.col("cap"), 1).otherwise(0)).alias("n_trim"),
        F.date_format(
            F.min(F.when(F.col("rn") <= F.col("cap"), F.col("ts"))),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("oldest_kept_ts"),
    )


# ---------------------------------------------------------------------------
# §3.1 rendered ranking card — formatters applied in-plan
# ---------------------------------------------------------------------------
@query(
    "ranking_card_rendered",
    survey="§3.1 card render stage (signal-service formatters/base.py, "
    "its only unit-tested surface) applied IN-PLAN: $-price, banded "
    "volume, signed percent, strength bar — C printf and the engine's "
    "CPython-faithful renderer round identically, so the STRINGS are "
    "hash-checked",
    description="Top event_types card with display-formatted columns",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS mx_ts FROM events),
agg AS (
  SELECT e.event_type,
    max_by(e.value, e.ts) AS last_price,
    CAST(SUM(CASE WHEN e.ts > mx.mx_ts - INTERVAL 24 HOUR
             THEN CAST(ABS(e.value) AS DECIMAL(18,8)) END) AS DOUBLE) AS flow24,
    CAST(SUM(CASE WHEN e.ts <= mx.mx_ts - INTERVAL 24 HOUR
              AND e.ts > mx.mx_ts - INTERVAL 48 HOUR
             THEN CAST(ABS(e.value) AS DECIMAL(18,8)) END) AS DOUBLE) AS flow_prev
  FROM events e, mx GROUP BY 1
),
r AS (
  SELECT event_type, last_price, flow24,
    (flow24 / NULLIF(flow_prev, 0) - 1) * 100 AS chg_pct,
    percent_rank() OVER (ORDER BY flow24) AS pr
  FROM agg
)
SELECT event_type,
  CASE
    WHEN last_price IS NULL THEN '-'
    WHEN last_price >= 1000
      THEN '$' || format('{:,}', CAST(printf('%.0f', last_price) AS BIGINT))
    WHEN last_price >= 1 THEN printf('$%.2f', last_price)
    ELSE printf('$%.4f', last_price)
  END AS price,
  CASE
    WHEN flow24 IS NULL THEN '-'
    WHEN flow24 >= 1e9 THEN printf('$%.2fB', flow24 / 1e9)
    WHEN flow24 >= 1e6 THEN printf('$%.1fM', flow24 / 1e6)
    WHEN flow24 >= 1e3 THEN printf('$%.0fK', flow24 / 1e3)
    ELSE printf('$%.0f', flow24)
  END AS flow,
  CASE
    WHEN chg_pct IS NULL THEN '-'
    WHEN chg_pct > 0 THEN printf('+%.2f%%', chg_pct)
    ELSE printf('%.2f%%', chg_pct)
  END AS chg,
  repeat('█', CAST(FLOOR(pr * 100 / 10) AS INTEGER))
    || repeat('░', 10 - CAST(FLOOR(pr * 100 / 10) AS INTEGER)) AS strength
FROM r
ORDER BY pr DESC, event_type ASC
LIMIT 10
""",
)
def ranking_card_rendered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The card's final render — previously Python string interpolation
    per row in the Telegram layer — runs as column expressions inside
    the same plan as the ranking query itself, so a 100 TB serving job
    ships rendered rows straight out of the cluster. Both engines
    format bit-identical doubles with exact-binary half-even rounding
    (C printf == CPython == functions/format.py's renderer), making
    display strings verifiable by hash."""
    from tradecat_spark.functions.format import fmt_pct, fmt_price, fmt_vol, strength_bar

    e = _events(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("mx_ts"))
    j = e.crossJoin(F.broadcast(mx))
    day = F.expr("INTERVAL 24 HOURS")
    in24 = F.col("ts") > F.col("mx_ts") - day
    in_prev = (~in24) & (F.col("ts") > F.col("mx_ts") - F.expr("INTERVAL 48 HOURS"))
    dec_abs = F.abs("value").cast(DEC)
    agg = j.groupBy("event_type").agg(
        F.max_by("value", "ts").alias("last_price"),
        F.sum(F.when(in24, dec_abs)).cast("double").alias("flow24"),
        F.sum(F.when(in_prev, dec_abs)).cast("double").alias("flow_prev"),
    )
    r = agg.select(
        "event_type", "last_price", "flow24",
        ((F.col("flow24") / F.nullif(F.col("flow_prev"), F.lit(0)) - 1) * 100)
        .alias("chg_pct"),
        F.percent_rank().over(Window.orderBy("flow24")).alias("pr"),
    )
    return (
        r.select(
            "event_type",
            fmt_price(F.col("last_price")).alias("price"),
            fmt_vol(F.col("flow24")).alias("flow"),
            fmt_pct(F.col("chg_pct")).alias("chg"),
            strength_bar(F.col("pr") * 100).alias("strength"),
            "pr",
        )
        .orderBy(F.desc("pr"), F.asc("event_type"))
        .limit(10)
        .drop("pr")
    )


#: Per-interval serving row budgets (trading-service db/reader.py:299-309
#: RETENTION dict — "keep the latest N rows per symbol per interval",
#: ~4 GB total in the reference's SQLite serving store; unknown
#: intervals fall back to 60).
RETENTION_POLICY = {
    "1m": (60, 120), "5m": (300, 120), "15m": (900, 96),
    "1h": (3600, 144), "4h": (14400, 120), "1d": (86400, 180),
    "1w": (604800, 104),
}
RETENTION_DEFAULT = 60

_RETENTION_SQL_VALUES = ", ".join(
    f"('{lbl}', {sec}, {cap})"
    for lbl, (sec, cap) in RETENTION_POLICY.items()
)


@query(
    "retention_policy_plan",
    survey="§2.1 S9 generalized: the per-(symbol, interval) retention "
    "law (db/reader.py:299-332 RETENTION dict) applied across the whole "
    "multi-interval gold surface in one pass — every interval's bars "
    "ranked newest-first per key, capped by the policy, delete set and "
    "kept horizon reported per (key, interval)",
    description="Policy-driven retention audit over all 7 serving intervals",
    oracle=f"""
WITH pol(interval, sec, cap) AS (VALUES {_RETENTION_SQL_VALUES}),
bars AS (
  SELECT
    e.event_type, p.interval, p.cap,
    to_timestamp(
      ((epoch_us(e.ts) - 946857600000000)
       // (CAST(p.sec AS BIGINT) * 1000000)) * p.sec + 946857600
    ) AS bucket_ts,
    CAST(COUNT(*) AS BIGINT) AS trade_count
  FROM events e CROSS JOIN pol p
  GROUP BY 1, 2, 3, 4
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type, interval ORDER BY bucket_ts DESC) AS rn
  FROM bars
)
SELECT
  event_type, interval,
  CAST(MIN(cap) AS BIGINT) AS cap,
  CAST(COUNT(*) AS BIGINT) AS n_bars,
  CAST(SUM(CASE WHEN rn > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
  CAST(SUM(CASE WHEN rn <= cap THEN trade_count ELSE 0 END) AS BIGINT)
    AS rows_kept,
  strftime(MIN(CASE WHEN rn <= cap THEN bucket_ts END),
           '%Y-%m-%d %H:%M:%S') AS oldest_kept_ts
FROM r GROUP BY 1, 2
""",
)
def retention_policy_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One events scan explodes to all 7 policy intervals and ONE hash
    aggregate builds every interval's bars (the fused-rollup pattern);
    the per-interval cap travels with the exploded rows so the audit
    needs no policy join afterwards. At scale the delete set is applied
    as a partition drop on date-partitioned gold tables
    (operators/retention.py) — this query is the law the drop must
    agree with."""
    from tradecat_spark.operators.rollup import bucket_ts

    e = _events(spark, sf_dir)
    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("interval"),
                F.lit(cap).alias("cap"),
                bucket_ts("ts", sec).alias("bucket_ts"),
            )
            for lbl, (sec, cap) in RETENTION_POLICY.items()
        ]
    )
    bars = (
        e.select("event_type", F.explode(pairs).alias("iv"))
        .groupBy(
            "event_type",
            F.col("iv.interval").alias("interval"),
            F.col("iv.cap").alias("cap"),
            F.col("iv.bucket_ts").alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).alias("trade_count"))
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type", "interval").orderBy(
            F.desc("bucket_ts")
        )
    )
    r = bars.withColumn("rn", rn)
    return r.groupBy("event_type", "interval").agg(
        F.min("cap").cast("long").alias("cap"),
        F.count(F.lit(1)).alias("n_bars"),
        F.sum(
            F.when(F.col("rn") > F.col("cap"), 1).otherwise(0)
        ).alias("n_trim"),
        F.sum(
            F.when(F.col("rn") <= F.col("cap"), F.col("trade_count"))
            .otherwise(F.lit(0))
        ).cast("long").alias("rows_kept"),
        F.date_format(
            F.min(F.when(F.col("rn") <= F.col("cap"), F.col("bucket_ts"))),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("oldest_kept_ts"),
    )
