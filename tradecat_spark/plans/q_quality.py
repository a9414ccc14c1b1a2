"""Data-quality / lineage ops queries (SURVEY.md §1.1 quality tables).

The reference's preview markets-service ships a full ops schema —
`quality.ingest_batches` (lineage root, start_batch/finish_batch
lifecycle), `quality.data_gaps`, `quality.anomaly_log`,
`quality.alert_rules` (5 preset rules), `quality.backfill_tasks`, and
`quality.lineage_graph` (scripts/ddl/08_quality.sql:8-215, enums
scripts/ddl/01_enums_schemas.sql:70-89). In the reference these are
PG tables populated by collectors; here each becomes a *derivable*
Spark query over the raw fact table, so the ops views are always
consistent with the data instead of trusting collector bookkeeping.

Modeling on the synthetic schema: `events.event_type` plays the symbol
role (5 "tables"/symbols), 1-minute cadence plays the 1m-kline
contract. All five queries are pure SQL shapes (window + group-by +
broadcast config joins) — no Python row work anywhere.

Scale notes: every aggregation keys on (symbol, day) or (symbol) —
cardinality ~symbols×days, partial-aggregated map-side; the alert
config and lineage edge list are constant-size broadcasts; the lineage
closure is driver-bounded iteration over a metadata-sized edge table,
never the fact table.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.exact import ratio6, ratio6_sql
from tradecat_spark.plans.registry import query

DEC = "decimal(18,8)"
TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# epoch minute as int64 — identical arithmetic in Spark and DuckDB
def _epoch_min(col: str = "ts") -> F.Column:
    return F.expr(f"unix_micros({col}) div 60000000")


EPOCH_MIN_SQL = "(epoch_us({col}) // 60000000)"


# ---------------------------------------------------------------------------
# quality.ingest_batches — the lineage root, derived not bookkept
# ---------------------------------------------------------------------------
@query(
    "quality_ingest_batches",
    survey="§1.1 quality.ingest_batches audit (08_quality.sql:8-35, "
    "start_batch/finish_batch :163-215): per-batch expected/actual rows, "
    "gap_ratio, terminal status",
    description="Per-(source, day) ingest batch audit: row counts, gap ratio, status",
    oracle=f"""
SELECT
  event_type AS source,
  'kline' AS data_type,
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS batch_day,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS time_range_start,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS time_range_end,
  COUNT(*) AS actual_rows,
  {EPOCH_MIN_SQL.format(col='MAX(ts)')} - {EPOCH_MIN_SQL.format(col='MIN(ts)')} + 1
    AS expected_rows,
  {ratio6_sql(
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1 - '
      + 'COUNT(DISTINCT ' + EPOCH_MIN_SQL.format(col='ts') + ')',
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1')} AS gap_ratio,
  CASE
    WHEN {ratio6_sql(
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1 - '
      + 'COUNT(DISTINCT ' + EPOCH_MIN_SQL.format(col='ts') + ')',
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1')} > 0.05 THEN 'failed'
    WHEN {ratio6_sql(
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1 - '
      + 'COUNT(DISTINCT ' + EPOCH_MIN_SQL.format(col='ts') + ')',
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1')} > 0.01 THEN 'reprocessing'
    ELSE 'success'
  END AS status
FROM events
GROUP BY event_type, date_trunc('day', ts)
""",
)
def quality_ingest_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One batch per (source, day) — the reference's collector opens a
    batch per symbol/time-range (start_batch), counts rows, and marks a
    terminal status (finish_batch). Derived form: expected = minute
    span of the covered range, actual = raw rows, gap_ratio exact at
    6dp (int64 path, plans/exact.py), status from the preset alert
    thresholds (08_quality.sql:223-228: 1% warning, 5% critical)."""
    e = _events(spark, sf_dir)
    g = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("_day")
    ).agg(
        F.min("ts").alias("_min_ts"),
        F.max("ts").alias("_max_ts"),
        F.count(F.lit(1)).alias("actual_rows"),
        F.countDistinct(_epoch_min()).alias("_minutes"),
    )
    span = (
        F.expr("unix_micros(_max_ts) div 60000000")
        - F.expr("unix_micros(_min_ts) div 60000000")
        + F.lit(1)
    )
    gap = ratio6((span - F.col("_minutes")).cast("long"), span.cast("long"))
    return g.select(
        F.col("event_type").alias("source"),
        F.lit("kline").alias("data_type"),
        F.date_format("_day", "yyyy-MM-dd").alias("batch_day"),
        F.date_format("_min_ts", TS_FMT).alias("time_range_start"),
        F.date_format("_max_ts", TS_FMT).alias("time_range_end"),
        "actual_rows",
        span.alias("expected_rows"),
        gap.alias("gap_ratio"),
        F.when(gap > 0.05, F.lit("failed"))
        .when(gap > 0.01, F.lit("reprocessing"))
        .otherwise(F.lit("success"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# quality.anomaly_log — four detector families over 5m bars
# ---------------------------------------------------------------------------
_BARS5_SQL = """
  SELECT
    event_type,
    time_bucket(INTERVAL '5 minutes', ts) AS b5,
    max_by(value, ts) AS close,
    SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS vol
  FROM events
  GROUP BY 1, 2
"""


@query(
    "quality_anomaly_log",
    survey="§1.1 quality.anomaly_log (08_quality.sql:64-86; "
    "enum_anomaly_type 01_enums_schemas.sql:82-85): price_spike / "
    "volume_spike / stale / gap detectors with severity",
    description="Anomaly log over 5m bars: price spikes, volume spikes, stale closes, time gaps",
    oracle=f"""
WITH bars AS ({_BARS5_SQL}),
w AS (
  SELECT
    event_type, b5, close, vol,
    lag(close) OVER (PARTITION BY event_type ORDER BY b5) AS prev_close,
    lag(b5) OVER (PARTITION BY event_type ORDER BY b5) AS prev_b5,
    SUM(vol) OVER (PARTITION BY event_type ORDER BY b5
                   ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS vol12,
    COUNT(*) OVER (PARTITION BY event_type ORDER BY b5
                   ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS n12
  FROM bars
)
SELECT * FROM (
  SELECT
    'candles_5m' AS table_name, event_type AS symbol,
    strftime(b5, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
    'price_spike' AS anomaly_type,
    CASE WHEN ABS(close - prev_close) / ABS(prev_close) > 1.0
         THEN 'critical' ELSE 'warning' END AS severity,
    ABS(close - prev_close) / ABS(prev_close) AS detail
  FROM w
  WHERE prev_close IS NOT NULL AND prev_close <> 0
    AND ABS(close - prev_close) / ABS(prev_close) > 0.5
  UNION ALL
  SELECT
    'candles_5m', event_type, strftime(b5, '%Y-%m-%d %H:%M:%S'),
    'volume_spike', 'warning',
    CAST(vol AS DOUBLE)
  FROM w
  WHERE n12 = 12 AND vol * 12 > vol12 * 3
  UNION ALL
  SELECT
    'candles_5m', event_type, strftime(b5, '%Y-%m-%d %H:%M:%S'),
    'stale', 'info', 0.0
  FROM w
  WHERE prev_close IS NOT NULL AND close = prev_close
  UNION ALL
  SELECT
    'candles_5m', event_type, strftime(b5, '%Y-%m-%d %H:%M:%S'),
    'gap',
    CASE WHEN epoch_us(b5) - epoch_us(prev_b5) > 3600000000
         THEN 'critical' ELSE 'warning' END,
    CAST((epoch_us(b5) - epoch_us(prev_b5)) // 1000000 AS DOUBLE)
  FROM w
  WHERE prev_b5 IS NOT NULL AND epoch_us(b5) - epoch_us(prev_b5) > 600000000
)
""",
)
def quality_anomaly_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four detectors share ONE window pass (lag/rolling-sum over
    the same (symbol, b5) ordering — a single Exchange), then each
    emits its anomaly rows; the union is branch-local projection, no
    second shuffle. Volume spike compares exact decimals cross-
    multiplied (vol*12 > sum12*3) so no division ever happens."""
    from tradecat_spark.operators.rollup import bucket_ts

    e = _events(spark, sf_dir)
    bars = e.groupBy(
        "event_type", bucket_ts("ts", 300).alias("b5")
    ).agg(
        F.max_by("value", "ts").alias("close"),
        F.sum(F.abs(F.col("value")).cast(DEC)).alias("vol"),
    )
    w = Window.partitionBy("event_type").orderBy("b5")
    wf = w.rowsBetween(-12, -1)
    x = bars.select(
        "event_type", "b5", "close", "vol",
        F.lag("close").over(w).alias("prev_close"),
        F.lag("b5").over(w).alias("prev_b5"),
        F.sum("vol").over(wf).alias("vol12"),
        F.count(F.lit(1)).over(wf).alias("n12"),
    )
    tbl = F.lit("candles_5m").alias("table_name")
    sym = F.col("event_type").alias("symbol")
    bts = F.date_format("b5", TS_FMT).alias("bucket_ts")
    jump = F.abs(F.col("close") - F.col("prev_close")) / F.abs("prev_close")
    gap_us = F.expr("unix_micros(b5) - unix_micros(prev_b5)")

    price = x.filter(
        F.col("prev_close").isNotNull() & (F.col("prev_close") != 0) & (jump > 0.5)
    ).select(
        tbl, sym, bts,
        F.lit("price_spike").alias("anomaly_type"),
        F.when(jump > 1.0, "critical").otherwise("warning").alias("severity"),
        jump.alias("detail"),
    )
    volume = x.filter(
        (F.col("n12") == 12) & (F.col("vol") * 12 > F.col("vol12") * 3)
    ).select(
        tbl, sym, bts,
        F.lit("volume_spike").alias("anomaly_type"),
        F.lit("warning").alias("severity"),
        F.col("vol").cast("double").alias("detail"),
    )
    stale = x.filter(
        F.col("prev_close").isNotNull() & (F.col("close") == F.col("prev_close"))
    ).select(
        tbl, sym, bts,
        F.lit("stale").alias("anomaly_type"),
        F.lit("info").alias("severity"),
        F.lit(0.0).alias("detail"),
    )
    gaps = x.filter(
        F.col("prev_b5").isNotNull() & (gap_us > 600_000_000)
    ).select(
        tbl, sym, bts,
        F.lit("gap").alias("anomaly_type"),
        F.when(gap_us > 3_600_000_000, "critical").otherwise("warning").alias("severity"),
        F.expr("cast((unix_micros(b5) - unix_micros(prev_b5)) div 1000000 as double)").alias("detail"),
    )
    return price.unionByName(volume).unionByName(stale).unionByName(gaps)


# ---------------------------------------------------------------------------
# quality.alert_rules — the 5 preset rules, config-driven generic eval
# ---------------------------------------------------------------------------
# One source of truth: the preset rows from 08_quality.sql:222-228.
ALERT_RULES: list[tuple[str, str, str, str, float, str, bool]] = [
    # (rule_name, table_name, metric, operator, threshold, severity, auto_backfill)
    ("kline_gap_warning", "raw.crypto_kline_1m", "gap_ratio", ">", 0.01, "warning", True),
    ("kline_gap_critical", "raw.crypto_kline_1m", "gap_ratio", ">", 0.05, "critical", True),
    ("trades_gap_warning", "raw.trades", "gap_ratio", ">", 0.01, "warning", True),
    ("orderbook_seq_break", "raw.orderbook_delta", "seq_break", "=", 1.0, "critical", False),
    ("ingest_latency_warning", "*", "latency_seconds", ">", 300.0, "warning", False),
]

_RULES_VALUES_SQL = ",\n    ".join(
    f"('{n}', '{t}', '{m}', '{op}', {th!r}, '{sev}', {str(ab).upper()})"
    for n, t, m, op, th, sev, ab in ALERT_RULES
)


@query(
    "quality_alert_rules_eval",
    survey="§1.1 quality.alert_rules generic eval (08_quality.sql:91-118, "
    "preset rows :222-228): metric table × broadcast rule config, "
    "operator applied declaratively",
    description="Fired quality alerts: per-symbol metrics joined to the 5 preset rules",
    oracle=f"""
WITH rules(rule_name, rule_table, metric, op, threshold, severity, auto_backfill) AS (
  VALUES
    {_RULES_VALUES_SQL}
),
kline_gap AS (
  SELECT
    'raw.crypto_kline_1m' AS table_name, event_type AS symbol,
    'gap_ratio' AS metric,
    {ratio6_sql(
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1 - '
      + 'COUNT(DISTINCT ' + EPOCH_MIN_SQL.format(col='ts') + ')',
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1')} AS value
  FROM events GROUP BY event_type
),
trades_gap AS (
  SELECT 'raw.trades' AS table_name, symbol, metric, value
  FROM kline_gap
),
seq_breaks AS (
  SELECT
    'raw.orderbook_delta' AS table_name, event_type AS symbol,
    'seq_break' AS metric,
    CASE WHEN COUNT(*) FILTER (WHERE prev_id IS NOT NULL AND event_id < prev_id) > 0
         THEN 1.0 ELSE 0.0 END AS value
  FROM (
    SELECT event_type, event_id,
           lag(event_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_id
    FROM events
  ) GROUP BY event_type
),
latency AS (
  SELECT
    '*' AS table_name, event_type AS symbol,
    'latency_seconds' AS metric,
    CAST(MAX(gap_us) // 1000000 AS DOUBLE) AS value
  FROM (
    SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
    FROM events
  ) WHERE gap_us IS NOT NULL GROUP BY event_type
),
metrics AS (
  SELECT * FROM kline_gap UNION ALL SELECT * FROM trades_gap
  UNION ALL SELECT * FROM seq_breaks UNION ALL SELECT * FROM latency
)
SELECT
  r.rule_name, m.table_name, m.symbol, m.metric, m.value,
  r.threshold, r.severity, r.auto_backfill
FROM metrics m
JOIN rules r ON r.metric = m.metric
  AND (r.rule_table = m.table_name OR (r.rule_table = '*' AND m.table_name = '*'))
WHERE CASE r.op
  WHEN '>' THEN m.value > r.threshold
  WHEN '<' THEN m.value < r.threshold
  WHEN '=' THEN m.value = r.threshold
  WHEN '!=' THEN m.value <> r.threshold
  ELSE FALSE END
""",
)
def quality_alert_rules_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rule table is a 5-row broadcast; the metric side is three
    small per-symbol aggregates over one fact scan each. The operator
    column is applied as a declarative CASE — adding a rule is a config
    row, not code (the reference's alert_rules design intent)."""
    e = _events(spark, sf_dir)

    span = (
        F.expr("unix_micros(_max_ts) div 60000000")
        - F.expr("unix_micros(_min_ts) div 60000000")
        + F.lit(1)
    )
    kline_gap = (
        e.groupBy("event_type")
        .agg(
            F.min("ts").alias("_min_ts"),
            F.max("ts").alias("_max_ts"),
            F.countDistinct(_epoch_min()).alias("_minutes"),
        )
        .select(
            F.lit("raw.crypto_kline_1m").alias("table_name"),
            F.col("event_type").alias("symbol"),
            F.lit("gap_ratio").alias("metric"),
            ratio6(
                (span - F.col("_minutes")).cast("long"), span.cast("long")
            ).alias("value"),
        )
    )
    trades_gap = kline_gap.withColumn("table_name", F.lit("raw.trades"))

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = (
        e.select("event_type", "event_id", F.lag("event_id").over(w).alias("prev_id"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.col("prev_id").isNotNull() & (F.col("event_id") < F.col("prev_id")), 1
                ).otherwise(0)
            ).alias("breaks")
        )
        .select(
            F.lit("raw.orderbook_delta").alias("table_name"),
            F.col("event_type").alias("symbol"),
            F.lit("seq_break").alias("metric"),
            F.when(F.col("breaks") > 0, 1.0).otherwise(0.0).alias("value"),
        )
    )
    lat = (
        e.select(
            "event_type",
            (
                F.expr("unix_micros(ts)") - F.lag(F.expr("unix_micros(ts)")).over(w)
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(F.expr("cast(max(gap_us) div 1000000 as double)").alias("value"))
        .select(
            F.lit("*").alias("table_name"),
            F.col("event_type").alias("symbol"),
            F.lit("latency_seconds").alias("metric"),
            "value",
        )
    )
    metrics = (
        kline_gap.unionByName(trades_gap).unionByName(seq).unionByName(lat)
    )

    rules = spark.createDataFrame(
        ALERT_RULES,
        "rule_name string, rule_table string, metric string, op string, "
        "threshold double, severity string, auto_backfill boolean",
    )
    fired = (
        metrics.join(
            F.broadcast(rules),
            (rules["metric"] == metrics["metric"])
            & (
                (rules["rule_table"] == metrics["table_name"])
                | ((rules["rule_table"] == "*") & (metrics["table_name"] == "*"))
            ),
        )
        .filter(
            F.when(F.col("op") == ">", F.col("value") > F.col("threshold"))
            .when(F.col("op") == "<", F.col("value") < F.col("threshold"))
            .when(F.col("op") == "=", F.col("value") == F.col("threshold"))
            .when(F.col("op") == "!=", F.col("value") != F.col("threshold"))
            .otherwise(F.lit(False))
        )
    )
    return fired.select(
        "rule_name", "table_name", "symbol", metrics["metric"].alias("metric"),
        "value", "threshold", "severity", "auto_backfill",
    )


# ---------------------------------------------------------------------------
# quality.backfill_tasks — auto-derived task queue from detected day gaps
# ---------------------------------------------------------------------------
@query(
    "quality_backfill_tasks",
    survey="§1.1 quality.backfill_tasks (08_quality.sql:115-140): gap → "
    "pending task with priority; auto_backfill spirit of the preset rules",
    description="Pending backfill tasks derived from day-level gap ratios",
    oracle=f"""
WITH audit AS (
  SELECT
    event_type,
    date_trunc('day', ts) AS batch_day,
    {ratio6_sql(
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1 - '
      + 'COUNT(DISTINCT ' + EPOCH_MIN_SQL.format(col='ts') + ')',
      EPOCH_MIN_SQL.format(col='MAX(ts)') + ' - '
      + EPOCH_MIN_SQL.format(col='MIN(ts)') + ' + 1')} AS gap_ratio
  FROM events
  GROUP BY event_type, date_trunc('day', ts)
)
SELECT
  'raw.crypto_kline_1m' AS table_name,
  event_type AS symbol,
  strftime(batch_day, '%Y-%m-%d %H:%M:%S') AS gap_start,
  strftime(batch_day + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS gap_end,
  'auto' AS trigger_type,
  CASE WHEN gap_ratio > 0.05 THEN 1 ELSE 5 END AS priority,
  'pending' AS status,
  0 AS retry_count,
  3 AS max_retries,
  gap_ratio
FROM audit
WHERE gap_ratio > 0.01
""",
)
def quality_backfill_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tasks exist only where a day's gap exceeds the auto-backfill
    threshold; priority escalates at the critical threshold (1=highest,
    08_quality.sql:128). The task time range is the whole day — the
    reference's ZIP backfiller works in day archives (S7)."""
    e = _events(spark, sf_dir)
    g = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("batch_day")
    ).agg(
        F.min("ts").alias("_min_ts"),
        F.max("ts").alias("_max_ts"),
        F.countDistinct(_epoch_min()).alias("_minutes"),
    )
    span = (
        F.expr("unix_micros(_max_ts) div 60000000")
        - F.expr("unix_micros(_min_ts) div 60000000")
        + F.lit(1)
    )
    gap = ratio6((span - F.col("_minutes")).cast("long"), span.cast("long"))
    return (
        g.select("event_type", "batch_day", gap.alias("gap_ratio"))
        .filter(F.col("gap_ratio") > 0.01)
        .select(
            F.lit("raw.crypto_kline_1m").alias("table_name"),
            F.col("event_type").alias("symbol"),
            F.date_format("batch_day", TS_FMT).alias("gap_start"),
            F.date_format(
                F.col("batch_day") + F.expr("INTERVAL 1 DAY"), TS_FMT
            ).alias("gap_end"),
            F.lit("auto").alias("trigger_type"),
            F.when(F.col("gap_ratio") > 0.05, 1).otherwise(5).alias("priority"),
            F.lit("pending").alias("status"),
            F.lit(0).alias("retry_count"),
            F.lit(3).alias("max_retries"),
            "gap_ratio",
        )
    )


# ---------------------------------------------------------------------------
# quality.lineage_graph — transitive closure over the real pipeline DAG
# ---------------------------------------------------------------------------
# One source of truth for both engines: the actual derivation edges of
# this engine's pipeline (mirrors the reference's physical lineage:
# cagg registry 004_continuous_aggregates.sql:67-81, metrics caggs
# 007:89-141, meta views 006:29-127, indicator tables reader.py:253-296,
# signal events engines/sqlite_engine.py:215-333).
LINEAGE_EDGES: list[tuple[str, str, str]] = [
    # (upstream, downstream, transform_type)
    *[
        ("candles_1m", f"candles_{iv}", "aggregate")
        for iv in ("3m", "5m", "15m", "30m", "1h", "2h", "4h", "6h", "8h",
                   "12h", "1d", "3d", "1w", "1M")
    ],
    *[
        ("metrics_5m", f"metrics_{iv}", "aggregate")
        for iv in ("15m", "30m", "1h", "4h", "1d", "1w")
    ],
    ("candles_1h", "candles_meta_1h", "derive"),
    ("metrics_1h", "candles_meta_1h", "derive"),
    ("candles_1d", "candles_meta_1d", "derive"),
    ("metrics_1d", "candles_meta_1d", "derive"),
    ("candles_meta_1h", "indicator_snapshot", "calculate"),
    ("candles_meta_1d", "indicator_snapshot", "calculate"),
    ("indicator_snapshot", "signal_events", "derive"),
    ("signal_events", "ranking_cards", "copy"),
]

_EDGES_VALUES_SQL = ",\n    ".join(
    f"('{u}', '{d}', '{t}')" for u, d, t in LINEAGE_EDGES
)

_LINEAGE_ROOTS = ("candles_1m", "metrics_5m")
_MAX_DEPTH = 4  # candles_1m → cagg → meta → indicator → signal → cards = 5 hops


@query(
    "quality_lineage_closure",
    survey="§1.1 quality.lineage_graph traversal (08_quality.sql:145-161): "
    "transitive closure root→descendant with min hop depth",
    description="Lineage reachability: every artifact downstream of the raw tables, with depth",
    oracle=f"""
WITH RECURSIVE edges(src, dst, transform_type) AS (
  VALUES
    {_EDGES_VALUES_SQL}
),
cl(root, node, depth) AS (
  SELECT src, dst, 1 FROM edges WHERE src IN ('candles_1m', 'metrics_5m')
  UNION ALL
  SELECT cl.root, e.dst, cl.depth + 1
  FROM cl JOIN edges e ON e.src = cl.node
  WHERE cl.depth < {_MAX_DEPTH + 1}
)
SELECT root, node AS downstream, CAST(MIN(depth) AS BIGINT) AS depth
FROM cl GROUP BY root, node
""",
)
def quality_lineage_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-iteration closure: the frontier×edges join is repeated
    ``_MAX_DEPTH`` times (the DAG's known diameter), all broadcast —
    lineage is metadata-sized, so there is no convergence collect() and
    the plan depth is static. The same pattern scales to real catalogs
    (thousands of tables) because each hop is one broadcast join."""
    edges = spark.createDataFrame(
        LINEAGE_EDGES, "src string, dst string, transform_type string"
    )
    frontier = edges.filter(F.col("src").isin(*_LINEAGE_ROOTS)).select(
        F.col("src").alias("root"), F.col("dst").alias("node"), F.lit(1).alias("depth")
    )
    acc = frontier
    for _ in range(_MAX_DEPTH):
        frontier = (
            frontier.join(F.broadcast(edges), frontier["node"] == edges["src"])
            .select("root", F.col("dst").alias("node"), (F.col("depth") + 1).alias("depth"))
        )
        acc = acc.unionByName(frontier)
    return acc.groupBy("root", F.col("node").alias("downstream")).agg(
        F.min("depth").cast("long").alias("depth")
    )


# ---------------------------------------------------------------------------
# Declarative data-contract expectations (Great-Expectations shape)
# ---------------------------------------------------------------------------
#: (table, expectation name, violation predicate SQL). A row VIOLATES
#: when the predicate is true; the report counts violations per
#: expectation in ONE scan per table (conditional sums, no per-check
#: passes). The predicate strings are the single source of truth —
#: compiled via F.expr for Spark and pasted verbatim into the oracle.
_EXPECTATIONS = (
    ("lineitem", "quantity_in_1_50",
     "l_quantity < 1 OR l_quantity > 50 OR l_quantity IS NULL"),
    ("lineitem", "discount_in_0_0.1",
     "l_discount < 0 OR l_discount > 0.1 OR l_discount IS NULL"),
    ("lineitem", "shipdate_not_null", "l_shipdate IS NULL"),
    ("lineitem", "tax_in_0_0.08",
     "l_tax < 0 OR l_tax > 0.08 OR l_tax IS NULL"),
    ("orders", "totalprice_positive",
     "o_totalprice <= 0 OR o_totalprice IS NULL"),
    ("orders", "status_in_domain", "o_orderstatus NOT IN ('O','F','P')"),
    ("customer", "acctbal_not_null", "c_acctbal IS NULL"),
)


@query(
    "data_contract_expectations",
    survey="beyond-reference generic operator: declarative data-contract "
    "expectations (the Great-Expectations pattern) — each table scanned "
    "ONCE with conditional violation sums; predicates shared verbatim "
    "between engines",
    description="Per-expectation violation counts over lineitem/orders/customer",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{t}' AS tbl, '{name}' AS expectation,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
  SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) = 0 AS passed
FROM {t}"""
        for t, name, pred in _EXPECTATIONS
    ),
)
def data_contract_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All of a table's expectations evaluate in one projection over one
    scan (a sum of flag columns — map-side combining, no shuffle beyond
    the final 1-row-per-table aggregate); the per-expectation rows then
    explode out of the aggregated struct. Counts are exact BIGINTs."""
    outs = []
    by_table: dict[str, list[tuple[str, str]]] = {}
    for t, name, pred in _EXPECTATIONS:
        by_table.setdefault(t, []).append((name, pred))
    for t, checks in by_table.items():
        df = load_table(spark, sf_dir, t)
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(
                    F.when(F.expr(pred), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"v_{i}")
                for i, (_, pred) in enumerate(checks)
            ],
        )
        rows = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            F.lit(name).alias("expectation"),
                            F.col("n_rows").alias("n_rows"),
                            F.col(f"v_{i}").alias("n_violations"),
                            (F.col(f"v_{i}") == 0).alias("passed"),
                        )
                        for i, (name, _) in enumerate(checks)
                    ]
                )
            ).alias("r")
        ).select("r.*")
        outs.append(rows)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query(
    "cdc_incremental_equivalence",
    survey="§2.4 A3-adjacent law: incremental view maintenance — "
    "applying the post-cutoff changelog onto the cutoff snapshot must "
    "equal the full recompute, per key and column (the TimescaleDB "
    "continuous-aggregate / Delta CDF refresh contract, gated as data)",
    description="snapshot(T0) + changes(T0..now) == snapshot(now), "
    "checked per user",
    oracle="""
WITH full_state AS (
  SELECT user_id,
    max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                  || lpad(CAST(event_id AS VARCHAR), 12, '0'))
      AS last_value,
    MAX(ts) AS last_ts,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
base AS (
  SELECT user_id,
    max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                  || lpad(CAST(event_id AS VARCHAR), 12, '0'))
      AS last_value,
    MAX(ts) AS last_ts,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1
),
delta AS (
  SELECT user_id,
    max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                  || lpad(CAST(event_id AS VARCHAR), 12, '0'))
      AS last_value,
    MAX(ts) AS last_ts,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1
),
merged AS (
  SELECT COALESCE(d.user_id, b.user_id) AS user_id,
    COALESCE(d.last_value, b.last_value) AS last_value,
    COALESCE(d.last_ts, b.last_ts) AS last_ts,
    COALESCE(b.n_events, 0) + COALESCE(d.n_events, 0) AS n_events
  FROM base b FULL OUTER JOIN delta d USING (user_id)
)
SELECT f.user_id, f.last_value, f.last_ts, f.n_events,
  m.last_value = f.last_value
    AND m.last_ts = f.last_ts
    AND m.n_events = f.n_events AS law_holds
FROM full_state f JOIN merged m USING (user_id)
""",
)
def cdc_incremental_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refresh law every incremental pipeline silently relies on,
    made a hashed row per key: the cutoff snapshot (latest-by-(ts,id)
    + counts), the post-cutoff delta in the same shape, a latest-wins
    FULL OUTER merge — and equality against the full recompute. All
    aggregates are selections and integer counts (order-free, engine-
    exact). At scale the merge is the cheap side: base and delta are
    one row per key, so the outer join is keyed and narrow — the law
    justifies never rescanning history on refresh."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def state(df):
        # zero-padded (epoch_us, event_id) string: a total order both
        # engines' max_by accept (DuckDB 1.0 rejects struct keys)
        key = F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        )
        return df.groupBy("user_id").agg(
            F.max_by("value", key).alias("last_value"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )

    full_state = state(e)
    base = state(e.filter(F.col("ts") < cut)).select(
        "user_id",
        F.col("last_value").alias("b_value"),
        F.col("last_ts").alias("b_ts"),
        F.col("n_events").alias("b_n"),
    )
    delta = state(e.filter(F.col("ts") >= cut)).select(
        "user_id",
        F.col("last_value").alias("d_value"),
        F.col("last_ts").alias("d_ts"),
        F.col("n_events").alias("d_n"),
    )
    merged = base.join(delta, "user_id", "full_outer").select(
        "user_id",
        F.coalesce("d_value", "b_value").alias("m_value"),
        F.coalesce("d_ts", "b_ts").alias("m_ts"),
        (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
        .alias("m_n"),
    )
    j = full_state.join(merged, "user_id")
    return j.select(
        "user_id", "last_value", "last_ts", "n_events",
        (
            (F.col("m_value") == F.col("last_value"))
            & (F.col("m_ts") == F.col("last_ts"))
            & (F.col("m_n") == F.col("n_events"))
        ).alias("law_holds"),
    )
