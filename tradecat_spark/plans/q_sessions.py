"""Sessionization — the gaps-and-islands session operator, batch and
streaming.

Batch law: per user, a new session starts when the gap to the previous
event is >= GAP (strict merge rule ``ts < prev_ts + gap``, matching
Spark's ``session_window`` semantics exactly). Streaming runs the REAL
``F.session_window`` aggregation (dynamic, merging windows — the
marquee stateful-window feature) and is hash-checked against the same
batch law.

Output-mode subtlety: Spark rejects update mode for session-window
aggregations (windows merge, so an updated row has no stable key to
revise). Complete mode sidesteps it — after availableNow drains the
source, the sink holds exactly the final state: every session, merged,
once. At production scale complete mode re-emits the whole result per
trigger, so a long-running deployment would use append mode plus the
watermark (emitting each session once it can no longer grow); for the
drain-and-compare gate, complete is both simpler and exact.

Timestamps are published as epoch microseconds (exact BIGINTs on both
engines) — no format-string risk.

Scale: sessionization shuffles once on the session key (user), state
per live session is a few scalars, and the watermark bounds how long a
quiet session holds state — the standard Spark posture for billions of
sessions/day.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.registry import query

GAP_SEC = 7200  # 2h session gap (events median inter-arrival ~7h)
_GAP_US = GAP_SEC * 1_000_000


def sessionize(
    df: DataFrame, keys: list[str], ts: str, gap_sec: int
) -> DataFrame:
    """Assign a per-key 1-based ``session_idx`` to every row (new
    session when the gap to the previous row is >= gap_sec)."""
    w = Window.partitionBy(*keys).orderBy(ts)
    us = F.unix_micros(F.col(ts))
    brk = F.when(
        F.lag(us).over(w).isNull()
        | (us - F.lag(us).over(w) >= gap_sec * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_idx",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


_BATCH_LAW = f"""
WITH g AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
          OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= {_GAP_US}
      THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
),
sess AS (
  SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
    epoch_us(MIN(ts)) AS session_start_us,
    epoch_us(MAX(ts)) AS session_end_us,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY 1, 2
)
"""


@query(
    "sessionize_user_events",
    survey="beyond-reference generic operator: gaps-and-islands "
    "sessionization over the events table (the canonical analytics "
    "session op; same break/cumsum algebra as the backfill planner)",
    description=f"Per-user sessions at a {GAP_SEC // 3600}h gap: "
    "bounds, size, duration",
    oracle=_BATCH_LAW + """
SELECT user_id, session_idx, session_start_us, session_end_us,
  n_events, session_end_us - session_start_us AS duration_us
FROM sess
""",
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on user_id; the break-flag cumsum and the session
    aggregate share that partitioning (no second exchange)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(e, ["user_id"], "ts", GAP_SEC)
    us = F.unix_micros("ts")
    agg = s.groupBy("user_id", "session_idx").agg(
        F.min(us).alias("session_start_us"),
        F.max(us).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "user_id", "session_idx", "session_start_us", "session_end_us",
        "n_events",
        (F.col("session_end_us") - F.col("session_start_us"))
        .alias("duration_us"),
    )


def _session_drain(spark: SparkSession, sf_dir: str, prefix: str,
                   output_mode: str) -> DataFrame:
    """Shared session-window drain: events → file stream →
    session_window(GAP) count agg → memory sink via the join family's
    ``_drain_append`` (pinned stateful shuffle width, completion
    assert, src/ckpt cleanup — the scaffolding q_streaming centralized
    in r4)."""
    from tradecat_spark.plans.q_streaming import _drain_append

    src = tempfile.mkdtemp(prefix=f"{prefix}_src_")
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    e.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy("user_id", F.session_window("ts", f"{GAP_SEC} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    t = _drain_append(spark, agg, prefix, src, output_mode=output_mode)
    return t.select(
        "user_id",
        F.unix_micros("session_window.start").alias("session_start_us"),
        F.unix_micros("session_window.end").alias("window_end_us"),
        "n_events",
    )


@query(
    "streaming_session_windows",
    survey="§2.11-adjacent: REAL F.session_window streaming aggregation "
    "(dynamic merging windows + keyed state), hash-checked against the "
    "batch gaps-and-islands law via a complete-mode drain",
    description="Per-user session windows from Structured Streaming",
    oracle=_BATCH_LAW + f"""
SELECT user_id, session_start_us,
  session_end_us + {_GAP_US} AS window_end_us, n_events
FROM sess
""",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → file stream → session_window(2h) agg (complete mode) →
    memory sink. Spark's window end is ``last event + gap``, which the
    oracle mirrors; the strict merge rule (an event exactly at the
    window end opens a NEW session) matches the batch law's
    ``diff >= gap`` break. See the module docstring for why complete
    mode (update is rejected for merging windows)."""
    return _session_drain(spark, sf_dir, "tc_sess", "complete")


@query(
    "streaming_session_append",
    survey="§2.11 production emission path for session windows: append "
    "mode + watermark — each session emitted EXACTLY ONCE when it can "
    "no longer grow (closes the r3 'complete-mode-only drain' gap)",
    description="Append-mode session windows: only watermark-finished "
    "sessions, emitted once",
    oracle=_BATCH_LAW + f"""
, mx AS (SELECT MAX(epoch_us(ts)) AS mx_us FROM events)
SELECT user_id, session_start_us,
  session_end_us + {_GAP_US} AS window_end_us, n_events
FROM sess, mx
WHERE session_end_us + {_GAP_US} <= mx_us - 60000000
""",
)
def streaming_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION emission path (complete mode re-emits the whole
    result every trigger; append writes each finished session once).

    Semantics, verified empirically and mirrored in the oracle: a
    session window is emitted when ``window.end <= watermark``
    (inclusive — a window ending exactly AT the watermark is flushed),
    where after an ``availableNow`` drain the watermark is
    ``max(event time) - delay`` (the post-drain no-data batch flushes
    eligible state). Sessions still inside the watermark stay in the
    state store awaiting growth — exactly the long-running deployment
    contract: state per live session is a few scalars, the watermark
    bounds how long a quiet session holds state, and the sink only ever
    receives immutable finished rows (no revisions to compact away).
    """
    return _session_drain(spark, sf_dir, "tc_sessap", "append")


@query(
    "cohort_retention",
    survey="beyond-reference generic operator: cohort retention — the "
    "canonical product-analytics triangle (first-seen day cohorts x "
    "day offset), integer-exact on both engines",
    description="Daily cohort retention counts with day-0 cohort sizes",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
joined AS (
  SELECT f.cohort_day, a.day - f.cohort_day AS day_offset, a.user_id
  FROM activity a JOIN firsts f USING (user_id)
),
sizes AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY cohort_day
)
SELECT
  strftime(j.cohort_day, '%Y-%m-%d') AS cohort_day,
  CAST(j.day_offset AS BIGINT) AS day_offset,
  CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_active,
  s.cohort_size,
  ROUND(COUNT(DISTINCT j.user_id) * 1.0 / s.cohort_size, 6)
    AS retention
FROM joined j JOIN sizes s USING (cohort_day)
GROUP BY j.cohort_day, j.day_offset, s.cohort_size
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hash-aggregates (first-seen day per user, distinct active
    days) joined on user_id, then the triangle count. Counts are exact
    BIGINTs; the single ratio is one ROUND over an integer quotient, so
    the cross-engine hash has no float path to diverge on. At 100 TB
    the firsts table is |users| rows — an UNBOUNDED domain (the r13
    broadcast-cardinality audit), so the activity join stays an
    unhinted user-keyed equi-join: the planner broadcasts it when
    stats say it fits and shuffles when they don't."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = e.distinct()
    joined = activity.join(firsts, "user_id").select(
        "cohort_day",
        F.datediff("day", "cohort_day").alias("day_offset"),
        "user_id",
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    agg = joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    return agg.join(F.broadcast(sizes), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") * 1.0 / F.col("cohort_size"), 6)
        .alias("retention"),
    )


@query(
    "funnel_conversion",
    survey="beyond-reference generic operator: ordered event funnel "
    "(view -> click -> purchase, each stage strictly after the "
    "previous) — chained conditional-min aggregates, integer-exact",
    description="3-stage ordered funnel: per-stage users, step and top conversion",
    oracle="""
WITH u1 AS (
  SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS vts
  FROM events GROUP BY user_id
),
u2 AS (
  SELECT e.user_id, ANY_VALUE(u1.vts) AS vts,
    MIN(e.ts) FILTER (WHERE e.event_type = 'click'
                      AND e.ts > u1.vts) AS cts
  FROM events e JOIN u1 USING (user_id) GROUP BY e.user_id
),
u3 AS (
  SELECT e.user_id, ANY_VALUE(u2.vts) AS vts, ANY_VALUE(u2.cts) AS cts,
    MIN(e.ts) FILTER (WHERE e.event_type = 'purchase'
                      AND e.ts > u2.cts) AS pts
  FROM events e JOIN u2 USING (user_id) GROUP BY e.user_id
),
c AS (
  SELECT
    CAST(COUNT(vts) AS BIGINT) AS n_view,
    CAST(COUNT(cts) AS BIGINT) AS n_click,
    CAST(COUNT(pts) AS BIGINT) AS n_purchase,
    CAST(SUM(CASE WHEN pts IS NOT NULL
          THEN epoch_us(pts) - epoch_us(vts) END) AS BIGINT)
      AS total_convert_us
  FROM u3
)
SELECT stage, CAST(stage_idx AS INT) AS stage_idx, n_users,
  ROUND(n_users * 1.0 / NULLIF(prev_n, 0), 6) AS pct_of_prev,
  ROUND(n_users * 1.0 / NULLIF(top_n, 0), 6) AS pct_of_top,
  total_convert_us
FROM (
  SELECT 'view' AS stage, 1 AS stage_idx, n_view AS n_users,
    n_view AS prev_n, n_view AS top_n, NULL::BIGINT AS total_convert_us
  FROM c
  UNION ALL
  SELECT 'click', 2, n_click, n_view, n_view, NULL FROM c
  UNION ALL
  SELECT 'purchase', 3, n_purchase, n_click, n_view, total_convert_us
  FROM c
)
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each stage is a conditional-min aggregate over events joined to
    the previous stage's |users|-row table; no event list ever
    collects. The stage tables are user-cardinality — unbounded at
    100 TB — so the joins stay unhinted user-keyed equi-joins (r13
    broadcast-cardinality audit; stage N+1 reuses stage N's shuffle
    partitioning). Counts and the total time-to-convert are exact
    BIGINTs; the two conversion ratios are single ROUNDs over integer
    quotients."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    u1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .alias("vts")
    )
    u2 = (
        e.join(u1, "user_id")
        .groupBy("user_id")
        .agg(
            F.any_value("vts").alias("vts"),
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("vts")),
                    F.col("ts"),
                )
            ).alias("cts"),
        )
    )
    u3 = (
        e.join(u2, "user_id")
        .groupBy("user_id")
        .agg(
            F.any_value("vts").alias("vts"),
            F.any_value("cts").alias("cts"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("cts")),
                    F.col("ts"),
                )
            ).alias("pts"),
        )
    )
    c = u3.agg(
        F.count("vts").alias("n_view"),
        F.count("cts").alias("n_click"),
        F.count("pts").alias("n_purchase"),
        F.sum(
            F.when(
                F.col("pts").isNotNull(),
                F.unix_micros("pts") - F.unix_micros("vts"),
            )
        ).alias("total_convert_us"),
    )
    nv, nc, np_ = F.col("n_view"), F.col("n_click"), F.col("n_purchase")
    null_us = F.lit(None).cast("long")
    stages = c.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("stage"),
                    F.lit(1).alias("stage_idx"),
                    nv.alias("n_users"),
                    nv.alias("prev_n"), nv.alias("top_n"),
                    null_us.alias("total_convert_us"),
                ),
                F.struct(
                    F.lit("click").alias("stage"),
                    F.lit(2).alias("stage_idx"),
                    nc.alias("n_users"),
                    nv.alias("prev_n"), nv.alias("top_n"),
                    null_us.alias("total_convert_us"),
                ),
                F.struct(
                    F.lit("purchase").alias("stage"),
                    F.lit(3).alias("stage_idx"),
                    np_.alias("n_users"),
                    nc.alias("prev_n"), nv.alias("top_n"),
                    F.col("total_convert_us").alias("total_convert_us"),
                ),
            )
        ).alias("s")
    )
    return stages.select(
        F.col("s.stage").alias("stage"),
        F.col("s.stage_idx").alias("stage_idx"),
        F.col("s.n_users").alias("n_users"),
        F.round(
            F.col("s.n_users") * 1.0
            / F.nullif(F.col("s.prev_n"), F.lit(0)), 6
        ).alias("pct_of_prev"),
        F.round(
            F.col("s.n_users") * 1.0
            / F.nullif(F.col("s.top_n"), F.lit(0)), 6
        ).alias("pct_of_top"),
        F.col("s.total_convert_us").alias("total_convert_us"),
    )


@query(
    "skew_salted_join_law",
    survey="§4 scale posture: explicit salted join for hot-key skew "
    "(big side scattered over 8 sub-keys, small side replicated) — the "
    "salt must be invisible in the result, so the oracle is the PLAIN "
    "join law",
    description="Events joined to per-user cohorts through a salted join",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
  GROUP BY user_id
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
  e.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN firsts f USING (user_id)
GROUP BY f.cohort_day, e.event_type
""",
)
def skew_salted_join_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted plumbing (operators/skew.py) must produce exactly the
    plain join's rows — the aggregate over the salted join hash-matches
    the unsalted SQL. The adversarial hot-key distribution test lives
    in tests/test_dedup_skew.py."""
    from tradecat_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("date").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = salted_join(e, firsts, ["user_id"], salts=8)
    return joined.groupBy("cohort_day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "event_type", "n_events",
    )


@query(
    "range_bin_join_law",
    survey="§2.3-adjacent scale technique: bin-bucketed range join "
    "(operators/rangejoin.py) — point-in-interval as an equi-join on "
    "time bins + exact filter; the oracle is the PLAIN BETWEEN join",
    description="Events annotated with their 6h-gap session via a bin range join",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
          OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= {3 * _GAP_US}
      THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
),
iv AS (
  SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
    MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM s GROUP BY 1, 2
)
SELECT e.user_id, iv.session_idx,
  epoch_us(iv.s_start) AS session_start_us,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN iv
  ON e.user_id = iv.user_id
  AND e.ts >= iv.s_start AND e.ts <= iv.s_end
GROUP BY e.user_id, iv.session_idx, iv.s_start
""",
)
def range_bin_join_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 6h-gap session intervals (built by the batch law) are range-
    joined back onto the raw events through the BIN path — interval
    exploded to covered 6h bins, point mapped to its bin, equi-join,
    exact filter. The aggregate over the bin join must hash-equal the
    plain BETWEEN join the oracle runs; the operator-level law over
    random (including overlapping) intervals is pinned in
    tests/test_properties.py."""
    from tradecat_spark.operators.rangejoin import bin_range_join

    gap = GAP_SEC * 3
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(e, ["user_id"], "ts", gap)
    iv = s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    j = bin_range_join(
        e, iv, ["user_id"], "ts", "s_start", "s_end", bin_sec=gap
    )
    return j.groupBy("user_id", "session_idx", "s_start").agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        F.unix_micros("s_start").alias("session_start_us"),
        "n_events",
    )
