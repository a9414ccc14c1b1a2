"""Intent-level checks for the quality/ops queries (plans/q_quality.py).

The oracle-parity suite proves Spark==DuckDB; these prove the semantics
are the *intended* ones (reference 08_quality.sql + enum DDL) on
hand-crafted frames where the expected output is known by inspection.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tradecat_spark.plans.q_quality import (
    ALERT_RULES,
    LINEAGE_EDGES,
    quality_lineage_closure,
)


def test_lineage_closure_depths(spark, sf_dir):
    """Known-by-inspection hops: 1m→cagg=1, →meta=2, →indicator=3,
    →signal=4, →cards=5 is beyond _MAX_DEPTH+1 iterations? No — the
    loop runs depth 1..5, cards included."""
    out = {
        (r["root"], r["downstream"]): r["depth"]
        for r in quality_lineage_closure(spark, sf_dir).collect()
    }
    assert out[("candles_1m", "candles_5m")] == 1
    assert out[("candles_1m", "candles_meta_1h")] == 2
    assert out[("candles_1m", "indicator_snapshot")] == 3
    assert out[("candles_1m", "signal_events")] == 4
    assert out[("candles_1m", "ranking_cards")] == 5
    assert out[("metrics_5m", "candles_meta_1h")] == 2
    # a root never reaches the other root
    assert ("metrics_5m", "candles_1m") not in out
    # closure is exactly the reachable set — no phantom nodes
    nodes = {d for _, d, _ in LINEAGE_EDGES} | {u for u, _, _ in LINEAGE_EDGES}
    assert {d for _, d in out} <= nodes


def test_alert_rules_config_is_the_ddl_preset():
    """The config mirrors 08_quality.sql:222-228 — 5 rules, unique
    names, operators restricted to the DDL's comment set."""
    names = [r[0] for r in ALERT_RULES]
    assert len(names) == 5 == len(set(names))
    assert {r[3] for r in ALERT_RULES} <= {">", "<", "=", "!="}
    by_name = {r[0]: r for r in ALERT_RULES}
    assert by_name["kline_gap_critical"][4] == 0.05
    assert by_name["kline_gap_critical"][5] == "critical"
    assert by_name["ingest_latency_warning"][1] == "*"


@pytest.fixture()
def crafted_events(spark):
    """One symbol, a 2-hour minute grid with: a 30-min hole (gap),
    one 10x price jump (price_spike), and a repeated close (stale)."""
    t0 = pd.Timestamp("2025-06-01 00:00:00")
    rows = []
    eid = 0
    for m in range(120):
        if 60 <= m < 90:  # the hole
            continue
        v = 100.0 + (m % 7)
        if m == 104:
            # last minute of the 01:40 5m bucket => becomes that bar's
            # close (max_by(value, ts)) => a >1.0 jump vs the prev bar
            v = 1000.0
        rows.append(
            dict(event_id=eid, ts=t0 + pd.Timedelta(minutes=m),
                 user_id=1, event_type="E", value=v, props="")
        )
        eid += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def test_anomaly_detectors_fire_where_expected(spark, crafted_events, monkeypatch, tmp_path):
    import tradecat_spark.plans.q_quality as Q

    monkeypatch.setattr(Q, "_events", lambda s, d: crafted_events)
    log = Q.quality_anomaly_log(spark, "unused").toPandas()
    kinds = set(log["anomaly_type"])
    assert "gap" in kinds and "price_spike" in kinds
    gap_rows = log[log["anomaly_type"] == "gap"]
    # the hole spans bar 00:55 → bar 01:30: a 35-minute bar-to-bar gap
    assert (gap_rows["detail"] == 2100.0).any()
    spike = log[log["anomaly_type"] == "price_spike"]
    # the 9x up-jump is critical; the drop back (|Δ|/1000 = 0.9) warns
    assert set(zip(spike["bucket_ts"], spike["severity"])) >= {
        ("2025-06-01 01:40:00", "critical"),
        ("2025-06-01 01:45:00", "warning"),
    }


def test_ingest_batch_status_thresholds(spark, crafted_events, monkeypatch):
    import tradecat_spark.plans.q_quality as Q

    monkeypatch.setattr(Q, "_events", lambda s, d: crafted_events)
    audit = Q.quality_ingest_batches(spark, "unused").toPandas()
    assert len(audit) == 1
    row = audit.iloc[0]
    # 90 present minutes over a 120-minute span → gap_ratio 0.25 → failed
    assert row["actual_rows"] == 90
    assert row["expected_rows"] == 120
    assert row["gap_ratio"] == 0.25
    assert row["status"] == "failed"

    tasks = Q.quality_backfill_tasks(spark, "unused").toPandas()
    assert len(tasks) == 1 and tasks.iloc[0]["priority"] == 1


def test_alert_eval_fires_on_crafted_gap(spark, crafted_events, monkeypatch):
    import tradecat_spark.plans.q_quality as Q

    monkeypatch.setattr(Q, "_events", lambda s, d: crafted_events)
    fired = Q.quality_alert_rules_eval(spark, "unused").toPandas()
    by_rule = set(fired["rule_name"])
    # 25% gap trips both kline rules (and the trades twin); the 30-min
    # hole is a 1800s latency > 300s
    assert {"kline_gap_warning", "kline_gap_critical",
            "trades_gap_warning", "ingest_latency_warning"} <= by_rule
    assert "orderbook_seq_break" not in by_rule  # ids are in order
