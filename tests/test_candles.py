"""Pattern-name parity fixtures for the full TA-Lib CDL set.

One canonical textbook fixture per CDL name (61 names; engulfing ships
as its bullish/bearish split labels). Each fixture is a calm 12-bar
preamble — body ~0.4, range ~1.0, so the TA-Lib-style trailing averages
(body_long ~0.4, body_doji ~0.1, shadow_very_short ~0.1, near ~0.2,
equal ~0.05) are well-defined — followed by the pattern bars; the
detector must fire the expected name (and direction) on the LAST bar,
and pure-preamble bars must stay quiet for multi-bar reversals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tradecat_spark.indicators.candles import CDL_LABELS, Candles

# (open, high, low, close) preamble: alternating flat bars around 100
_PRE = [
    (100.0, 100.7, 99.7, 100.4),
    (100.4, 100.7, 99.7, 100.0),
] * 6


def detect(*bars):
    rows = _PRE + [tuple(map(float, b)) for b in bars]
    o, h, l, c = (np.array(x) for x in zip(*rows))  # noqa: E741
    return dict(Candles(o, h, l, c).detect(len(rows) - 1))


# name -> (expected_direction, pattern bars appended to the preamble)
FIXTURES = {
    "two_crows": ("bear", [
        (100, 103.1, 99.9, 103),
        (104.5, 104.6, 103.9, 104),
        (104.3, 104.4, 101.9, 102),
    ]),
    "three_black_crows": ("bear", [
        (100, 102.6, 99.9, 102.5),
        (102.4, 102.5, 101.0, 101.0),
        (102.0, 102.1, 100.2, 100.2),
        (101.0, 101.1, 99.2, 99.2),
    ]),
    "three_inside": ("bull", [
        (103, 103.1, 99.9, 100),
        (101, 101.4, 100.6, 101.3),
        (101.2, 103.6, 101.1, 103.5),
    ]),
    "three_line_strike": ("bull", [
        (100, 101.6, 99.9, 101.5),
        (101.4, 103.1, 101.3, 103),
        (102.9, 104.6, 102.8, 104.5),
        (105, 105.1, 99.4, 99.5),
    ]),
    "three_outside": ("bull", [
        (101, 101.1, 99.9, 100),
        (99.8, 101.4, 99.7, 101.3),
        (101.2, 102.0, 101.1, 101.9),
    ]),
    "three_stars_in_south": ("bull", [
        (103, 103.1, 99.5, 101.5),
        (102.5, 102.6, 100.5, 101.8),
        (101.6, 101.65, 101.35, 101.4),
    ]),
    "three_white_soldiers": ("bull", [
        (100, 101.55, 99.8, 101.5),
        (101, 103.05, 100.9, 103),
        (102.5, 104.55, 102.4, 104.5),
    ]),
    "abandoned_baby": ("bull", [
        (103, 103.1, 100.9, 101),
        (100.2, 100.5, 99.9, 100.21),
        (100.7, 102.6, 100.6, 102.5),
    ]),
    "advance_block": ("bear", [
        (100, 103.2, 99.9, 103),
        (102.5, 104.9, 102.4, 103.7),
        (103.2, 105.6, 103.1, 104.5),
    ]),
    "belt_hold": ("bull", [(100, 102.5, 100.02, 102)]),
    "breakaway": ("bull", [
        (103, 103.1, 100.4, 100.5),
        (100, 100.1, 99.4, 99.5),
        (99.4, 99.45, 98.9, 99.0),
        (98.9, 98.95, 98.3, 98.4),
        (98.5, 100.4, 98.4, 100.3),
    ]),
    "closing_marubozu": ("bull", [(100, 102.5, 99.5, 102.5)]),
    "concealing_baby_swallow": ("bull", [
        (103, 103, 100, 100),
        (100, 100, 97.5, 97.5),
        (97, 98, 96.4, 96.5),
        (98.1, 98.2, 95.9, 96),
    ]),
    "counterattack": ("bull", [
        (102, 102.1, 99.9, 100),
        (98, 100.1, 97.9, 100.02),
    ]),
    "dark_cloud_cover": ("bear", [
        (100, 102.6, 99.9, 102.5),
        (102.8, 102.9, 100.9, 101),
    ]),
    "doji": ("neutral", [(100, 100.5, 99.5, 100.02)]),
    "doji_star": ("bull", [
        (102.5, 102.6, 100.4, 100.5),
        (100.1, 100.3, 99.9, 100.12),
    ]),
    "dragonfly_doji": ("bull", [(100, 100.05, 99.0, 100.02)]),
    "bullish_engulfing": ("bull", [
        (100.5, 100.6, 99.9, 100),
        (99.9, 100.8, 99.8, 100.7),
    ]),
    "bearish_engulfing": ("bear", [
        (100, 100.6, 99.9, 100.5),
        (100.6, 100.7, 99.7, 99.8),
    ]),
    "evening_doji_star": ("bear", [
        (100, 102.6, 99.9, 102.5),
        (102.8, 103.1, 102.7, 102.81),
        (102.2, 102.3, 100.9, 101.0),
    ]),
    "evening_star": ("bear", [
        (100, 102.6, 99.9, 102.5),
        (102.8, 103.1, 102.7, 103.0),
        (102.2, 102.3, 100.9, 101.0),
    ]),
    "gap_side_side_white": ("bull", [
        (100.3, 100.5, 99.8, 100),
        (100.8, 101.6, 100.7, 101.5),
        (100.9, 101.7, 100.85, 101.6),
    ]),
    "gravestone_doji": ("bear", [(100, 101.0, 99.99, 100.02)]),
    "hammer": ("bull", [
        (100, 100.7, 99.7, 100.4),
        (99.95, 99.96, 99.2, 99.8),
    ]),
    "hanging_man": ("bear", [
        (100, 100.7, 99.7, 100.4),
        (100.8, 100.81, 100.1, 100.65),
    ]),
    "harami": ("neutral", [
        (100, 102.1, 99.9, 102),
        (101, 101.5, 100.9, 101.3),
    ]),
    "harami_cross": ("bear", [
        (100, 102.1, 99.9, 102),
        (101, 101.5, 100.9, 101.02),
    ]),
    "high_wave": ("bull", [(100, 101.2, 99.2, 100.3)]),
    "hikkake": ("bull", [
        (100, 101, 99, 100.5),
        (100, 100.6, 99.4, 100.2),
        (100.2, 100.3, 99.2, 99.5),
    ]),
    "hikkake_mod": ("bull", [
        (100, 101, 99, 100.5),
        (100.4, 100.6, 99.4, 99.5),
        (100, 100.3, 99.2, 99.3),
    ]),
    "homing_pigeon": ("bull", [
        (102.5, 102.6, 99.9, 100),
        (101.5, 101.6, 100.9, 101),
    ]),
    "identical_three_crows": ("bear", [
        (102, 102.1, 100.9, 101),
        (101.02, 101.1, 99.9, 100),
        (100.03, 100.1, 98.9, 99),
    ]),
    "in_neck": ("bear", [
        (102.5, 102.6, 100, 100.2),
        (99.8, 100.3, 99.7, 100.22),
    ]),
    "inverted_hammer": ("bull", [
        (100, 100.7, 99.7, 100.4),
        (99.5, 100.3, 99.49, 99.62),
    ]),
    "kicking": ("bull", [
        (102, 102, 100, 100),
        (102.5, 105.2, 102.5, 105.2),
    ]),
    "kicking_by_length": ("bull", [
        (102, 102, 100, 100),
        (102.5, 105.2, 102.5, 105.2),
    ]),
    "ladder_bottom": ("bull", [
        (103, 103.05, 101.4, 101.5),
        (102.5, 102.55, 100.4, 100.5),
        (101.5, 101.55, 99.4, 99.5),
        (99.2, 99.8, 98.6, 98.7),
        (99.5, 100.4, 99.4, 100.3),
    ]),
    "long_legged_doji": ("neutral", [(100, 100.8, 99.3, 100.05)]),
    "long_line": ("bull", [(100, 102.2, 99.8, 102)]),
    "marubozu": ("bull", [(100, 102.02, 99.99, 102)]),
    "mat_hold": ("bull", [
        (100, 102.6, 99.9, 102.5),
        (103.3, 103.4, 102.8, 102.9),
        (102.95, 103.0, 102.65, 102.7),
        (102.75, 102.8, 102.5, 102.55),
        (102.7, 103.9, 102.6, 103.8),
    ]),
    "matching_low": ("bull", [
        (102, 102.1, 100.9, 101),
        (101.8, 101.9, 100.95, 101.03),
    ]),
    "morning_doji_star": ("bull", [
        (102.5, 102.6, 99.9, 100),
        (99.7, 99.8, 99.4, 99.72),
        (99.9, 101.3, 99.8, 101.2),
    ]),
    "morning_star": ("bull", [
        (102.5, 102.6, 99.9, 100),
        (99.7, 99.8, 99.4, 99.5),
        (99.9, 101.3, 99.8, 101.2),
    ]),
    "on_neck": ("bear", [
        (102.5, 102.6, 100, 100.2),
        (99.7, 100.1, 99.6, 100.03),
    ]),
    "piercing": ("bull", [
        (102.5, 102.6, 100, 100.2),
        (99.5, 101.6, 99.4, 101.5),
    ]),
    "rickshaw_man": ("neutral", [(100.0, 101, 99, 100.04)]),
    "rise_fall_three_methods": ("bull", [
        (100, 102.6, 99.9, 102.5),
        (102.3, 102.4, 101.9, 102),
        (101.9, 102.0, 101.5, 101.6),
        (101.5, 101.6, 101.1, 101.2),
        (101.4, 103.6, 101.3, 103.5),
    ]),
    "separating_lines": ("bull", [
        (101, 101.1, 99.4, 99.5),
        (101.03, 103.5, 101.01, 103),
    ]),
    "shooting_star": ("bear", [
        (100, 100.7, 99.7, 100.4),
        (100.8, 101.6, 100.79, 100.92),
    ]),
    "short_line": ("bull", [(100, 100.4, 99.9, 100.25)]),
    "spinning_top": ("neutral", [(100, 100.9, 99.6, 100.3)]),
    "stalled_pattern": ("bear", [
        (100, 101.65, 99.9, 101.6),
        (101.3, 103.05, 101.2, 103),
        (102.8, 103.2, 102.7, 103.1),
    ]),
    "stick_sandwich": ("bull", [
        (102, 102.1, 100.9, 101),
        (101.2, 102.4, 101.1, 102.3),
        (102.5, 102.6, 100.95, 101.04),
    ]),
    "takuri": ("bull", [(100, 100.05, 99.0, 100.02)]),
    "tasuki_gap": ("bull", [
        (100.2, 100.5, 99.8, 100),
        (100.6, 101.4, 100.5, 101.3),
        (101, 101.1, 100.3, 100.4),
    ]),
    "thrusting": ("bear", [
        (102.5, 102.6, 100, 100.2),
        (99.8, 100.9, 99.7, 100.8),
    ]),
    "tristar": ("bear", [
        (100, 100.3, 99.8, 100.04),
        (100.5, 100.7, 100.4, 100.54),
        (100.2, 100.4, 100.1, 100.24),
    ]),
    "unique_three_river": ("bull", [
        (102.5, 102.6, 100.4, 100.5),
        (102, 102.1, 100.2, 100.8),
        (100.3, 100.7, 100.25, 100.6),
    ]),
    "upside_gap_two_crows": ("bear", [
        (100, 103.1, 99.9, 103),
        (104.5, 104.6, 103.9, 104),
        (104.8, 104.9, 103.4, 103.5),
    ]),
    "xside_gap_three_methods": ("bull", [
        (99.8, 100.3, 99.7, 100.2),
        (100.5, 101.3, 100.4, 101.2),
        (101, 101.1, 99.9, 100),
    ]),
}


def test_fixture_inventory_covers_all_labels():
    assert set(FIXTURES) == set(CDL_LABELS)


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_pattern_fires_on_canonical_shape(name):
    direction, bars = FIXTURES[name]
    hits = detect(*bars)
    assert name in hits, f"{name} not in {sorted(hits)}"
    assert hits[name] == direction


def test_preamble_is_quiet_for_reversals():
    """The flat preamble alone must not trigger any multi-bar reversal
    (single-bar shape labels like short_line/spinning_top are allowed —
    TA-Lib classifies every bar's shape)."""
    hits = detect((100.0, 100.7, 99.7, 100.4))
    multi = {n for n, lb in CDL_LABELS.items() if lb >= 1}
    assert not (set(hits) & multi), sorted(set(hits) & multi)


def test_k_pattern_indicator_uses_full_set():
    import pandas as pd

    from tradecat_spark.indicators.library import i_k_pattern

    rows = _PRE + FIXTURES["morning_star"][1]
    o, h, l, c = (np.array(x) for x in zip(*rows))  # noqa: E741
    out = i_k_pattern(pd.DataFrame(
        {"open": o, "high": h, "low": l, "close": c}
    ))
    assert "morning_star" in out["pattern"].split(",")
    assert out["pattern_dir"] == "bull"
    assert out["n_patterns_20"] >= 1


# ---------------------------------------------------------------------------
# price-structure patterns (the 12-label family the reference's
# tradingpatterns/patternpy/trendln stack emits)
# ---------------------------------------------------------------------------
def _zigzag(*targets, tail, bars_per_leg=5, tail_bars=5):
    """Close path interpolating between leg targets, then a drift to
    ``tail``; high/low = close +/- 0.2 so pivot extremes sit at the leg
    apexes (pivot radius 3)."""
    closes = [float(targets[0])]
    for t in targets[1:]:
        prev = closes[-1]
        closes += [
            prev + (t - prev) * (k + 1) / bars_per_leg
            for k in range(bars_per_leg)
        ]
    prev = closes[-1]
    closes += [
        prev + (tail - prev) * (k + 1) / tail_bars for k in range(tail_bars)
    ]
    import pandas as pd

    c = pd.Series(closes)
    return pd.DataFrame(
        {"open": c, "high": c + 0.2, "low": c - 0.2, "close": c}
    )


CHART_FIXTURES = {
    "ascending_triangle": ("bull", (95, 90, 100, 94, 100), 97),
    "descending_triangle": ("bear", (96, 100, 90, 95, 90.05), 92),
    "symmetrical_triangle": ("bull", (95, 90, 100, 93, 96.5), 94.5),
    "rising_wedge": ("bear", (95, 90, 100, 95, 103), 100.5),
    "rising_channel": ("bull", (95, 90, 100, 96, 106.5), 104),
    "falling_wedge": ("bull", (96, 100, 90, 95.5, 88), 90),
    "falling_channel": ("bear", (96, 100, 90, 94, 84), 86),
    "horizontal_channel": ("bull", (95, 90, 100, 90.1, 100.1), 95),
    "double_top": ("bear", (95, 100, 90, 100.1), 85),
    "double_bottom": ("bull", (96, 90, 100, 89.9), 104),
    "head_shoulders_top": ("bear", (95, 96, 90, 100, 92, 96.2), 90),
    "head_shoulders_bottom": ("bull", (96, 94, 100, 90, 98, 93.8), 100),
}


@pytest.mark.parametrize("name", sorted(CHART_FIXTURES))
def test_chart_pattern_fires_on_canonical_shape(name):
    from tradecat_spark.indicators.library import _chart_pattern

    direction, targets, tail = CHART_FIXTURES[name]
    hits = dict(_chart_pattern(_zigzag(*targets, tail=tail)))
    assert name in hits, f"{name} not in {sorted(hits)}"
    assert hits[name] == direction


def test_cdl_parity_queries_survive_short_history(spark, tmp_path):
    """1/6/10-bar keys: every CDL/chart parity oracle must run (no
    empty-list or index crashes in the scan/pivot machinery) and still
    hash-match the detector, which emits nothing (or 'none') there."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as E
    from tests.oracle_utils import assert_frames_match

    rows, eid = [], 0
    for key, n_hours in (("one", 1), ("six", 6), ("ten", 10)):
        for hh in range(n_hours):
            eid += 1
            rows.append({
                "event_id": eid,
                "ts": pd.Timestamp("2025-03-01") + pd.Timedelta(hours=hh),
                "user_id": 1,
                "event_type": key,
                "value": 100.0 + ((hh * 37) % 11) + hh * 0.01,
                "props": "{}",
            })
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    q, o = E.queries(), E.oracle_sql()
    for name in (
        "ind_cdl_singles_parity", "ind_cdl_pairs_parity",
        "ind_cdl_triples_parity", "ind_cdl_wide_parity",
        "ind_chart_patterns_parity",
    ):
        spdf = q[name](spark, str(tmp_path)).toPandas()
        odf = con.execute(o[name]).df()
        assert_frames_match(spdf, odf, f"{name}_short")


def _fixture_events(tmp_path):
    """One events corpus where each key's hourly bars replay a fixture
    (the CDL preamble + pattern bars), so every label's POSITIVE case
    reaches the parity queries — an oracle condition mis-transcribed
    into something unfirable would hash-mismatch here instead of
    matching empty-vs-empty."""
    rows, eid = [], 0
    base = pd.Timestamp("2025-03-01")
    last_ts = {}
    for name, (_, pattern_bars) in FIXTURES.items():
        bars = _PRE + [tuple(map(float, b)) for b in pattern_bars]
        for j, (o, h, l, c) in enumerate(bars):  # noqa: E741
            t0 = base + pd.Timedelta(hours=j)
            for off, v in ((0, o), (15, h), (30, l), (45, c)):
                eid += 1
                rows.append({
                    "event_id": eid, "ts": t0 + pd.Timedelta(minutes=off),
                    "user_id": 1, "event_type": name, "value": v,
                    "props": "{}",
                })
        last_ts[name] = (
            base + pd.Timedelta(hours=len(bars) - 1)
        ).strftime("%Y-%m-%d %H:%M:%S")
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))
    return last_ts


def test_cdl_parity_oracles_fire_on_every_fixture(spark, tmp_path):
    import duckdb

    import __spark_entry__ as E
    from tests.oracle_utils import assert_frames_match
    from tradecat_spark.plans.q_indicators import (
        CDL_PAIRS,
        CDL_SINGLES,
        CDL_TRIPLES,
        CDL_WIDE,
    )

    last_ts = _fixture_events(tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    q, o = E.queries(), E.oracle_sql()
    for qname, label_set in (
        ("ind_cdl_singles_parity", CDL_SINGLES),
        ("ind_cdl_pairs_parity", CDL_PAIRS),
        ("ind_cdl_triples_parity", CDL_TRIPLES),
        ("ind_cdl_wide_parity", CDL_WIDE),
    ):
        spdf = q[qname](spark, str(tmp_path)).toPandas()
        odf = con.execute(o[qname]).df()
        assert_frames_match(spdf, odf, f"{qname}_fixtures")
        for label in label_set:
            if label not in FIXTURES:
                continue
            direction = FIXTURES[label][0]
            hit = spdf[
                (spdf.event_type == label) & (spdf.pattern == label)
                & (spdf.bucket_ts == last_ts[label])
            ]
            assert len(hit) >= 1, f"{qname}: {label} fixture did not fire"
            assert (hit.direction == direction).all(), label


def test_chart_parity_oracle_fires_on_every_fixture(spark, tmp_path):
    import duckdb

    import __spark_entry__ as E
    from tests.oracle_utils import assert_frames_match

    rows, eid = [], 0
    base = pd.Timestamp("2025-03-01")
    for name, (_, targets, tail) in CHART_FIXTURES.items():
        frame = _zigzag(*targets, tail=tail)
        for j, r in frame.iterrows():
            t0 = base + pd.Timedelta(hours=int(j))
            for off, v in ((0, r.open), (15, r.high), (30, r.low),
                           (45, r.close)):
                eid += 1
                rows.append({
                    "event_id": eid, "ts": t0 + pd.Timedelta(minutes=off),
                    "user_id": 1, "event_type": name, "value": float(v),
                    "props": "{}",
                })
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    q, o = E.queries(), E.oracle_sql()
    spdf = q["ind_chart_patterns_parity"](spark, str(tmp_path)).toPandas()
    odf = con.execute(o["ind_chart_patterns_parity"]).df()
    assert_frames_match(spdf, odf, "chart_parity_fixtures")
    for name, (direction, _, _) in CHART_FIXTURES.items():
        hit = spdf[(spdf.event_type == name) & (spdf.pattern == name)]
        assert len(hit) == 1, f"chart fixture {name} did not fire"
        assert hit.direction.iloc[0] == direction, name
