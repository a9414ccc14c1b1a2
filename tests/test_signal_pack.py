"""The 129-rule pack: counts, compilation, column-vs-python agreement.

Mirrors the reference's pack shape exactly
(services/signal-service/src/rules/__init__.py: 129 rules, 8
categories) and asserts the Spark compiler covers every rule.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import Column

from tradecat_spark.signals.pack import (
    ALL_RULES,
    RULES_BY_CATEGORY,
    RULE_COUNT,
)
from tradecat_spark.signals.rules import (
    compile_condition,
    condition_fields,
    condition_sql,
    eval_condition_py,
)

#: the reference's per-category counts (rules/__init__.py)
REF_COUNTS = {
    "core": 20, "momentum": 27, "trend": 19, "volatility": 15,
    "volume": 13, "futures": 11, "pattern": 16, "misc": 8,
}

#: label vocabulary per string field, for fuzzing
LABELS = {
    "rsi_state": ["overbought", "oversold", "neutral"],
    "rsi_divergence": ["none", "bearish_div", "bullish_div"],
    "kdj_signal": ["continue", "golden_cross", "death_cross",
                   "j_oversold", "j_overbought"],
    "st_state": ["up", "down"],
    "pt_state": ["bull", "range", "bear"],
    "ichi_signal": ["buy", "sell", "neutral"],
    "zl_state": ["bull", "range", "bear"],
    "cloud_side": ["above", "below"],
    "tl_state": ["up", "down"],
    "ls_signal": ["long", "short"],
    "ribbon_state": ["bull", "bear", "mixed"],
    "regime": ["bull_stack", "bear_stack", "tangled"],
    "vol_class": ["low", "mid", "high", "extreme"],
    "flip_signal": ["none", "bull_flip", "bear_flip"],
    "smc_bias": ["bullish", "bearish", "neutral"],
    "struct_event": ["none", "BOS_up", "BOS_down", "CHoCH_up", "CHoCH_down"],
    "pattern": ["none", "doji", "hammer", "bullish_engulfing",
                "double_top", "head_shoulders_top", "triangle"],
    "price_pos": ["in_va", "above_va", "below_va"],
    "liq_level": ["poor", "fair", "good", "excellent"],
    "scalp_signal": ["long", "short"],
    "fib_state": ["up", "down"],
}


def test_pack_matches_reference_shape():
    assert RULE_COUNT == 129
    assert {k: len(v) for k, v in RULES_BY_CATEGORY.items()} == REF_COUNTS
    # every rule maps back to a reference rule by original name
    assert all(r.ref_name for r in ALL_RULES)
    # engine-side names are unique (the reference reuses two names
    # across categories; ours are disambiguated)
    assert len({r.name for r in ALL_RULES}) == 129


def test_every_rule_compiles_to_column(spark):
    for r in ALL_RULES:
        assert isinstance(compile_condition(r), Column), r.name


def test_sql_forms_cover_every_rule():
    missing = [r.name for r in ALL_RULES if condition_sql(r) is None]
    # every condition — including the rsi-confluence compounds — has a
    # SQL rendering; rules stay out of the hash gate only when a
    # condition FIELD is not derivable in the snapshot
    assert missing == []


def _random_snapshot_rows(n_fields: set[str], rows: int = 400):
    rng = random.Random(11)
    out = []
    for _ in range(rows):
        row = {}
        for f in n_fields:
            if f in LABELS:
                row[f] = rng.choice(LABELS[f])
            else:
                # spread across the thresholds the pack uses
                row[f] = rng.choice(
                    [-120, -80, -20, -5, -2, -1, 0, 0.5, 1, 1.5, 2, 3, 5,
                     8, 11, 25, 50, 60, 75, 85, 101]
                ) + rng.random()
        out.append(row)
    return out


def test_column_and_python_eval_agree_on_pack(spark):
    """Fuzz every pack rule: the compiled Column and the streaming-path
    Python evaluator must agree row-for-row on randomized prev/curr
    snapshots (same contract the reference's check_condition defines)."""
    fields = set()
    for r in ALL_RULES:
        fields |= condition_fields(r)
    rows = _random_snapshot_rows(fields)
    # prev/curr pairs: consecutive rows
    pairs = list(zip(rows[:-1], rows[1:]))
    flat = [
        {**{f"prev_{k}": v for k, v in p.items()}, **c, "i": i}
        for i, (p, c) in enumerate(pairs)
    ]
    df = spark.createDataFrame(pd.DataFrame(flat))
    for r in ALL_RULES:
        col_hits = {
            row["i"] for row in df.filter(compile_condition(r)).select("i").collect()
        }
        py_hits = {
            i for i, (p, c) in enumerate(pairs) if eval_condition_py(r, p, c)
        }
        assert col_hits == py_hits, r.name


def test_full_pack_query_runs(spark, sf_dir):
    from tradecat_spark.plans.q_signal_pack import signal_rule_pack_129

    out = signal_rule_pack_129(spark, sf_dir)
    assert out.columns == ["event_type", "rule", "category", "direction",
                           "strength"]
    assert out.count() >= 0


def test_sql_subset_size():
    from tradecat_spark.plans.q_signal_pack import pack_sql_rules

    assert len(pack_sql_rules()) == 129


def test_snapshot_final_states_match_ind_twins(spark, sf_dir):
    """The snapshot's per-row path-dependent states, at the final row,
    must equal the standalone ind_* fold queries — at sf0.001 every
    key's history is under the twins' 500-bar tail, so the full-prefix
    laws coincide exactly (harmonic and price_pos are excluded: they
    deliberately use the snapshot's bounded-window conventions)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tradecat_spark.plans.q_signal_pack import build_snapshot
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    w = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    last = (
        build_snapshot(spark, sf_dir)
        .withColumn("rn_", F.row_number().over(w))
        .filter("rn_ = 1")
        .select("event_type", "adx", "st_state", "ls_signal", "tl_state",
                "zl_state", "pt_state", "pt_strength", "smc_bias",
                "struct_event")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )

    def twin(name, cols):
        return (
            specs[name].fn(spark, sf_dir).select("event_type", *cols)
            .toPandas().set_index("event_type").sort_index()
        )

    adx = twin("ind_adx_di", ["adx"])
    st = twin("ind_supertrend_fold", ["st_state"])
    ha = twin("ind_heikin_long_short", ["ls_signal"])
    tl = twin("ind_trend_line", ["tl_state"])
    zl = twin("ind_zero_lag_bands", ["zl_state"])
    pt = twin("ind_precision_trend", ["pt_state", "pt_strength"])
    smc = twin("ind_smc_structure", ["smc_bias", "struct_event"])

    assert (last["adx"] == adx["adx"]).all()
    assert (last["st_state"] == st["st_state"]).all()
    assert (last["ls_signal"] == ha["ls_signal"]).all()
    assert (last["tl_state"] == tl["tl_state"]).all()
    assert (last["zl_state"] == zl["zl_state"]).all()
    assert (last["pt_state"] == pt["pt_state"]).all()
    assert (last["pt_strength"] == pt["pt_strength"]).all()
    assert (last["smc_bias"] == smc["smc_bias"]).all()
    assert (last["struct_event"] == smc["struct_event"]).all()
