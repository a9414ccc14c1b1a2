"""Checksum twins for the Python-surface queries (r4 verdict item 2).

Each twin runs the REAL applyInPandas / state-machine pipeline and
reduces it to columns with exact DuckDB oracles; this test mirrors the
driver's hash gate at sf0.001 (the driver re-checks at sf0.01).
Determinism matters here: DuckDB 1.0 lambda folds are evaluated
in-place over shared vectors, and two classes of corruption were found
while building these (struct_pack accumulators; whole-list CASE
pass-through) — the twins use only the safe list-fold forms, and the
oracle runs TWICE to pin determinism.
"""

from __future__ import annotations

import pytest

from oracle_utils import assert_frames_match
from tradecat_spark.plans.registry import load_all

TWINS = (
    "indicator_surface_checksum",
    "indicator_batch_checksum",
    "signal_rule_events_checksum",
    # may be EMPTY at sf0.001 (no subset rule fires on 15-user data);
    # the sf0.01 driver gate carries the non-trivial rows
    "signal_pack_subset_checksum",
)


@pytest.mark.parametrize("name", TWINS)
def test_checksum_twin_matches_oracle(spark, duck, sf_dir, name):
    spec = load_all()[name]
    sp = spec.fn(spark, sf_dir).toPandas()
    if name != "signal_pack_subset_checksum":
        assert len(sp) > 0
    first = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(sp, first, name)
    again = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(sp, again, f"{name} (rerun — fold determinism)")


def test_surface_checksum_covers_many_families():
    """The twin must stay a BROAD value gate: n_bars + ≥40 indicator
    columns spanning selections, counts, and all four fold families."""
    from tradecat_spark.plans.q_checksums import _checksum_cols

    names = [n for n, _, _, _ in _checksum_cols()]
    assert len(names) >= 40
    for family_marker in ("don_high", "macd_cross", "atr14", "rsi_state",
                          "ema99", "up_run", "tenkan", "last_close"):
        assert family_marker in names
