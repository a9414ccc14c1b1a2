"""Laws for the scale-path operators (plans/q_scale.py)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tradecat_spark.plans.q_scale import (
    _BUCKET_DIV,
    _M,
    _WORD_BITS,
    _ZDOM,
    _z_expr,
)


def _morton_py(x: int, y: int) -> int:
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.integers(min_value=0, max_value=_ZDOM - 1),
    st.integers(min_value=0, max_value=_ZDOM - 1),
)
@settings(max_examples=60, deadline=None)
def test_zorder_sql_expr_matches_bit_interleave(x, y):
    """The div/mod arithmetic rendering must equal true bit
    interleaving, and deinterleaving must round-trip (the property that
    makes per-bucket x/y spans tight)."""
    con = duckdb.connect()
    (z,) = con.execute(
        f"SELECT {_z_expr(str(x), str(y), '//')}"
    ).fetchone()
    assert z == _morton_py(x, y)
    # deinterleave: even bits → x, odd bits → y
    xr = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    yr = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (xr, yr) == (x, y)


def test_zorder_buckets_are_tiles():
    """Every 256-code bucket is one 16×16 (x, y) tile: all codes in a
    bucket share their high interleaved bits, so both key spans are
    bounded by 16 — THE locality guarantee the gated query reports."""
    tile = {}
    for x in range(_ZDOM):
        for y in range(0, _ZDOM, 7):
            b = _morton_py(x, y) // _BUCKET_DIV
            lo_x, hi_x, lo_y, hi_y = tile.get(
                b, (x, x, y, y)
            )
            tile[b] = (
                min(lo_x, x), max(hi_x, x), min(lo_y, y), max(hi_y, y)
            )
    for b, (lo_x, hi_x, lo_y, hi_y) in tile.items():
        assert hi_x - lo_x < 16, b
        assert hi_y - lo_y < 16, b


def test_zorder_beats_single_key_layout_for_cross_predicates(spark, sf001_dir):
    """A selective x-range predicate must overlap strictly fewer
    Z-buckets than day-only buckets (where every bucket spans all x) —
    the file-skipping win the layout buys. Needs sf0.01: at sf0.001 the
    user domain fits ONE 16-wide x tile and the ratio is undefined."""
    from tradecat_spark.plans.registry import load_all

    rows = (
        load_all()["zorder_curve_layout"]
        .fn(spark, sf001_dir)
        .collect()
    )
    assert len(rows) > 3
    x0, x1 = 0, 15  # one x tile
    z_overlap = sum(
        1 for r in rows if not (r.x_max < x0 or r.x_min > x1)
    )
    # day-bucketing baseline: every day bucket holds (almost) the full
    # x range, so the same predicate overlaps every bucket
    assert z_overlap < len(rows) / 2, (z_overlap, len(rows))


@given(
    st.sets(st.integers(min_value=0, max_value=10**6), max_size=40),
    st.lists(st.integers(min_value=0, max_value=10**6), max_size=40),
)
@settings(max_examples=30, deadline=None)
def test_bloom_never_false_negative(keys, probes):
    """For ANY key set, every inserted key must test positive — the law
    the gated query's n_missed = 0 row asserts on the driver data."""
    con = duckdb.connect()

    def positions(k: int) -> list[int]:
        out = []
        for i in range(3):
            (p,) = con.execute(
                f"SELECT ('0x' || substr(md5('{k}'), {1 + 8 * i}, 8))"
                f"::BIGINT % {_M}"
            ).fetchone()
            out.append(p)
        return out

    words: dict[int, int] = {}
    for k in keys:
        for p in positions(k):
            words[p // _WORD_BITS] = words.get(p // _WORD_BITS, 0) | (
                1 << (p % _WORD_BITS)
            )

    def member(k: int) -> bool:
        return all(
            words.get(p // _WORD_BITS, 0) & (1 << (p % _WORD_BITS))
            for p in positions(k)
        )

    for k in keys:
        assert member(k)
    for q in probes:
        if q in keys:
            assert member(q)
        # non-members may false-positive; that's the contract


def test_law_queries_hold_on_driver_data(spark, sf_dir):
    """The r5 law-query family must report its law TRUE on every row —
    the driver hashes the outcomes, this pins them in pytest too."""
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    kmv = specs["kmv_merge_law"].fn(spark, sf_dir).toPandas()
    assert len(kmv) > 0 and kmv.law_holds.all()
    cms = specs["cms_frequency_law"].fn(spark, sf_dir).toPandas()
    assert len(cms) > 0 and cms.no_undercount.all()
    cdc = specs["cdc_incremental_equivalence"].fn(spark, sf_dir).toPandas()
    assert len(cdc) > 0 and cdc.law_holds.all()


def test_cms_error_eval_consistent_with_law(spark, sf_dir):
    """The tiered error eval must partition the law query's key set
    exactly (sum of n_keys = distinct users), report non-negative
    overcounts bounded by the tier max, and agree with a pandas
    recompute of the eps*N bound share."""
    from tradecat_spark.operators.cms import CMS_W
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    law = specs["cms_frequency_law"].fn(spark, sf_dir).toPandas()
    ev = specs["cms_error_eval"].fn(spark, sf_dir).toPandas()
    assert ev.n_keys.sum() == len(law)
    assert (ev.max_overcount >= 0).all()
    assert ((ev.frac_within_eps >= 0) & (ev.frac_within_eps <= 1)).all()
    n_total = law.true_cnt.sum()
    law["tier"] = law.true_cnt.apply(lambda n: int(n).bit_length() - 1)
    law["within"] = CMS_W * law.overcount <= 2 * n_total
    want = law.groupby("tier").agg(
        n_keys=("within", "size"),
        n_within=("within", "sum"),
        max_over=("overcount", "max"),
    )
    got = ev.set_index("tier").sort_index()
    assert (got.n_keys == want.n_keys).all()
    assert (got.n_within_eps == want.n_within).all()
    assert (got.max_overcount == want.max_over).all()
    assert (ev.eps_n == round(2 * n_total / CMS_W, 6)).all()


def test_pagerank_mass_and_floor_laws(spark, sf_dir):
    """Fixed-point PageRank invariants: total mass never exceeds SCALE
    (flooring only loses), every isolated node sits exactly at the base
    term, and connected nodes sit at or above it."""
    from tradecat_spark.plans.q_cluster import _PR_SCALE
    from tradecat_spark.plans.registry import load_all

    df = load_all()["pagerank_similarity_graph"].fn(spark, sf_dir).toPandas()
    n = len(df)
    assert n > 0
    base = (15 * _PR_SCALE) // (100 * n)
    assert df.pr_micro.sum() <= _PR_SCALE
    isolated = df[df.degree == 0]
    assert (isolated.pr_micro == base).all()
    assert (df.pr_micro >= base).all()


def test_iterative_ops_reliable_checkpoint_parity(spark, sf_dir, tmp_path):
    """r5 verdict item 4: the iterative ops' reliable-checkpoint mode
    (per-iteration parquet write-read, fault-tolerant at scale) must be
    byte-equivalent to the default localCheckpoint mode — the lineage
    cut is an execution detail, never a semantics knob."""
    from tradecat_spark.plans.q_cluster import (
        _lloyd,
        pagerank_similarity_graph,
    )

    pr_default = sorted(
        map(tuple, pagerank_similarity_graph(spark, sf_dir).collect())
    )
    pr_reliable = sorted(
        map(
            tuple,
            pagerank_similarity_graph(
                spark, sf_dir, checkpoint_dir=str(tmp_path / "pr")
            ).collect(),
        )
    )
    assert pr_default == pr_reliable and len(pr_default) > 0
    # the reliable run actually committed per-iteration parquet, and
    # the per-iteration GC collected every superseded cut: only the
    # LAST iteration survives (plus the reused non-numbered tags)
    assert (tmp_path / "pr" / "pr_edges").is_dir()
    assert (tmp_path / "pr" / "pr_iter_2").is_dir()
    assert not (tmp_path / "pr" / "pr_iter_0").exists()
    assert not (tmp_path / "pr" / "pr_iter_1").exists()

    _, cent_default = _lloyd(spark, sf_dir)
    _, cent_reliable = _lloyd(
        spark, sf_dir, checkpoint_dir=str(tmp_path / "km")
    )
    cd = {r["cid"]: (r["cv"], r["n_members"]) for r in cent_default.collect()}
    cr = {r["cid"]: (r["cv"], r["n_members"]) for r in cent_reliable.collect()}
    assert cd == cr and len(cd) > 0
    # lloyd cuts at i=0,1; committing cent_1 GCs cent_0
    assert (tmp_path / "km" / "lloyd_cent_1").is_dir()
    assert not (tmp_path / "km" / "lloyd_cent_0").exists()


def test_join_advice_est_out_is_exact_and_broadcast_matches_catalyst(
    spark, sf_dir
):
    """Two laws for the advisor (r12): (1) est_out_rows is the EXACT
    join cardinality — check it against a real join's count for every
    advised pair; (2) where the advisor says 'broadcast', Catalyst's
    executed plan for that equi-join under default thresholds is
    indeed a BroadcastHashJoin (the advisor and the engine agree on
    the obvious cases at test scale)."""
    from pyspark.sql import functions as F

    from tradecat_spark.catalog import load_table
    from tradecat_spark.plans.q_scale import _ADVISED_JOINS
    from tradecat_spark.plans.registry import load_all

    advice = {
        r["join_name"]: r
        for r in load_all()["join_strategy_advice"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(advice) == {j[0] for j in _ADVISED_JOINS}
    for name, lt, lk, rt, rk in _ADVISED_JOINS:
        left = load_table(spark, sf_dir, lt).select(lk).filter(
            F.col(lk).isNotNull()
        )
        right = load_table(spark, sf_dir, rt).select(rk).filter(
            F.col(rk).isNotNull()
        )
        joined = left.join(right, F.col(lk) == F.col(rk))
        assert joined.count() == advice[name]["est_out_rows"], name
        if advice[name]["decision"] == "broadcast":
            plan = (
                joined._jdf.queryExecution().executedPlan().toString()
            )
            assert "BroadcastHashJoin" in plan, (name, plan)
        # skew factor is max/avg frequency: never below 1 by definition
        assert advice[name]["skew6"] >= 1.0, name
