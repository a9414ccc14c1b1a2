"""Adversarial skew test for the LSH candidate-pairs guard.

A degenerate corpus — every document identical — collapses all docs into
ONE (band, band_sig) bucket per band. Without the guard the pairs join
emits n·(n-1)/2 rows per band on a single shuffle key; with the star cap
it emits n-1 rows per band while preserving connected components, so the
cluster/keep-one step is byte-identical to the unguarded result.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tradecat_spark.plans.q_text import BAND_CAP, minhash_candidate_pairs


def _sig_frame(spark, n_docs: int, n_bands: int = 4):
    """All docs share every band signature — the worst-case bucket."""
    rows = [
        (d, b, f"sig{b}") for d in range(n_docs) for b in range(n_bands)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "band", "band_sig"])
    ).withColumn("doc_id", F.format_string("doc%05d", "doc_id"))


def test_degenerate_bucket_emits_star_not_quadratic(spark):
    n = BAND_CAP * 4  # 256 identical docs — far beyond the cap
    pairs = minhash_candidate_pairs(_sig_frame(spark, n)).toPandas()
    # star: every non-anchor doc pairs with the anchor exactly once
    assert len(pairs) == n - 1
    assert set(pairs.doc_a) == {"doc00000"}
    assert set(pairs.doc_b) == {f"doc{i:05d}" for i in range(1, n)}


def test_small_buckets_keep_all_pairs(spark):
    n = 10  # well under the cap
    pairs = minhash_candidate_pairs(_sig_frame(spark, n)).toPandas()
    assert len(pairs) == n * (n - 1) // 2


def test_mixed_buckets_guard_only_the_big_one(spark):
    big, small = BAND_CAP + 5, 3
    rows = [(f"big{d:05d}", 0, "bigsig") for d in range(big)]
    rows += [(f"sml{d:05d}", 0, "smlsig") for d in range(small)]
    sig = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "band", "band_sig"])
    )
    pairs = minhash_candidate_pairs(sig).toPandas()
    big_pairs = pairs[pairs.doc_a.str.startswith("big")]
    sml_pairs = pairs[pairs.doc_a.str.startswith("sml")]
    assert len(big_pairs) == big - 1          # star
    assert len(sml_pairs) == small * (small - 1) // 2  # all pairs


def test_hot_key_merge_batch_stays_bounded(spark, tmp_path):
    """BTC-heavy micro-batch: ~70% of a 50k-row batch lands on ONE
    (symbol, bucket) key — the worst realistic replay/backfill skew.
    The fold must stay correct (sequential open law over the hot key's
    full arrival order) and bounded: the per-key state is one collected
    struct array, never a quadratic join, and the store merge touches
    only the hot day's partition."""
    import time

    from tradecat_spark.streaming.ingest import read_store, upsert_batch

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    n, hot = 50_000, 0.7
    n_hot = int(n * hot)
    rows = []
    for i in range(n_hot):  # hot key: many partial updates of one bar
        rows.append(dict(
            symbol="BTC", bucket_ts=t0, seq=i,
            open=100.0 + (i % 7) * 0.1, high=100.0 + i * 1e-4,
            low=100.0 - i * 1e-4, close=100.0 + (i % 11) * 0.01,
            trade_count=i, is_closed=i == n_hot - 1,
        ))
    for i in range(n - n_hot):  # long tail of cold keys
        rows.append(dict(
            symbol=f"ALT{i % 600:03d}",
            bucket_ts=t0 + pd.Timedelta(minutes=i % 240), seq=n_hot + i,
            open=10.0, high=10.5, low=9.5, close=10.1,
            trade_count=1, is_closed=False,
        ))
    batch = spark.createDataFrame(pd.DataFrame(rows)).repartition(8)
    store = str(tmp_path / "skew_store")

    start = time.monotonic()
    upsert_batch(spark, batch, store, ["symbol", "bucket_ts"],
                 order_col="seq")
    elapsed = time.monotonic() - start
    assert elapsed < 60, f"hot-key merge took {elapsed:.1f}s"

    got = {
        (r["symbol"], r["bucket_ts"]): r
        for r in read_store(spark, store).collect()
    }
    hot_bar = got[("BTC", t0)]
    # closed by the last hot row; open frozen at the last value BEFORE
    # the close (the closing row itself carries open of (n_hot-1)%7)
    assert hot_bar["is_closed"] is True
    assert hot_bar["trade_count"] == n_hot - 1
    assert hot_bar["high"] == 100.0 + (n_hot - 1) * 1e-4
    assert hot_bar["open"] == 100.0 + ((n_hot - 1) % 7) * 0.1
    # cold keys all present: 600 symbols x the distinct minute buckets
    assert len(got) > 600


def test_salted_join_hot_key_spreads_and_matches_plain(spark):
    """70% of a batch on ONE user: the salted join must (a) return
    exactly the plain join's rows, (b) actually scatter the hot key
    across multiple salts."""
    import pandas as pd

    from pyspark.sql import functions as F

    from tradecat_spark.operators.skew import salted_join

    rows = [{"user_id": 1 if i < 7000 else i % 50 + 2, "v": i}
            for i in range(10000)]
    big = spark.createDataFrame(pd.DataFrame(rows))
    small = spark.createDataFrame(
        pd.DataFrame([{"user_id": u, "tag": f"u{u}"}
                      for u in range(1, 60)])
    )
    got = salted_join(big, small, ["user_id"], salts=8)
    plain = big.join(small, "user_id")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, plain.collect()))

    salted = big.withColumn(
        "__salt", F.pmod(F.hash(*big.columns), F.lit(8))
    )
    n_salts = (
        salted.filter(F.col("user_id") == 1)
        .select("__salt").distinct().count()
    )
    assert n_salts >= 4  # hot key genuinely scattered

    # left join keeps unmatched big rows exactly once
    small_missing = small.filter(F.col("user_id") > 30)
    left = salted_join(big, small_missing, ["user_id"], how="left")
    assert left.count() == big.count()


def test_two_level_reservoir_equals_one_pass_under_skew(spark):
    """per_group_topk's two-level pre-filter must lose NOTHING: on an
    adversarially skewed frame (one group 5000 rows, one 3) the result
    equals the direct one-pass rank window for several shard counts —
    and the k boundary sits mid-shard, the case a lossy pre-filter
    would get wrong."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tradecat_spark.operators.reservoir import per_group_topk

    rows = [("hot", i) for i in range(5000)] + [("cold", i) for i in range(3)]
    df = spark.createDataFrame(rows, "source string, doc_id long").repartition(8)
    d = df.withColumn("h", F.md5(F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    want = sorted(
        map(
            tuple,
            d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 10)
            .select("source", "doc_id", "rk")
            .collect(),
        )
    )
    for shards in (1, 2, 8, 64):
        got = sorted(
            map(
                tuple,
                per_group_topk(d, ["source"], ["h", "doc_id"], 10,
                               shards=shards)
                .select("source", "doc_id", "rk")
                .collect(),
            )
        )
        assert got == want, shards
    assert len(want) == 13  # 10 hot + 3 cold


def test_quality_canonical_skew_free_on_identical_corpus(spark, tmp_path):
    """All-identical corpus: every doc collapses into ONE duplicate
    cluster, so a per-cluster row_number window would sort the whole
    corpus in a single task. The canonical query's aggregate form must
    (a) still pick exactly one winner — the lowest doc_id, since all
    quality scores tie — and (b) carry NO Window/Sort over the corpus
    in its optimized plan (the aggregate partial-combines map-side)."""
    from tradecat_spark.plans.q_text import BAND_CAP
    from tradecat_spark.plans.registry import load_all

    n = BAND_CAP * 2  # beyond the star cap: the degenerate bucket
    text = "the same document body repeated everywhere " * 8
    docs = pd.DataFrame(
        dict(
            doc_id=range(1, n + 1),
            text=[text] * n,
            lang=["en"] * n,
            source=["s"] * n,
            n_chars=[len(text)] * n,
        )
    )
    sf = tmp_path / "sf_adversarial"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet")

    fn = load_all()["dedup_quality_canonical"].fn
    out = fn(spark, str(sf))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, plan
    got = out.toPandas()
    assert len(got) == n
    assert got.cluster_id.nunique() == 1
    kept = got[got.is_kept]
    assert len(kept) == 1 and kept.doc_id.iloc[0] == 1


def test_phash_delta_star_guard_bounds_and_preserves_components(spark):
    """The delta-probe star guard (operators/phash.
    phash_delta_candidate_pairs): a degenerate store bucket (every doc
    the same hash) joined by a delta must emit ONE anchor row per
    (new doc, band), never bucket-size rows — and the union of
    per-delta emissions over an ingest history must keep the bucket's
    members in one connected component even though pairwise candidacy
    is sacrificed."""
    from tradecat_spark.operators.components import min_label_components
    from tradecat_spark.operators.phash import (
        phash_delta_candidate_pairs,
    )

    def wide(ids):
        return spark.createDataFrame(
            [(i, 7, 7, 7, 7) for i in ids],
            "doc_id long, b0 int, b1 int, b2 int, b3 int",
        )

    cap = 4
    # ingest history: 3 deltas into one all-identical bucket
    history = [list(range(0, 6)), list(range(6, 12)), list(range(12, 20))]
    emitted = []
    stored: list[int] = []
    for ids in history:
        cand = phash_delta_candidate_pairs(
            wide(ids), wide(stored), probe=False, cap=cap
        ).collect()
        emitted += [(r["doc_a"], r["doc_b"]) for r in cand]
        stored += ids
        # bound: oversized store bucket -> one anchor per (new, band);
        # within-delta stays star-capped too, so per-delta emissions
        # are O(delta), never O(delta x bucket)
        assert len(cand) <= len(ids) * 2
    nodes = spark.createDataFrame([(i,) for i in stored], "doc_id long")
    pairs = spark.createDataFrame(
        sorted(set(emitted)), "doc_a long, doc_b long"
    )
    labels = min_label_components(nodes, pairs).collect()
    assert {r["cluster_id"] for r in labels} == {0}  # one component
