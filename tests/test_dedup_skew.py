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
