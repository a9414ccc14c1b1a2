"""Perceptual-hash LSH joins over (doc_id, b0..b3) hash tables.

Operator-level home (r12) for the band/probe candidate generation and
hamming verification that the batch image-dedup lanes
(`plans/q_multimodal.py`, hash-gated since r11) and the streaming
image-hash store (`streaming/phash.py`, the ingest pipeline's 6th
store) share — one implementation, so the pairs a stream emits against
its store and the pairs a batch query computes can never drift.

Scale shape: inputs are 5-scalar rows (payload bytes never reach these
joins), candidates come from 16-bit band buckets (exact, or 1-bit
multi-probe for the recall-repaired radius-11 guarantee), oversized
buckets fall back to anchor stars (the shared star-cap guard in
operators/minhash.py), and verification is two id-joins plus a
JVM-side popcount fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tradecat_spark.operators.minhash import minhash_candidate_pairs

#: hamming radius for "near-duplicate image": 12 of 64 aHash bits.
PHASH_HAMMING_MAX = 12


def phash_sig_rows(wide: DataFrame, probe: bool) -> DataFrame:
    """(doc_id, band, band_sig) bucket rows from the 4-column hash
    table. ``probe=False``: one row per band (exact value).
    ``probe=True``: 17 rows per band — the exact value plus all 16
    single-bit flips (symmetric 1-bit multi-probe: two hashes whose
    band values differ by <= 2 bits meet in some probe bucket, since
    each side flips one of the differing bits; pigeonhole over 4 bands
    then covers total hamming <= 11)."""
    sig = wide.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).cast("int").alias("band"),
                    F.col(f"b{j}").alias("band_val"),
                )
                for j in range(4)
            ])
        ).alias("s"),
    ).select("doc_id", F.col("s.band").alias("band"),
             F.col("s.band_val").alias("band_val"))
    if not probe:
        return sig.select(
            "doc_id", "band", F.col("band_val").cast("string").alias("band_sig")
        )
    flips = F.explode(
        F.array(F.lit(-1), *[F.lit(i) for i in range(16)])
    ).alias("flip")
    return sig.select("doc_id", "band", "band_val", flips).select(
        "doc_id",
        "band",
        F.when(F.col("flip") < 0, F.col("band_val"))
        .otherwise(
            # shiftleft's numBits arg is py-int-only; expr form takes a column
            F.expr("band_val ^ shiftleft(1, flip)")
        )
        .cast("string")
        .alias("band_sig"),
    )


def phash_candidate_pairs(wide: DataFrame, probe: bool) -> DataFrame:
    """Star-capped candidate pairs from exact-band or multi-probe
    bucket rows (reuses ``minhash_candidate_pairs`` verbatim)."""
    return minhash_candidate_pairs(phash_sig_rows(wide, probe))


def phash_delta_candidate_pairs(
    new_wide: DataFrame,
    old_wide: DataFrame,
    probe: bool = True,
    cap: int = 64,
) -> DataFrame:
    """Candidate pairs INTRODUCED by a delta against an existing hash
    table — the production trigger shape: a 100 TB ingest must not
    re-join the whole store per batch, it probes the store's buckets
    with the delta's (tiny) signature rows.

    Two parts, one per pair provenance:

    * within-delta: the ordinary star-capped self-join
      (``phash_candidate_pairs`` over the new rows only);
    * delta x store: the delta's bucket rows inner-join the store's on
      (band, band_sig) — at scale the store side is bucket-partitioned
      so this prunes to the delta's buckets. The star-cap guard
      carries over: a matched STORE bucket larger than ``cap`` emits
      only (new doc ↔ bucket-min anchor) star rows instead of all
      members, O(delta) not O(delta x bucket). As with the batch
      guard, stars sacrifice pairwise candidacy but preserve connected
      components CUMULATIVELY (induction over ingest order): every
      doc that enters an oversized bucket pairs with the bucket's
      then-current min-id anchor — an already-ingested member — so
      each arrival attaches to the bucket's existing connected
      subgraph, and the union of per-delta emissions keeps every
      bucket's members connected even as the min-id anchor shifts.

    Pair ordering follows the batch convention (doc_a < doc_b), so
    the union of per-delta emissions over an ingest history is
    set-comparable with the full-table generator — EQUAL whenever no
    bucket exceeds ``cap`` (pytest law), component-equal beyond it.
    """
    from pyspark.sql import Window

    new_sig = phash_sig_rows(new_wide, probe)
    old_sig = phash_sig_rows(old_wide, probe)
    within = minhash_candidate_pairs(new_sig, cap=cap)
    w = Window.partitionBy("band", "band_sig")
    old_sized = old_sig.select(
        F.col("doc_id").alias("old_id"), "band", "band_sig",
        F.count(F.lit(1)).over(w).alias("bucket_n"),
        F.min("doc_id").over(w).alias("anchor"),
    )
    # oversized buckets are REDUCED to their one anchor row before the
    # join, so the guard bounds join output (O(delta) rows), not just
    # the post-distinct set
    small = old_sized.filter(F.col("bucket_n") <= cap).select(
        "band", "band_sig", "old_id"
    )
    big = (
        old_sized.filter(F.col("bucket_n") > cap)
        .select("band", "band_sig", F.col("anchor").alias("old_id"))
        .distinct()
    )
    cross = (
        new_sig.withColumnRenamed("doc_id", "new_id")
        .join(small.unionByName(big), ["band", "band_sig"])
        .filter(F.col("new_id") != F.col("old_id"))
        .select(
            F.least("new_id", "old_id").alias("doc_a"),
            F.greatest("new_id", "old_id").alias("doc_b"),
        )
    )
    return within.unionByName(cross).distinct()


def phash_verify_pairs(pairs: DataFrame, wide: DataFrame) -> DataFrame:
    """Join candidates back to the hash table and keep pairs within
    the hamming radius (JVM-side popcount fold)."""
    wa = wide.alias("wa")
    wb = wide.alias("wb")
    ham = sum(
        F.bit_count(F.col(f"wa.b{j}").bitwiseXOR(F.col(f"wb.b{j}")))
        for j in range(4)
    ).cast("int")
    return (
        pairs.join(wa, F.col("wa.doc_id") == F.col("doc_a"))
        .join(wb, F.col("wb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )
