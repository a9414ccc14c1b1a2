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
