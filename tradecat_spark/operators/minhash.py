"""MinHash/LSH signature recipe + incremental-delta screening.

Single home for the signature algebra shared by the batch dedup lane
(`plans/q_text.py`: dedup_minhash_bands, dedup_incremental_delta) and
the streaming screen (`streaming/dedup.py`), so the silver store a
stream persists and the signatures a batch query computes can never
drift. Reference behavior: the incremental shape mirrors
dedup_incremental_delta's oracle — exact-hash lane for every doc,
LSH band lane for shingle-able docs, broadcast-delta probes so the
base (the 100 TB side) streams through map-side hash joins and is
never self-joined.

Signature-row schema (the silver store's data columns):
  doc_id, h (md5 of text), band (int; -1 = the exact-hash row every
  doc gets, 0..3 = LSH band rows for docs with >= SHINGLE_WORDS
  words), band_sig (null on the band=-1 row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_SEEDS = 8          # minhash permutations
BAND_ROWS = 2        # rows per LSH band -> 4 bands
SHINGLE_WORDS = 5    # word-shingle width
BAND_CAP = 64        # max bucket size for all-pairs; beyond → star pairs


def minhash_candidate_pairs(sig: DataFrame, cap: int = BAND_CAP) -> DataFrame:
    """Skew-proof LSH candidate pairs from (doc_id, band, band_sig) rows.

    A degenerate bucket — one band_sig shared by millions of docs (all-
    identical boilerplate, empty pages) — would make the all-pairs
    self-join emit O(n²) rows on one shuffle key. Guard: buckets up to
    ``cap`` docs emit all pairs (the near-dup candidate set); larger
    buckets emit STAR pairs (bucket-min anchor ↔ every other member),
    O(n) rows that preserve connected components exactly — so the
    downstream cluster/keep-one step is unchanged, and a >cap bucket's
    members are still all marked as duplicates of the anchor. The size
    window and the join shuffle on the same (band, band_sig) key, so the
    guard reuses the exchange rather than adding one.

    Operator-level home (r12): shared by the batch MinHash lanes
    (plans/q_text.py), the batch phash lanes (operators/phash.py →
    plans/q_multimodal.py), and the streaming image-hash store
    (streaming/phash.py) — one star-cap guard, three consumers.
    """
    w = Window.partitionBy("band", "band_sig")
    sized = sig.select(
        "doc_id", "band", "band_sig",
        F.count(F.lit(1)).over(w).alias("bucket_n"),
        F.min("doc_id").over(w).alias("anchor"),
    )
    a = sized.filter(F.col("bucket_n") <= cap).alias("a")
    b = sized.filter(F.col("bucket_n") <= cap).alias("b")
    all_pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_sig") == F.col("b.band_sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    star_pairs = sized.filter(
        (F.col("bucket_n") > cap) & (F.col("doc_id") != F.col("anchor"))
    ).select(F.col("anchor").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    return all_pairs.unionByName(star_pairs).distinct()


def spread(d: DataFrame) -> DataFrame:
    """Round-robin repartition ahead of CPU-heavy string/hash stages
    (a small parquet file is ONE input partition, which would
    serialize shingling on a single core). REPARTITION_BY_NUM is
    AQE-coalesce-exempt; 2n+1 avoids colliding with
    spark.sql.shuffle.partitions."""
    nparts = 2 * d.sparkSession.sparkContext.defaultParallelism + 1
    return d.repartition(nparts)


def minhash_wide(d: DataFrame, carry: list[str] | tuple = ()) -> DataFrame:
    """(doc_id, text [, carry...]) -> (doc_id [, carry...], mh0..mh7)
    wide minhash signature; docs shorter than SHINGLE_WORDS words drop
    out (they are screened by the exact-hash lane instead).

    All N_SEEDS minima are aggregate COLUMNS in one groupBy(doc_id) —
    no shingle x seed row explosion, and partial aggregation means the
    one shuffle carries 8 hashes per (doc, partition). ``carry``
    columns must be constant per doc (they join the group key)."""
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    # r14: shingle expansion as a posexplode-style Generate over the
    # start indices with the 5-gram concat in a codegen'd projection,
    # instead of an interpreted transform lambda that re-embedded the
    # split(text) inside its body (CodegenFallback, and the split
    # re-evaluated per element). The (doc_id, carry, shingle) row
    # multiset is identical; min() aggregation is order-free.
    sh = (
        spread(d.filter(n >= SHINGLE_WORDS))
        .select("doc_id", *carry, w.alias("wrds"))
        .select(
            "doc_id",
            *carry,
            "wrds",
            F.explode(
                F.sequence(
                    F.lit(0), F.size("wrds") - SHINGLE_WORDS
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            *carry,
            F.concat_ws(
                " ", F.slice("wrds", F.col("i") + 1, SHINGLE_WORDS)
            ).alias("shingle"),
        )
    )
    return sh.groupBy("doc_id", *carry).agg(
        *[
            F.min(
                F.md5(
                    F.concat(F.lit(f"{s}|"), F.col("shingle")).cast(
                        "binary"
                    )
                )
            ).alias(f"mh{s}")
            for s in range(N_SEEDS)
        ]
    )


def bands_from_wide(wide: DataFrame, carry: list[str] | tuple = ()) -> DataFrame:
    """(doc_id [, carry...], mh0..mh7) -> (doc_id [, carry...], band,
    band_sig) LSH band rows: the wide signature re-hashed over
    adjacent column pairs, exploded into 4 tiny rows per doc. Split out
    of band_rows so a caller that also needs the wide signature (the
    per-seed Jaccard estimator) computes it exactly once."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("band"),
                F.md5(
                    F.concat(
                        *[
                            F.col(f"mh{j}")
                            for j in range(
                                i * BAND_ROWS, (i + 1) * BAND_ROWS
                            )
                        ]
                    ).cast("binary")
                ).alias("band_sig"),
            )
            for i in range(N_SEEDS // BAND_ROWS)
        ]
    )
    return wide.select(
        "doc_id", *carry, F.explode(bands).alias("b")
    ).select(
        "doc_id",
        *carry,
        F.col("b.band").alias("band"),
        F.col("b.band_sig").alias("band_sig"),
    )


def band_rows(d: DataFrame, carry: list[str] | tuple = ()) -> DataFrame:
    """(doc_id, text [, carry...]) -> (doc_id [, carry...], band,
    band_sig) LSH band rows straight from text (wide signature is an
    internal intermediate)."""
    return bands_from_wide(minhash_wide(d, carry), carry)


def doc_sigs(d: DataFrame) -> DataFrame:
    """Full signature rows for a (doc_id, text) frame — the rows the
    silver store persists: one band=-1 exact-hash row per doc plus the
    LSH band rows, every row carrying h so either lane can probe."""
    withh = d.select(
        "doc_id", "text", F.md5(F.col("text").cast("binary")).alias("h")
    )
    exact = withh.select(
        "doc_id",
        "h",
        F.lit(-1).cast("int").alias("band"),
        F.lit(None).cast("string").alias("band_sig"),
    )
    bands = band_rows(withh, carry=["h"]).select(
        "doc_id", "h", "band", "band_sig"
    )
    return exact.unionByName(bands)


def screen_delta(delta_sigs: DataFrame, base_sigs: DataFrame) -> DataFrame:
    """Screen delta docs against base signatures; per delta doc:
    exact-dup flag, LSH candidate count, first (lowest-id) base match,
    verdict in {exact, near_candidate, unique}.

    Both probe joins BROADCAST the delta side (batch ≪ corpus), so the
    base streams through map-side hash joins: no base self-join, no
    base shuffle — the only shape that holds when the base is 100 TB
    and the batch is GBs."""
    dex = delta_sigs.filter(F.col("band") == -1).select(
        F.col("doc_id").alias("d_id"), "h"
    )
    bex = base_sigs.filter(F.col("band") == -1).select("doc_id", "h")
    ex = (
        bex.join(F.broadcast(dex), "h")
        .groupBy("d_id")
        .agg(F.min("doc_id").alias("exact_base"))
        .withColumnRenamed("d_id", "doc_id")
    )
    ds = delta_sigs.filter(F.col("band") >= 0).select(
        F.col("doc_id").alias("d_id"), "band", "band_sig"
    )
    bs = base_sigs.filter(F.col("band") >= 0).select(
        "doc_id", "band", "band_sig"
    )
    cand = (
        bs.join(F.broadcast(ds), ["band", "band_sig"])
        .select(
            F.col("d_id").alias("doc_id"),
            F.col("doc_id").alias("base_doc"),
        )
        .distinct()
    )
    cagg = cand.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lsh_candidates"),
        F.min("base_doc").alias("min_cand"),
    )
    out = (
        dex.select(F.col("d_id").alias("doc_id"))
        .join(ex, "doc_id", "left")
        .join(cagg, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.col("exact_base").isNotNull().alias("is_exact_dup"),
        F.coalesce(F.col("n_lsh_candidates"), F.lit(0)).cast("bigint")
        .alias("n_lsh_candidates"),
        F.least(
            F.coalesce(F.col("exact_base"), F.col("min_cand")),
            F.coalesce(F.col("min_cand"), F.col("exact_base")),
        ).alias("first_match"),
        F.when(F.col("exact_base").isNotNull(), F.lit("exact"))
        .when(F.col("n_lsh_candidates") > 0, F.lit("near_candidate"))
        .otherwise(F.lit("unique"))
        .alias("verdict"),
    )
