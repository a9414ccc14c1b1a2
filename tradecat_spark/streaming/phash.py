"""Streaming perceptual-hash store: image dedup on the ingest path.

A 100 TB image/caption pipeline dedups on INGEST, not in a batch
sweep: the r11 batch lanes (plans/q_multimodal.py) prove the aHash →
LSH-band → verify algebra, and this module gives that algebra the same
persisted-store treatment the dedup signature, HLL, CMS, and ANN code
stores got — making it the composed ingest pipeline's 6th store
(streaming/pipeline.py; r11 verdict item 4).

Store schema: (doc_id, b0..b3, batch_id) — the 4x16-bit sign-safe
aHash bands of every payload ever ingested, ~40 bytes per image.
Idempotence discipline (the ANN code store's exactly, because the
invariants coincide):

* a hash is a DETERMINISTIC function of the payload, so a replayed
  batch re-derives identical rows — keeping the first attempt's rows
  loses nothing (insert-if-absent per partition);
* a doc RE-PUBLISHED under a later batch id (a recrawl) is dropped by
  the store-wide screen (which self-excludes the batch's own prior
  partition so an at-least-once replay still rewrites its rows);
* each batch commits into its own partition through the crash-safe
  symlink-swap upsert, and compaction folds old partials under the
  publish-base-first coverage rule (`compact_hashes`).

Decode-once: the payload is hashed in ONE mapInPandas pass per batch,
map-side, before any shuffle; everything downstream (the store commit,
the near-dup emit) moves 5-scalar rows. `near_dup_pairs` runs the
SAME star-capped band/probe joins as the batch lanes
(operators/phash.py), so stream-emitted pairs and batch-computed pairs
can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.multimodal import attach_payload, phash_bands
from tradecat_spark.operators.phash import (
    phash_candidate_pairs,
    phash_verify_pairs,
)
from tradecat_spark.streaming.ingest import (
    batch_partition_vals,
    drop_batch_partition,
    live_batch_vals,
    read_batch_partitions,
    start_foreach_batch,
    store_has_data,
    upsert_partitions,
)

HASH_KEYS = ["doc_id"]

_HASH_SCHEMA = (
    "doc_id bigint, b0 int, b1 int, b2 int, b3 int, batch_id bigint"
)


def upsert_hashes(
    spark: SparkSession, hashed: DataFrame, store_path: str
) -> None:
    """Commit one batch's hash rows (must carry ``batch_id``).
    Insert-if-absent by doc_id: a redelivered payload re-derives the
    identical hash, so keeping the first attempt's rows loses nothing;
    partitioning by batch id makes the replay rewrite exactly one
    partition."""

    def _merge(existing: DataFrame | None, f: DataFrame) -> DataFrame:
        if existing is None:
            return f
        return existing.unionByName(
            f.join(
                existing.select("doc_id").distinct(), "doc_id",
                "left_anti",
            )
        )

    upsert_partitions(
        spark, hashed, hashed, store_path, HASH_KEYS, _merge,
        part_expr=F.concat(F.lit("b"), F.col("batch_id").cast("string")),
    )


def _read_live(spark: SparkSession, store_path: str) -> DataFrame:
    """All columns of the LIVE partitions (newest compacted base +
    newer partials — the coverage rule shared with the CMS/ANN
    stores); empty store reads as an empty frame."""
    live = live_batch_vals(batch_partition_vals(store_path))
    if not live:
        return spark.createDataFrame([], _HASH_SCHEMA)
    return read_batch_partitions(spark, store_path, live).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "b0", "b1", "b2", "b3",
        F.col("batch_id").cast("bigint").alias("batch_id"),
    )


def read_hashes(spark: SparkSession, store_path: str) -> DataFrame:
    """(doc_id, b0..b3) currently stored — the corpus hash table."""
    return _read_live(spark, store_path).select(
        "doc_id", "b0", "b1", "b2", "b3"
    )


def compact_hashes(
    spark: SparkSession, store_path: str, upto_batch: int
) -> None:
    """Fold every live partition with index <= ``upto_batch`` into one
    ``c<upto_batch>`` base partition, then delete what it covers — the
    publish-base-first coverage-rule protocol shared with the CMS and
    ANN stores, so every crash point either replays to an identical
    base or leaves debris the reader already ignores. Rows KEEP their
    original batch_id (the screen's self-exclusion still works against
    compacted rows). Live partitions hold disjoint doc_ids by
    construction (the screen), so the fold is a pass-through union.
    Only pass batch ids the stream's checkpoint has committed."""
    vals = live_batch_vals(batch_partition_vals(store_path))
    src = [v for v in vals if int(v[1:]) <= upto_batch]
    if not src:
        return
    base = read_batch_partitions(spark, store_path, src).select(
        "doc_id", "b0", "b1", "b2", "b3", "batch_id"
    )

    def _merge(existing: DataFrame | None, f: DataFrame) -> DataFrame:
        # re-compaction recomputes the identical base: REPLACE
        return f

    # literal partition value → probe needs no data (the ANN store's
    # r8 lesson: probing with `base` would scan every folded partition
    # twice just to discover 'c<k>')
    upsert_partitions(
        spark, spark.range(1), base, store_path, HASH_KEYS, _merge,
        part_expr=F.lit(f"c{upto_batch}"),
    )
    for v in batch_partition_vals(store_path):
        if v == f"c{upto_batch}" or int(v[1:]) > upto_batch:
            continue
        drop_batch_partition(store_path, v)


def near_dup_pairs(
    spark: SparkSession, store_path: str, probe: bool = True
) -> DataFrame:
    """Near-duplicate image pairs over the CURRENT store — the exact
    band/probe/star-cap/verify joins of the batch lanes
    (operators/phash.py) over the persisted hash table, so a pair the
    stream surfaces is a pair the batch sweep would have surfaced.
    At scale this runs per trigger against the delta only (join the
    batch's hash rows to the store) — the full-store form here is what
    the gated query checksums."""
    wide = read_hashes(spark, store_path).localCheckpoint()
    return phash_verify_pairs(phash_candidate_pairs(wide, probe), wide)


def hash_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    pairs_dir: str | None = None,
) -> tuple[DataFrame, DataFrame | None] | None:
    """The foreachBatch body, exposed for tests: decode+hash once
    (mapInPandas, map-side), screen against the store, commit — and,
    with ``pairs_dir``, emit the near-dup pairs this delta INTRODUCES
    (new x store via the cap-guarded bucket probe + new x new; see
    ``operators/phash.phash_delta_candidate_pairs``) into the batch's
    own partition. The hash table is materialized ONCE
    (localCheckpoint) so the screen, the upsert's partition probe, the
    pair join, and the staging write don't re-run the decode stage —
    the same plan bug the batch lane fixed in b9755a9, avoided here by
    construction.

    Intra-batch dedup first: an at-least-once source can redeliver a
    doc WITHIN one trigger; hashes are deterministic, so dropping
    duplicates is lossless. Zero-byte payloads are corrupt media —
    dropped before hashing, exactly as the batch lane and its oracle
    (length(text) > 0) do.

    Pair-emission exactly-once: each pair lands when its LATER
    endpoint ingests. A replayed batch id re-derives the identical
    pair set (the screen self-excludes the batch's own partition, so
    the "new" side is the same rows, and the "old" side explicitly
    excludes them) and overwrites its own partition; a re-published
    doc is screened out entirely, so its pairs are never re-emitted.

    Returns the delta this trigger actually introduced — (new_wide,
    pairs) with ``pairs`` None unless ``pairs_dir`` was given — so a
    composing caller (the pipeline's label store, r13) consumes the
    SAME materialized frames the store commits instead of re-deriving
    them; None when the screen leaves nothing new."""
    docs = batch.dropDuplicates(["doc_id"])
    if "lang" not in docs.columns:
        # attach_payload's meta struct carries a source_lang; a
        # document stream need not — null is the honest value
        docs = docs.withColumn("lang", F.lit(None).cast("string"))
    media = attach_payload(docs.select("doc_id", "text", "lang")).filter(
        F.octet_length("payload") > 0
    )
    hashed = phash_bands(media).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    ).localCheckpoint()
    if hashed.isEmpty():
        return None
    old_wide = spark.createDataFrame([], _HASH_SCHEMA).select(
        "doc_id", "b0", "b1", "b2", "b3"
    )
    if store_has_data(store_path):
        # NOT materialized (r14, the labels-store precedent): prior is
        # the ENTIRE live hash store, and localCheckpoint'ing it here
        # re-wrote the corpus to block storage every trigger — O(store)
        # write amplification per micro-batch at 100 TB. Its consumers
        # (the screen's anti-join, the delta pair probe, the verify
        # union) are map-side passes over the committed parquet, so
        # re-scanning the pruned store partitions beats checkpointing
        # the corpus; the delta frames below keep their cuts.
        prior = _read_live(spark, store_path).filter(
            F.col("batch_id") != F.lit(batch_id).cast("long")
        )
        old_wide = prior.select("doc_id", "b0", "b1", "b2", "b3")
        hashed = hashed.join(
            prior.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint()
        if hashed.isEmpty():
            return None
    upsert_hashes(spark, hashed, store_path)
    new_wide = hashed.select("doc_id", "b0", "b1", "b2", "b3")
    pairs = None
    if pairs_dir is not None:
        from tradecat_spark.operators.phash import (
            phash_delta_candidate_pairs,
        )

        cand = phash_delta_candidate_pairs(new_wide, old_wide)
        # materialized ONCE: the sink write below and any composing
        # consumer (the label store) read the cut, not the band joins
        pairs = phash_verify_pairs(
            cand, new_wide.unionByName(old_wide)
        ).localCheckpoint()
        pairs.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch_id={batch_id}"
        )
    return new_wide, pairs


def read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming) — the union of every batch's emitted
    delta pairs: the streaming image-dedup product. Equals the
    full-table near-dup pair set whenever no bucket exceeded the cap
    over the ingest history; component-equal beyond it (the guard's
    contract, pinned in tests)."""
    import os

    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame(
            [], "doc_a bigint, doc_b bigint, hamming int"
        )
    return spark.read.parquet(pairs_dir).select(
        F.col("doc_a").cast("bigint").alias("doc_a"),
        F.col("doc_b").cast("bigint").alias("doc_b"),
        F.col("hamming").cast("int").alias("hamming"),
    ).distinct()


def start_phash_maintenance(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    trigger_sec: int = 3,
    available_now: bool = False,
    pairs_dir: str | None = None,
):
    """Start hash-store maintenance over a (doc_id, text) document
    stream; per-trigger work is the map-side decode+hash plus one
    partition commit (plus the bucket-probe pair join when
    ``pairs_dir`` is given)."""
    spark = stream.sparkSession

    def _sink(batch: DataFrame, batch_id: int) -> None:
        hash_batch(spark, batch, batch_id, store_path, pairs_dir=pairs_dir)

    return start_foreach_batch(
        stream, _sink, checkpoint, trigger_sec, available_now
    )
