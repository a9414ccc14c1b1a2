"""Streaming inverted-index (postings) store: lexical retrieval on
the ingest path.

A 100 TB retrieval stack indexes documents on INGEST: the batch
retrieval lanes (plans/q_retrieval.py) prove the BM25 algebra, and
this module gives the lexical index the persisted-store treatment the
dedup signature, HLL, CMS, ANN-code, and image-hash stores got —
the composed ingest pipeline's 7th store (streaming/pipeline.py).

Store schema: (doc_id, word, tf, batch_id) — the per-document term
frequencies, i.e. the postings of an inverted index (row-oriented
here; at 100 TB the same rows live bucketed/partitioned BY WORD, which
is only a layout choice — the scorer is relational either way).
Idempotence discipline (the image-hash store's exactly, because the
invariants coincide):

* postings are a DETERMINISTIC function of the payload text, so a
  replayed batch re-derives identical rows — keeping the first
  attempt's rows loses nothing (insert-if-absent per doc);
* a doc RE-PUBLISHED under a later batch id is dropped by the
  store-wide screen (self-excluding the batch's own prior partition
  so an at-least-once replay still rewrites its rows) — first
  publication wins, the family-wide re-publish rule;
* each batch commits into its own partition through the crash-safe
  symlink-swap upsert, and compaction folds old partials under the
  publish-base-first coverage rule (`compact_postings`).

Scoring over the store runs through operators/bm25.py — the SAME
joins and exact micro-unit arithmetic as the batch lane, so a ranking
served off the ingest-maintained index can never drift from the batch
sweep (the gated ``streaming_pipeline_bm25`` lane pins this with a
value hash every round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.operators.bm25 import bm25_micro_scores
from tradecat_spark.streaming.ingest import (
    batch_partition_vals,
    drop_batch_partition,
    live_batch_vals,
    read_batch_partitions,
    start_foreach_batch,
    store_has_data,
    upsert_partitions,
)

POST_KEYS = ["doc_id"]

_POST_SCHEMA = "doc_id bigint, word string, tf bigint, batch_id bigint"


def postings_of(docs: DataFrame) -> DataFrame:
    """(doc_id, word, tf) postings of a (doc_id, text) frame — the
    same single-space tokenization every text lane uses, empty tokens
    dropped. One map-side-combining hash aggregate."""
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return w.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def upsert_postings(
    spark: SparkSession, rows: DataFrame, store_path: str
) -> None:
    """Commit one batch's postings (must carry ``batch_id``).
    Insert-if-absent by doc_id: a redelivered payload re-derives the
    identical postings, so keeping the first attempt's rows loses
    nothing; partitioning by batch id makes a replay rewrite exactly
    one partition."""

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
        spark, rows, rows, store_path, POST_KEYS, _merge,
        part_expr=F.concat(F.lit("b"), F.col("batch_id").cast("string")),
    )


def _read_live(spark: SparkSession, store_path: str) -> DataFrame:
    live = live_batch_vals(batch_partition_vals(store_path))
    if not live:
        return spark.createDataFrame([], _POST_SCHEMA)
    return read_batch_partitions(spark, store_path, live).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "word",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("batch_id").cast("bigint").alias("batch_id"),
    )


def read_postings(spark: SparkSession, store_path: str) -> DataFrame:
    """(doc_id, word, tf) currently stored — the corpus inverted
    index in row form."""
    return _read_live(spark, store_path).select("doc_id", "word", "tf")


def compact_postings(
    spark: SparkSession, store_path: str, upto_batch: int
) -> None:
    """Fold every live partition with index <= ``upto_batch`` into one
    ``c<upto_batch>`` base partition, then delete what it covers — the
    publish-base-first coverage-rule protocol shared with the CMS/ANN/
    image-hash stores. Live partitions hold disjoint doc_ids by
    construction (the screen), so the fold is a pass-through union;
    rows keep their original batch_id so the screen's self-exclusion
    still works against compacted rows."""
    vals = live_batch_vals(batch_partition_vals(store_path))
    src = [v for v in vals if int(v[1:]) <= upto_batch]
    if not src:
        return
    base = read_batch_partitions(spark, store_path, src).select(
        "doc_id", "word", "tf", "batch_id"
    )

    def _merge(existing: DataFrame | None, f: DataFrame) -> DataFrame:
        # re-compaction recomputes the identical base: REPLACE
        return f

    upsert_partitions(
        spark, spark.range(1), base, store_path, POST_KEYS, _merge,
        part_expr=F.lit(f"c{upto_batch}"),
    )
    for v in batch_partition_vals(store_path):
        if v == f"c{upto_batch}" or int(v[1:]) > upto_batch:
            continue
        drop_batch_partition(store_path, v)


def index_text_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    store_path: str,
) -> None:
    """The foreachBatch body, exposed for tests: tokenize + aggregate
    once (map-side), screen against the store, commit. Intra-batch
    dedup first — an at-least-once source can redeliver a doc within
    one trigger, and postings are deterministic, so dropping
    duplicates is lossless. Empty texts produce no postings rows (the
    same convention as the batch scorer, whose corpus stats only see
    docs with at least one token)."""
    docs = batch.dropDuplicates(["doc_id"]).select("doc_id", "text")
    rows = postings_of(docs).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    ).localCheckpoint()
    if rows.isEmpty():
        return
    if store_has_data(store_path):
        prior = _read_live(spark, store_path).filter(
            F.col("batch_id") != F.lit(batch_id).cast("long")
        )
        rows = rows.join(
            prior.select("doc_id").distinct(), "doc_id", "left_anti"
        ).localCheckpoint()
        if rows.isEmpty():
            return
    upsert_postings(spark, rows, store_path)


def bm25_topk_over_store(
    spark: SparkSession,
    store_path: str,
    query_pred,
    k: int = 10,
) -> DataFrame:
    """BM25 top-``k`` per query over the CURRENT store, queries being
    the stored docs satisfying ``query_pred`` (a Column predicate over
    doc_id). Scoring runs through the shared operator — identical
    joins and micro-unit arithmetic to the batch lane — so the served
    ranking equals the batch sweep's over the same corpus. The scorer
    materializes the postings once internally (the operator's
    localCheckpoint), so the store partitions are scanned a single
    time however many aggregates consume them."""
    tf = read_postings(spark, store_path)
    qt = tf.filter(query_pred).select(
        F.col("doc_id").alias("query_id"), "word"
    )
    bm = bm25_micro_scores(tf, qt)
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("micros"), F.asc("doc_id")
    )
    return (
        bm.withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= k)
    )


def publish_bucketed_postings(
    spark: SparkSession,
    store_path: str,
    table: str,
    buckets: int = 64,
) -> None:
    """Publish the CURRENT live postings as a doc_id-bucketed,
    doc_id-sorted parquet catalog table — the 100 TB serving-layout
    decision (r14 verdict Next #4, guide §6/§2.4: bucketed tables
    persist a partitioning across jobs so repeated joins/aggregations
    on the bucket key skip the shuffle entirely).

    Why doc_id: every corpus-scaled shuffle in the scorer is keyed by
    it — the ``dl`` per-doc length aggregate, the dl↔term-hits join,
    and the final (query_id, doc_id) score sum (HashPartitioning on a
    SUBSET of the grouping keys satisfies the clustering requirement).
    The remaining exchanges are query-bounded (idf's per-word
    aggregate, the top-k window) or scalar (corpus stats). Scoring off
    the published table therefore never shuffles the corpus — pinned
    by tests/test_streaming.py::test_bucketed_postings_scoring.

    Bucket-count sizing at 100 TB: buckets ≈ corpus postings bytes /
    target file size (guide §6, 128 MB-1 GB/file) — a layout constant
    of the PUBLISHED table, deliberately not derived from the
    publishing session's core count. The default suits test corpora;
    production publishes pass it explicitly.

    Bucketed writes must go through ``saveAsTable`` (the bucket spec
    lives in the catalog, not the files), which is why this is a
    separate publish step rather than the store's own layout: the
    ingest store's crash-safe partition-swap protocol needs bare-path
    atomic renames. Publish-after-compaction is the intended cadence.
    """
    (
        read_postings(spark, store_path)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(table)
    )


def bm25_topk_over_bucketed(
    spark: SparkSession,
    table: str,
    query_pred,
    k: int = 10,
) -> DataFrame:
    """BM25 top-``k`` per query over a published bucketed postings
    table (``publish_bucketed_postings``). Identical joins and exact
    micro-unit arithmetic to ``bm25_topk_over_store`` — same results,
    value for value — but ``materialize=False`` keeps the scan's
    bucket partitioning visible to the planner, so the corpus is never
    shuffled: no exchange carries doc_id anywhere in the plan."""
    tf = spark.table(table)
    qt = tf.filter(query_pred).select(
        F.col("doc_id").alias("query_id"), "word"
    )
    bm = bm25_micro_scores(tf, qt, materialize=False)
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("micros"), F.asc("doc_id")
    )
    return (
        bm.withColumn("rk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rk") <= k)
    )


def start_postings_maintenance(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    trigger_sec: int = 3,
    available_now: bool = False,
):
    """Start inverted-index maintenance over a (doc_id, text) document
    stream; per-trigger work is one map-side tokenize+aggregate plus
    one partition commit."""
    spark = stream.sparkSession

    def _sink(batch: DataFrame, batch_id: int) -> None:
        index_text_batch(spark, batch, batch_id, store_path)

    return start_foreach_batch(
        stream, _sink, checkpoint, trigger_sec, available_now
    )
