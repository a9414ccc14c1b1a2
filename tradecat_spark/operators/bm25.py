"""Okapi BM25 scoring over a postings frame — shared batch/stream.

Promoted to operator level (the phash candidate/verify precedent) so
the batch retrieval lanes (plans/q_retrieval.py) and the streaming
postings store (streaming/postings.py) score through the SAME joins
and the SAME exact arithmetic: a lexical hit the ingest path surfaces
is the hit the batch sweep would have ranked, bit for bit.

Inputs are relational, not raw text, so any corpus representation that
can produce a (doc_id, word, tf) postings frame — a parquet sweep, a
persisted ingest-maintained inverted index, a bucketed term-partitioned
table at 100 TB — feeds the identical scorer. Corpus statistics (N,
Σdl, df) derive from the postings frame itself; dl = Σ tf per doc
equals the token count the batch lanes measure directly.

Exactness discipline (plans/exact.py): 6dp idf, exact ratio6 length
normalizer (dl·N / Σdl in DECIMAL(38,0)), per-term scores rounded to
6dp and summed in integer micro-units — order-insensitive and
hash-gateable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tradecat_spark.plans.exact import ratio6

K1 = 1.2   # term-frequency saturation
B = 0.75   # length normalization


def bm25_micro_scores(
    tf: DataFrame, qt: DataFrame, materialize: bool = True
) -> DataFrame:
    """(query_id, doc_id, n_terms_hit, micros) BM25 scores.

    ``tf``: postings over the candidate corpus — (doc_id, word, tf).
    ``qt``: query term sets — (query_id, word), distinct rows; a
    query_id that is also a doc_id never matches itself.

    Plan shape: two hash aggregates over the postings (dl over the full
    frame, df over the query-word semi-joined slice — both
    map-side-combining), the query/idf/corpus-stat sides broadcast
    (idf deliberately query-bounded, never vocab-sized — see inline
    comment), candidate generation as the term-keyed equi-join, and
    ONE wide shuffle on (query_id, doc_id) for the micro-unit score
    sum. No cross join; the postings join is how a search engine
    scales (term-partitioned at 100 TB).

    The postings frame is materialized ONCE (localCheckpoint — the
    decode-once precedent from the phash lane, b9755a9): dl, df and
    the term join would otherwise each re-run the producing lineage
    (a tokenize+aggregate over the corpus in the batch lane — its
    dominant cost). At 100 TB this materialization is a persisted
    postings table (exactly what streaming/postings.py maintains);
    localCheckpoint is the single-process stand-in, caveat documented
    repo-wide via q_cluster."""
    # (r14 note: re-spreading + re-materializing the checkpointed
    # postings to undo AQE's partition coalescing was tried and
    # MEASURED SLOWER — official-format bench 2.669 -> 3.611 s at
    # equal calibration: the extra exchange + second materialization
    # cost more than the scoring passes' restored parallelism saves.
    # Reverted; the coalesced layout stands.)
    #
    # ``materialize=False`` is for callers whose postings frame is
    # ALREADY persisted storage — e.g. a doc_id-bucketed catalog table
    # (streaming/postings.py::publish_bucketed_postings). A
    # localCheckpoint here would erase the scan's bucket partitioning
    # (ExistingRDD reports unknown partitioning), putting the doc_id
    # exchanges back — the exact shuffles bucketing removes (guide §6:
    # bucketed tables persist a partitioning across jobs).
    if materialize:
        tf = tf.localCheckpoint()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    n = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    # idf is broadcast below, so its cardinality must be QUERY-bounded,
    # never vocabulary-bounded: at 100 TB of web text the distinct-term
    # count is 10^8-10^9 (typos, numbers, ids — Heaps' law does not
    # flatten it), a multi-GB broadcast. Restricting the postings to
    # query words FIRST leaves df per kept word bit-identical (every
    # posting of a kept word survives the semi-join) while the
    # aggregate's output — and the broadcast — shrinks to |query vocab|.
    qwords = qt.select("word").distinct()
    idf = (
        tf.join(F.broadcast(qwords), "word")
        .groupBy("word")
        .agg(F.count_distinct("doc_id").alias("df"))
        .join(F.broadcast(n))
        .select(
            "word",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                ),
                6,
            ).alias("idf6"),
        )
    )
    lr6 = ratio6(F.col("dl") * F.col("n_docs"), F.col("sum_dl"))
    s6 = F.round(
        F.col("idf6")
        * (F.col("tf") * F.lit(K1 + 1.0))
        / (F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * lr6)),
        6,
    )
    term = (
        tf.join(F.broadcast(qt), "word")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(idf), "word")
        .join(dl.withColumnRenamed("doc_id", "cd"),
              F.col("cd") == F.col("doc_id"))
        .join(F.broadcast(n))
        .select("query_id", "doc_id", s6.alias("s6"))
    )
    return term.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum(F.round(F.col("s6") * 1_000_000).cast("decimal(38,0)"))
        .cast("long")
        .alias("micros"),
    )
