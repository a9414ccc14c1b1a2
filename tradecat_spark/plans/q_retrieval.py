"""Hybrid retrieval — BM25 lexical ranking fused with embedding ANN.

Beyond-reference family (the reference has no search/retrieval path;
SURVEY §2 text surface ends at TF-IDF keywords): the standard RAG /
training-data-curation retrieval stack is *hybrid* — a lexical ranker
(Okapi BM25 over an inverted index) and a semantic ranker (cosine over
an embedding index) fused by reciprocal-rank fusion (RRF, Cormack et
al., SIGIR 2009: score(d) = Σ_lists 1/(k + rank_list(d)), k=60).

Spark-first shapes, all three lanes:

* BM25 is an *inverted-index equi-join*: postings = the per-(doc, term)
  tf table (one map-side-combining hash aggregate), query terms are a
  tiny broadcast side, scoring is JVM column arithmetic, and the only
  wide shuffle keys on (query_id, doc_id) for the partial-aggregated
  score sum. No cross join anywhere — at 100 TB the postings join IS
  how a search engine scales (term-partitioned), and the per-query
  top-k is a bounded window.
* The semantic list broadcasts the ≤``Q_DOCS`` query vectors against
  the corpus (map-only scoring stage), same plan as
  ``ann_cosine_topk``; at scale the IVF/LSH lanes in q_similarity are
  the candidate generator and this list is their re-rank output.
* Fusion joins two bounded top-``POOL_K`` lists (|Q|·K rows each) —
  driver-sized, never corpus-sized.

Cross-engine exactness: BM25 sums 6dp-rounded per-term scores in
micro-units (BIGINT/DECIMAL(38,0) — the mean6/ratio6 discipline from
plans/exact.py), the length normalizer dl/avgdl is an exact integer
ratio via ratio6 (dl·N / Σdl), and RRF reciprocals are rounded to
integer micro-units before the (order-insensitive) integer add, so
every rank and every published score is bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.operators.bm25 import B, K1, bm25_micro_scores
from tradecat_spark.plans.exact import ratio6, ratio6_sql
from tradecat_spark.plans.q_similarity import _emb, cosine
from tradecat_spark.plans.registry import query

Q_DOCS = 8     # doc_id < 8 are the query documents
POOL_K = 20    # per-list candidate pool fed into fusion
FUSE_K = 10    # published fused/lexical top-k
RRF_K = 60     # RRF rank offset (Cormack et al. default)


# ---------------------------------------------------------------------------
# shared CTE builders (oracle side) / DataFrame builders (Spark side)
# ---------------------------------------------------------------------------

def _bm25_ctes_sql(
    doc_where: str = "TRUE", q_pred: str = f"doc_id < {Q_DOCS}"
) -> str:
    """DuckDB CTE chain: postings → BM25 per-(query, doc) micro-score.

    Mirrors ``operators/bm25.bm25_micro_scores`` stage for stage; the
    micro-unit sum makes the score order-insensitive and hashable.
    ``doc_where`` restricts the candidate corpus (the streaming
    postings-store lane replays a delta split); ``q_pred`` selects the
    query documents."""
    lr6 = ratio6_sql("dl.dl * n.n_docs", "n.sum_dl")
    return f"""w AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE {doc_where}
  ) WHERE word <> ''
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM w GROUP BY 1),
n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl
  FROM dl
),
tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
),
idf AS (
  SELECT w.word, ROUND(ln((n.n_docs - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf6
  FROM (
    SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM w GROUP BY 1
  ) w CROSS JOIN n
),
qt AS (SELECT DISTINCT doc_id AS query_id, word FROM w WHERE {q_pred}),
term AS (
  SELECT qt.query_id, tf.doc_id,
    ROUND(idf.idf6 * (tf.tf * {K1 + 1.0})
          / (tf.tf + {K1} * ({1.0 - B} + {B} * ({lr6}))), 6) AS s6
  FROM qt
  JOIN tf  ON tf.word = qt.word AND tf.doc_id <> qt.query_id
  JOIN idf ON idf.word = qt.word
  JOIN dl  ON dl.doc_id = tf.doc_id
  CROSS JOIN n
),
bm AS (
  SELECT query_id, doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
    SUM(CAST(ROUND(s6 * 1000000) AS BIGINT)) AS micros
  FROM term GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id, n_terms_hit,
    micros / 1000000.0 AS bm25,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY micros DESC, doc_id ASC) AS BIGINT) AS lex_rank
  FROM bm
)"""


def _sem_ctes_sql() -> str:
    """DuckDB CTE chain: cosine top-``POOL_K`` semantic list per query
    (same arithmetic as the hash-green ``ann_cosine_topk``)."""
    return f"""qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {Q_DOCS}
),
cv AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
sims AS (
  SELECT query_id, doc_id,
    ROUND(list_dot_product(qv, cv)
          / NULLIF(sqrt(list_dot_product(qv, qv))
                   * sqrt(list_dot_product(cv, cv)), 0), 6) AS cos_sim
  FROM qv, cv WHERE query_id <> doc_id
),
sem AS (
  SELECT query_id, doc_id, cos_sim,
    CAST(rn AS BIGINT) AS sem_rank
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, doc_id ASC) AS rn
    FROM sims
  ) WHERE rn <= {POOL_K}
)"""


def _fused_ctes_sql() -> str:
    """lex + sem → RRF-fused candidate rows (micro-unit scores)."""
    return f"""{_bm25_ctes_sql()},
{_sem_ctes_sql()},
pool AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
    COALESCE(l.doc_id, s.doc_id) AS doc_id,
    COALESCE(l.lex_rank, 0) AS lex_rank,
    COALESCE(s.sem_rank, 0) AS sem_rank,
    COALESCE(CAST(ROUND(1000000.0 / ({RRF_K} + l.lex_rank)) AS BIGINT), 0)
      + COALESCE(CAST(ROUND(1000000.0 / ({RRF_K} + s.sem_rank)) AS BIGINT), 0)
      AS rrf_micros
  FROM (SELECT * FROM lex WHERE lex_rank <= {POOL_K}) l
  FULL JOIN sem s ON l.query_id = s.query_id AND l.doc_id = s.doc_id
),
fused AS (
  SELECT query_id, doc_id, lex_rank, sem_rank,
    rrf_micros / 1000000.0 AS rrf,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY rrf_micros DESC, doc_id ASC) AS BIGINT) AS fused_rank
  FROM pool
)"""


def _docs_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tradecat_spark.operators.minhash import spread

    # spread() before the tokenize (r14): the corpus parquet is one
    # small file = ONE scan partition, so the CPU-heavy explode +
    # partial tf aggregation ran serialized on a single core
    # (plans/r14/text_bm25_topk_before.txt nodes 3-8: Scan -> Generate
    # -> HashAggregate with no exchange in between). The round-robin
    # repartition — the q_text/minhash idiom for exactly this shape —
    # costs one tiny exchange of the raw text and unlocks n-way
    # parallel tokenization; downstream tf counts are key-grouped
    # aggregates, so row placement cannot change any result.
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        spread(d)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, n_terms_hit, micros) — the BM25 score table,
    through the shared operator (operators/bm25.py) so the batch lane
    and the streaming postings store rank identically. dl inside the
    operator is Σ tf per doc — exactly this lane's old direct token
    count."""
    w = _docs_words(spark, sf_dir)
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # the query-term side tokenizes ONLY the query docs — the doc_id
    # filter pushes to the parquet scan, so this lineage reads 8 rows
    # instead of re-running the corpus tokenize (the operator
    # materializes the corpus postings once; this keeps the tiny
    # broadcast side tiny too)
    q = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < Q_DOCS
    )
    qt = (
        q.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .select(F.col("doc_id").alias("query_id"), "word")
        .distinct()
    )
    return bm25_micro_scores(tf, qt)


def _lex_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    bm = _bm25_scores(spark, sf_dir)
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("micros"), F.asc("doc_id")
    )
    return bm.withColumn(
        "lex_rank", F.row_number().over(wk).cast("long")
    )


def _sem_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``POOL_K`` cosine list per query vector (vec_id ≡ doc_id on
    the driver tables — asserted domain of the streaming pipeline)."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < Q_DOCS).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    # conditional spread (r14, the ann_cosine_topk fix): parallelize
    # the single-task corpus scan's cosine folds; row-wise probe +
    # re-keyed window are placement-free
    from tradecat_spark.catalog import spread_if_narrow

    c = spread_if_narrow(
        e.select(F.col("vec_id").alias("doc_id"), F.col("vec").alias("cv"))
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    return (
        sims.withColumn("sem_rank", F.row_number().over(wk).cast("long"))
        .filter(F.col("sem_rank") <= POOL_K)
    )


def _rrf_micros(rank: Column) -> Column:
    """Integer micro-units of 1/(RRF_K + rank); 0 when absent (rank
    NULL). Engine-stable ONLY because fused inputs are capped at
    POOL_K=20 ranks: for 1 ≤ r ≤ POOL_K, 60+r ≤ 80 < 128, and no
    divisor of 2·10^6 below 128 yields an odd quotient at 60+r, so no
    1e6/(60+r) value sits on a .5 midpoint. The bound is NOT general:
    r=68 gives 1e6/128 = 7812.5 exactly (2e6/128 = 15625, odd) — do
    not feed uncapped ranks (e.g. lex ranks beyond POOL_K) through
    this without revisiting the rounding."""
    return F.coalesce(
        F.round(F.lit(1_000_000.0) / (F.lit(RRF_K) + rank)).cast("long"),
        F.lit(0),
    )


def _fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = _lex_ranks(spark, sf_dir).filter(
        F.col("lex_rank") <= POOL_K
    ).select("query_id", "doc_id", "lex_rank")
    sem = _sem_ranks(spark, sf_dir).select("query_id", "doc_id", "sem_rank")
    pool = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce("sem_rank", F.lit(0)).cast("long").alias("sem_rank"),
        (_rrf_micros(F.col("lex_rank")) + _rrf_micros(F.col("sem_rank")))
        .alias("rrf_micros"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micros"), F.asc("doc_id")
    )
    return pool.withColumn(
        "fused_rank", F.row_number().over(wk).cast("long")
    )


# ---------------------------------------------------------------------------
# registered lanes
# ---------------------------------------------------------------------------

@query(
    "text_bm25_topk",
    survey="beyond §2 (north-star retrieval): Okapi BM25 document ranking "
    "over an inverted-index join — the lexical half of the hybrid RAG "
    "retrieval stack (k1=1.2, b=0.75; Robertson/Spärck Jones)",
    description=f"BM25 top-{FUSE_K} documents per query doc (doc_id < {Q_DOCS})",
    bench=True,
    oracle=f"""
WITH {_bm25_ctes_sql()}
SELECT query_id, doc_id, n_terms_hit, bm25, lex_rank AS rk
FROM lex WHERE lex_rank <= {FUSE_K}
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings-join BM25: the query side (distinct terms of the
    ≤``Q_DOCS`` query docs) broadcasts against the (doc, term, tf)
    postings aggregate, per-term scores are pure JVM arithmetic off a
    6dp idf and an exact dl·N/Σdl length ratio, and the per-(query,
    doc) sum runs in integer micro-units so the hash gate covers the
    score itself. Ranks break ties on doc_id. At 100 TB the postings
    table is term-partitioned parquet and this plan is unchanged."""
    lex = _lex_ranks(spark, sf_dir).filter(F.col("lex_rank") <= FUSE_K)
    return lex.select(
        "query_id",
        "doc_id",
        "n_terms_hit",
        (F.col("micros") / F.lit(1_000_000.0)).alias("bm25"),
        F.col("lex_rank").alias("rk"),
    )


@query(
    "hybrid_rrf_fusion",
    survey="beyond §2 (north-star retrieval): reciprocal-rank fusion of the "
    "BM25 lexical list and the embedding-cosine list (RRF k=60, Cormack "
    "et al. SIGIR'09) — the hybrid-search primitive",
    description=f"RRF top-{FUSE_K} fused (lexical ∪ semantic) hits per query",
    oracle=f"""
WITH {_fused_ctes_sql()}
SELECT query_id, doc_id, lex_rank, sem_rank, rrf, fused_rank
FROM fused WHERE fused_rank <= {FUSE_K}
""",
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two bounded top-``POOL_K`` rank lists (each
    |Q|·K rows — driver-sized however big the corpus), RRF reciprocals
    pre-rounded to integer micro-units so the fused score is an exact
    integer add; absent-in-list ranks publish as 0. The fused window is
    per-query over ≤2K candidate rows."""
    f = _fused(spark, sf_dir).filter(F.col("fused_rank") <= FUSE_K)
    return f.select(
        "query_id",
        "doc_id",
        "lex_rank",
        "sem_rank",
        (F.col("rrf_micros") / F.lit(1_000_000.0)).alias("rrf"),
        "fused_rank",
    )


@query(
    "retrieval_fusion_eval",
    survey="beyond §2 (north-star retrieval): fusion diagnostics — "
    "lexical/semantic pool agreement (Jaccard) and the composition of "
    "the fused top-k by evidence source, per query",
    description="Per-query lex∩sem overlap + fused-top-k source composition",
    oracle=f"""
WITH {_fused_ctes_sql()},
pools AS (
  SELECT query_id,
    CAST(SUM(CASE WHEN lex_rank > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lex,
    CAST(SUM(CASE WHEN sem_rank > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sem,
    CAST(SUM(CASE WHEN lex_rank > 0 AND sem_rank > 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_both
  FROM pool GROUP BY 1
),
topk AS (
  SELECT query_id,
    CAST(SUM(CASE WHEN lex_rank > 0 AND sem_rank > 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS k_both,
    CAST(SUM(CASE WHEN lex_rank > 0 AND sem_rank = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS k_lex_only,
    CAST(SUM(CASE WHEN lex_rank = 0 AND sem_rank > 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS k_sem_only
  FROM fused WHERE fused_rank <= {FUSE_K} GROUP BY 1
)
SELECT p.query_id, p.n_lex, p.n_sem, p.n_both,
  {ratio6_sql('p.n_both', 'p.n_lex + p.n_sem - p.n_both')} AS pool_jaccard,
  t.k_both, t.k_lex_only, t.k_sem_only
FROM pools p JOIN topk t USING (query_id)
""",
)
def retrieval_fusion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer diagnostics over the fused pool: how much the two
    retrievers agree (pool Jaccard via the exact ratio6 path) and where
    the fused top-k's evidence comes from. Catches a dead list (n_lex
    or n_sem collapsing) and fusion skew (k_lex_only ≫ k_sem_only)
    — the monitoring a hybrid stack runs per index build."""
    pool = _fused(spark, sf_dir)
    pools = pool.groupBy("query_id").agg(
        F.sum((F.col("lex_rank") > 0).cast("long")).alias("n_lex"),
        F.sum((F.col("sem_rank") > 0).cast("long")).alias("n_sem"),
        F.sum(((F.col("lex_rank") > 0) & (F.col("sem_rank") > 0)).cast("long"))
        .alias("n_both"),
    )
    topk = pool.filter(F.col("fused_rank") <= FUSE_K).groupBy("query_id").agg(
        F.sum(((F.col("lex_rank") > 0) & (F.col("sem_rank") > 0)).cast("long"))
        .alias("k_both"),
        F.sum(((F.col("lex_rank") > 0) & (F.col("sem_rank") == 0)).cast("long"))
        .alias("k_lex_only"),
        F.sum(((F.col("lex_rank") == 0) & (F.col("sem_rank") > 0)).cast("long"))
        .alias("k_sem_only"),
    )
    return pools.join(topk, "query_id").select(
        "query_id",
        "n_lex",
        "n_sem",
        "n_both",
        ratio6(
            F.col("n_both"), F.col("n_lex") + F.col("n_sem") - F.col("n_both")
        ).alias("pool_jaccard"),
        "k_both",
        "k_lex_only",
        "k_sem_only",
    )


@query(
    "retrieval_rank_quality",
    survey="beyond §2 (north-star retrieval): recall@k of the lexical "
    "and fused top-k lists against the exact-cosine truth — the "
    "label-free eval a hybrid stack runs per index build (semantic "
    "top-k IS the truth by construction, so the informative rows are "
    "how much BM25 alone misses and how much RRF fusion recovers)",
    description=f"Per-query recall@{FUSE_K}: lexical-only vs RRF-fused "
    "against the exact cosine truth",
    oracle=f"""
WITH {_fused_ctes_sql()},
truth AS (SELECT query_id, doc_id FROM sem WHERE sem_rank <= {FUSE_K}),
lexq AS (SELECT query_id, doc_id FROM lex WHERE lex_rank <= {FUSE_K}),
fusq AS (SELECT query_id, doc_id FROM fused WHERE fused_rank <= {FUSE_K}),
agg AS (
  SELECT t.query_id,
    CAST(COUNT(*) AS BIGINT) AS n_truth,
    CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_lex_hits,
    CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_fused_hits
  FROM truth t
  LEFT JOIN lexq l ON l.query_id = t.query_id AND l.doc_id = t.doc_id
  LEFT JOIN fusq f ON f.query_id = t.query_id AND f.doc_id = t.doc_id
  GROUP BY 1
)
SELECT query_id, n_truth, n_lex_hits, n_fused_hits,
  {ratio6_sql('n_lex_hits', 'n_truth')} AS lex_recall6,
  {ratio6_sql('n_fused_hits', 'n_truth')} AS fused_recall6
FROM agg
""",
)
def retrieval_rank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three bounded rank lists (each |Q|·k rows) and two left joins —
    driver-sized work however large the corpus. fused_recall >=
    overlap-with-truth of any single list containing the truth's
    head is NOT guaranteed (RRF can push a truth doc past rank k when
    the lexical list disagrees), which is exactly why the eval exists:
    the gated values record how the fusion trade-off lands on this
    corpus, per query."""
    truth = _sem_ranks(spark, sf_dir).filter(
        F.col("sem_rank") <= FUSE_K
    ).select("query_id", "doc_id")
    lexq = _lex_ranks(spark, sf_dir).filter(
        F.col("lex_rank") <= FUSE_K
    ).select("query_id", "doc_id", F.lit(1).alias("lex_hit"))
    fusq = _fused(spark, sf_dir).filter(
        F.col("fused_rank") <= FUSE_K
    ).select("query_id", "doc_id", F.lit(1).alias("fused_hit"))
    agg = (
        truth.join(lexq, ["query_id", "doc_id"], "left")
        .join(fusq, ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_truth"),
            F.sum(F.coalesce("lex_hit", F.lit(0))).cast("long")
            .alias("n_lex_hits"),
            F.sum(F.coalesce("fused_hit", F.lit(0))).cast("long")
            .alias("n_fused_hits"),
        )
    )
    return agg.select(
        "query_id", "n_truth", "n_lex_hits", "n_fused_hits",
        ratio6(F.col("n_lex_hits"), F.col("n_truth"))
        .alias("lex_recall6"),
        ratio6(F.col("n_fused_hits"), F.col("n_truth"))
        .alias("fused_recall6"),
    )
