"""Similarity search over the ``embeddings`` table (array<float> vectors).

The approximate-nearest-neighbor surface for a training-data pipeline:
brute-force cosine top-k as the exactness baseline, sign-LSH bucketing as
the scale path, and per-label centroids (the IVF coarse quantizer step).

Scale notes: brute-force is broadcast-query × corpus — linear in corpus
size and embarrassingly parallel, the right baseline when the query set
is small. The LSH/IVF path turns ANN into an equi-join on bucket id, the
only shape that survives a 100 TB corpus. All vector math runs JVM-side
via ``zip_with``/``aggregate`` higher-order functions in double
precision — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.catalog import spread_if_narrow as _spread_rows
from tradecat_spark.plans.exact import mean6, mean6_sql
from tradecat_spark.plans.registry import query

# PQ / IVF algebra single-sourced in operators.ivfadc (shared with the
# streaming ANN index maintenance) — aliased back to the historical
# private names so the query lanes and their tests read unchanged
from tradecat_spark.operators.ivfadc import (  # noqa: E402
    PQ_DSUB,
    PQ_ITERS,
    PQ_KS,
    PQ_M,
    d2_fold as _d2f,
    dot,
    ivf_cellinfo as _ivf_cellinfo,
    ivf_cells_row as _ivf_cells_row,
    ivf_centroids as _ivf_centroids,
    ivf_probe_cells as _ivf_probe_cells,
    lsum as _lsum,
    nearest_cell_col as _nearest_cell_col,
    pq_codebook_row as _pq_codebook_row,
    pq_codes_col as _pq_codes_col,
    pq_query_rows as _pq_query_rows_n,
    pq_train as _pq_train,
    residuals as _residuals,
)


def _pq_query_rows(e, brow):
    """Query-lane shim: the registered queries fix n_queries."""
    return _pq_query_rows_n(e, brow, N_QUERIES)

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )




def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)), F.lit(0))




def _ivf_nearest_cell(q: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign each query row (must carry ``query_id`` and a ``qv``
    vector; any extra columns ride along) to its nearest centroid via
    the rounded |q|² − 2q·c + |c|² fold — identical on both engines so
    the argmin is stable. Returns q's columns + ``cell_label``."""
    dist2 = F.round(
        dot(F.col("qv"), F.col("qv"))
        - 2 * dot(F.col("qv"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv")),
        6,
    )
    aw = Window.partitionBy("query_id").orderBy(
        F.asc("d2"), F.asc("label")
    )
    return (
        q.crossJoin(F.broadcast(cent))
        .withColumn("d2", dist2)
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .drop("d2", "rn", "cv")
        .withColumnRenamed("label", "cell_label")
    )


@query(
    "ann_cosine_topk",
    survey="north-star similarity search: brute-force cosine top-k baseline",
    description=f"Top-{TOP_K} cosine neighbors for query vectors (vec_id < {N_QUERIES})",
    bench=True,
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
),
sims AS (
  SELECT
    query_id, neighbor_id,
    ROUND(list_dot_product(qv, cv)
          / NULLIF(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)), 0),
          6) AS cos_sim
  FROM q, c
  WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast the (small) query set against the corpus — a map-only
    stage per corpus partition, then a per-query top-k window over
    |queries|×|corpus| similarity rows. Ordering uses the rounded
    similarity with neighbor-id tiebreak so the cutoff is deterministic."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    # spread (r14): the corpus side is the single-row-group scan = one
    # task, so every cosine fold ran on one core; the probe is row-wise
    # and the top-k window re-keys by query_id — placement-free
    c = _spread_rows(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cv"))
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@query(
    "ann_lsh_buckets",
    survey="north-star similarity search: LSH-bucketed scale path",
    description="Sign-LSH (4 axis hyperplanes) bucket per vector + bucket stats",
    oracle="""
WITH b AS (
  SELECT
    vec_id, label,
    (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
     + CASE WHEN embedding[9] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[17] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[25] > 0 THEN 1 ELSE 0 END) AS bucket,
    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
)
SELECT
  bucket,
  COUNT(*) AS n_vectors,
  ROUND(AVG(norm), 6) AS avg_norm,
  MIN(vec_id) AS sample_vec_id
FROM b GROUP BY bucket
""",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-of-projection LSH with axis-aligned hyperplanes: candidate
    generation becomes a groupBy/equi-join on the bucket id. At scale,
    neighbors are searched within a bucket (± multi-probe), never across
    the full corpus."""
    e = _emb(spark, sf_dir)
    bit = lambda i, v: F.when(F.element_at("vec", i) > 0, F.lit(v)).otherwise(0)
    bucket = bit(1, 8) + bit(9, 4) + bit(17, 2) + bit(25, 1)
    withb = e.select(
        "vec_id",
        "label",
        bucket.alias("bucket"),
        F.sqrt(dot(F.col("vec"), F.col("vec"))).alias("norm"),
    )
    return withb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
        F.min("vec_id").alias("sample_vec_id"),
    )


@query(
    "ann_label_centroids",
    survey="north-star similarity search: IVF coarse-quantizer centroids",
    description="Per-label centroid coordinates (label ≈ IVF cell)",
    oracle="""
SELECT
  label,
  i AS dim,
  ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS centroid
FROM embeddings,
     LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
GROUP BY label, i
""",
)
def ann_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode → (label, dim) average: the reduce step of one k-means
    iteration / IVF training pass, expressed as a plain hash aggregate."""
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode("vec").alias("pos", "x"))
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )


@query(
    "dedup_embedding_cosine",
    survey="north-star dedup: embedding-cosine near-duplicate candidates "
    "(IVF-cell-scoped pairing — pairs only form within a label cell)",
    description="Top-20 most-similar same-label vector pairs by cosine",
    oracle="""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
),
pairs AS (
  SELECT
    a.vec_id AS id_a, b.vec_id AS id_b, a.label,
    ROUND(list_dot_product(a.dv, b.dv)
          / NULLIF(sqrt(list_dot_product(a.dv, a.dv))
                   * sqrt(list_dot_product(b.dv, b.dv)), 0), 6) AS cos_sim
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, label, cos_sim
FROM pairs ORDER BY cos_sim DESC, id_a, id_b LIMIT 20
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup scan scoped to the coarse-quantizer cell (label): the
    self-join is an equi-join on label, so at 100 TB each cell's pairs
    form inside one shuffle partition instead of a global cross join.
    The synthetic corpus has no true duplicates, so the query ranks the
    top candidates; a production dedup would threshold cos_sim."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("id_a"), "label", F.col("vec").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), "label", F.col("vec").alias("vb"))
    pairs = a.join(b, "label").filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", "label",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    )
    return pairs.orderBy(F.desc("cos_sim"), "id_a", "id_b").limit(20)


@query(
    "ann_ivf_search",
    survey="north-star similarity search: IVF probe — assign each query to "
    "its nearest coarse centroid, then search only that cell",
    description="Top-3 neighbors per query vector, searched within the nearest-centroid cell",
    oracle="""
WITH cent AS (
  SELECT label, list(c ORDER BY dim) AS cv FROM (
    SELECT label, i AS dim, ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS c
    FROM embeddings,
         LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
    GROUP BY label, i
  ) GROUP BY label
),
q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 10
),
assign AS (
  SELECT query_id, qv, label AS cell_label FROM (
    SELECT q.query_id, q.qv, c.label,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        ROUND(list_dot_product(q.qv, q.qv)
              - 2 * list_dot_product(q.qv, c.cv)
              + list_dot_product(c.cv, c.cv), 6) ASC,
        c.label ASC) AS rn
    FROM q, cent c
  ) WHERE rn = 1
),
cand AS (
  SELECT vec_id AS neighbor_id, label, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
)
SELECT query_id, cell_label, neighbor_id, cos_sim FROM (
  SELECT a.query_id, a.cell_label, cand.neighbor_id,
    ROUND(list_dot_product(a.qv, cand.cv)
          / NULLIF(sqrt(list_dot_product(a.qv, a.qv))
                   * sqrt(list_dot_product(cand.cv, cand.cv)), 0), 6) AS cos_sim,
    ROW_NUMBER() OVER (PARTITION BY a.query_id ORDER BY
      ROUND(list_dot_product(a.qv, cand.cv)
            / NULLIF(sqrt(list_dot_product(a.qv, a.qv))
                     * sqrt(list_dot_product(cand.cv, cand.cv)), 0), 6) DESC,
      cand.neighbor_id ASC) AS rn
  FROM assign a JOIN cand ON cand.label = a.cell_label
                         AND cand.neighbor_id <> a.query_id
) WHERE rn <= 3
""",
)
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF scale path end-to-end: centroids are a tiny aggregate
    (|labels| × dim rows, broadcast), assignment is a |queries|×|labels|
    nested-loop on the driver-side broadcast, and the candidate search
    is an equi-join on the cell id — the corpus is never cross-joined.
    dist² uses the rounded centroids and the identical
    |q|² − 2q·c + |c|² fold on both engines so the argmin is stable."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    assign = _ivf_nearest_cell(q, _ivf_centroids(e))
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cell_label"),
        F.col("vec").alias("cv"),
    )
    sims = (
        cand.join(F.broadcast(assign), "cell_label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "cell_label", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "ann_recall_eval",
    survey="north-star similarity search: recall evaluation — the metric "
    "that decides whether the approximate scale path (IVF cell / LSH "
    "bucket) is good enough to replace brute force at 100 TB",
    description="Per-query recall of IVF-cell and LSH-bucket candidate sets vs exact top-5",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
  SELECT vec_id AS neighbor_id, label, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT
      q.query_id, c.neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        ROUND(list_dot_product(qv, cv)
              / NULLIF(sqrt(list_dot_product(qv, qv))
                       * sqrt(list_dot_product(cv, cv)), 0), 6) DESC,
        c.neighbor_id ASC) AS rn
    FROM q, c WHERE q.query_id <> c.neighbor_id
  ) WHERE rn <= {TOP_K}
),
cent AS (
  SELECT label, list(ce ORDER BY dim) AS cv FROM (
    SELECT label, i AS dim, ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS ce
    FROM embeddings,
         LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
    GROUP BY label, i
  ) GROUP BY label
),
assign AS (
  SELECT query_id, label AS cell_label FROM (
    SELECT q.query_id, cent.label,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        ROUND(list_dot_product(q.qv, q.qv)
              - 2 * list_dot_product(q.qv, cent.cv)
              + list_dot_product(cent.cv, cent.cv), 6) ASC,
        cent.label ASC) AS rn
    FROM q, cent
  ) WHERE rn = 1
),
qb AS (
  SELECT vec_id AS query_id,
    (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
     + CASE WHEN embedding[9] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[17] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[25] > 0 THEN 1 ELSE 0 END) AS q_bucket
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
nb AS (
  SELECT vec_id AS neighbor_id, label AS n_label,
    (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
     + CASE WHEN embedding[9] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[17] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[25] > 0 THEN 1 ELSE 0 END) AS n_bucket
  FROM embeddings
)
SELECT
  e.query_id,
  a.cell_label,
  qb.q_bucket,
  CAST(COUNT(*) AS BIGINT) AS exact_k,
  CAST(COUNT(*) FILTER (nb.n_label = a.cell_label) AS BIGINT) AS ivf_hits,
  CAST(COUNT(*) FILTER (nb.n_label = a.cell_label) AS DOUBLE)
    / COUNT(*) AS ivf_recall,
  CAST(COUNT(*) FILTER (nb.n_bucket = qb.q_bucket) AS BIGINT) AS lsh_hits,
  CAST(COUNT(*) FILTER (nb.n_bucket = qb.q_bucket) AS DOUBLE)
    / COUNT(*) AS lsh_recall,
  CAST(COUNT(*) FILTER (bit_count(xor(nb.n_bucket, qb.q_bucket)) <= 1)
    AS BIGINT) AS mp_hits,
  CAST(COUNT(*) FILTER (bit_count(xor(nb.n_bucket, qb.q_bucket)) <= 1)
    AS DOUBLE) / COUNT(*) AS mp_recall
FROM exact e
JOIN assign a USING (query_id)
JOIN qb USING (query_id)
JOIN nb USING (neighbor_id)
GROUP BY e.query_id, a.cell_label, qb.q_bucket
""",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation recall: of the EXACT top-k neighbors, how
    many live in the query's assigned IVF cell / sign-LSH bucket — the
    fraction an approximate search scoped to that cell/bucket could ever
    return. All joins are per-query-row against broadcast-small sides
    (centroids, query buckets); the only corpus-sized work is the exact
    top-k baseline itself. Recall is a division of exact integers —
    deterministic."""
    e = _emb(spark, sf_dir)
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")

    bit = lambda i, v: F.when(F.element_at("vec", i) > 0, F.lit(v)).otherwise(0)
    bucket = bit(1, 8) + bit(9, 4) + bit(17, 2) + bit(25, 1)
    qb = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), bucket.alias("q_bucket")
    )
    nb = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        bucket.alias("n_bucket"),
    )

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    assign = _ivf_nearest_cell(q, _ivf_centroids(e)).select(
        "query_id", "cell_label"
    )

    joined = (
        exact.join(F.broadcast(assign), "query_id")
        .join(F.broadcast(qb), "query_id")
        .join(nb, "neighbor_id")
    )
    ivf_hit = F.col("n_label") == F.col("cell_label")
    lsh_hit = F.col("n_bucket") == F.col("q_bucket")
    mp_hit = (
        F.bit_count(F.col("n_bucket").bitwiseXOR(F.col("q_bucket"))) <= 1
    )
    return joined.groupBy("query_id", "cell_label", "q_bucket").agg(
        F.count(F.lit(1)).alias("exact_k"),
        F.count_if(ivf_hit).alias("ivf_hits"),
        (F.count_if(ivf_hit).cast("double") / F.count(F.lit(1)))
        .alias("ivf_recall"),
        F.count_if(lsh_hit).alias("lsh_hits"),
        (F.count_if(lsh_hit).cast("double") / F.count(F.lit(1)))
        .alias("lsh_recall"),
        F.count_if(mp_hit).alias("mp_hits"),
        (F.count_if(mp_hit).cast("double") / F.count(F.lit(1)))
        .alias("mp_recall"),
    )


@query(
    "ann_multiprobe_search",
    survey="north-star similarity search: multi-probe LSH — search the "
    "query's bucket plus every 1-bit-flip probe bucket, the standard "
    "recall repair for sign-LSH at scale (probing 5 of 16 buckets "
    "instead of scanning the corpus)",
    description="Top-3 neighbors per query within the 1-bit-probe bucket set",
    oracle=f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
    (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
     + CASE WHEN embedding[9] > 0 THEN 4 ELSE 0 END
     + CASE WHEN embedding[17] > 0 THEN 2 ELSE 0 END
     + CASE WHEN embedding[25] > 0 THEN 1 ELSE 0 END) AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket AS qb
  FROM b WHERE vec_id < {N_QUERIES}
),
probes AS (
  SELECT query_id, qv, unnest([qb, xor(qb, 1), xor(qb, 2),
                               xor(qb, 4), xor(qb, 8)]) AS probe
  FROM q
),
cand AS (
  SELECT p.query_id, p.qv, b.vec_id AS neighbor_id, b.bucket, b.v
  FROM probes p JOIN b ON b.bucket = p.probe
  WHERE b.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, bucket, cos_sim FROM (
  SELECT query_id, neighbor_id, bucket,
    ROUND(list_dot_product(qv, v)
          / NULLIF(sqrt(list_dot_product(qv, qv))
                   * sqrt(list_dot_product(v, v)), 0), 6) AS cos_sim,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
      ROUND(list_dot_product(qv, v)
            / NULLIF(sqrt(list_dot_product(qv, qv))
                     * sqrt(list_dot_product(v, v)), 0), 6) DESC,
      neighbor_id ASC) AS rn
  FROM cand
) WHERE rn <= 3
""",
)
def ann_multiprobe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe generation is an explode of 5 bucket ids per query; the
    candidate join is an equi-join on bucket — at 100 TB each query
    touches 5/2^bits of the corpus instead of all of it, and the probe
    side is broadcast. Same deterministic rounded-similarity ordering
    as the exact baseline."""
    e = _emb(spark, sf_dir)
    bit = lambda i, v: F.when(F.element_at("vec", i) > 0, F.lit(v)).otherwise(0)
    bucket = bit(1, 8) + bit(9, 4) + bit(17, 2) + bit(25, 1)
    b = e.select("vec_id", "vec", bucket.alias("bucket"))
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    probes = q.select(
        "query_id", "qv",
        F.explode(
            F.array(
                F.col("qb"),
                F.col("qb").bitwiseXOR(1),
                F.col("qb").bitwiseXOR(2),
                F.col("qb").bitwiseXOR(4),
                F.col("qb").bitwiseXOR(8),
            )
        ).alias("probe"),
    )
    cand = (
        b.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(probes), F.col("bucket") == F.col("probe"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    sims = cand.select(
        "query_id", "neighbor_id", "bucket",
        F.round(cosine(F.col("qv"), F.col("vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "embedding_norms_quality",
    survey="north-star similarity: embedding quality audit — per-label "
    "L2-norm stats, zero/near-unit vector counts, dimension check "
    "(the pre-index sanity pass an ANN build runs first)",
    description="Per-label embedding norm statistics and degenerate-vector counts",
    oracle=f"""
WITH n AS (
  SELECT label, len(embedding) AS dim,
    ROUND(sqrt(list_reduce(
      list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
      (a, b) -> a + b)), 6) AS norm6
  FROM embeddings
)
SELECT label,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(MAX(dim) AS BIGINT) AS dim,
  CAST(MIN(dim) = MAX(dim) AS BOOLEAN) AS dim_consistent,
  {mean6_sql('norm6')} AS mean_norm,
  MIN(norm6) AS min_norm,
  MAX(norm6) AS max_norm,
  CAST(SUM(CASE WHEN norm6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
  CAST(SUM(CASE WHEN ABS(norm6 - 1) < 0.01 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_near_unit
FROM n GROUP BY label
""",
)
def embedding_norms_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norms are sequential JVM-side folds over the squared elements
    (same evaluation order as DuckDB's list_reduce after the exact
    0.0+x seed), rounded once; the mean sums the rounded norms as
    DECIMAL so group order cannot perturb it. Map-only + one
    hash-aggregate — the cheapest possible full-corpus pass at 100 TB."""
    e = _emb(spark, sf_dir)
    sq_sum = F.aggregate(
        F.transform(F.col("vec"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n = e.select(
        "label",
        F.size("vec").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("norm6"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.max("dim").cast("long").alias("dim"),
        (F.min("dim") == F.max("dim")).alias("dim_consistent"),
        # exact micro-unit mean (see exact.mean6: the double-ROUND
        # form hits engine-divergent midpoints at larger SF)
        mean6(F.col("norm6")).alias("mean_norm"),
        F.min("norm6").alias("min_norm"),
        F.max("norm6").alias("max_norm"),
        F.sum(F.when(F.col("norm6") == 0, 1).otherwise(0)).cast("long")
        .alias("n_zero"),
        F.sum(F.when(F.abs(F.col("norm6") - 1) < 0.01, 1).otherwise(0))
        .cast("long").alias("n_near_unit"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss signed random projection (deterministic signs)
# ---------------------------------------------------------------------------
_RP_K = 16  # projected dimensions


def _rp_sign(i, pj="pj"):
    """±1 from md5(i_j) parity — the implicit projection matrix entry."""
    return 1 - 2 * (
        F.conv(
            F.substring(
                F.md5(F.concat(i.cast("string"), F.lit("_"),
                               F.col(pj).cast("string"))), 1, 8
            ), 16, 10
        ).cast("bigint") % 2
    )


def _rp_coord(vec="vec"):
    """One projected coordinate: sequential signed fold over the dims
    (same order as DuckDB list_reduce, so sums are bit-comparable)."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda i: F.element_at(F.col(vec), i + 1) * _rp_sign(i),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )


def _rp_proj_sql() -> str:
    """The e/j/proj CTE chain both RP oracles share (single source)."""
    return f"""e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
j AS (SELECT range AS pj FROM range({_RP_K})),
proj AS (
  SELECT vec_id, pj,
    list_reduce(
      list_transform(range(len(v)), i ->
        v[i + 1] * (1 - 2 * (('0x' || substr(
            md5(CAST(i AS VARCHAR) || '_' || CAST(pj AS VARCHAR)),
          1, 8))::BIGINT % 2))),
      (a, b) -> a + b) AS coord
  FROM e CROSS JOIN j
)"""


@query(
    "embedding_random_projection",
    survey="north-star similarity: JL signed random projection — "
    "64→16 dims with md5-parity signs (no RNG state), the compression "
    "step in front of an ANN index build; Achlioptas 2003 ±1 scheme",
    description=f"{_RP_K}-dim signed random projection of every embedding",
    oracle=f"""
WITH {_rp_proj_sql()}
SELECT vec_id, CAST(pj AS BIGINT) AS proj_dim,
  ROUND(coord, 6) AS coord
FROM proj
""",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The projection matrix never materializes: sign(i, j) is the
    parity of md5(i_j) — identical in both engines, no RNG state, and
    any worker can recompute any entry, so at 100 TB the stage is
    map-only (explode 16 projection rows per vector, one sequential
    fold per row — the same order DuckDB's list_reduce uses, so the
    sums are bit-comparable). Downstream ANN probes run on the 16-dim
    vectors at 1/4 the dot-product cost."""
    e = _emb(spark, sf_dir)
    pj = F.explode(F.sequence(F.lit(0), F.lit(_RP_K - 1))).alias("pj")
    x = e.select("vec_id", "vec", pj)
    return x.select(
        "vec_id",
        F.col("pj").cast("bigint").alias("proj_dim"),
        F.round(_rp_coord(), 6).alias("coord"),
    )


@query(
    "rp_recall_eval",
    survey="north-star similarity: JL-projection recall — top-5 by "
    "16-dim projected cosine vs exact 64-dim top-5, the accept/reject "
    "metric for running ANN probes on compressed vectors",
    description=f"Per-query recall@{TOP_K} of the {_RP_K}-dim "
    "projection against exact cosine",
    oracle=f"""
WITH {_rp_proj_sql()},
pv AS (
  SELECT vec_id, list(coord ORDER BY pj) AS p FROM proj GROUP BY vec_id
),
exact_sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    ROUND(list_dot_product(q.v, c.v)
      / NULLIF(sqrt(list_dot_product(q.v, q.v))
               * sqrt(list_dot_product(c.v, c.v)), 0), 6) AS s
  FROM e q, e c
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY s DESC, neighbor_id) AS rn FROM exact_sims
  ) WHERE rn <= {TOP_K}
),
rp_sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    ROUND(list_dot_product(q.p, c.p)
      / NULLIF(sqrt(list_dot_product(q.p, q.p))
               * sqrt(list_dot_product(c.p, c.p)), 0), 6) AS s
  FROM pv q, pv c
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
rp_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY s DESC, neighbor_id) AS rn FROM rp_sims
  ) WHERE rn <= {TOP_K}
)
SELECT e.query_id,
  CAST(COUNT(r.neighbor_id) AS BIGINT) AS n_hit,
  ROUND(COUNT(r.neighbor_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_top e
LEFT JOIN rp_top r USING (query_id, neighbor_id)
GROUP BY e.query_id
""",
)
def rp_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both rankings come from the same deterministic machinery (rounded
    sims + id tiebreaks); the projected vectors reuse
    embedding_random_projection's map-only fold, collected to a 16-long
    array per vector. The projected all-pairs term is |queries|×|corpus|
    at 1/4 dot cost — the point of the compression; recall per query is
    an exact integer ratio.

    Expected values on the driver's SYNTHETIC embeddings are low
    (~0.2 at sf0.01): i.i.d.-random vectors have razor-thin neighbor
    margins, which 4× JL distortion swamps — that is the measurement
    this eval exists to surface (on clustered real embeddings the same
    16 dims preserve neighborhoods far better). The query gates the
    MACHINERY exactly; the number is data-honest."""
    e = _emb(spark, sf_dir)
    pj = F.explode(F.sequence(F.lit(0), F.lit(_RP_K - 1))).alias("pj")
    x = e.select("vec_id", "vec", pj)
    pv = (
        x.select("vec_id", "pj", _rp_coord().alias("coord"))
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("pj", "coord"))).alias("ps"))
        .select(
            "vec_id",
            F.transform(F.col("ps"), lambda s: s["coord"]).alias("p"),
        )
    )

    def topk(df, col):
        q = df.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col(col).alias("qv")
        )
        c = df.select(F.col("vec_id").alias("neighbor_id"),
                      F.col(col).alias("cv"))
        sims = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id", "neighbor_id",
                F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("s"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("s"), F.asc("neighbor_id")
        )
        return (
            sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    exact_top = topk(e.withColumnRenamed("vec", "v"), "v")
    rp_top = topk(pv, "p")
    hit = exact_top.join(
        rp_top.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"],
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("hit").alias("n_hit"),
        F.round(F.count("hit") / F.lit(float(TOP_K)), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Per-component exact quantiles (embedding winsorization bounds)
# ---------------------------------------------------------------------------
_COMP_QUANTS = (("p01", 1, 100), ("p50", 1, 2), ("p99", 99, 100))


@query(
    "embedding_component_quantiles",
    survey="north-star similarity/quality: exact per-component "
    "p01/p50/p99 of the embedding distribution — the winsorization/"
    "clipping bounds a vector-quality pass needs, computed per "
    "component from the bounded value histogram (rankcut.group_value_cb"
    ") with no per-component sort of the corpus",
    description="Exact per-component p01/p50/p99 of embedding values "
    "(6dp micro-units)",
    oracle=f"""
WITH c AS (
  SELECT generate_subscripts(embedding, 1) AS component,
    CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT)
      AS m
  FROM embeddings
),
n AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY component
),
r AS (
  SELECT component, m,
    ROW_NUMBER() OVER (PARTITION BY component ORDER BY m) - 1 AS rk
  FROM c
)
"""
    + "\nUNION ALL\n".join(
        f"""SELECT r.component, '{lbl}' AS quantile,
  CAST(({num} * (n.n - 1)) // {den} AS BIGINT) AS k,
  CAST(r.m AS BIGINT) AS value_micro, n.n AS n
FROM r JOIN n USING (component)
WHERE r.rk = ({num} * (n.n - 1)) // {den}"""
        for lbl, num, den in _COMP_QUANTS
    ),
)
def embedding_component_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distributed exact selection PER GROUP: one posexplode of the
    embedding corpus into (component, 6dp micro value), one grouped
    histogram (``group_value_cb`` — every window partition bounded by
    the value range, the component count only widens parallelism), and
    each quantile is max(m : cb(m) <= k) per component. The brute
    per-component sort lives only in the oracle. Values are published
    as micro-unit BIGINTs: float->double cast is exact and both
    engines round identically, so the gate stays integer-only."""
    from tradecat_spark.plans.rankcut import exact_quantiles, group_value_cb

    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos", "x")
    ).select(
        (F.col("pos") + 1).cast("bigint").alias("component"),
        F.round(F.col("x") * 1_000_000).cast("long").alias("m"),
    )
    hist = group_value_cb(comp, ["component"], "m", 10_000)
    return exact_quantiles(
        hist, ["component"], "m", _COMP_QUANTS, "value_micro"
    )


def _bounds_sql() -> str:
    """The q/b/c CTE chain every winsorize/SQ8 oracle shares — ONE
    rendering of the bounds definition (nests the quantile oracle
    verbatim), so the lo/hi pivot and the micro-unit rounding cannot
    drift between the consumers."""
    from tradecat_spark.plans.registry import REGISTRY

    return f"""q AS ({REGISTRY['embedding_component_quantiles'].oracle}),
b AS (
  SELECT component,
    MAX(CASE WHEN quantile = 'p01' THEN value_micro END) AS lo,
    MAX(CASE WHEN quantile = 'p99' THEN value_micro END) AS hi
  FROM q GROUP BY component
),
c AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS component,
    CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT)
      AS m
  FROM embeddings
)"""


def _winsor_oracle() -> str:
    return f"""
WITH {_bounds_sql()},
cl AS (
  SELECT c.vec_id, LEAST(GREATEST(c.m, b.lo), b.hi) AS mc,
    CASE WHEN c.m < b.lo OR c.m > b.hi THEN 1 ELSE 0 END AS clipped
  FROM c JOIN b USING (component)
)
SELECT vec_id,
  CAST(COUNT(*) AS BIGINT) AS n_comp,
  CAST(SUM(clipped) AS BIGINT) AS n_clipped,
  CAST(SUM(mc * mc) AS BIGINT) AS sq_norm_micro2
FROM cl GROUP BY vec_id
"""


@query(
    "embedding_winsorized_stats",
    survey="north-star similarity/quality: APPLY the per-component "
    "p01/p99 bounds — winsorize every vector, count clipped "
    "components, and publish the clipped squared norm in exact "
    "micro^2 integers (the outlier-robust magnitude a vector-quality "
    "gate thresholds on); oracle nests the quantile oracle verbatim",
    description="Per-vector winsorized stats: clipped-component count "
    "+ exact clipped squared norm",
    oracle=_winsor_oracle(),
)
def embedding_winsorized_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composes ``embedding_component_quantiles`` (the oracle nests its
    oracle, so bounds cannot drift): the bounds collapse to ONE row of
    component-ordered lo/hi arrays (``_sq8_bounds_row``) and broadcast,
    so every vector clips, counts, and folds its exact integer squared
    norm MAP-SIDE — no posexplode and, critically, no dim-times-
    amplified corpus regroup shuffle (micro^2 * dim fits int64 with
    orders of magnitude to spare). The output is one narrow row per
    vector straight off the scan."""
    brow = _sq8_bounds_row(spark, sf_dir)
    e = _emb(spark, sf_dir).crossJoin(F.broadcast(brow))

    def per_comp(f):
        return F.transform(
            F.col("vec"),
            lambda x, i: f(
                F.round(x * 1_000_000).cast("long"),
                F.element_at(F.col("los"), i + 1),
                F.element_at(F.col("his"), i + 1),
            ),
        )

    mc = per_comp(lambda m, lo, hi: F.least(F.greatest(m, lo), hi))
    clip = per_comp(
        lambda m, lo, hi: ((m < lo) | (m > hi)).cast("long")
    )
    return e.select(
        "vec_id",
        F.size("vec").cast("bigint").alias("n_comp"),
        _lsum(clip).alias("n_clipped"),
        _lsum(F.transform(mc, lambda v: v * v)).alias("sq_norm_micro2"),
    )


# ---------------------------------------------------------------------------
# 8-bit scalar quantization (SQ8) over the winsorized bounds
# ---------------------------------------------------------------------------
# The classic ANN memory-compression step (the scalar cousin of Jegou
# 2011 product quantization): each component maps to a 0..255 code over
# the robust [p01, p99] range, 4x smaller than float32. Codes and
# reconstructions are defined in exact integer micro-units with half-up
# integer division, so both engines agree bit-for-bit and the recall
# ranking below never touches a float until the final cosine of exact
# integer dot products.


def _sq8_sql() -> str:
    """Shared CTE chain: the common bounds rendering (``_bounds_sql``)
    -> exact integer SQ8 reconstruction."""
    return f"""{_bounds_sql()},
xh AS (
  SELECT c.vec_id, c.component, c.m,
    CASE WHEN b.hi > b.lo THEN
      b.lo + ((2 * ((510 * (LEAST(GREATEST(c.m, b.lo), b.hi) - b.lo)
                     + (b.hi - b.lo)) // (2 * (b.hi - b.lo)))
               * (b.hi - b.lo) + 255) // 510)
    ELSE b.lo END AS xhat
  FROM c JOIN b USING (component)
)"""


def _sq8_bounds_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE row holding the lo/hi micro bounds as component-ordered
    arrays — the broadcastable model artifact (dim entries, never
    corpus-sized), so quantization stays a map-only crossJoin instead
    of a posexplode + per-vector regroup shuffle of the corpus."""
    from tradecat_spark.plans.registry import REGISTRY

    bounds = (
        REGISTRY["embedding_component_quantiles"]
        .fn(spark, sf_dir)
        .groupBy("component")
        .agg(
            F.max(
                F.when(F.col("quantile") == "p01", F.col("value_micro"))
            ).alias("lo"),
            F.max(
                F.when(F.col("quantile") == "p99", F.col("value_micro"))
            ).alias("hi"),
        )
    )
    return bounds.agg(
        F.array_sort(
            F.collect_list(F.struct("component", "lo", "hi"))
        ).alias("b")
    ).select(
        F.transform(F.col("b"), lambda s: s["lo"]).alias("los"),
        F.transform(F.col("b"), lambda s: s["hi"]).alias("his"),
    )


def _sq8_xhat(vec: Column, los: Column, his: Column) -> Column:
    """Exact integer SQ8 reconstruction of every component: code =
    half-up((255*(clip(m)-lo))/span), xhat = lo + half-up(code*span/255).
    Half-up integer division is (2a+b) div (2b) — nonneg operands only,
    identical to the oracle's `//` form. span clamps to >=1 inside the
    dead branch so ANSI mode never sees a div-by-zero."""

    def f(x: Column, i: Column) -> Column:
        lo = F.element_at(los, i + 1)
        hi = F.element_at(his, i + 1)
        span = hi - lo
        safe = F.greatest(span, F.lit(1))
        m = F.round(x * 1_000_000).cast("long")
        mc = F.least(F.greatest(m, lo), hi)
        code = F.call_function(
            "div", F.lit(510) * (mc - lo) + safe, 2 * safe
        )
        off = F.call_function("div", 2 * code * safe + 255, F.lit(510))
        return F.when(hi > lo, lo + off).otherwise(lo)

    return F.transform(vec, f)




@query(
    "embedding_sq8_error",
    survey="north-star similarity: SQ8 quantizer fidelity — exact "
    "per-vector reconstruction error of the 8-bit code over the "
    "winsorized [p01,p99] range (the accept gate before swapping an "
    "ANN index to 4x-compressed codes)",
    description="Per-vector exact integer reconstruction error of the "
    "SQ8 quantizer",
    oracle=f"""
WITH {_sq8_sql()}
SELECT vec_id,
  CAST(SUM((xhat - m) * (xhat - m)) AS BIGINT) AS sq_err_micro2,
  CAST(MAX(ABS(xhat - m)) AS BIGINT) AS max_abs_err_micro
FROM xh GROUP BY vec_id
""",
)
def embedding_sq8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize map-side (one-row bounds broadcast, transform over the
    components — the corpus never shuffles), then fold the exact
    integer error per vector. Per-vector sums stay under 2^53 by
    construction (dim * (2*max|m|)^2), so no decimal widening is
    needed at any scale factor."""
    brow = _sq8_bounds_row(spark, sf_dir)
    e = _emb(spark, sf_dir).crossJoin(F.broadcast(brow))
    m_arr = F.transform(
        F.col("vec"), lambda x: F.round(x * 1_000_000).cast("long")
    )
    err = F.zip_with(
        _sq8_xhat(F.col("vec"), F.col("los"), F.col("his")),
        m_arr,
        lambda a, b: a - b,
    )
    return e.select(
        "vec_id",
        _lsum(F.transform(err, lambda v: v * v)).alias("sq_err_micro2"),
        F.array_max(F.transform(err, F.abs)).alias("max_abs_err_micro"),
    )


def _sq8_recall_oracle() -> str:
    from tradecat_spark.plans.registry import REGISTRY

    return f"""
WITH {_sq8_sql()},
sd AS (
  SELECT vec_id, CAST(SUM(xhat * xhat) AS BIGINT) AS s2
  FROM xh GROUP BY vec_id
),
ad AS (
  SELECT qx.vec_id AS query_id, cx.vec_id AS neighbor_id,
    CAST(SUM(qx.xhat * cx.xhat) AS BIGINT) AS d
  FROM xh qx JOIN xh cx USING (component)
  WHERE qx.vec_id < {N_QUERIES} AND qx.vec_id <> cx.vec_id
  GROUP BY 1, 2
),
approx_sims AS (
  SELECT query_id, neighbor_id,
    ROUND(CAST(d AS DOUBLE) / NULLIF(
      sqrt(CAST(q2.s2 AS DOUBLE) * CAST(c2.s2 AS DOUBLE)), 0), 6) AS s
  FROM ad
  JOIN sd q2 ON q2.vec_id = ad.query_id
  JOIN sd c2 ON c2.vec_id = ad.neighbor_id
),
approx_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY s DESC, neighbor_id) AS rn FROM approx_sims
  ) WHERE rn <= {TOP_K}
),
exact_top AS (
  SELECT query_id, neighbor_id
  FROM ({REGISTRY['ann_cosine_topk'].oracle}) t
)
SELECT e.query_id,
  CAST(COUNT(r.neighbor_id) AS BIGINT) AS n_hit,
  ROUND(COUNT(r.neighbor_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_top e
LEFT JOIN approx_top r USING (query_id, neighbor_id)
GROUP BY e.query_id
"""


@query(
    "ann_sq8_recall",
    survey="north-star similarity: recall@5 of SQ8-compressed cosine "
    "vs exact float cosine — the quality bar for serving ANN from "
    "4x-compressed codes; ranking derives from exact integer dot "
    "products so the cutoff is engine-deterministic",
    description=f"Per-query recall@{TOP_K} of SQ8-quantized cosine "
    "against exact cosine",
    oracle=_sq8_recall_oracle(),
)
def ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx ranking: quantize map-side (bounds broadcast), carry the
    exact int64 self-dot per vector, broadcast the {N_QUERIES}-row query
    side, and fold exact integer cross-dots per (query, candidate) —
    the cosine's inputs are identical integers in both engines, so the
    double sqrt/divide is bit-identical too. Exact ranking reuses
    ann_cosine_topk. One |queries| x |corpus| map stage + two top-k
    windows + one {TOP_K}*{N_QUERIES}-row join: nothing corpus-global."""
    from tradecat_spark.plans.registry import REGISTRY

    brow = _sq8_bounds_row(spark, sf_dir)
    xv = (
        _emb(spark, sf_dir)
        .crossJoin(F.broadcast(brow))
        .select(
            "vec_id",
            _sq8_xhat(F.col("vec"), F.col("los"), F.col("his"))
            .alias("xhat"),
        )
        .select(
            "vec_id", "xhat",
            _lsum(F.transform(F.col("xhat"), lambda v: v * v))
            .alias("s2"),
        )
    )
    q = xv.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("xhat").alias("qx"),
        F.col("s2").alias("qs2"),
    )
    sims = (
        xv.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _lsum(
                    F.zip_with(
                        F.col("qx"), F.col("xhat"), lambda a, b: a * b
                    )
                ).cast("double")
                / F.nullif(
                    F.sqrt(
                        F.col("qs2").cast("double")
                        * F.col("s2").cast("double")
                    ),
                    F.lit(0),
                ),
                6,
            ).alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("neighbor_id")
    )
    approx_top = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact_top = (
        REGISTRY["ann_cosine_topk"]
        .fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
    )
    hit = exact_top.join(
        approx_top.withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("hit").cast("bigint").alias("n_hit"),
        F.round(F.count("hit") / F.lit(float(TOP_K)), 6).alias("recall"),
    )


def _ivf_assign_sql(train_pred: str | None = None) -> str:
    """IVF coarse-quantizer CTE fragment shared by the SQ8 and PQ
    search oracles: per-label centroids, the query vectors, the
    rounded-argmin cell assignment, and the member-label table — ONE
    rendering so the assignment semantics cannot drift between the
    two compressed-index searches. ``train_pred`` restricts the rows
    the centroids are computed FROM (frozen-model split)."""
    where = f"WHERE {train_pred}" if train_pred else ""
    return f"""cent AS (
  SELECT label, list(cc ORDER BY dim) AS cv FROM (
    SELECT label, i AS dim,
      ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS cc
    FROM embeddings,
         LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
    {where}
    GROUP BY label, i
  ) GROUP BY label
),
qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
assign AS (
  SELECT query_id, label AS cell_label FROM (
    SELECT q.query_id, c2.label,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        ROUND(list_dot_product(q.v, q.v)
              - 2 * list_dot_product(q.v, c2.cv)
              + list_dot_product(c2.cv, c2.cv), 6) ASC,
        c2.label ASC) AS rn
    FROM qv q, cent c2
  ) WHERE rn = 1
),
lbl AS (SELECT vec_id, label FROM embeddings)"""


def _ivf_sq8_oracle() -> str:
    return f"""
WITH {_sq8_sql()},
sd AS (
  SELECT vec_id, CAST(SUM(xhat * xhat) AS BIGINT) AS s2
  FROM xh GROUP BY vec_id
),
qm AS (
  SELECT vec_id AS query_id, component, m
  FROM c WHERE vec_id < {N_QUERIES}
),
qs AS (
  SELECT query_id, CAST(SUM(m * m) AS BIGINT) AS qs2
  FROM qm GROUP BY query_id
),
{_ivf_assign_sql()},
ad AS (
  SELECT a.query_id, a.cell_label, l.vec_id AS neighbor_id,
    CAST(SUM(qm.m * xh.xhat) AS BIGINT) AS d
  FROM assign a
  JOIN lbl l ON l.label = a.cell_label AND l.vec_id <> a.query_id
  JOIN xh ON xh.vec_id = l.vec_id
  JOIN qm ON qm.query_id = a.query_id AND qm.component = xh.component
  GROUP BY 1, 2, 3
),
sims AS (
  SELECT ad.query_id, ad.cell_label, ad.neighbor_id,
    ROUND(CAST(ad.d AS DOUBLE) / NULLIF(
      sqrt(CAST(qs.qs2 AS DOUBLE) * CAST(sd.s2 AS DOUBLE)), 0), 6)
      AS adc_sim
  FROM ad
  JOIN qs USING (query_id)
  JOIN sd ON sd.vec_id = ad.neighbor_id
)
SELECT query_id, cell_label, neighbor_id, adc_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY adc_sim DESC, neighbor_id ASC) AS rn
  FROM sims
) WHERE rn <= 3
"""


@query(
    "ann_ivf_sq8_search",
    survey="north-star similarity search: the production ANN stack in "
    "one plan — IVF coarse-quantizer cell pruning (ann_ivf_search) "
    "over SQ8-compressed codes (embedding_sq8_error), ranked by "
    "asymmetric distance (exact-micro query x reconstructed candidate "
    "— Jegou 2011 ADC), all dots exact int64",
    description="Top-3 per query from the nearest IVF cell, ranked by "
    "SQ8 ADC similarity",
    oracle=_ivf_sq8_oracle(),
)
def ann_ivf_sq8_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full compressed-index search: the corpus is stored once as
    SQ8 codes partitioned by IVF cell; a query (a) assigns to its
    nearest centroid on a broadcast |labels|-row table, (b) equi-joins
    the ONE cell's codes — never the corpus — and (c) ranks by ADC:
    the UNquantized query (exact micro ints) against reconstructed
    candidates, the standard accuracy repair for quantized indexes.
    Every dot is an exact int64 fold, so both engines rank
    identically; the only broadcasts are centroids, bounds, and the
    10-row query side."""
    brow = _sq8_bounds_row(spark, sf_dir)
    e = _emb(spark, sf_dir)
    xv = (
        e.crossJoin(F.broadcast(brow))
        .select(
            "vec_id", "label",
            _sq8_xhat(F.col("vec"), F.col("los"), F.col("his"))
            .alias("xhat"),
        )
        .select(
            "vec_id", "label", "xhat",
            _lsum(F.transform(F.col("xhat"), lambda v: v * v))
            .alias("s2"),
        )
    )
    m_arr = F.transform(
        F.col("vec"), lambda x: F.round(x * 1_000_000).cast("long")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        m_arr.alias("qm"),
        _lsum(
            F.transform(m_arr, lambda v: v * v)
        ).alias("qs2"),
    )
    assign = _ivf_nearest_cell(q, _ivf_centroids(e)).select(
        "query_id", "qm", "qs2", "cell_label"
    )
    sims = (
        xv.withColumnRenamed("label", "cell_label")
        .join(F.broadcast(assign), "cell_label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "cell_label",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _lsum(
                    F.zip_with(
                        F.col("qm"), F.col("xhat"), lambda a, b: a * b
                    )
                ).cast("double")
                / F.nullif(
                    F.sqrt(
                        F.col("qs2").cast("double")
                        * F.col("s2").cast("double")
                    ),
                    F.lit(0),
                ),
                6,
            ).alias("adc_sim"),
        )
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance search (Jegou 2011 §II)
# ---------------------------------------------------------------------------
# The sub-vector generalization of SQ8 above: split each 64-d vector
# into PQ_M=8 subspaces, learn a PQ_KS=16-centroid Lloyd codebook per
# subspace, store each vector as 8 one-byte codes (32x smaller than
# float32), and rank candidates by ADC — the query stays exact while
# candidates are looked up in a per-query table of precomputed
# query x centroid dots. All determinism-critical arithmetic follows
# the SQ8/IVF precedent: centroid components are decimal-mean doubles,
# assignment distances round to 6dp with lower-code tie-break, and
# every ADC dot is an exact int64 fold over micro-unit integers, so
# both engines rank identically.











_PQD2 = (
    "list_reduce(list_transform(range(1, len({v}) + 1), "
    "i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), (a, b) -> a + b)"
)


def _pq_assign_sql(label: str, prev: str, sv: str = "sv") -> str:
    """One per-subspace assignment CTE: nearest ``prev`` centroid per
    (sub, vec_id), rounded-distance argmin, lower-cid tie-break."""
    d2 = _PQD2.format(v="s.sv", c="k.cv")
    return f"""{label} AS (
  SELECT vec_id, sub, sv, cid, d2r FROM (
    SELECT s.vec_id, s.sub, s.sv, k.cid, ROUND({d2}, 6) AS d2r,
      ROW_NUMBER() OVER (PARTITION BY s.sub, s.vec_id
        ORDER BY ROUND({d2}, 6) ASC, k.cid ASC) AS rn
    FROM {sv} s JOIN {prev} k USING (sub)
  ) WHERE rn = 1
)"""


def _pq_chain_sql(
    src: str, p: str, train_pred: str | None = None
) -> list[str]:
    """The subvector-split + Lloyd-unroll + final-assignment CTE chain
    over vector CTE ``src`` (columns vec_id, v), every CTE name
    prefixed with ``p`` — ONE rendering shared by the raw-vector chain
    (p='') and the IVF-residual chain (p='r'), so the training
    semantics cannot drift between the two PQ lanes. Ends with
    ``{p}pqc`` (vec_id, sub, code, d2r) and ``{p}pc{PQ_ITERS}``.

    ``train_pred`` models a FROZEN-model split (streaming_ann_index):
    the Lloyd iterations (and seeds) see only rows satisfying the
    predicate, while the final assignment encodes EVERY row — exactly
    the train-on-base / encode-the-stream semantics of
    streaming/ann.py."""
    tsv = f"{p}tsv" if train_pred else f"{p}sv"
    ctes = [
        f"""{p}sv AS (
  SELECT vec_id, CAST(s AS BIGINT) AS sub,
    v[s*{PQ_DSUB}+1 : s*{PQ_DSUB}+{PQ_DSUB}] AS sv
  FROM {src}, LATERAL (SELECT unnest(range(0, {PQ_M})) AS s) t
)""",
    ]
    if train_pred:
        ctes.append(
            f"{p}tsv AS (SELECT * FROM {p}sv WHERE {train_pred})"
        )
    ctes.append(
        f"{p}pc0 AS (SELECT sub, CAST(vec_id AS BIGINT) AS cid, sv AS cv "
        f"FROM {tsv} WHERE vec_id < {PQ_KS})"
    )
    for t in range(1, PQ_ITERS + 1):
        ctes.append(_pq_assign_sql(f"{p}pa{t}", f"{p}pc{t - 1}", tsv))
        ctes.append(f"""{p}pc{t} AS (
  SELECT sub, cid, list(m ORDER BY pos) AS cv FROM (
    SELECT sub, cid, pos,
      CAST(SUM(CAST(x AS DECIMAL(25,14))) AS DOUBLE) / COUNT(*) AS m
    FROM (SELECT sub, cid, unnest(sv) AS x,
                 generate_subscripts(sv, 1) AS pos
          FROM {p}pa{t})
    GROUP BY sub, cid, pos
  ) GROUP BY sub, cid
)""")
    final = _pq_assign_sql(f"{p}pqa", f"{p}pc{PQ_ITERS}", f"{p}sv")
    ctes.append(final)
    ctes.append(
        f"{p}pqc AS (SELECT vec_id, sub, cid AS code, d2r FROM {p}pqa)"
    )
    return ctes


def _pq_sql() -> str:
    """CTE chain replaying the per-subspace Lloyd unroll + the final
    code assignment: ends with ``pqc`` (vec_id, sub, code, d2r) and
    ``pc{PQ_ITERS}`` (the final codebook)."""
    ctes = [
        "c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)",
        *_pq_chain_sql("c", ""),
    ]
    return ",\n".join(ctes)


def _pq_adc_sql() -> str:
    """ADC CTE chain on top of ``_pq_sql``: micro-int codebook, the
    per-query LUT of exact int64 query x centroid dots, candidate
    scores as LUT sums, reconstructed norms, and the cosine-analog
    ``adc`` similarity table (query_id, neighbor_id, adc_sim)."""
    lsum = "(a, b) -> a + b"
    return f"""centm AS (
  SELECT sub, cid,
    list_transform(cv, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS cvm
  FROM pc{PQ_ITERS}
),
c2t AS (
  SELECT sub, cid,
    CAST(list_reduce(list_transform(cvm, x -> x * x), {lsum}) AS BIGINT)
      AS c2
  FROM centm
),
qmi AS (
  SELECT vec_id AS query_id,
    list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS qm
  FROM c WHERE vec_id < {N_QUERIES}
),
qst AS (
  SELECT query_id,
    CAST(list_reduce(list_transform(qm, x -> x * x), {lsum}) AS BIGINT)
      AS qs2
  FROM qmi
),
lut AS (
  SELECT q.query_id, m.sub, m.cid,
    CAST(list_reduce(list_transform(range(1, {PQ_DSUB} + 1),
      i -> q.qm[m.sub * {PQ_DSUB} + i] * m.cvm[i]), {lsum}) AS BIGINT)
      AS ld
  FROM qmi q, centm m
),
rst AS (
  SELECT k.vec_id, CAST(SUM(c2t.c2) AS BIGINT) AS rs2
  FROM pqc k JOIN c2t ON c2t.sub = k.sub AND c2t.cid = k.code
  GROUP BY 1
),
sct AS (
  SELECT l.query_id, k.vec_id AS neighbor_id, CAST(SUM(l.ld) AS BIGINT) AS d
  FROM pqc k JOIN lut l ON l.sub = k.sub AND l.cid = k.code
  WHERE l.query_id <> k.vec_id
  GROUP BY 1, 2
),
adc AS (
  SELECT sct.query_id, sct.neighbor_id,
    ROUND(CAST(sct.d AS DOUBLE) / NULLIF(
      sqrt(CAST(qst.qs2 AS DOUBLE) * CAST(rst.rs2 AS DOUBLE)), 0), 6)
      AS adc_sim
  FROM sct
  JOIN qst USING (query_id)
  JOIN rst ON rst.vec_id = sct.neighbor_id
)"""


@query(
    "embedding_pq_codes",
    survey="north-star similarity: product-quantization encoding "
    "(Jegou 2011 §II) — per-subspace Lloyd codebooks (m=8, ks=16) "
    "learned with the decimal-exact k-means idiom, then every vector "
    "encoded MAP-SIDE against one broadcast codebook row (the 32x "
    "compressed index a 100 TB ANN corpus actually stores)",
    description=f"PQ codes: per (vector, subspace) nearest-centroid "
    f"code + rounded distance (m={PQ_M}, ks={PQ_KS})",
    oracle=f"WITH {_pq_sql()}\n"
    "SELECT vec_id, sub, code, d2r FROM pqc",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook training is the bounded-sample stage (``_pq_train``);
    encoding is a pure scan: one crossJoin with the ONE-row codebook
    (maps keyed sub*ks+cid) and a per-row fold — no per-dimension
    explode of the corpus, no shuffle, no window. The only explode is
    the x{PQ_M} unnest of the RESULT rows."""
    e = _emb(spark, sf_dir)
    brow = _pq_codebook_row(_pq_train(e))
    return (
        e.crossJoin(F.broadcast(brow))
        .select(
            "vec_id",
            F.explode(
                _pq_codes_col(F.col("vec"), F.col("cb"))
            ).alias("z"),
        )
        .select(
            "vec_id",
            F.col("z.sub").alias("sub"),
            F.col("z.code").alias("code"),
            F.col("z.d2r").alias("d2r"),
        )
    )


def _pq_candidates(e: DataFrame, brow: DataFrame) -> DataFrame:
    """Corpus side of ADC search: per vector its m-entry code array
    and the reconstructed self-dot (sum of its centroids' exact
    micro-int self-dots) — all map-side off the broadcast codebook."""
    return (
        e.crossJoin(F.broadcast(brow))
        .select(
            "vec_id", "label",
            F.transform(
                _pq_codes_col(F.col("vec"), F.col("cb")),
                lambda z: z["code"],
            ).alias("codes"),
            "c2m",
        )
        .select(
            "vec_id", "label", "codes",
            _lsum(
                F.transform(
                    F.col("codes"),
                    lambda c, s: F.try_element_at(
                        F.col("c2m"),
                        (s.cast("bigint") * PQ_KS + c),
                    ),
                )
            ).alias("rs2"),
        )
    )




def _pq_adc_sim() -> Column:
    """ADC cosine-analog for one (candidate row x query row) pair:
    sum of m LUT lookups over exact int64, normalized by the exact
    query/reconstruction norms, rounded once."""
    d = _lsum(
        F.transform(
            F.col("codes"),
            lambda c, s: F.element_at(
                F.col("lut"),
                (s.cast("bigint") * PQ_KS + c + 1).cast("int"),
            ),
        )
    )
    return F.round(
        d.cast("double")
        / F.nullif(
            F.sqrt(
                F.col("qs2").cast("double") * F.col("rs2").cast("double")
            ),
            F.lit(0),
        ),
        6,
    )


def _pq_recall_oracle() -> str:
    from tradecat_spark.plans.registry import REGISTRY

    return f"""
WITH {_pq_sql()},
{_pq_adc_sql()},
approx_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY adc_sim DESC, neighbor_id) AS rn FROM adc
  ) WHERE rn <= {TOP_K}
),
exact_top AS (
  SELECT query_id, neighbor_id
  FROM ({REGISTRY['ann_cosine_topk'].oracle}) t
)
SELECT e.query_id,
  CAST(COUNT(r.neighbor_id) AS BIGINT) AS n_hit,
  ROUND(COUNT(r.neighbor_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_top e
LEFT JOIN approx_top r USING (query_id, neighbor_id)
GROUP BY e.query_id
"""


@query(
    "ann_pq_recall",
    survey="north-star similarity: recall@5 of PQ/ADC ranking vs "
    "exact float cosine — the quality gate before serving ANN from "
    "32x-compressed codes; every dot is an exact int64 LUT sum so "
    "the cutoff is engine-deterministic",
    description=f"Per-query recall@{TOP_K} of PQ ADC ranking against "
    "exact cosine",
    oracle=_pq_recall_oracle(),
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus ADC as the recall baseline: candidates carry codes
    + reconstructed norms (map-side), the 10 query rows broadcast
    their LUTs, and scoring is m integer lookups per pair — one
    |queries| x |corpus| map stage, one top-k window, one tiny join;
    nothing corpus-global. Exact side reuses ann_cosine_topk."""
    from tradecat_spark.plans.registry import REGISTRY

    e = _emb(spark, sf_dir)
    brow = _pq_codebook_row(_pq_train(e))
    sims = (
        _pq_candidates(e, brow)
        .crossJoin(F.broadcast(_pq_query_rows(e, brow)))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _pq_adc_sim().alias("adc_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    approx_top = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact_top = (
        REGISTRY["ann_cosine_topk"]
        .fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
    )
    hit = exact_top.join(
        approx_top.withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("hit").cast("bigint").alias("n_hit"),
        F.round(F.count("hit") / F.lit(float(TOP_K)), 6).alias("recall"),
    )


@query(
    "ann_ivf_pq_search",
    survey="north-star similarity search: the production compressed "
    "index — IVF cell pruning over PQ codes ranked by ADC lookup "
    "tables (Jegou 2011 IVFADC); codebooks, LUTs and queries all "
    "broadcast, the corpus never exploded per-dimension",
    description="Top-3 per query from the nearest IVF cell, ranked by "
    "PQ ADC similarity",
    oracle=f"""
WITH {_pq_sql()},
{_pq_adc_sql()},
{_ivf_assign_sql()}
SELECT query_id, cell_label, neighbor_id, adc_sim FROM (
  SELECT a.query_id, a.cell_label, l.vec_id AS neighbor_id,
    adc.adc_sim,
    ROW_NUMBER() OVER (PARTITION BY a.query_id
      ORDER BY adc.adc_sim DESC, l.vec_id ASC) AS rn
  FROM assign a
  JOIN lbl l ON l.label = a.cell_label AND l.vec_id <> a.query_id
  JOIN adc ON adc.query_id = a.query_id AND adc.neighbor_id = l.vec_id
) WHERE rn <= 3
""",
)
def ann_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC: a query (a) assigns to its nearest coarse cell on the
    broadcast |labels|-row centroid table, (b) equi-joins that ONE
    cell's PQ codes, (c) ranks by ADC LUT sums — at 100 TB the store
    is m one-byte codes per vector partitioned by cell, the probe
    reads one cell, and every per-pair score is m array lookups."""
    e = _emb(spark, sf_dir)
    brow = _pq_codebook_row(_pq_train(e))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    assign = _ivf_nearest_cell(q, _ivf_centroids(e)).select(
        "query_id", "cell_label"
    )
    qrows = _pq_query_rows(e, brow).join(
        F.broadcast(assign), "query_id"
    )
    sims = (
        _pq_candidates(e, brow)
        .withColumnRenamed("label", "cell_label")
        .join(F.broadcast(qrows), "cell_label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "cell_label",
            F.col("vec_id").alias("neighbor_id"),
            _pq_adc_sim().alias("adc_sim"),
        )
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# True IVFADC: PQ over IVF RESIDUALS + multi-cell probe (Jegou 2011
# SIII — the residual x - coarse_centroid is what the fine quantizer
# encodes, and production IVF probes nprobe > 1 cells; the r7 lane
# above quantized raw vectors and probed one cell, a recall ceiling
# this lane removes. r7 verdict item 1.)
# ---------------------------------------------------------------------------
NPROBE = 4  # coarse cells probed per query (recall-tuned: 0.34 vs raw lane 0.30 at sf0.01)












def _ivfadc_sims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-ADC similarity rows (query_id, probe_rank, cell_label,
    neighbor_id, adc_sim) over the NPROBE nearest cells per query —
    the shared core of ann_ivfadc_search / ann_ivfadc_recall /
    ann_ivfadc_nprobe_curve, composed entirely from the single-sourced
    algebra in operators.ivfadc (see encode_residual_codes /
    adc_probe_rows / residual_adc_scores for the exact int64
    decompositions and the 100 TB partitioned-by-cell shape). Here the
    model is trained inline from the corpus; streaming/ann.py runs the
    SAME operators against a frozen persisted model."""
    from tradecat_spark.operators.ivfadc import (
        adc_probe_rows,
        encode_residual_codes,
        residual_adc_scores,
    )

    e = _emb(spark, sf_dir)
    # Materialize the shared training intermediates ONCE (r14): the
    # model chain fans out — cent feeds residuals/cellinfo/probes, er
    # feeds both Lloyd iterations and the encode — and without a
    # barrier every consumer re-executed the producing lineage (the
    # corpus centroid aggregate and the interpreted nearest-cell fold
    # re-ran per consumer; the executed plan carried 88 scans of the
    # embeddings parquet and 284 Exchange nodes, plans/r14/
    # ann_ivfadc_search_before.txt). cent/rbrow/cellinfo are
    # |cells|-row model artifacts; er is the residual frame a real
    # index build materializes exactly once before encoding (guide §8:
    # one full read, decisions off small tables — localCheckpoint is
    # the single-process stand-in for that persisted intermediate,
    # same caveat as q_cluster).
    cent = _ivf_centroids(e).localCheckpoint()
    # spread() before the residual fold (r14): the corpus parquet is
    # one file = one scan partition, so the interpreted nearest-cell
    # and PQ-encode folds ran on a single core. Round-robin
    # repartition parallelizes them; every er consumer is placement-
    # insensitive (pq_train's recompute means are decimal-exact sums,
    # its argmin is per-(sub, vec_id); the encode is row-wise). cent
    # deliberately keeps the UNspread e: its double avg is the one
    # order-sensitive fold in the chain.
    er = _residuals(_spread_rows(e), cent).localCheckpoint()
    rbrow = _pq_codebook_row(_pq_train(er)).localCheckpoint()
    # cellinfo stays LAZY (r14 second pass): it is |cells| rows of pure
    # column algebra over the two checkpointed model frames, consumed
    # only as broadcast build sides — recomputing it inside the final
    # job is cheaper than paying a fourth sequential checkpoint barrier
    cellinfo = _ivf_cellinfo(cent, rbrow)
    cand = encode_residual_codes(er, rbrow, cellinfo)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    prow = adc_probe_rows(q, cent, rbrow, cellinfo, NPROBE)
    return residual_adc_scores(cand, prow)


def _pqr_sql(train_pred: str | None = None) -> str:
    """Residual-chain CTEs: coarse quantizer (+ qv from the shared IVF
    fragment), the NEAREST-cell corpus assignment ``xasg`` (a real
    inverted file — Voronoi cells of the coarse codebook, not the
    data labels), the residual vectors, and the prefixed Lloyd/encode
    chain ending at ``rpqc`` / ``rpc{PQ_ITERS}``. With ``train_pred``
    the coarse centroids and codebooks train on the predicate rows
    only while every row is assigned/encoded (frozen-model split)."""
    d2 = _PQD2.format(v="c.v", c="ct.cv")
    return ",\n".join([
        "c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)",
        _ivf_assign_sql(train_pred),
        f"""xasg AS (
  SELECT vec_id, label FROM (
    SELECT c.vec_id, ct.label,
      ROW_NUMBER() OVER (PARTITION BY c.vec_id
        ORDER BY ROUND({d2}, 6) ASC, ct.label ASC) AS rn
    FROM c, cent ct
  ) WHERE rn = 1
)""",
        """rv AS (
  SELECT c.vec_id, l.label,
    list_transform(range(1, len(c.v) + 1), i -> c.v[i] - ct.cv[i]) AS v
  FROM c JOIN xasg l ON l.vec_id = c.vec_id
  JOIN cent ct ON ct.label = l.label
)""",
        *_pq_chain_sql("rv", "r", train_pred),
    ])


_LR = "(a, b) -> a + b"


def _ivfadc_adc_sql() -> str:
    """Residual-ADC CTE chain on top of ``_pqr_sql``: micro-int
    residual codebook + per-cell constants, candidate norms, query
    LUTs, the NPROBE-cell assignment, and the final ``radc`` table
    (query_id, probe_rank, cell_label, neighbor_id, adc_sim)."""
    return f"""rcentm AS (
  SELECT sub, cid,
    list_transform(cv, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS cvm
  FROM rpc{PQ_ITERS}
),
rc2t AS (
  SELECT sub, cid,
    CAST(list_reduce(list_transform(cvm, x -> x * x), {_LR}) AS BIGINT)
      AS c2
  FROM rcentm
),
cmt AS (
  SELECT label,
    list_transform(cv, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS cm
  FROM cent
),
cm2 AS (
  SELECT label,
    CAST(list_reduce(list_transform(cm, x -> x * x), {_LR}) AS BIGINT)
      AS c2
  FROM cmt
),
ccr AS (
  SELECT t.label, m.sub, m.cid,
    CAST(list_reduce(list_transform(range(1, {PQ_DSUB} + 1),
      i -> t.cm[m.sub * {PQ_DSUB} + i] * m.cvm[i]), {_LR}) AS BIGINT)
      AS cc
  FROM cmt t, rcentm m
),
rrs AS (
  SELECT k.vec_id, CAST(SUM(rc2t.c2) AS BIGINT) AS rs2
  FROM rpqc k JOIN rc2t ON rc2t.sub = k.sub AND rc2t.cid = k.code
  GROUP BY 1
),
xcc AS (
  SELECT k.vec_id, CAST(SUM(ccr.cc) AS BIGINT) AS ccs
  FROM rpqc k JOIN xasg ON xasg.vec_id = k.vec_id
  JOIN ccr ON ccr.label = xasg.label AND ccr.sub = k.sub
          AND ccr.cid = k.code
  GROUP BY 1
),
xs2 AS (
  SELECT l.vec_id, l.label, cm2.c2 + 2 * xcc.ccs + rrs.rs2 AS xs2
  FROM xasg l JOIN cm2 ON cm2.label = l.label
  JOIN xcc ON xcc.vec_id = l.vec_id
  JOIN rrs ON rrs.vec_id = l.vec_id
),
rqmi AS (
  SELECT vec_id AS query_id,
    list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS qm
  FROM c WHERE vec_id < {N_QUERIES}
),
rqst AS (
  SELECT query_id,
    CAST(list_reduce(list_transform(qm, x -> x * x), {_LR}) AS BIGINT)
      AS qs2
  FROM rqmi
),
rlut AS (
  SELECT q.query_id, m.sub, m.cid,
    CAST(list_reduce(list_transform(range(1, {PQ_DSUB} + 1),
      i -> q.qm[m.sub * {PQ_DSUB} + i] * m.cvm[i]), {_LR}) AS BIGINT)
      AS ld
  FROM rqmi q, rcentm m
),
passign AS (
  -- probe ranks by the SAME (x-c)^2 fold as xasg's corpus assignment
  -- (one distance rendering both sides, mirrors ivf_probe_cells)
  SELECT query_id, label AS cell_label, CAST(rn AS BIGINT) AS probe_rank
  FROM (
    SELECT q.query_id, c2.label,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        ROUND({_PQD2.format(v="q.v", c="c2.cv")}, 6) ASC,
        c2.label ASC) AS rn
    FROM qv q, cent c2
  ) WHERE rn <= {NPROBE}
),
qcd AS (
  SELECT q.query_id, p.cell_label, p.probe_rank,
    CAST(list_reduce(list_transform(range(1, len(q.qm) + 1),
      i -> q.qm[i] * t.cm[i]), {_LR}) AS BIGINT) AS qcd
  FROM rqmi q JOIN passign p USING (query_id)
  JOIN cmt t ON t.label = p.cell_label
),
rsct AS (
  SELECT p.query_id, p.cell_label, k.vec_id AS neighbor_id,
    CAST(SUM(l.ld) AS BIGINT) AS d
  FROM rpqc k JOIN xasg ON xasg.vec_id = k.vec_id
  JOIN passign p ON p.cell_label = xasg.label
  JOIN rlut l ON l.query_id = p.query_id AND l.sub = k.sub
             AND l.cid = k.code
  WHERE p.query_id <> k.vec_id
  GROUP BY 1, 2, 3
),
radc AS (
  SELECT s.query_id, q2.probe_rank, s.cell_label, s.neighbor_id,
    ROUND(CAST(q2.qcd + s.d AS DOUBLE) / NULLIF(
      sqrt(CAST(rqst.qs2 AS DOUBLE) * CAST(x.xs2 AS DOUBLE)), 0), 6)
      AS adc_sim
  FROM rsct s
  JOIN qcd q2 ON q2.query_id = s.query_id
             AND q2.cell_label = s.cell_label
  JOIN rqst ON rqst.query_id = s.query_id
  JOIN xs2 x ON x.vec_id = s.neighbor_id
)"""


@query(
    "embedding_pq_residual_codes",
    survey="north-star similarity: TRUE IVFADC fine quantizer (Jegou "
    "2011 SIII) — PQ codebooks learned on IVF RESIDUALS "
    "x - coarse_centroid, not raw vectors; residual energy is what "
    "the coarse+fine bit budget exploits, the fidelity gap the r7 "
    "verdict named",
    description=f"Residual PQ codes: per (vector, subspace) "
    f"nearest-centroid code + rounded distance (m={PQ_M}, ks={PQ_KS})",
    oracle=f"WITH {_pqr_sql()}\n"
    "SELECT vec_id, sub, code, d2r FROM rpqc",
)
def embedding_pq_residual_codes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Identical shape to embedding_pq_codes — bounded-sample Lloyd
    training, map-side encode against one broadcast codebook row —
    but over the residual frame (_residuals). The residuals carry far
    less energy than raw vectors, so the same m x ks budget quantizes
    finer; ann_ivfadc_recall measures the payoff."""
    e = _emb(spark, sf_dir)
    # same materialization as _ivfadc_sims (r14): er feeds both Lloyd
    # iterations AND the encode; without the cut each consumer re-ran
    # the centroid aggregate + nearest-cell fold over the corpus
    # (spread parallelizes the single-partition fold; cent keeps the
    # unspread e — see _ivfadc_sims)
    er = _residuals(
        _spread_rows(e), _ivf_centroids(e).localCheckpoint()
    ).localCheckpoint()
    rbrow = _pq_codebook_row(_pq_train(er))
    return (
        er.crossJoin(F.broadcast(rbrow))
        .select(
            "vec_id",
            F.explode(
                _pq_codes_col(F.col("vec"), F.col("cb"))
            ).alias("z"),
        )
        .select(
            "vec_id",
            F.col("z.sub").alias("sub"),
            F.col("z.code").alias("code"),
            F.col("z.d2r").alias("d2r"),
        )
    )


@query(
    "ann_ivfadc_search",
    # benched (r8): the compressed-index search is now a flagship
    # family — a regression in the encode fold or a broadcast
    # degrading to shuffle shows up as a number
    bench=True,
    survey="north-star similarity search: production IVFADC — "
    f"nprobe={NPROBE} coarse cells probed per query, candidates "
    "ranked by residual-ADC (reconstruction c + r_hat), closing both "
    "r7 fidelity gaps (raw-vector PQ, one-cell probe) in one lane",
    description=f"Top-3 per query from the {NPROBE} nearest IVF "
    "cells, ranked by residual-PQ ADC similarity",
    oracle=f"""
WITH {_pqr_sql()},
{_ivfadc_adc_sql()}
SELECT query_id, probe_rank, cell_label, neighbor_id, adc_sim FROM (
  SELECT radc.*, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY adc_sim DESC, neighbor_id ASC) AS rn
  FROM radc
) WHERE rn <= 3
""",
)
def ann_ivfadc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _ivfadc_sims for the decomposition and the 100 TB shape;
    the search ranks the union of the probed cells' candidates and
    keeps the top 3 (ties to the lower neighbor id). A candidate
    lives in exactly one cell, so multi-probe never duplicates."""
    sims = _ivfadc_sims(spark, sf_dir)
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


def _ivfadc_recall_oracle() -> str:
    from tradecat_spark.plans.registry import REGISTRY

    return f"""
WITH {_pqr_sql()},
{_ivfadc_adc_sql()},
approx_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY adc_sim DESC, neighbor_id ASC) AS rn
    FROM radc
  ) WHERE rn <= {TOP_K}
),
exact_top AS (
  SELECT query_id, neighbor_id
  FROM ({REGISTRY['ann_cosine_topk'].oracle}) t
)
SELECT e.query_id,
  CAST(COUNT(r.neighbor_id) AS BIGINT) AS n_hit,
  ROUND(COUNT(r.neighbor_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_top e
LEFT JOIN approx_top r USING (query_id, neighbor_id)
GROUP BY e.query_id
"""


@query(
    "ann_ivfadc_recall",
    survey="north-star similarity: recall@5 of the residual IVFADC "
    f"search (nprobe={NPROBE}) against exact float cosine — the eval "
    "that makes the residual upgrade measurable (the POINT of r7 "
    "verdict item 1); pytest pins it >= the raw-vector full-corpus "
    "ADC lane's recall on the same queries",
    description=f"Per-query recall@{TOP_K} of residual IVFADC "
    f"(nprobe={NPROBE}) against exact cosine",
    oracle=_ivfadc_recall_oracle(),
)
def ann_ivfadc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same tail as ann_pq_recall (exact side reuses ann_cosine_topk)
    over the nprobe-restricted residual-ADC ranking — so the recorded
    number prices BOTH approximations (cell pruning + residual PQ)
    against the exact answer."""
    from tradecat_spark.plans.registry import REGISTRY

    sims = _ivfadc_sims(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    approx_top = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact_top = (
        REGISTRY["ann_cosine_topk"]
        .fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
    )
    hit = exact_top.join(
        approx_top.withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("hit").cast("bigint").alias("n_hit"),
        F.round(F.count("hit") / F.lit(float(TOP_K)), 6).alias("recall"),
    )


def _ivfadc_curve_oracle() -> str:
    from tradecat_spark.plans.registry import REGISTRY

    blocks = "\nUNION ALL ".join(
        f"""SELECT CAST({np} AS INTEGER) AS nprobe, e.query_id,
  CAST(COUNT(r.neighbor_id) AS BIGINT) AS n_hit,
  ROUND(COUNT(r.neighbor_id) / CAST({TOP_K} AS DOUBLE), 6) AS recall
FROM exact_top e
LEFT JOIN (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY adc_sim DESC, neighbor_id ASC) AS rn
    FROM radc WHERE probe_rank <= {np}
  ) WHERE rn <= {TOP_K}
) r USING (query_id, neighbor_id)
GROUP BY e.query_id"""
        for np in range(1, NPROBE + 1)
    )
    return f"""
WITH {_pqr_sql()},
{_ivfadc_adc_sql()},
exact_top AS (
  SELECT query_id, neighbor_id
  FROM ({REGISTRY['ann_cosine_topk'].oracle}) t
)
{blocks}
"""


@query(
    "ann_ivfadc_nprobe_curve",
    survey="north-star similarity: the recall-vs-nprobe curve (the "
    "standard IVF tuning eval, Jegou 2011 Fig. 8 shape) — per query, "
    f"recall@{TOP_K} at nprobe = 1..{NPROBE}, all derived from ONE "
    "scored scan since a cell ranked <= k is also ranked <= k+1",
    description=f"Per (nprobe 1..{NPROBE}, query): recall@{TOP_K} of "
    "residual IVFADC against exact cosine",
    oracle=_ivfadc_curve_oracle(),
)
def ann_ivfadc_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe=k candidate set is the probe_rank <= k slice of the
    nprobe=NPROBE scored rows, so the whole curve reuses one
    _ivfadc_sims pass (cut once — |queries| x probed-candidates rows,
    never corpus-sized); each curve point is then a bounded window +
    a |queries|-row join."""
    from tradecat_spark.plans.registry import REGISTRY

    sims = _ivfadc_sims(spark, sf_dir).localCheckpoint()
    exact_top = (
        REGISTRY["ann_cosine_topk"]
        .fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    outs = []
    for np_ in range(1, NPROBE + 1):
        at = (
            sims.filter(F.col("probe_rank") <= np_)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        hit = exact_top.join(
            at.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        outs.append(
            hit.groupBy("query_id").agg(
                F.count("hit").cast("bigint").alias("n_hit"),
                F.round(F.count("hit") / F.lit(float(TOP_K)), 6)
                .alias("recall"),
            ).select(
                F.lit(np_).cast("int").alias("nprobe"),
                "query_id", "n_hit", "recall",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# Frozen-model IVFADC: the 100 TB training contract as a gated fact
# (r8 verdict item 2). The inline lanes above retrain per run — fine
# for a hash gate, but the scale contract (operators/ivfadc.py:11-14)
# says codebooks train on a bounded SAMPLE while everything is
# encoded. This lane gates exactly that: model trained on the
# _FROZEN_TRAIN_PRED slice, persisted (parquet float64 round-trips
# bit-exactly), the FULL corpus encoded once into a code store
# PARTITIONED BY CELL, and the search reading codes from the store —
# so the bench's steady-state number is pure SEARCH (probe + pruned
# store read + ADC scoring), the production-relevant latency, while
# the cold number prices the one-off build.
# ---------------------------------------------------------------------------
_FROZEN_TRAIN_PRED = "vec_id % 2 = 0"

#: process-lifetime cache: sf_dir -> (model_dir, store_dir). Training
#: is deterministic (decimal-exact Lloyd on a fixed slice), so any
#: rebuild writes byte-identical model artifacts; the cache only
#: avoids repeating the build, it can never change an answer.
_FROZEN_ASSETS: dict[str, tuple[str, str]] = {}


def _frozen_ivfadc_assets(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Build-once model + code store for ``sf_dir``: train coarse
    centroids and residual codebooks on the train slice ONLY
    (streaming/ann.py's train_ann_model — the same frozen-model
    machinery the streaming index gates), then encode EVERY vector
    and persist the codes partitioned by ``cell_label``, so an
    nprobe-cell search reads nprobe partitions (dynamic partition
    pruning against the broadcast probe rows), never the index."""
    if sf_dir in _FROZEN_ASSETS:
        return _FROZEN_ASSETS[sf_dir]
    import tempfile

    from tradecat_spark.operators.ivfadc import encode_residual_codes
    from tradecat_spark.streaming import ann

    model_dir = tempfile.mkdtemp(prefix="tc_ivfadc_model_")
    store_dir = tempfile.mkdtemp(prefix="tc_ivfadc_store_") + "/codes"
    e = _emb(spark, sf_dir)
    ann.train_ann_model(
        spark, e.filter(F.expr(_FROZEN_TRAIN_PRED)), model_dir
    )
    cent, rbrow, cellinfo = ann.load_ann_model(spark, model_dir)
    cand = encode_residual_codes(_residuals(e, cent), rbrow, cellinfo)
    cand.write.partitionBy("cell_label").mode("overwrite").parquet(
        store_dir
    )
    _FROZEN_ASSETS[sf_dir] = (model_dir, store_dir)
    return model_dir, store_dir


@query(
    "ann_ivfadc_search_frozen",
    # benched: steady-state = SEARCH ONLY against the pre-built frozen
    # model + cell-partitioned store (the build is memoized per
    # process, so runs 2..n never retrain); cold = build + search.
    # Together with the inline ann_ivfadc_search row (which retrains
    # every run — the BUILD-dominated composite) the bench now prices
    # build and search separately (r8 verdict item 2).
    bench=True,
    survey="north-star similarity search: IVFADC under the 100 TB "
    f"TRAINING CONTRACT — model trained on the {_FROZEN_TRAIN_PRED} "
    "sample only, frozen to parquet, full corpus encoded under it "
    "into a store partitioned BY CELL; search = broadcast probe rows "
    "+ partition-pruned store read + residual-ADC scoring. The gate "
    "proves the sample-trained/encode-everything split end-to-end "
    "(oracle: _pqr_sql(train_pred), the parameterization built for "
    "exactly this).",
    description="Top-3 residual-ADC neighbors per query from a "
    f"frozen model trained on the {_FROZEN_TRAIN_PRED} slice, codes "
    "read from a cell-partitioned store",
    oracle=f"""
WITH {_pqr_sql(_FROZEN_TRAIN_PRED)},
{_ivfadc_adc_sql()}
SELECT query_id, probe_rank, cell_label, neighbor_id, adc_sim FROM (
  SELECT radc.*, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY adc_sim DESC, neighbor_id ASC) AS rn
  FROM radc
) WHERE rn <= 3
""",
)
def ann_ivfadc_search_frozen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Search path only (given the built assets): load the frozen
    model, broadcast the per-query probe rows, score the store's
    codes. The store scan carries a dynamic-partition-pruning filter
    from the cell_label join, so only the probed cells' partitions
    are read — the registered shape IS the serving shape."""
    from tradecat_spark.operators.ivfadc import (
        adc_probe_rows,
        residual_adc_scores,
    )
    from tradecat_spark.streaming.ann import load_ann_model

    model_dir, store_dir = _frozen_ivfadc_assets(spark, sf_dir)
    cent, rbrow, cellinfo = load_ann_model(spark, model_dir)
    cand = spark.read.parquet(store_dir).select(
        "vec_id",
        F.col("cell_label").cast("int").alias("cell_label"),
        "codes",
        "xs2",
    )
    q = _emb(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    prow = adc_probe_rows(q, cent, rbrow, cellinfo, NPROBE)
    sims = residual_adc_scores(cand, prow)
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Spectral family: exact integer Gram matrix + fixed-point power
# iteration for the top principal direction
# ---------------------------------------------------------------------------
#: micro CTE shared with the SQ8 lane's `c` (same rounding), full-pair
#: Gram in HUGEINT, published scaled by 1e6 with sign-safe truncation
_GRAM_SQL = """c AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS component,
    CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT)
      AS m
  FROM embeddings
),
gall AS (
  SELECT CAST(a.component AS INTEGER) AS i, CAST(b.component AS INTEGER) AS j,
         SUM(CAST(a.m AS HUGEINT) * b.m) AS s
  FROM c a JOIN c b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
g AS (
  SELECT i, j,
    CAST(CASE WHEN s >= 0 THEN 1 ELSE -1 END
         * (ABS(s) // 1000000) AS BIGINT) AS gram_scaled
  FROM gall
)"""


def _sgn(col: Column) -> Column:
    return F.when(col >= 0, F.lit(1)).otherwise(F.lit(-1))


def _dec(col: Column) -> Column:
    return col.cast("decimal(38,0)")


def _gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, gram_scaled) FULL d x d Gram over micro-unit integer
    embeddings, entries scaled down by 1e6 with sign-safe truncation
    (matches DuckDB's ABS-// form). The pair explode amplifies rows d x
    per component MAP-SIDE only: the hash aggregate has d^2 groups, so
    partial aggregation collapses everything before the one shuffle —
    the shuffle carries d^2 x partitions rows at any corpus size (the
    d^2 n multiplications are inherent to a Gram)."""
    e = _emb(spark, sf_dir)
    mv = F.transform(
        F.col("vec"), lambda x: F.round(x * 1_000_000).cast("long")
    )
    # the localCheckpoint is a projection-collapse BARRIER, not a
    # lineage choice: without it Catalyst inlines the mv transform into
    # every consumer of mv — under the pre-r14 nested-transform pair
    # lambda that turned each O(1) element_at into an O(d)
    # re-evaluation (measured 88 s -> ~2 s at sf0.01); under the r14
    # chained-posexplode form the transform would still be duplicated
    # into both Generate inputs. r7 shipped this barrier as a
    # repartition(), which holds
    # the same plan cut but pays a full corpus-width Exchange — every
    # (vec_id, 64 x int64) row through the shuffle service — purely to
    # defeat the inlining; the eager localCheckpoint (the idiom the
    # power-iteration chain below already relies on) materializes the
    # compact rows on their source partitions with NO data movement
    # (r7 verdict item 5: same hash, no Exchange in the Gram stage).
    # One test-scale-only carve-out: the synthetic corpora are a single
    # parquet row group, so the cut would inherit ONE partition and
    # serialize the n x d^2 explode — if (and only if) the scan
    # under-parallelizes, spread the compact rows before cutting. At
    # corpus scale the scan already has >= defaultParallelism splits
    # and the branch never moves a byte. Fault-tolerance posture
    # matches the other iterative ops: executor-local blocks; at
    # 100 TB swap for a reliable cut (see q_cluster._cut_lineage).
    em = e.select("vec_id", mv.alias("mv"))
    dp = e.sparkSession.sparkContext.defaultParallelism
    if em.rdd.getNumPartitions() < dp:
        em = em.repartition(dp)
    em = em.localCheckpoint()
    # r14: the pair expansion is two chained posexplode Generates
    # instead of one interpreted nested transform that built all d^2
    # (i, j, prod) structs per row before a single explode — Generate
    # is whole-stage-codegen'd, the higher-order transform lambda is a
    # CodegenFallback (guide §4.1). Identical (i, j, prod) multiset
    # into the same key-grouped exact DECIMAL(38) sum, so the grouped
    # results are bit-identical (integer adds, order-free).
    p = (
        em.select("mv", F.posexplode("mv").alias("pi", "vi"))
        .select("pi", "vi", F.posexplode("mv").alias("pj", "vj"))
        .select(
            (F.col("pi") + 1).cast("int").alias("i"),
            (F.col("pj") + 1).cast("int").alias("j"),
            (F.col("vi") * F.col("vj")).alias("prod"),
        )
        .groupBy("i", "j")
        .agg(F.sum(_dec(F.col("prod"))).alias("s"))
    )
    g = _sgn(F.col("s")) * F.call_function(
        "div", F.abs(F.col("s")), F.lit(1_000_000)
    )
    return p.select("i", "j", g.cast("bigint").alias("gram_scaled"))


@query(
    "embedding_gram_matrix",
    survey="north-star similarity: the d x d Gram/scatter matrix over "
    "micro-unit integer embeddings — the spectral-analysis input (PCA, "
    "whitening, anisotropy checks) a vector-store review computes "
    "before trusting cosine geometry; exact in HUGEINT/DECIMAL(38)",
    description="Upper-triangle Gram entries (i <= j), micro^2 sums "
    "scaled by 1e6, sign-safe integer truncation",
    # benched (r7 verdict item 6): this is the barrier-sensitive plan —
    # the 88 s -> 2 s projection-collapse regression the plan pin
    # guards is also caught by a NUMBER across Spark upgrades
    bench=True,
    oracle=f"""
WITH {_GRAM_SQL}
SELECT i, j, gram_scaled FROM g WHERE i <= j
""",
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See _gram for the shuffle-bounded shape; published as the upper
    triangle (the matrix is symmetric by construction — the pytest law
    asserts it on the full form)."""
    return _gram(spark, sf_dir).filter(F.col("i") <= F.col("j"))


N_PC_ITERS = 3
_PC_SCALE = 1_000_000  # fixed-point scale of the iterated vector


def _pc_iter_sql(k: int, prev: str) -> str:
    """One power-iteration step in HUGEINT fixed point: w = G v, then
    renormalize to max|w| = SCALE with sign-safe truncation."""
    return f"""
w{k} AS (
  SELECT g.i, SUM(CAST(g.gram_scaled AS HUGEINT) * v.v) AS w
  FROM g JOIN {prev} v ON v.k = g.j
  GROUP BY 1
),
m{k} AS (SELECT MAX(ABS(w)) AS mx FROM w{k}),
v{k} AS (
  SELECT i AS k,
         CASE WHEN w >= 0 THEN 1 ELSE -1 END
           * ((ABS(w) * {_PC_SCALE}) // mx) AS v
  FROM w{k}, m{k}
)"""


def _pc_oracle() -> str:
    iters = "".join(
        "," + _pc_iter_sql(k, "v0" if k == 1 else f"v{k - 1}")
        for k in range(1, N_PC_ITERS + 1)
    )
    last = f"v{N_PC_ITERS}"
    return f"""
WITH {_GRAM_SQL},
v0 AS (
  SELECT DISTINCT i AS k, CAST({_PC_SCALE} AS HUGEINT) AS v FROM g
){iters},
num AS (
  SELECT SUM(va.v * CAST(g.gram_scaled AS HUGEINT) * vb.v) AS nu
  FROM g
  JOIN {last} va ON va.k = g.i
  JOIN {last} vb ON vb.k = g.j
),
den AS (SELECT SUM(v * v) AS de FROM {last})
SELECT CAST(k AS INTEGER) AS component, CAST(v AS BIGINT) AS v_fp,
       CAST(CASE WHEN nu >= 0 THEN 1 ELSE -1 END
            * (ABS(nu) // de) AS BIGINT) AS lambda_scaled
FROM {last}, num, den
"""


@query(
    "embedding_top_pc_power",
    survey="north-star similarity: top principal direction via power "
    "iteration on the Gram matrix — 3 fixed-point steps, max-abs "
    "renormalization, Rayleigh-quotient eigenvalue, ALL integer-exact "
    "(the same fixed-point discipline as the PageRank lane), so the "
    "spectral read is hash-checkable across engines",
    description="Per component: fixed-point top-PC coordinate after 3 "
    "power steps + Rayleigh eigenvalue in gram_scaled units",
    oracle=None,  # set below (generated iteration chain)
)
def embedding_top_pc_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every step is a d^2-row broadcast-scale join (the Gram is the
    ONLY corpus-derived input — computed once, then iteration cost is
    corpus-independent): w = G v in DECIMAL(38) (HUGEINT in the
    oracle), renormalized to max|w| = 1e6 by sign-safe integer
    division. Starting from all-ones, 3 steps, the dominant direction
    at the precision the fixed point carries; the Rayleigh quotient
    v'Gv / v'v publishes the eigenvalue in gram_scaled units. No
    floating-point accumulates anywhere, so both engines agree
    bit-for-bit — the property float PCA can never give the driver
    gate."""
    g = _gram(spark, sf_dir).localCheckpoint()
    v = g.select(F.col("i").alias("k")).distinct().select(
        "k", F.lit(_PC_SCALE).cast("long").alias("v")
    )
    for _t in range(N_PC_ITERS):
        w = (
            g.join(v, v["k"] == g["j"])
            .groupBy("i")
            .agg(F.sum(_dec(F.col("gram_scaled")) * F.col("v")).alias("w"))
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                F.col("i").alias("k"),
                (
                    _sgn(F.col("w"))
                    * F.call_function(
                        "div",
                        F.abs(F.col("w")) * F.lit(_PC_SCALE),
                        F.col("mx"),
                    )
                )
                .cast("long")
                .alias("v"),
            )
        )
    va = v.select(F.col("k").alias("i"), F.col("v").alias("via"))
    vb = v.select(F.col("k").alias("j"), F.col("v").alias("vjb"))
    num = (
        g.join(F.broadcast(va), "i")
        .join(F.broadcast(vb), "j")
        .agg(
            F.sum(
                F.col("via") * _dec(F.col("gram_scaled")) * F.col("vjb")
            ).alias("nu")
        )
    )
    den = v.agg(F.sum(_dec(F.col("v")) * F.col("v")).alias("de"))
    lam = _sgn(F.col("nu")) * F.call_function(
        "div", F.abs(F.col("nu")), F.col("de")
    )
    return (
        v.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("k").cast("int").alias("component"),
            F.col("v").cast("bigint").alias("v_fp"),
            lam.cast("bigint").alias("lambda_scaled"),
        )
    )


from tradecat_spark.plans.registry import REGISTRY as _REG_PC  # noqa: E402

_REG_PC["embedding_top_pc_power"].oracle = _pc_oracle()


@query(
    "embedding_anisotropy",
    survey="north-star similarity: anisotropy diagnostic — top-PC "
    "share of total variance (lambda / trace of the Gram), the "
    "one-number embedding-collapse check (a share near 1 means cosine "
    "geometry has degenerated onto one axis) — rides the hash-green "
    "Gram + power-iteration pair, all integer-exact",
    description="One row: Rayleigh eigenvalue, Gram trace, 6dp top-PC "
    "variance share",
    oracle=None,  # set below (nests the power-iteration chain)
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lambda from the fixed-point power iteration (constant across its
    64 output rows — reduced by max), trace as the exact sum of the
    Gram diagonal; the share is the exact int64 6dp ratio. Everything
    after the one Gram pass is d-bounded."""
    from tradecat_spark.plans.exact import ratio6

    lam = embedding_top_pc_power(spark, sf_dir).agg(
        F.max("lambda_scaled").cast("bigint").alias("lambda_scaled")
    )
    tr = (
        _gram(spark, sf_dir)
        .filter(F.col("i") == F.col("j"))
        .agg(F.sum("gram_scaled").cast("bigint").alias("trace_scaled"))
    )
    return lam.crossJoin(tr).select(
        "lambda_scaled",
        "trace_scaled",
        ratio6(F.col("lambda_scaled"), F.col("trace_scaled")).alias(
            "top_pc_share"
        ),
    )


def _anisotropy_oracle() -> str:
    from tradecat_spark.plans.exact import ratio6_sql
    from tradecat_spark.plans.registry import REGISTRY

    return f"""
WITH pc AS ({REGISTRY['embedding_top_pc_power'].oracle}),
lam AS (
  SELECT CAST(MAX(lambda_scaled) AS BIGINT) AS lambda_scaled FROM pc
),
tr AS (
  SELECT CAST(SUM(gram_scaled) AS BIGINT) AS trace_scaled
  FROM ({REGISTRY['embedding_gram_matrix'].oracle}) gm
  WHERE i = j
)
SELECT lambda_scaled, trace_scaled,
       {ratio6_sql('lambda_scaled', 'trace_scaled')} AS top_pc_share
FROM lam, tr
"""


_REG_PC["embedding_anisotropy"].oracle = _anisotropy_oracle()
