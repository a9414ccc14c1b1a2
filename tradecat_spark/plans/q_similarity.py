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
from tradecat_spark.plans.registry import query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential fold dot-product (matches DuckDB's list_dot_product
    evaluation order, so results are comparable without tolerance)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)), F.lit(0))


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
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cv"))
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
