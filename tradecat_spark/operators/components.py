"""Connected components by distributed min-label propagation.

The keep-one-per-cluster step of every dedup pipeline (text MinHash,
image perceptual-hash) reduces to connected components over a verified
edge list. This is the shared iterative operator: every node starts as
its own label; each round pushes the min label across edges (one
shuffled join + one min-aggregate) until a round changes nothing.
Converges in O(component diameter) rounds — LSH/near-dup components
are near-cliques, so 2-3 rounds in practice.

Scale posture: the edge list only materializes inside LSH buckets, so
it is tiny relative to the corpus; ``localCheckpoint`` truncates the
lineage each round so the plan does not grow with iterations (at
100 TB swap for ``checkpoint()`` on durable storage — q_cluster.py's
repo-wide caveat applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    nodes: DataFrame, pairs: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """(doc_id) nodes + (doc_a, doc_b) undirected pairs →
    (doc_id, cluster_id) with cluster_id = min doc_id reachable.

    ``max_rounds`` bounds the loop for adversarial path graphs; the
    loop exits early on the first fixed-point round (the normal case).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint()
    )
    labels = nodes.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    ).localCheckpoint()
    for _ in range(max_rounds):
        prop = edges.join(
            labels.withColumnRenamed("doc_id", "src"), "src"
        ).select(F.col("dst").alias("doc_id"), "cluster_id")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
