"""Adversarial convergence tests for the shared connected-components
operator (r11 verdict item 1 / ADVICE item 1).

The dangerous graph for label propagation is a long PATH: min-label
eccentricity equals the path length, so a plain edge-step loop needs
`diameter` rounds and the pre-r12 operator silently returned split
clusters once `max_rounds=20` ran out. With pointer doubling the same
budget covers diameters around 2^20; and when the budget genuinely
cannot cover the graph the operator must RAISE, never return wrong
labels.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: F401

from tradecat_spark.operators.components import min_label_components


def _path_graph(spark, n: int):
    """Nodes 0..n-1 chained 0-1-2-...-(n-1): one component,
    diameter n-1, min label 0."""
    nodes = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(n))})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_a": list(range(n - 1)), "doc_b": list(range(1, n))}
        )
    )
    return nodes, pairs


def test_path_deeper_than_round_budget_converges(spark):
    # diameter 199 >> 20 rounds: the pre-r12 edge-step loop returned
    # ~180 split clusters here; doubling needs ~log2(199) ≈ 8 rounds
    nodes, pairs = _path_graph(spark, 200)
    labels = min_label_components(nodes, pairs, max_rounds=20).toPandas()
    assert len(labels) == 200
    assert set(labels.cluster_id) == {0}


def test_exhausted_budget_raises_instead_of_silent_split(spark):
    # a 64-node path needs ~6 doubling rounds; 2 cannot converge —
    # the operator must refuse to hand back partial labels
    nodes, pairs = _path_graph(spark, 64)
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(nodes, pairs, max_rounds=2)


def test_multi_component_labels_are_component_minima(spark):
    # two paths (10..19, 30..39) + two singletons (50, 60)
    nodes = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(range(10, 20)) + list(range(30, 40)) + [50, 60]}
        )
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_a": list(range(10, 19)) + list(range(30, 39)),
                "doc_b": list(range(11, 20)) + list(range(31, 40)),
            }
        )
    )
    labels = min_label_components(nodes, pairs).toPandas()
    got = dict(zip(labels.doc_id, labels.cluster_id))
    for d in range(10, 20):
        assert got[d] == 10
    for d in range(30, 40):
        assert got[d] == 30
    assert got[50] == 50 and got[60] == 60


def test_random_graph_matches_union_find(spark):
    # seeded random sparse graph vs a driver-side union-find reference
    import random

    rng = random.Random(7)
    n = 120
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(90)
        }
    )
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in range(n)}

    nodes = spark.createDataFrame(pd.DataFrame({"doc_id": range(n)}))
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    )
    labels = min_label_components(nodes, pairs).toPandas()
    got = dict(zip(labels.doc_id, labels.cluster_id))
    assert got == want


def test_zero_round_budget_raises_up_front(spark):
    # max_rounds=0 used to skip the loop entirely (changed starts at 0)
    # and return identity labels without raising — the silent-split
    # failure mode through the front door (r12 ADVICE item 3)
    nodes, pairs = _path_graph(spark, 4)
    with pytest.raises(ValueError, match="max_rounds"):
        min_label_components(nodes, pairs, max_rounds=0)
