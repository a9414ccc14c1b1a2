"""Property law for the incremental cluster-label store (r13).

The gated lane pins ONE streamed history (the pipeline's delta split);
this test pins the ALGEBRA: for random undirected graphs ingested
under random batch slicings — each edge arriving with its LATER
endpoint, the delta-pair contract — the stream-maintained store must
equal the one-pass batch ``min_label_components``, and a replay of any
single trigger must be a no-op. This is the slicing-independence claim
the lane's docstring makes, quantified over graphs instead of assumed.
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from tradecat_spark.operators.components import min_label_components
from tradecat_spark.streaming.labels import read_labels, update_labels


@st.composite
def sliced_graphs(draw):
    """(batches) where batches is a list of (new_docs, pairs): a random
    graph over <= 14 nodes cut into 2-4 ingest batches; every edge is
    assigned to the batch of its LATER endpoint (the delta-pair
    emission contract: a pair lands when its second doc ingests)."""
    n = draw(st.integers(min_value=2, max_value=14))
    nodes = list(range(n))
    n_batches = draw(st.integers(min_value=2, max_value=4))
    # batch index per node, drawn freely: any batch (including leading
    # ones) may come out empty — update_labels must treat an empty
    # trigger as a no-op, so empty batches are part of the law
    assign = {v: draw(st.integers(min_value=0, max_value=n_batches - 1))
              for v in nodes}
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).filter(lambda e: e[0] != e[1]),
            max_size=20,
        )
    )
    edges = sorted({(min(a, b), max(a, b)) for a, b in edges})
    batches = []
    for b in range(n_batches):
        new_docs = [v for v in nodes if assign[v] == b]
        prs = [
            (a, c) for a, c in edges
            if max(assign[a], assign[c]) == b
        ]
        batches.append((new_docs, prs))
    # random compaction boundaries (up to 2, so base-over-base
    # re-compaction is drawn too): since r14 the reader COMPOSES
    # latest-wins from (unique base) ∪ (strictly-newer partials)
    # instead of folding everything, so the base/partial invariant is
    # correctness-load-bearing and must hold under any compaction
    # placement, not just the gated lane's single boundary
    compact_at = draw(
        st.sets(
            st.integers(min_value=0, max_value=n_batches - 2), max_size=2
        )
    )
    return batches, compact_at


@given(batches_and_compactions=sliced_graphs())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_streamed_labels_equal_batch_components(
    spark, batches_and_compactions
):
    batches, compact_at = batches_and_compactions
    store = tempfile.mkdtemp(prefix="tc_lblprop_") + "/labels"
    # compaction's contract: only checkpoint-committed batches may be
    # compacted (a replayed batch's rows are never in a base). In this
    # harness the replayed trigger is the LAST non-empty one, so only
    # boundaries strictly before it are contract-valid draws.
    last_nonempty = max(
        (i for i, (nd, prs) in enumerate(batches) if nd or prs),
        default=-1,
    )
    all_docs, all_pairs = [], []
    replay = None
    for i, (new_docs, prs) in enumerate(batches):
        all_docs += new_docs
        all_pairs += prs
        nd = spark.createDataFrame(
            [(int(v),) for v in new_docs], "doc_id bigint"
        )
        pr = spark.createDataFrame(
            [(int(a), int(b)) for a, b in prs], "doc_a bigint, doc_b bigint"
        )
        update_labels(spark, store, i, nd, pr)
        if new_docs or prs:
            replay = (i, nd, pr)
        if i in compact_at and i < last_nonempty:
            from tradecat_spark.streaming.labels import compact_labels

            compact_labels(spark, store, i)
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in read_labels(spark, store).collect()
    )
    nodes = spark.createDataFrame(
        [(int(v),) for v in all_docs], "doc_id bigint"
    )
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in all_pairs],
        "doc_a bigint, doc_b bigint",
    )
    want = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in min_label_components(nodes, pairs).collect()
    )
    assert got == want
    # replaying the last non-empty trigger is a no-op
    if replay is not None:
        i, nd, pr = replay
        update_labels(spark, store, i, nd, pr)
        again = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in read_labels(spark, store).collect()
        )
        assert again == got
