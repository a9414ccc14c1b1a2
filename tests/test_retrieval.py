"""Laws for the hybrid retrieval family (q_retrieval).

The sf0.001 oracle parity sweep (test_oracle_parity) covers value
equality with DuckDB; these tests pin the semantic laws and the plan
shapes the oracle cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tradecat_spark.plans.q_retrieval import (
    FUSE_K,
    POOL_K,
    Q_DOCS,
    RRF_K,
    _fused,
)
from tradecat_spark.plans.registry import load_all

SPECS = load_all()


def test_bm25_plan_is_inverted_index_join(spark, sf_dir):
    """BM25 must never go all-pairs: candidates come from the
    term-keyed postings equi-join, so the executed plan contains no
    cartesian/nested-loop join (the 100 TB law — a lexical ranker that
    cross-joins queries to the corpus is wrong at any scale)."""
    df = SPECS["text_bm25_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only keyless joins are the 1-row corpus-stat scalars (N, Σdl)
    # broadcast into the scoring expression — every BNLJ must be one of
    # those two, i.e. exactly two, both BuildRight over an aggregate
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan
    # candidate generation itself is the term-keyed hash join
    assert "BroadcastHashJoin [word" in plan, plan


def test_bm25_ranks_dense_scores_monotone_no_self(spark, sf_dir):
    pdf = SPECS["text_bm25_topk"].fn(spark, sf_dir).toPandas()
    assert set(pdf["query_id"]) == set(range(Q_DOCS))
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values("rk")
        assert list(g["rk"]) == list(range(1, len(g) + 1)), qid
        assert (g["bm25"].diff().dropna() <= 0).all(), qid
        assert (g["n_terms_hit"] >= 1).all(), qid
        assert (g["doc_id"] != qid).all(), qid


def test_rrf_score_is_exact_integer_algebra(spark, sf_dir):
    """Recompute the fused score from the published ranks: RRF must be
    exactly sum of round(1e6/(60+rank)) micro-units over the lists the
    doc appears in (rank 0 = absent = no contribution)."""
    pdf = SPECS["hybrid_rrf_fusion"].fn(spark, sf_dir).toPandas()

    def micros(rank: int) -> int:
        return int(round(1_000_000.0 / (RRF_K + rank))) if rank > 0 else 0

    expect = pdf["lex_rank"].map(micros) + pdf["sem_rank"].map(micros)
    got = (pdf["rrf"] * 1_000_000).round().astype("int64")
    assert (expect == got).all()
    # a doc on both lists at their heads dominates any single-list doc
    both = pdf[(pdf["lex_rank"] > 0) & (pdf["sem_rank"] > 0)]
    single = pdf[(pdf["lex_rank"] == 0) | (pdf["sem_rank"] == 0)]
    if len(both) and len(single):
        assert single["rrf"].max() <= 2 * round(1e6 / (RRF_K + 1)) / 1e6


def test_fusion_eval_consistent_with_fused_pool(spark, sf_dir):
    eval_pdf = SPECS["retrieval_fusion_eval"].fn(spark, sf_dir).toPandas()
    assert len(eval_pdf) == Q_DOCS
    assert (eval_pdf["n_lex"] <= POOL_K).all()
    assert (eval_pdf["n_sem"] <= POOL_K).all()
    assert (
        eval_pdf["n_both"]
        <= eval_pdf[["n_lex", "n_sem"]].min(axis=1)
    ).all()
    # top-k composition partitions the fused top-k exactly
    ks = eval_pdf[["k_both", "k_lex_only", "k_sem_only"]].sum(axis=1)
    assert (ks == FUSE_K).all()


def test_fused_head_has_max_rrf_and_pool_is_union(spark, sf_dir):
    pool = _fused(spark, sf_dir).toPandas()
    for qid, g in pool.groupby("query_id"):
        head = g[g["fused_rank"] == 1]
        assert len(head) == 1
        assert head["rrf_micros"].iloc[0] == g["rrf_micros"].max(), qid
        # every pool row carries evidence from at least one list
        assert ((g["lex_rank"] > 0) | (g["sem_rank"] > 0)).all(), qid
    # union size: |lex| + |sem| - |both| rows per query
    n = pool.groupby("query_id").size()
    lex = (pool["lex_rank"] > 0).groupby(pool["query_id"]).sum()
    sem = (pool["sem_rank"] > 0).groupby(pool["query_id"]).sum()
    both = (
        ((pool["lex_rank"] > 0) & (pool["sem_rank"] > 0))
        .groupby(pool["query_id"])
        .sum()
    )
    assert (n == lex + sem - both).all()


def test_bm25_length_normalization_direction(spark, sf_dir):
    """B > 0 law: between two candidate docs whose matched query terms
    and per-term tfs are IDENTICAL, the longer doc must not outscore
    the shorter (the whole point of the dl/avgdl normalizer).
    Constructed directly from the postings: per (query, candidate)
    collect the sorted (term, tf) profile; within groups sharing a
    profile, bm25 must be non-increasing in dl."""
    from tradecat_spark.plans.q_retrieval import _bm25_scores, _docs_words

    w = _docs_words(spark, sf_dir)
    dl = w.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    qt = (
        w.filter(F.col("doc_id") < Q_DOCS)
        .select(F.col("doc_id").alias("query_id"), "word")
        .distinct()
    )
    profile = (
        tf.join(qt, "word")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.concat_ws(":", "word", "tf"))
            ).cast("string").alias("profile")
        )
    )
    bm = _bm25_scores(spark, sf_dir).select("query_id", "doc_id", "micros")
    pdf = (
        bm.join(profile, ["query_id", "doc_id"])
        .join(dl, "doc_id")
        .toPandas()
    )
    groups_checked = 0
    for (_, _), g in pdf.groupby(["query_id", "profile"]):
        if g["dl"].nunique() < 2:
            continue
        g = g.sort_values("dl")
        assert (g["micros"].diff().dropna() <= 0).all()
        groups_checked += 1
    # the synthetic corpus repeats its small vocabulary heavily, so
    # identical profiles at different lengths must actually occur —
    # otherwise this law tested nothing and should fail loudly
    assert groups_checked > 0


def test_rank_quality_consistent_with_published_lists(spark, sf_dir):
    """The eval lane's hit counts must be reproducible from the
    published top-k lists themselves: recompute lexical and fused
    recall against the semantic truth from text_bm25_topk /
    hybrid_rrf_fusion output and compare exactly."""
    truth = {
        (r["query_id"], r["doc_id"])
        for r in SPECS["hybrid_rrf_fusion"].fn(spark, sf_dir).collect()
        if 0 < r["sem_rank"] <= FUSE_K
    }  # not the full truth (only fused-listed docs) — lower bound only
    lex = {
        (r["query_id"], r["doc_id"])
        for r in SPECS["text_bm25_topk"].fn(spark, sf_dir).collect()
    }
    out = SPECS["retrieval_rank_quality"].fn(spark, sf_dir).toPandas()
    assert (out["n_truth"] <= FUSE_K).all()
    assert (out["n_lex_hits"] <= out["n_truth"]).all()
    assert (out["n_fused_hits"] <= out["n_truth"]).all()
    # exact cross-check of the lexical hits using the full truth
    full_truth = {
        (r["query_id"], r["doc_id"])
        for r in _fused(spark, sf_dir)
        .filter((F.col("sem_rank") > 0) & (F.col("sem_rank") <= FUSE_K))
        .collect()
    }
    for _, row in out.iterrows():
        qid = row["query_id"]
        t = {d for q, d in full_truth if q == qid}
        assert row["n_truth"] == len(t), qid
        assert row["n_lex_hits"] == len(
            t & {d for q, d in lex if q == qid}
        ), qid
    assert truth <= full_truth
