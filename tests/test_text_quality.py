"""Intent check for text_repetition_stats: the Gopher flags must fire
on a crafted repetitive doc and stay off for a diverse one."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

import tradecat_spark.plans.q_text as Q


def test_repetition_flags_on_crafted_docs(spark, monkeypatch):
    docs = pd.DataFrame(
        [
            # "spam spam spam ..." — top bigram owns every slot
            dict(doc_id=1, text=" ".join(["spam"] * 40),
                 lang="en", source="s", n_chars=0),
            # all-distinct words — zero repetition
            dict(doc_id=2, text=" ".join(f"w{i}" for i in range(40)),
                 lang="en", source="s", n_chars=0),
            # half the bigrams duplicated: a b a b ... (dup frac high,
            # top frac = ~0.5 > 0.18 so it flags via the top rule too)
            dict(doc_id=3, text=" ".join(["a", "b"] * 20),
                 lang="en", source="s", n_chars=0),
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    out = (
        Q.text_repetition_stats(spark, "unused")
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "is_repetitive"]) is True
    assert out.loc[1, "top_word_frac"] == 1.0
    assert out.loc[1, "top_2gram_frac"] == 1.0
    assert bool(out.loc[2, "is_repetitive"]) is False
    assert out.loc[2, "dup_2gram_frac"] == 0.0
    assert bool(out.loc[3, "is_repetitive"]) is True
    # 39 bigrams: 20x "a b", 19x "b a" → dup = (39-2)/39
    assert abs(out.loc[3, "dup_2gram_frac"] - 37 / 39) < 1e-6


def test_gapfill_locf_laws(spark, sf_dir):
    """Gap-fill contract: the spine is dense (every hour between each
    key's bounds), close_filled is non-null from the first observation
    on, carry-forward rows are flagged, and observed rows pass their
    close through unchanged."""
    import pandas as pd

    from tradecat_spark.plans.registry import load_all

    df = load_all()["gapfill_locf_1h"].fn(spark, sf_dir).toPandas()
    assert df.close_filled.notna().all()  # first spine row is observed
    for et, g in df.groupby("event_type"):
        g = g.sort_values("bucket_ts")
        span = pd.date_range(g.bucket_ts.min(), g.bucket_ts.max(),
                             freq="1h")
        assert len(g) == len(span) and (g.bucket_ts.values ==
                                        span.values).all(), et
        # carry-forward == previous filled value
        filled = g[g.is_filled]
        prev = g.close_filled.shift(1)
        assert (filled.close_filled.values ==
                prev[g.is_filled].values).all(), et


def test_reservoir_exact_k_per_group(spark, sf_dir):
    """Exactly min(10, |source|) docs per source, ranks 1..k, and the
    selection is stable across reruns (hash order, no RNG)."""
    from tradecat_spark.plans.registry import load_all

    fn = load_all()["sample_per_group_reservoir"].fn
    a = fn(spark, sf_dir).toPandas().sort_values(["source", "rk"])
    sizes = a.groupby("source").size()
    assert (sizes <= 10).all() and (sizes > 0).all()
    assert (a.groupby("source").rk.max() == sizes).all()
    b = fn(spark, sf_dir).toPandas().sort_values(["source", "rk"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_manifest_decision_precedence(spark, sf_dir):
    """Every manifest row's decision must follow the documented
    precedence (duplicate > low_quality > off_target > kept) and
    keep_final must equal decision == 'kept'."""
    from tradecat_spark.plans.registry import load_all

    df = load_all()["corpus_training_manifest"].fn(spark, sf_dir).toPandas()
    assert len(df) > 0
    for _, r in df.iterrows():
        if not r.is_canonical:
            want = "duplicate"
        elif r.low_quality:
            want = "low_quality"
        elif not r.dsir_keep:
            want = "off_target"
        else:
            want = "kept"
        assert r.decision == want, dict(r)
        assert r.keep_final == (want == "kept"), dict(r)


def test_span_trim_ranges_cut_real_duplicated_text(spark, sf_dir):
    """The trim ranges must be APPLICABLE: text[char_start:char_end]
    reconstructs exactly ' '.join(tokens[tok_start:tok_end]), islands
    within a (doc, width) never overlap, and every island is at least
    one span wide."""
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    ranges = specs["dedup_span_trim_ranges"].fn(spark, sf_dir).collect()
    assert len(ranges) > 0
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    by_doc_w: dict = {}
    for r in ranges:
        assert r["width"] in (10, 25, 50)
        assert r["tok_end"] - r["tok_start"] >= r["width"]
        text = texts[r["doc_id"]]
        toks = text.split(" ")
        expect = " ".join(toks[r["tok_start"]:r["tok_end"]])
        assert text[r["char_start"]:r["char_end"]] == expect, r
        by_doc_w.setdefault((r["doc_id"], r["width"]), []).append(
            (r["tok_start"], r["tok_end"])
        )
    for spans in by_doc_w.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 > e1  # maximal islands: disjoint AND non-adjacent


def test_decile_tiers_and_exact_quantiles_laws(spark, sf_dir):
    """Integer rank laws, verified against a driver-side sort of the
    same values: tier == (10 * rank0) // N with ties sharing, and each
    exact quantile equals the value at sorted position k."""
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    tiers = specs["token_decile_tiers"].fn(spark, sf_dir).collect()
    n = len(tiers)
    assert n > 0
    vals = sorted(r["n_tokens"] for r in tiers)
    first_rank = {}
    for i, v in enumerate(vals):
        first_rank.setdefault(v, i)
    for r in tiers:
        assert r["tier"] == (10 * first_rank[r["n_tokens"]]) // n, r
    qs = {
        r["quantile"]: r
        for r in specs["corpus_exact_quantiles"].fn(spark, sf_dir).collect()
    }
    assert set(qs) == {"p50", "p90", "p99"}
    for lbl, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        k = (num * (n - 1)) // den
        assert qs[lbl]["k"] == k and qs[lbl]["n"] == n
        assert qs[lbl]["value"] == vals[k], (lbl, qs[lbl], vals[k])


def test_dsir_single_doc_corpus(spark, tmp_path):
    """Degenerate n==1 corpus: percent_rank of a single row is 0 in
    both engines, so keep must be False — and under ANSI mode (Spark 4
    default) the 0/(n-1) division must never evaluate (pct_of is a
    lazy CASE). Regression for the r6 review finding."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["one tiny document about spark windows"],
            "lang": ["en"],
            "source": ["src0"],
            "n_chars": [37],
        }
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    from tradecat_spark.plans.registry import load_all

    rows = (
        load_all()["sample_dsir_importance"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["keep"] is False


def test_epoch_plan_all_dropped_corpus(spark, tmp_path):
    """A corpus where every doc is dropped (single short doc -> DSIR
    keep=False -> manifest keep_final=False) must yield all-zero
    weights and quotas, not an ANSI DIVIDE_BY_ZERO or NULLs.
    Regression for the r6 second-pass review finding."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["one tiny document about spark windows"],
            "lang": ["en"],
            "source": ["src0"],
            "n_chars": [37],
        }
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    from tradecat_spark.plans.registry import load_all

    rows = load_all()["mix_epoch_plan"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["n_kept"] == 0
    assert rows[0]["p_half"] == 0.0
    assert rows[0]["quota_per_10k"] == 0


def test_minhash_estimator_laws_on_crafted_docs(spark, monkeypatch):
    """Broder estimator sanity on a corpus with known Jaccards:
    identical docs must estimate J=1 with every seed agreeing; the
    calibration rows must carry exact true J; the LSH quality row's
    counts must be consistent and the identical pair must be a hit."""
    base = [f"w{i}" for i in range(30)]
    docs = pd.DataFrame(
        [
            dict(doc_id=1, text=" ".join(base), lang="en", source="s",
                 n_chars=0),
            dict(doc_id=2, text=" ".join(base), lang="en", source="s",
                 n_chars=0),
            # doc 1 with the last word changed: only the final 5-gram
            # differs -> 25 of 26 shingles shared, true J = 25/27
            dict(doc_id=4, text=" ".join(base[:-1] + ["zz"]), lang="en",
                 source="s", n_chars=0),
            # disjoint vocabulary -> never a truth pair
            dict(doc_id=9, text=" ".join(f"q{i}" for i in range(30)),
                 lang="en", source="s", n_chars=0),
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)

    est = {
        (r["doc_a"], r["doc_b"]): r
        for r in Q.dedup_minhash_est_jaccard(spark, "unused").collect()
    }
    r12 = est[(1, 2)]
    assert r12["n_matching_seeds"] == 8
    assert r12["est_jaccard"] == 1.0
    assert bool(r12["is_near_dup"]) is True
    assert all(0.0 <= r["est_jaccard"] <= 1.0 for r in est.values())

    cal = {
        (r["doc_a"], r["doc_b"]): r
        for r in Q.minhash_jaccard_calibration(spark, "unused").collect()
    }
    assert cal[(1, 2)]["true_jaccard"] == 1.0
    assert cal[(1, 2)]["abs_err"] == 0.0
    if (1, 4) in cal:
        assert abs(cal[(1, 4)]["true_jaccard"] - round(25 / 27, 6)) < 1e-9
    assert all(0.0 <= r["true_jaccard"] <= 1.0 for r in cal.values())

    q = Q.minhash_lsh_quality(spark, "unused").collect()[0]
    assert q["n_hit"] <= min(q["n_truth"], q["n_candidates"])
    assert 0.0 <= q["lsh_precision"] <= 1.0
    assert 0.0 <= q["lsh_recall"] <= 1.0
    # identical docs share every band, so (1,2) is truth AND candidate
    assert q["n_truth"] >= 1 and q["n_hit"] >= 1


def test_kmv_jaccard_sketch_laws(spark, sf_dir, monkeypatch):
    """KMV Jaccard laws: identical gram sets estimate exactly 1,
    disjoint sets exactly 0; and whenever the union k-min sketch is
    not full (k_used < KJ) both sketches are complete, so the
    'estimate' must equal the exact Jaccard."""
    text_a = " ".join(f"a{i}" for i in range(20))
    text_z = " ".join(f"z{i}" for i in range(20))
    docs = pd.DataFrame(
        [
            dict(doc_id=1, text=text_a, lang="en", source="sx", n_chars=0),
            dict(doc_id=2, text=text_a, lang="en", source="sy", n_chars=0),
            dict(doc_id=3, text=text_z, lang="en", source="sz", n_chars=0),
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    est = {
        (r["source_a"], r["source_b"]): r
        for r in Q.kmv_source_jaccard(spark, "unused").collect()
    }
    assert est[("sx", "sy")]["est_jaccard"] == 1.0
    assert est[("sx", "sz")]["est_jaccard"] == 0.0
    assert est[("sy", "sz")]["est_jaccard"] == 0.0
    monkeypatch.undo()

    rows = Q.kmv_jaccard_error_eval(spark, sf_dir).collect()
    assert len(rows) > 0
    k = {
        (r["source_a"], r["source_b"]): r["k_used"]
        for r in Q.kmv_source_jaccard(spark, sf_dir).collect()
    }
    for r in rows:
        assert bool(r["within_bound"]) is True, r
        if k[(r["source_a"], r["source_b"])] < Q.KJ:
            assert r["abs_err"] == 0.0, r


def test_containment_detects_subset_source(spark, monkeypatch):
    """A source whose grams are a strict subset of another's must show
    containment 1.0 in the subset direction and flag near_subset, while
    Jaccard alone stays well under 1 — the case the directional matrix
    exists to catch."""
    big = " ".join(f"t{i}" for i in range(40))     # grams t0..  (33 8-grams)
    small = " ".join(f"t{i}" for i in range(12))   # first 5 8-grams of big
    docs = pd.DataFrame(
        [
            dict(doc_id=1, text=big, lang="en", source="big", n_chars=0),
            dict(doc_id=2, text=small, lang="en", source="small", n_chars=0),
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in Q.source_containment_matrix(spark, "unused").collect()
    }
    r = rows[("big", "small")]
    # small ⊂ big: containment of the b-side (small) is 1.0
    assert r["cont_b_in_a"] == 1.0
    assert r["cont_a_in_b"] < 1.0
    assert bool(r["near_subset"]) is True


def _ref_bpe(vocab: dict, steps: int):
    """Pure-Python Sennrich reference: weighted pair stats, argmax with
    (weight desc, pair asc) ties, greedy left-to-right merge."""
    seqs = {w: list(w) for w in vocab}
    merges = []
    for step in range(steps):
        stats: dict = {}
        for w, toks in seqs.items():
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                stats[k] = stats.get(k, 0) + vocab[w]
        if not stats:
            break
        (a, b), wt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step + 1, a, b, a + b, wt))
        for w, toks in seqs.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_learn_merges_matches_python_reference(spark, monkeypatch):
    """The relational greedy application must agree with the sequential
    reference, including the overlapping-run hazard: 'aaaa' under merge
    (a,a) must merge positions (1,2) and (3,4), never (2,3)."""
    words = ["aaaa", "aaaa", "aaaa", "aaa", "abab", "abab", "baaa", "bb"]
    docs = pd.DataFrame(
        [
            dict(doc_id=i + 1, text=w, lang="en", source="s", n_chars=0)
            for i, w in enumerate(words)
        ]
    )
    vocab: dict = {}
    for w in words:
        vocab[w] = vocab.get(w, 0) + 1
    want = _ref_bpe(vocab, Q.N_BPE_STEPS)

    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    got = [
        (r["step"], r["left_tok"], r["right_tok"], r["merged_tok"],
         r["pair_weight"])
        for r in Q.bpe_learn_merges(spark, "unused")
        .orderBy("step").collect()
    ]
    assert got == want, (got, want)

    # compression curve agrees with the reference's post-merge corpus
    # token counts and is monotone non-increasing
    seqs = {w: list(w) for w in vocab}
    ref_tokens = [sum(vocab[w] * len(s) for w, s in seqs.items())]
    for _, a, b, _, _ in want:
        for w, toks in seqs.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = out
        ref_tokens.append(sum(vocab[w] * len(s) for w, s in seqs.items()))
    curve = {
        r["step"]: r["corpus_tokens"]
        for r in Q.bpe_compression_curve(spark, "unused").collect()
    }
    assert [curve[k] for k in sorted(curve)] == ref_tokens
    assert all(
        curve[k] <= curve[k - 1] for k in sorted(curve) if k > 0
    )

    # encode side: per-doc counts are the reference's final seq lengths
    fert = {
        r["doc_id"]: r
        for r in Q.bpe_encode_fertility(spark, "unused").collect()
    }
    for i, w in enumerate(words):
        r = fert[i + 1]
        assert r["n_words"] == 1
        assert r["n_bpe_tokens"] == len(seqs[w])
        assert r["n_bpe_tokens"] <= r["n_char_tokens"] == len(w)


def test_quality_canonical_keeps_best_per_cluster(spark, sf_dir):
    """Exactly one kept doc per cluster, and no cluster member strictly
    out-scores it (doc_id breaks score ties)."""
    from tradecat_spark.plans.registry import load_all

    df = load_all()["dedup_quality_canonical"].fn(spark, sf_dir).toPandas()
    assert (df.groupby("cluster_id").is_kept.sum() == 1).all()
    best = df.groupby("cluster_id").quality_score.max()
    kept = df[df.is_kept].set_index("cluster_id")
    assert (kept.quality_score == best.loc[kept.index]).all()

    # the windowed twin agrees doc-for-doc on is_kept and adds the rank
    rk = load_all()["dedup_quality_keep_rank"].fn(spark, sf_dir).toPandas()
    assert (rk.groupby("cluster_id").keep_rank.min() == 1).all()
    merged = df.merge(rk[["doc_id", "keep_rank", "is_kept"]],
                      on="doc_id", suffixes=("", "_w"))
    assert len(merged) == len(df)
    assert (merged.is_kept == merged.is_kept_w).all()
    assert (merged[merged.is_kept].keep_rank == 1).all()


def test_bpe_relational_greedy_on_seeded_random_corpus(spark, monkeypatch):
    """One seeded random corpus over the 2-letter alphabet — the
    densest possible field of overlapping-candidate runs — must
    reproduce the sequential reference's merges AND per-word final
    sequences (checked through bpe_encode_fertility's token counts)."""
    import random

    rng = random.Random(20260815)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 9)))
        for _ in range(40)
    ]
    docs = pd.DataFrame(
        [
            dict(doc_id=i + 1, text=w, lang="en", source="s", n_chars=0)
            for i, w in enumerate(words)
        ]
    )
    vocab: dict = {}
    for w in words:
        vocab[w] = vocab.get(w, 0) + 1
    want = _ref_bpe(vocab, Q.N_BPE_STEPS)

    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    got = [
        (r["step"], r["left_tok"], r["right_tok"], r["merged_tok"],
         r["pair_weight"])
        for r in Q.bpe_learn_merges(spark, "unused")
        .orderBy("step").collect()
    ]
    assert got == want, (got, want)

    # replay the reference merges to final sequences and compare the
    # per-doc BPE token counts
    seqs = {w: list(w) for w in vocab}
    for _, a, b, _, _ in want:
        for w, toks in seqs.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = out
    fert = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in Q.bpe_encode_fertility(spark, "unused").collect()
    }
    for i, w in enumerate(words):
        assert fert[i + 1] == len(seqs[w]), (w, seqs[w])


def test_bpe_deep_matches_python_reference_on_random_corpus(
    spark, monkeypatch
):
    """16 delta-maintained merges must reproduce the sequential
    reference's merge sequence exactly on a seeded random corpus —
    the incremental pair-count bookkeeping (+new/-old pairs of
    changed words only) may never drift from the full recount."""
    import random

    rng = random.Random(20260815)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(2, 12)))
        for _ in range(80)
    ]
    docs = pd.DataFrame(
        [
            dict(doc_id=i + 1, text=w, lang="en", source="s", n_chars=0)
            for i, w in enumerate(words)
        ]
    )
    vocab: dict = {}
    for w in words:
        vocab[w] = vocab.get(w, 0) + 1
    want = _ref_bpe(vocab, 16)
    assert len(want) == 16, "seed must supply 16 merges"

    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    got = [
        (r["step"], r["left_tok"], r["right_tok"], r["merged_tok"],
         r["pair_weight"])
        for r in Q.bpe_learn_merges_deep(spark, "unused")
        .orderBy("step").collect()
    ]
    assert got == want


def test_bpe_deep_prefix_equals_recount_lane(spark, sf_dir):
    """Step-equivalence law (r7 verdict item 2): the delta-maintained
    lane's first 3 merges must equal the recount lane's output
    row-for-row on the driver corpus."""
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    deep = (
        specs["bpe_learn_merges_deep"].fn(spark, sf_dir)
        .filter("step <= 3").orderBy("step").collect()
    )
    shallow = (
        specs["bpe_learn_merges"].fn(spark, sf_dir)
        .orderBy("step").collect()
    )
    assert [tuple(r) for r in deep] == [tuple(r) for r in shallow]


def test_deep_fertility_monotone_in_merges(spark, sf_dir):
    """More merges can never lengthen an encoding: per doc,
    n_bpe_tokens(16 merges) <= n_bpe_tokens(3 merges) <= n_char_tokens,
    with word/char counts identical across the two lanes."""
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    f3 = specs["bpe_encode_fertility"].fn(spark, sf_dir).toPandas() \
        .set_index("doc_id").sort_index()
    f16 = specs["bpe_encode_fertility_deep"].fn(spark, sf_dir).toPandas() \
        .set_index("doc_id").sort_index()
    assert f3.index.equals(f16.index)
    assert (f16.n_words == f3.n_words).all()
    assert (f16.n_char_tokens == f3.n_char_tokens).all()
    assert (f16.n_bpe_tokens <= f3.n_bpe_tokens).all()
    assert (f3.n_bpe_tokens <= f3.n_char_tokens).all()
    assert (f16.n_bpe_tokens < f3.n_bpe_tokens).any()  # 16 > 3 must bite


def _seq_apply(word: str, merges: list) -> list:
    """Sequential-in-order frozen apply — the reference for
    _bpe_apply_merges_col on ANY word, seen or not."""
    toks = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_frozen_apply_tokenizes_unseen_words(spark, monkeypatch):
    """The frozen-tokenizer apply must handle words the training
    corpus NEVER saw (the capability the vocab-join encode lacks):
    train 16 merges on a seeded random corpus, then fold a disjoint
    word set through the merge list and compare token sequences
    against the sequential-apply reference — and seen words must
    tokenize exactly as the training tables did."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260816)
    train_words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(2, 12)))
        for _ in range(80)
    ]
    docs = pd.DataFrame(
        [
            dict(doc_id=i + 1, text=w, lang="en", source="s", n_chars=0)
            for i, w in enumerate(train_words)
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    tops, final_t = Q._bpe_deep_chain(spark, "unused", 16)
    merges = [(a, b) for a, b, _ in tops]
    assert len(merges) == 16

    unseen = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(2, 14)))
        for _ in range(60)
    ]
    unseen = [w for w in unseen if w not in set(train_words)]
    assert len(unseen) >= 30, "seed must supply unseen words"

    wdf = spark.createDataFrame(
        pd.DataFrame({"word": unseen + train_words})
    ).distinct()
    mrow = spark.createDataFrame(
        pd.DataFrame({"merges": [[{"a": a, "b": b} for a, b in merges]]})
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substr(F.col("word"), i, F.lit(1)),
    )
    got = {
        r["word"]: list(r["enc"])
        for r in wdf.crossJoin(F.broadcast(mrow)).select(
            "word",
            Q._bpe_apply_merges_col(chars, F.col("merges")).alias("enc"),
        ).collect()
    }
    for w in set(unseen) | set(train_words):
        assert got[w] == _seq_apply(w, merges), w

    # seen words: frozen apply == the training chain's final tokens
    train_toks = {r["word"]: list(r["toks"]) for r in final_t.collect()}
    for w, toks in train_toks.items():
        assert got[w] == toks, w


def _ref_bpe_units(units, steps):
    """Word-level recount reference: like _ref_bpe but over arbitrary
    (token list, weight) units instead of words-as-char-sequences."""
    seqs = [list(t) for t, _ in units]
    wcs = [w for _, w in units]
    merges = []
    for step in range(steps):
        stats: dict = {}
        for s, w in zip(seqs, wcs):
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                stats[k] = stats.get(k, 0) + w
        if not stats:
            break
        (a, b), wt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, wt))
        for idx, s in enumerate(seqs):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[idx] = out
    return merges


def test_bpe_hist_loop_matches_recount_reference():
    """The centralized incremental loop (pair counts + unit index
    maintained by deltas) must reproduce the full-recount reference
    merge-for-merge on seeded random word-level corpora, including
    deep tie-heavy tails and saturation."""
    import random

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(5):
        units = [
            ([rng.choice(vocab) for _ in range(rng.randint(1, 9))],
             rng.randint(1, 4))
            for _ in range(60)
        ]
        n = 300  # deliberately past saturation on some trials
        got = Q._bpe_hist_loop([(list(t), w) for t, w in units], n)
        want = _ref_bpe_units([(list(t), w) for t, w in units], n)
        assert got == want, trial


def test_bpe_hist_loop_equals_distributed_chain_to_saturation(
    spark, monkeypatch
):
    """Interchangeability law at FULL depth (r10 verdict item 4
    extended the r10-born 24-merge pin): the histogram-collect loop
    and the distributed delta chain must learn the identical merge
    sequence on the same seeded corpus all the way to SATURATION
    (157 merges here — every merge the corpus supports), not just a
    shallow prefix. The n=200 ask exceeds saturation on both sides,
    so the equality also pins that they stop at the same depth."""
    import random

    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(10)]
    docs = pd.DataFrame(
        [
            dict(
                doc_id=i + 1,
                text=" ".join(
                    rng.choice(vocab) for _ in range(rng.randint(2, 10))
                ),
                lang="en", source="s", n_chars=0,
            )
            for i in range(50)
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    n = 200  # past saturation (157) on this corpus
    seed = Q._bpe_wide_seed(spark, "unused")
    dist, _ = Q._bpe_deep_chain(spark, "unused", n, seed=seed)
    assert 100 < len(dist) < n  # really saturated, really deep
    lcol = F.slice(
        F.filter(Q._words(), lambda x: x != ""), 1, Q.WIDE_WORDS
    )
    v = df.select(lcol.alias("l")).groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("wcount")
    )
    units = [(list(r["l"]), int(r["wcount"])) for r in v.collect()]
    hist = Q._bpe_hist_loop(units, n)
    assert hist == dist


def test_bpe_heap_loop_equals_scan_loop_to_saturation():
    """The max-heap + lazy-deletion argmax (_bpe_hist_loop_heap — the
    escalation path for real 32k-merge vocabularies) must be
    row-equal to the scan loop INCLUDING final sequences, at full
    saturation, across seeded corpora with heavy ties — lazy deletion
    is exactly where a stale-entry bug would reorder tie-broken
    merges."""
    import random

    for seed in (1, 2, 3, 20260817, 99):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(rng.randint(5, 14))]
        units = [
            ([rng.choice(vocab) for _ in range(rng.randint(1, 10))],
             rng.randint(1, 5))
            for _ in range(80)
        ]
        a = Q._bpe_hist_loop(
            [(list(t), c) for t, c in units], 10**9, return_seqs=True
        )
        b = Q._bpe_hist_loop_heap(
            [(list(t), c) for t, c in units], 10**9, return_seqs=True
        )
        assert a == b, seed


def test_bpe_heap_loop_equals_scan_on_real_units(duck):
    """Same pin on the REAL sf0.001 wide-seed units, to saturation
    (2,272 merges) — the corpus whose tie structure the gated lanes
    actually face."""
    rows = duck.execute(
        "SELECT l, COUNT(*) FROM ("
        "  SELECT list_filter(string_split(text,' '), x -> x <> '')"
        f"    [1:{Q.WIDE_WORDS}] AS l FROM documents)"
        " WHERE len(l) > 0 GROUP BY l"
    ).fetchall()
    units = [(list(l), int(c)) for l, c in rows]
    a = Q._bpe_hist_loop([(list(t), c) for t, c in units], 10**9)
    b = Q._bpe_hist_loop_heap([(list(t), c) for t, c in units], 10**9)
    assert a == b
    assert len(a) > 2000  # really saturated at real depth


def test_bpe_hist_loop_seqs_match_frozen_reapply():
    """return_seqs contract: the learn loop's final token table must
    equal a sequential greedy reapply of the learned merge list to the
    raw units — the driver-side half of the frozen-encode law the
    bpe_learn_merges_wide_2048 lane gates in-engine."""
    import random

    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(8)]
    units = [
        ([rng.choice(vocab) for _ in range(rng.randint(1, 9))],
         rng.randint(1, 4))
        for _ in range(40)
    ]
    merges, seqs = Q._bpe_hist_loop(
        [(list(t), w) for t, w in units], 10**9, return_seqs=True
    )

    def reapply(s):
        for a, b, _w in merges:
            out, k = [], 0
            while k < len(s):
                if k + 1 < len(s) and s[k] == a and s[k + 1] == b:
                    out.append(a + b)
                    k += 2
                else:
                    out.append(s[k])
                    k += 1
            s = out
        return s

    assert seqs == [reapply(list(t)) for t, _ in units]


def test_bpe_wide_2048_lane_saturates_and_self_gates(spark, monkeypatch):
    """The 2048-merge lane on a corpus that saturates early: emits
    exactly the saturation-depth merge table (same rows as the hist
    loop), and its in-lane frozen-encode law passes for real — the
    lane collects, learns, folds the literal list in Spark, and
    row-compares before returning."""
    import random

    rng = random.Random(20260821)
    vocab = [f"w{i}" for i in range(9)]
    docs = pd.DataFrame(
        [
            dict(
                doc_id=i + 1,
                text=" ".join(
                    rng.choice(vocab) for _ in range(rng.randint(2, 9))
                ),
                lang="en", source="s", n_chars=0,
            )
            for i in range(40)
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    got = [
        (r["step"], r["left_tok"], r["right_tok"], r["pair_weight"])
        for r in Q.bpe_learn_merges_wide_2048(spark, "unused")
        .orderBy("step").collect()
    ]
    lcol = F.slice(
        F.filter(Q._words(), lambda x: x != ""), 1, Q.WIDE_WORDS
    )
    v = df.select(lcol.alias("l")).groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("wcount")
    )
    units = [(list(r["l"]), int(r["wcount"])) for r in v.collect()]
    want = Q._bpe_hist_loop(units, Q.N_BPE_2048)
    assert 0 < len(want) < Q.N_BPE_2048  # saturated below the ask
    assert got == [
        (k, a, b, w) for k, (a, b, w) in enumerate(want, start=1)
    ]


def test_bpe_types_hist_equals_distributed_64(spark, sf_dir):
    """Cross-substrate pin on the CHAR seed (r10 verdict item 2): the
    word-type histogram loop must reproduce the distributed
    bpe_learn_merges_64 table row-for-row on the real sf0.001 corpus
    — the same one-oracle-two-substrates law the wide pair carries,
    now on the seed whose histogram is genuinely vocab-bounded
    (31 word types at every SF)."""
    want = [
        tuple(r) for r in
        Q.bpe_learn_merges_64(spark, sf_dir).orderBy("step").collect()
    ]
    got = [
        tuple(r) for r in
        Q.bpe_learn_merges_types_hist(spark, sf_dir)
        .orderBy("step").collect()
    ]
    assert got == want and len(got) == Q.N_BPE_64


def test_bpe_deep_chain_saturates_on_pair_exhaustion(spark, monkeypatch):
    """A corpus whose mergeable pairs run out before N_BPE_DEEP steps
    must SATURATE (r8 advice): the learn lane emits only the supported
    merges and the frozen encode still sees every word — previously
    the empty-argmax crossJoin silently collapsed the token table (and
    therefore the encode output) to zero rows."""
    docs = pd.DataFrame(
        [dict(doc_id=1, text="ab ab cd", lang="en", source="s", n_chars=0)]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)

    out = Q.bpe_learn_merges_deep(spark, "unused").orderBy("step").collect()
    # (a,b) weight 2 merges first, then (c,d) weight 1 — then nothing
    assert [(r["step"], r["merged_tok"]) for r in out] == [(1, "ab"), (2, "cd")]

    enc = Q.bpe_encode_frozen(spark, "unused").collect()
    assert len(enc) == 1
    r = enc[0]
    assert (r["n_words"], r["n_char_tokens"], r["n_bpe_tokens"]) == (3, 6, 3)

    fert = Q.bpe_encode_fertility_deep(spark, "unused").collect()
    assert len(fert) == 1 and fert[0]["n_bpe_tokens"] == 3

    # the ORACLE must saturate identically (r9 advice item 2): the
    # step CTE's scalar-subquery form keeps the token table intact
    # when {p}top is empty, where the old CROSS JOIN collapsed it to
    # zero rows — run the real 16-step-unrolled SQL on the same corpus
    import duckdb

    con = duckdb.connect()
    con.register("documents", docs)
    learn = con.execute(Q._bpe_oracle(Q.N_BPE_DEEP)).df()
    learn = learn.sort_values("step").reset_index(drop=True)
    assert list(learn["merged_tok"]) == ["ab", "cd"]
    f = con.execute(Q._bpe_fertility_oracle(Q.N_BPE_DEEP)).df()
    assert len(f) == 1
    assert (
        int(f.n_words[0]), int(f.n_char_tokens[0]), int(f.n_bpe_tokens[0])
    ) == (3, 6, 3)


def test_frozen_wide_drops_wordless_docs_like_the_oracle(
    spark, monkeypatch
):
    """A document with no words has no token rows in the oracle's
    learn chain, so its per-unit join drops it — the Spark side must
    drop it too instead of emitting an n_words=0 row (latent parity
    gap found in r10 self-review; the driver corpus has no empty
    docs, so only this test exercises it). Both engines run for real
    on the same 3-doc corpus, saturation and all."""
    import duckdb

    docs = pd.DataFrame(
        [
            dict(doc_id=1, text="alpha beta alpha beta", lang="en",
                 source="s", n_chars=0),
            dict(doc_id=2, text="", lang="en", source="s", n_chars=0),
            dict(doc_id=3, text="beta gamma", lang="en", source="s",
                 n_chars=0),
        ]
    )
    df = spark.createDataFrame(docs)
    monkeypatch.setattr(Q, "_docs", lambda s, d: df)
    got = (
        Q.bpe_encode_frozen_wide(spark, "unused")
        .orderBy("doc_id").toPandas()
    )
    assert list(got.doc_id) == [1, 3]

    con = duckdb.connect()
    con.register("documents", docs)
    from tradecat_spark.plans.registry import REGISTRY

    want = (
        con.execute(REGISTRY["bpe_encode_frozen_wide"].oracle)
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(want.doc_id) == [1, 3]
    assert list(got.n_bpe_tokens) == list(want.n_bpe_tokens)
    assert list(got.n_words) == list(want.n_words)


def _rows(*tups):
    return [dict(a=a, b=b, w=w) for a, b, w in tups]


def test_safe_batch_exactness_edges():
    """Unit pins for the batch-selection rule's proof obligations."""
    # disjoint candidates above the floor batch together
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 7), ("g", "h", 1)),
        k=12, remaining=10,
    )
    assert [(r["a"], r["b"]) for r in got] == [("a", "b"), ("c", "d"),
                                              ("e", "f"), ("g", "h")]
    # token sharing stops the prefix (b reused as left token)
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("b", "c", 8), ("x", "y", 7)),
        k=12, remaining=10,
    )
    assert len(got) == 1
    # floor: with k rows collected, the last row's weight is the
    # uncollected ceiling — a candidate tied with it must not batch
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("c", "d", 5), ("e", "f", 5)),
        k=3, remaining=10,
    )
    assert len(got) == 1
    # threat: (x, a) carries weight >= candidate (c, d), so merging
    # (a, b) could create (x, ab) with up to weight 8, outranking
    # (c, d) at its turn — rows in exact (w desc, a, b) driver order
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("c", "d", 8), ("x", "a", 8), ("z", "z", 1)),
        k=12, remaining=10,
    )
    assert len(got) == 1
    # no threat once (x, a) sorts strictly below the candidate: the
    # new pair (x, ab) is bounded by 6 < 7, so (c, d) batches
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("c", "d", 7), ("x", "a", 6), ("z", "z", 1)),
        k=12, remaining=10,
    )
    assert [(r["a"], r["b"]) for r in got] == [("a", "b"), ("c", "d")]
    # TOKEN-STRING COLLISION: "ab" already exists as a token (the
    # collected pair (x, ab) proves it), so merging (a, b) can GAIN
    # count for (x, ab) — the one way an old pair grows; must solo
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("x", "ab", 8), ("c", "d", 7)),
        k=12, remaining=10,
    )
    assert len(got) == 1
    # incomplete collection: a candidate above the floor but not
    # above TWICE the floor can be outranked by an uncollected old
    # pair gaining through an uncollected neighbor (floor + floor)
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("c", "d", 7), ("e", "f", 4)),
        k=3, remaining=10,
    )
    assert len(got) == 1
    # self-pair blocks successors through its own adjacency row
    got = Q._safe_batch(
        _rows(("a", "a", 9), ("c", "d", 8), ("e", "f", 7)),
        k=12, remaining=10,
    )
    assert len(got) == 1
    # remaining caps the batch
    got = Q._safe_batch(
        _rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 7), ("g", "h", 6)),
        k=12, remaining=2,
    )
    assert len(got) == 2


def test_bpe_heap_loop_past_32k_merges():
    """The '32k merges belong in a centralized driver loop' claim,
    measured AT 32k rather than extrapolated from 17k (r10 verdict
    item 4's last open decade): a synthetic 6,000-unit corpus whose
    saturation depth exceeds 32k merges runs to saturation in about a
    second on the heap form (measured 35,101 merges / 1.02 s on this
    box, 2026-08-16), and the scan loop — too slow to saturate here —
    agrees on a 500-merge prefix, so the depth evidence rides on the
    already-pinned heap==scan law plus this corpus's scale."""
    import random
    import time

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(240)]
    units = [
        ([rng.choice(vocab) for _ in range(rng.randint(5, 11))],
         rng.randint(1, 4))
        for _ in range(6000)
    ]
    t0 = time.time()
    merges = Q._bpe_hist_loop_heap([(list(t), c) for t, c in units], 10**9)
    wall = time.time() - t0
    assert len(merges) > 32_000
    # r11 ADVICE item 3: wall-clock assertions flake on loaded boxes
    # (full pytest has been observed at 28m47s under concurrent load),
    # so the timing pin is opt-in; merge count + scan-prefix agreement
    # remain the unconditional correctness pins
    if os.environ.get("TC_TIMING_ASSERTS"):
        assert wall < 30  # ~1 s measured on a quiet box
    scan = Q._bpe_hist_loop([(list(t), c) for t, c in units], 500)
    assert scan == merges[:500]
