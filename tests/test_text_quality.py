"""Intent check for text_repetition_stats: the Gopher flags must fire
on a crafted repetitive doc and stay off for a diverse one."""

from __future__ import annotations

import pandas as pd

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
