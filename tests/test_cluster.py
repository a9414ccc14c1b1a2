"""Degenerate-input robustness for the Lloyd/SemDeDup operators.

The oracle-parity suite covers the happy path on the driver's synthetic
embeddings; these tests hit the adversarial shape — an all-identical
corpus, where every distance ties at 0, clusters 1..K-1 lose every
member and vanish, and every SemDeDup pair has cosine exactly 1.0 —
and assert BOTH engines still agree bit-for-bit.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_utils import assert_frames_match
from tradecat_spark.plans.registry import load_all

SPECS = load_all()


def _write_embeddings(path: str, vecs: np.ndarray) -> None:
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "label": pa.array(["x"] * len(vecs)),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs],
            pa.list_(pa.float32()),
        ),
    })
    pq.write_table(tbl, path)


@pytest.fixture
def identical_dir(tmp_path):
    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    _write_embeddings(
        str(tmp_path / "embeddings.parquet"), np.tile(base, (20, 1))
    )
    return str(tmp_path)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con.execute(sql).df()


def test_kmeans_collapses_to_one_cluster_consistently(spark, identical_dir):
    """All-identical corpus: every d² ties at 0, the lowest cid takes
    every member, the other K-1 centroids vanish — and the survivors
    still hash-match the oracle."""
    spec = SPECS["cluster_kmeans_lloyd"]
    got = spec.fn(spark, identical_dir).toPandas()
    assert len(got) == 1
    assert got["n_members"].iloc[0] == 20
    assert_frames_match(got, _oracle(identical_dir, spec.oracle),
                        "kmeans_degenerate")


def test_semdedup_identical_vectors_match_oracle(spark, identical_dir):
    """cos ≡ 1.0 everywhere: every ranking tie must resolve through the
    id tiebreaks identically on both engines."""
    spec = SPECS["cluster_semdedup_candidates"]
    got = spec.fn(spark, identical_dir).toPandas()
    assert (got["cos_sim"] == 1.0).all()
    assert_frames_match(got, _oracle(identical_dir, spec.oracle),
                        "semdedup_degenerate")


def test_gram_and_power_iteration_laws(spark, sf_dir):
    """Spectral-family laws: the Gram triangle reconstructs a symmetric
    PSD-diagonal matrix; the published eigenvalue IS the Rayleigh
    quotient of the published fixed-point vector (recomputed in exact
    Python ints with the same truncation); and 3 power steps do not
    decrease the Rayleigh quotient vs the all-ones start (PSD
    monotonicity)."""
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    tri = specs["embedding_gram_matrix"].fn(spark, sf_dir).collect()
    g: dict = {}
    for r in tri:
        g[(r["i"], r["j"])] = r["gram_scaled"]
        g[(r["j"], r["i"])] = r["gram_scaled"]
    d = max(i for i, _ in g)
    assert set(g) == {(i, j) for i in range(1, d + 1)
                      for j in range(1, d + 1)}
    assert all(g[(i, i)] >= 0 for i in range(1, d + 1))

    rows = specs["embedding_top_pc_power"].fn(spark, sf_dir).collect()
    v = {r["component"]: r["v_fp"] for r in rows}
    lam = rows[0]["lambda_scaled"]
    assert all(r["lambda_scaled"] == lam for r in rows)
    assert max(abs(x) for x in v.values()) == 1_000_000

    def rayleigh(vec: dict) -> int:
        nu = sum(vec[i] * g[(i, j)] * vec[j]
                 for i in range(1, d + 1) for j in range(1, d + 1))
        de = sum(x * x for x in vec.values())
        s = 1 if nu >= 0 else -1
        return s * (abs(nu) // de)

    assert rayleigh(v) == lam
    ones = {i: 1_000_000 for i in range(1, d + 1)}
    assert lam >= rayleigh(ones)
