"""Every oracle-backed declared query must hash-match DuckDB at sf0.001.

This mirrors the verify driver's correctness gate (it runs the same
comparison at sf0.01), so a green run here means the gate passes.
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import assert_frames_match
from tradecat_spark.plans.registry import load_all

SPECS = load_all()
ORACLE_QUERIES = sorted(n for n, s in SPECS.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = SPECS[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_all_queries_return_rows(spark, sf_dir):
    """Rows-only smoke for every registered query (incl. oracle-less)."""
    for name, spec in SPECS.items():
        n = spec.fn(spark, sf_dir).count()
        assert n >= 0, name
