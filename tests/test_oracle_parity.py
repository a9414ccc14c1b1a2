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
    """Rows-only smoke for every registered query (incl. oracle-less).

    The 296 plans are independent, so they run from a small driver
    thread pool (guide §2.6): Spark schedules concurrent jobs FIFO and
    back-fills executors from the next query while the current one
    drains its tail. Sequentially this test was 698 s — 29% of the
    whole suite — and the driver's capture window truncated the run
    (VERIFY_r14 tests_ok=false by timeout); the pool form does the
    identical checks. Failures are collected with their lane names so
    one bad query doesn't mask the rest."""
    from concurrent.futures import ThreadPoolExecutor

    def _smoke(item):
        name, spec = item
        try:
            n = spec.fn(spark, sf_dir).count()
            return None if n >= 0 else f"{name}: count {n}"
        except Exception as e:  # noqa: BLE001 — reported per lane
            return f"{name}: {type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=6) as pool:
        failures = [f for f in pool.map(_smoke, SPECS.items()) if f]
    assert not failures, failures
