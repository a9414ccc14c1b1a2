"""Every oracle-backed declared query must hash-match DuckDB at sf0.001.

This mirrors the verify driver's correctness gate (it runs the same
comparison at sf0.01), so a green run here means the gate passes.

r15 layout: the ~290 per-lane comparisons are grouped into interleaved
CHUNKS, each chunk running its lanes from a small driver thread pool —
the same guide §2.6 overlap the rows-only smoke below has used since
r14 (Spark schedules concurrent driver-thread jobs FIFO and back-fills
idle cores; DuckDB oracle chains run GIL-released on their own
threads, so Spark- and oracle-side work overlap too). Sequentially the
parity file was the bulk of a ~40-minute suite, which the verify
driver's capture window truncates (VERIFY_r14 tests_ok=false by
timeout, r15 verdict Next #2). The comparisons themselves are
UNCHANGED — same ``assert_frames_match`` strictness per lane, failures
collected with their lane names so one bad query can't mask the rest.
Chunks interleave (``ORACLE_QUERIES[i::N]``) so the few multi-minute
BPE lanes land in different chunks instead of serializing in one.

Each worker thread compares through its own ``duck.cursor()`` —
DuckDB connections are not safe for concurrent execute, cursors of one
in-memory database share its catalog (the table views) while keeping
per-cursor session state (the BPE oracles' ``SET
max_expression_depth``).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from tests.oracle_utils import assert_frames_match
from tradecat_spark.plans.registry import load_all

SPECS = load_all()
ORACLE_QUERIES = sorted(n for n, s in SPECS.items() if s.oracle is not None)

_N_CHUNKS = 8
_POOL = 6


@pytest.mark.parametrize("chunk", range(_N_CHUNKS))
def test_oracle_parity(chunk, spark, duck, sf_dir):
    names = ORACLE_QUERIES[chunk::_N_CHUNKS]

    def _one(name: str):
        spec = SPECS[name]
        cur = duck.cursor()
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
            oracle_pdf = cur.execute(spec.oracle).df()
            assert_frames_match(spark_pdf, oracle_pdf, name)
            return None
        except Exception as e:  # noqa: BLE001 — reported per lane
            return f"{name}: {type(e).__name__}: {e}"
        finally:
            cur.close()

    with ThreadPoolExecutor(max_workers=_POOL) as pool:
        failures = [f for f in pool.map(_one, names) if f]
    assert not failures, failures


def test_oracle_parity_covers_every_oracle_lane():
    """The chunked parametrization must partition ORACLE_QUERIES
    exactly — no lane skipped, none compared twice."""
    seen = [
        n
        for c in range(_N_CHUNKS)
        for n in ORACLE_QUERIES[c::_N_CHUNKS]
    ]
    assert sorted(seen) == ORACLE_QUERIES
    assert len(seen) == len(set(seen))


def test_all_queries_return_rows(spark, sf_dir):
    """Rows-only smoke for every registered query the parity gate does
    NOT already execute — i.e. the oracle-less lanes. The parity
    chunks above run every oracle-backed lane end-to-end (toPandas +
    full value comparison), which strictly subsumes a count()
    executability check, so re-running those 290 plans here was pure
    duplication: sequentially this test was 698 s (29% of the whole
    suite, r14), 233-285 s pooled 6-wide (r15 — a 12-wide pool A/B'd
    worse, 243 vs 233 s, saturated on driver-side analysis), and ~10 s
    once scoped to the non-oracle lanes. The lane set is computed
    dynamically, so a lane that loses its oracle falls back into this
    smoke automatically. Failures are collected with their lane names
    so one bad query doesn't mask the rest."""

    def _smoke(item):
        name, spec = item
        try:
            n = spec.fn(spark, sf_dir).count()
            return None if n >= 0 else f"{name}: count {n}"
        except Exception as e:  # noqa: BLE001 — reported per lane
            return f"{name}: {type(e).__name__}: {e}"

    uncovered = {
        n: s for n, s in SPECS.items() if s.oracle is None
    }
    assert uncovered, "registry unexpectedly has no oracle-less lanes"
    with ThreadPoolExecutor(max_workers=6) as pool:
        failures = [f for f in pool.map(_smoke, uncovered.items()) if f]
    assert not failures, failures
