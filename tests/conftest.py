from __future__ import annotations

import duckdb
import pytest

from tradecat_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    # Core count: half the box up to 16 (was a pinned 4 — measured the
    # suite leaving 28 of 32 cores idle while its CPU-bound rows ran:
    # the bpe_encode_frozen_wide parity test alone was 334 s of
    # interpreted 256-merge folds on 4 cores; r15 verdict item 2 needs
    # the whole suite inside the driver's capture window).
    # shuffle_partitions stays 8: plan-pin tests count Exchange nodes
    # and AQE-coalesced layouts, which must not drift with the box.
    import os

    ncpu = os.cpu_count() or 4
    s = get_spark(
        "tradecat-tests",
        cpus=max(4, min(16, ncpu // 2)),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    """The sf0.01 dataset, for tests whose law is degenerate at
    sf0.001; skip cleanly on machines without the driver testdata."""
    import os

    path = "/root/testdata/sf0.01"
    if not os.path.isdir(path):
        pytest.skip("sf0.01 testdata not available on this machine")
    return path
