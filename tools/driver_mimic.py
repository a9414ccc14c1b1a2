"""Driver-mimic per the verify skill: run registered queries on a PLAIN
SparkSession against their DuckDB oracles at sf0.01 (or a given sf dir),
comparing via tests/oracle_utils.assert_frames_match (dtype-kind strict,
exact float equality — same sensitivity as the driver's value hash).

Usage::

    python tools/driver_mimic.py name1 name2 ...   # scoped
    python tools/driver_mimic.py --all             # full surface
    SF_DIR=/root/testdata/sf0.001 python tools/driver_mimic.py --all
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    run_all = "--all" in sys.argv
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from oracle_utils import assert_frames_match

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    n = E.entry(spark).count()
    print(f"entry smoke: {n} rows", flush=True)
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    targets = list(qs) if run_all else names
    unknown = [t for t in targets if t not in qs]
    if unknown:
        print(f"UNKNOWN queries: {unknown}")
        return 2

    results: dict[str, str] = {}
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                # the real driver's rows check fails empty results —
                # mirror it or the mimic green-lights a regression
                if len(sdf) == 0:
                    raise AssertionError("rows-only query returned 0 rows")
                results[name] = f"rows-only ({len(sdf)} rows)"
            else:
                odf = con.execute(oracles[name]).fetchdf()
                assert_frames_match(sdf, odf, name)
                results[name] = f"MATCH ({len(sdf)} rows)"
        except Exception as exc:  # noqa: BLE001 — report, don't die
            results[name] = f"FAIL: {type(exc).__name__}: {exc}"
        print(f"  {name}: {results[name]} [{time.time() - t0:.1f}s]", flush=True)

    fails = {k: v for k, v in results.items() if v.startswith("FAIL")}
    print(json.dumps({"checked": len(results), "fails": len(fails)}))
    if fails:
        for k, v in fails.items():
            print(f"FAIL {k}: {v[:300]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
