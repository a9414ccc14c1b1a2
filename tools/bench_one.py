"""Time individual registered queries in isolation with the noop sink
(guide §1.4), same session shape as bench.py. Prints per-run seconds
plus min/median — for optimization A/Bs; the official numbers stay
bench.py's.

Usage::

    python tools/bench_one.py ann_ivfadc_search [more names]
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... REPEATS=4 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("REPEATS", "4"))

    from tradecat_spark.plans.registry import load_all
    from tradecat_spark.session import get_spark

    spark = get_spark(
        "tradecat-bench-one", cpus=cpus, shuffle_partitions=max(cpus, 16)
    )
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    # calibration row (same workload as bench.py) so readings are
    # normalizable against box load
    t0 = time.perf_counter()
    spark.range(0, 400_000_000, 1, 64).selectExpr(
        "sum((id * 2654435761) % 1000003) AS s"
    ).collect()
    print(f"calibration: {time.perf_counter() - t0:.3f}s", flush=True)

    specs = load_all()
    for n in names:
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_one:{n}#{i}")
            t0 = time.perf_counter()
            specs[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{n}: min={min(runs):.3f} "
            f"median={statistics.median(runs):.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
