#!/usr/bin/env python
"""Headline-query benchmark.

Runs the bench-flagged queries from the tradecat_spark registry against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from tradecat_spark.plans.registry import load_all
from tradecat_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("tradecat-bench", cpus=cpus, shuffle_partitions=max(cpus, 16))
    specs = load_all()
    bench_specs = {n: s for n, s in specs.items() if s.bench}

    # warm the JVM/catalog once so per-query numbers measure the queries
    next(iter(bench_specs.values())).fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
