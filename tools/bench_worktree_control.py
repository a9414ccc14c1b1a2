#!/usr/bin/env python
"""Same-box worktree bench control (the r7 methodology, re-used r12).

Measures the pinned calibration row plus named bench queries against
ONE source tree (a git worktree of an older round, or the current
repo), printing one JSON line. Adjudicating a suspected per-query
regression means running this alternately against the old tree and
the current tree in the same quiet window (fresh process each run, so
neither JVM state nor page cache carries across trees) and comparing
distributions — identical distributions mean box variance, not code
drift (see README round-7 notes for the original rollup case).

Usage::

    python tools/bench_worktree_control.py <tree_root> <repeats> <query...>

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32) — same knobs as bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    # argv hygiene (the r13 ADVICE standard set on the rollup sibling):
    # this tool repeatedly launches 32-core sessions, so fail with usage
    # text, not a bare IndexError/ValueError traceback
    if (len(sys.argv) < 4 or not sys.argv[2].isdigit()
            or int(sys.argv[2]) < 1):
        sys.exit(
            "usage: bench_worktree_control.py <tree_root> "
            "<repeats: int >= 1> <query...>"
        )
    tree, repeats, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    sys.path.insert(0, tree)
    from tradecat_spark.plans.registry import load_all
    from tradecat_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "tradecat-bench-control", cpus=cpus,
        shuffle_partitions=max(cpus, 16),
    )
    try:
        # identical warm-up to bench.py: JVM + the Python worker pool
        spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
        nparts = 2 * spark.sparkContext.defaultParallelism

        def _touch(it):
            import tradecat_spark.indicators.library  # noqa: F401

            yield from it

        spark.range(0, nparts, 1, nparts).mapInPandas(_touch, "id long").count()

        out: dict = {"tree": tree, "repeats": repeats}
        cal = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            spark.range(0, 400_000_000, 1, 64).selectExpr(
                "sum((id * 2654435761) % 1000003) AS s"
            ).collect()
            cal.append(time.perf_counter() - t0)
        out["calibration_fixed"] = {
            "min": round(min(cal), 3),
            "median": round(statistics.median(cal), 3),
        }
        specs = load_all()
        for n in names:
            runs = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                specs[n].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            out[n] = {
                "min": round(min(runs), 3),
                "median": round(statistics.median(runs), 3),
                "runs": [round(r, 3) for r in runs],
            }
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
