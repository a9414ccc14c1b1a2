#!/usr/bin/env python
"""Same-box worktree control for the STREAMING bench rows (r13).

`bench_worktree_control.py` drives registry lanes; the streaming
freshness rows (`streaming_ingest_600sym`, `streaming_rollup_600sym`,
`streaming_cms_read_compacted`) live in `bench.py::_bench_streaming`,
so adjudicating the r12 rollup mover needs this sibling: it imports
the named TREE's own bench module and runs its `_bench_streaming`
repeatedly in a fresh session — the official machinery, but ISOLATED
from the headline-query suite that precedes it in a real bench run.
Comparing tree A vs tree B interleaved separates code drift from box
variance; comparing isolated-vs-full-bench on ONE tree separates both
from the session-state interaction the r12 verdict suspects (the
bench session registers every lane and builds 7+ stores before the
rollup's stream planning).

Usage::

    python tools/rollup_worktree_control.py <tree_root> <repeats>
"""

from __future__ import annotations

import importlib.util
import json
import statistics
import sys
import time


def main() -> None:
    # argv guard (r13 ADVICE): this tool spins up 32-core sessions —
    # fail with usage, not a bare IndexError/ValueError traceback
    if len(sys.argv) != 3 or not sys.argv[2].isdigit():
        sys.exit(
            "usage: python tools/rollup_worktree_control.py "
            "<tree_root> <repeats:int>"
        )
    tree, repeats = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, tree)
    spec = importlib.util.spec_from_file_location("treebench", f"{tree}/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from tradecat_spark.session import get_spark

    spark = get_spark(
        "tradecat-rollup-control", cpus=32, shuffle_partitions=32
    )
    try:
        spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
        bench._warm_python_workers(spark)

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
        runs = [bench._bench_streaming(spark) for _ in range(repeats)]
        for k in runs[0]:
            vals = [r[k] for r in runs]
            out[k] = {
                "min": round(min(vals), 3),
                "median": round(statistics.median(vals), 3),
                "runs": [round(v, 3) for v in vals],
            }
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
