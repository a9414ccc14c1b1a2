"""Capture ``.explain("formatted")`` for bench queries (or a named
list) into plans/$PLANS_DIR/<name>_<tag>.txt (default plans/r15) —
the optimization round's before/after plan evidence.

Usage::

    python tools/capture_plans.py before            # all bench queries
    python tools/capture_plans.py after name1 ...   # scoped
    SF_DIR=/root/testdata/sf0.1 PLANS_DIR=r15 python tools/capture_plans.py before
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / os.environ.get("PLANS_DIR", "r15")
    out_dir.mkdir(parents=True, exist_ok=True)

    from tradecat_spark.plans.registry import load_all
    from tradecat_spark.session import get_spark

    spark = get_spark("tradecat-plan-capture", cpus=8, shuffle_partitions=16)
    specs = load_all()
    targets = names or [n for n, s in specs.items() if s.bench]
    for n in targets:
        df = specs[n].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{n}_{tag}.txt").write_text(plan)
        print(f"{n}: {plan.count('Exchange')} Exchange mentions", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
