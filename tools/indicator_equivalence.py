"""Bit-identity harness for indicator-library rewrites (r15).

Compares EVERY registered indicator's output dict, value for value,
between the current library and a reference copy of the pre-rewrite
implementation, over:

- the real bar groups of indicator_batch_150x7 (150 user keys × 7
  intervals) and the 1h/6h event_type surfaces, at every SF directory
  passed (the driver's correctness SFs plus the bench SF);
- adversarial synthetic frames: constant prices (zero true range),
  zero volumes, monotone trends, lengths straddling every min_data
  threshold, h==l==c bars.

Equality is EXACT: floats must be bit-equal (or both NaN), strings and
ints equal, and a group where the old code raised must raise in the
new code too (the engine maps exceptions to NULL rows). This is the
same standard the r14 engine rewrite used (direct full-surface
compare), mechanized so the r15 library rewrite can run it per class.

Usage::

    python tools/indicator_equivalence.py /path/to/library_old.py \
        [sf_dir ...]          # default: sf0.001 sf0.01 sf0.1
"""

from __future__ import annotations

import importlib.util
import math
import struct
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BAR_COLS = ("open", "high", "low", "close", "volume")


def load_old_registry(path: str):
    import tradecat_spark.indicators.base as base
    import tradecat_spark.indicators.library  # noqa: F401 (fill current)

    current = base.REGISTRY
    base.REGISTRY = {}
    try:
        spec = importlib.util.spec_from_file_location("library_old_ref", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        old = base.REGISTRY
    finally:
        base.REGISTRY = current
    return old


def real_groups(sf_dir: str):
    """The compute_all bar groups the declared queries actually feed,
    rebuilt via DuckDB (values identical to the Spark rollups: exact
    min/max/arg picks and integer-scaled sums)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    con.execute(
        """CREATE VIEW hot_events AS
           SELECT e.* FROM events e JOIN (
             SELECT user_id FROM events GROUP BY user_id
             ORDER BY SUM(ABS(value)) DESC, user_id LIMIT 150
           ) h USING (user_id)"""
    )
    intervals = {"5m": 300, "15m": 900, "30m": 1800, "1h": 3600,
                 "2h": 7200, "4h": 14400, "1d": 86400}
    frames = []
    iv_sql = " UNION ALL ".join(
        f"""SELECT user_id::VARCHAR || '|{lbl}' AS g,
            to_timestamp(floor(epoch(ts)/{sec})*{sec}) AS bucket_ts,
            arg_min(value, ts) AS open, MAX(value) AS high,
            MIN(value) AS low, arg_max(value, ts) AS close,
            SUM(ABS(value)) AS volume
            FROM hot_events GROUP BY 1, 2"""
        for lbl, sec in intervals.items()
    )
    frames.append(con.execute(iv_sql).df())
    for sec in (3600, 21600):  # surface_1h + signal_pack snapshots
        frames.append(con.execute(
            f"""SELECT event_type AS g,
                to_timestamp(floor(epoch(ts)/{sec})*{sec}) AS bucket_ts,
                arg_min(value, ts) AS open, MAX(value) AS high,
                MIN(value) AS low, arg_max(value, ts) AS close,
                SUM(ABS(value)) AS volume
                FROM events GROUP BY 1, 2"""
        ).df())
    for f in frames:
        for gname, g in f.groupby("g", sort=False):
            yield gname, g.sort_values("bucket_ts").tail(500)


def synthetic_groups():
    rng = np.random.default_rng(123)
    lengths = [1, 2, 3, 5, 12, 15, 20, 29, 30, 31, 45, 50, 80, 100, 300, 500]
    for n in lengths:
        close = 100 + np.cumsum(rng.normal(0, 1, n))
        high = close + rng.uniform(0, 2, n)
        low = close - rng.uniform(0, 2, n)
        yield f"rand{n}", pd.DataFrame({
            "open": close + rng.normal(0, 0.5, n), "high": high,
            "low": low, "close": close, "volume": rng.uniform(10, 1000, n),
        })
    n = 120
    yield "const", pd.DataFrame({           # zero true range everywhere
        "open": 5.0, "high": 5.0, "low": 5.0, "close": 5.0,
        "volume": np.full(n, 3.0),
    }, index=range(n))
    yield "zerovol", pd.DataFrame({
        "open": 1.0, "high": 2.0, "low": 0.5,
        "close": 100 + np.cumsum(rng.normal(0, 1, n)),
        "volume": np.zeros(n),
    })
    yield "monotone", pd.DataFrame({
        "open": np.arange(n, dtype=float), "high": np.arange(n) + 2.0,
        "low": np.arange(n) - 1.0, "close": np.arange(n) + 1.0,
        "volume": np.ones(n),
    })


def _vbits(v):
    if v is None:
        return ("none",)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return ("i", int(v))
    f = float(v)
    if math.isnan(f):
        return ("nan",)
    return ("f", struct.pack("<d", f).hex())


def run_one(fn, b):
    try:
        return ("ok", fn(b))
    except Exception as e:  # engine maps any raise to NULL row
        return ("raise", type(e).__name__)


def main() -> int:
    old_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/library_old.py"
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    only = {a for a in sf_dirs if not a.startswith("/")}
    sf_dirs = [a for a in sf_dirs if a.startswith("/")]

    from tradecat_spark.indicators.base import REGISTRY as NEW

    old = load_old_registry(old_path)
    assert set(old) == set(NEW), (set(old) ^ set(NEW))

    mismatches = 0
    n_groups = 0
    sources = [("synth", synthetic_groups())]
    sources += [(sf, real_groups(sf)) for sf in sf_dirs]
    for src, groups in sources:
        for gname, g in groups:
            n_groups += 1
            b = g[list(BAR_COLS)].astype("float64").reset_index(drop=True)
            b_old = b.copy()
            for name, meta in NEW.items():
                if only and name not in only:
                    continue
                so, ro = run_one(old[name].fn, b_old)
                sn, rn = run_one(meta.fn, b)
                if so != sn:
                    print(f"MISMATCH {src}/{gname}/{name}: outcome "
                          f"{so}({ro if so=='raise' else ''}) vs "
                          f"{sn}({rn if sn=='raise' else ''})")
                    mismatches += 1
                    continue
                if so == "raise":
                    continue
                keys = set(ro) | set(rn)
                for k in keys:
                    vo, vn = ro.get(k), rn.get(k)
                    if _vbits(vo) != _vbits(vn):
                        print(f"MISMATCH {src}/{gname}/{name}.{k}: "
                              f"{vo!r} vs {vn!r} "
                              f"[{_vbits(vo)} vs {_vbits(vn)}]")
                        mismatches += 1
        print(f"{src}: done ({n_groups} cumulative groups)", flush=True)
    print(f"TOTAL groups={n_groups} mismatches={mismatches}")
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
