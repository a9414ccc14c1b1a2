"""Spark-vs-DuckDB comparison mirroring the verify driver's check:
row count, schema (column names), and order-insensitive values.

Deliberately strict: floats must match EXACTLY (bit-for-bit after the
queries' own rounding), because the driver hashes values. Any query that
needs tolerance here would fail the driver's hash gate — fix the query,
not the test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_extension_array_dtype(s):
            df[c] = s.to_numpy()
        elif s.dtype == object:
            # dates / decimals → canonical string
            df[c] = s.map(lambda v: None if v is None else str(v))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a dtype to the class the driver's value-hash is sensitive
    to: an oracle returning float64 where Spark returns int64 hashes
    differently even when every value matches (the r3
    ``pack_context_windows`` red row — DuckDB HUGEINT widening)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        ka, kb = _dtype_kind(spark_pdf[c]), _dtype_kind(oracle_pdf[c])
        assert ka == kb, (
            f"{name}.{c}: dtype-kind mismatch spark={ka}({spark_pdf[c].dtype})"
            f" vs oracle={kb}({oracle_pdf[c].dtype}) — the driver hash is "
            f"representation-sensitive; CAST in the oracle (HUGEINT gotcha)"
        )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af, bf = av.astype("float64"), bv.astype("float64")
            an, bn = pd.isna(af), pd.isna(bf)
            assert (an == bn).all(), f"{name}.{c}: null placement differs"
            # Bit-pattern equality, not ==: the driver hashes raw values,
            # so -0.0 vs +0.0 (which compare ==) must count as a mismatch.
            ok = af[~an].view("int64") == bf[~bn].view("int64")
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {len(ok) - ok.sum()} float bit-pattern "
                    f"mismatches (incl. -0.0 vs +0.0), "
                    f"e.g. {af[~an][bad]} vs {bf[~bn][bad]}"
                )
        else:
            same = pd.Series(av).fillna("␀").eq(pd.Series(bv).fillna("␀"))
            assert same.all(), (
                f"{name}.{c}: {(~same).sum()} mismatches, e.g. "
                f"{pd.Series(av)[~same].head(3).tolist()} vs "
                f"{pd.Series(bv)[~same].head(3).tolist()}"
            )
