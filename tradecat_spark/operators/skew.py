"""Salted join — the standard remedy for hot-key skew.

A shuffled equi-join hashes rows by key, so one hot key (one symbol on
a volatile day, one power user, one degenerate LSH bucket) lands its
entire row set on a single task. AQE's skew-join split handles many
cases at runtime; salting is the explicit, planner-independent form:
the big side's rows scatter across ``salts`` sub-keys and the small
side replicates ``salts``×, so the hot key becomes ``salts`` evenly
sized join groups.

The law: ``salted_join(big, small, keys) ≡ big.join(small, keys)``
row-for-row — the salt is invisible in the output, which is what the
hash-gated query checks.

Cost model: replicating the small side multiplies it by ``salts`` —
correct only while |small| × salts stays shuffle-cheap (dims, per-user
tables). For two big sides, salt only the hot KEYS (split-and-union)
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__tc_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with the big side salted.

    The salt is ``hash(all big columns) % salts`` — deterministic (no
    RNG state; identical rows co-locate, distinct rows of a hot key
    spread) and irrelevant to the result. ``how`` supports inner/left
    (each big row carries exactly one salt, so match/no-match semantics
    are untouched).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    for side, df in (("big", big), ("small", small)):
        if SALT_COL in df.columns:
            raise ValueError(
                f"{side} input already has reserved column {SALT_COL!r}"
            )
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.hash(*big.columns), F.lit(salts))
    )
    small_s = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1))),
    )
    return big_s.join(small_s, [*keys, SALT_COL], how).drop(SALT_COL)
