"""CUSTOM condition expressions: the reference's lambda rules, declaratively.

Reference ``ConditionType.CUSTOM`` carries an opaque Python lambda over
(prev, curr) dicts (rules/base.py:139-143); 53 of the 129 shipped rules
use it (rules/core/__init__.py:26-41 et al.). Opaque lambdas can't
compile to Column expressions, so this module replaces them with a
**registry of named predicate shapes**: each shape registers three
semantically-identical forms —

- ``column(cfg)``  → a boolean ``Column`` over ``<field>`` /
  ``prev_<field>`` columns (the batch / whole-stage-codegen path),
- ``py(cfg, p, c)`` → a Python predicate over (prev, curr) dicts (the
  ``applyInPandasWithState`` streaming path),
- ``sql(cfg)``     → an ANSI-SQL boolean (the DuckDB oracle path),

and a rule references a shape by name: ``condition_config={"expr":
"leave_above", "field": "cci", "threshold": 100}``. The 53 reference
lambdas reduce to the ~two dozen shapes below (several are shared by
many rules). Tests fuzz column-vs-py agreement; the oracle gate checks
column-vs-sql.

Null semantics: any comparison over a missing/NULL field is False (SQL
three-valued logic), matching the compiled-Column behavior; the
reference's ``(x or default)`` falsy-coalescing is a quirk of its dict
evaluation, not part of the declared rule semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CustomExpr:
    name: str
    column: Callable[[dict], Column]
    py: Callable[[dict, dict | None, dict], bool]
    sql: Callable[[dict], str] | None = None  # None → not oracle-expressible


CUSTOM_EXPRS: dict[str, CustomExpr] = {}


def register_custom(
    name: str,
    column: Callable[[dict], Column],
    py: Callable[[dict, dict | None, dict], bool],
    sql: Callable[[dict], str] | None = None,
) -> None:
    if name in CUSTOM_EXPRS:
        raise ValueError(f"duplicate custom expr {name!r}")
    CUSTOM_EXPRS[name] = CustomExpr(name, column, py, sql)


def get_custom(name: str) -> CustomExpr:
    try:
        return CUSTOM_EXPRS[name]
    except KeyError:
        raise ValueError(f"unknown custom expr {name!r}") from None


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
def _c(f: str) -> Column:
    return F.col(f)


def _p(f: str) -> Column:
    return F.col(f"prev_{f}")


def _pv(prev: dict | None, f):
    return prev.get(f) if prev else None


def _ok(*vals) -> bool:
    return all(v is not None for v in vals)


# ---------------------------------------------------------------------------
# zone-leave shapes: strict crossing back through a level
# (CCI/WR/MFI leave-overbought/oversold, ADX weaken, extreme-ratio flips,
#  z-score drops — reference rules/momentum/others.py:42-57 etc.)
# ---------------------------------------------------------------------------
register_custom(
    "leave_above",  # prev > t  AND  curr < t
    lambda cfg: (_p(cfg["field"]) > cfg["threshold"])
    & (_c(cfg["field"]) < cfg["threshold"]),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) > cfg["threshold"]
    and c.get(cfg["field"]) < cfg["threshold"],
    lambda cfg: (
        f"(prev_{cfg['field']} > {cfg['threshold']} "
        f"AND {cfg['field']} < {cfg['threshold']})"
    ),
)

register_custom(
    "leave_below",  # prev < t  AND  curr > t
    lambda cfg: (_p(cfg["field"]) < cfg["threshold"])
    & (_c(cfg["field"]) > cfg["threshold"]),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) < cfg["threshold"]
    and c.get(cfg["field"]) > cfg["threshold"],
    lambda cfg: (
        f"(prev_{cfg['field']} < {cfg['threshold']} "
        f"AND {cfg['field']} > {cfg['threshold']})"
    ),
)

register_custom(
    "cross_up_ge",  # prev < t  AND  curr >= t (OI z-score breach)
    lambda cfg: (_p(cfg["field"]) < cfg["threshold"])
    & (_c(cfg["field"]) >= cfg["threshold"]),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) < cfg["threshold"]
    and c.get(cfg["field"]) >= cfg["threshold"],
    lambda cfg: (
        f"(prev_{cfg['field']} < {cfg['threshold']} "
        f"AND {cfg['field']} >= {cfg['threshold']})"
    ),
)

register_custom(
    "cross_down_le",  # prev > t  AND  curr <= t (sentiment-diff flip down)
    lambda cfg: (_p(cfg["field"]) > cfg["threshold"])
    & (_c(cfg["field"]) <= cfg["threshold"]),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) > cfg["threshold"]
    and c.get(cfg["field"]) <= cfg["threshold"],
    lambda cfg: (
        f"(prev_{cfg['field']} > {cfg['threshold']} "
        f"AND {cfg['field']} <= {cfg['threshold']})"
    ),
)

# ---------------------------------------------------------------------------
# stateless level checks (OBV/CVD change-rate, harmonic, near-S/R)
# ---------------------------------------------------------------------------
register_custom(
    "gt",
    lambda cfg: _c(cfg["field"]) > cfg["threshold"],
    lambda cfg, p, c: _ok(c.get(cfg["field"]))
    and c.get(cfg["field"]) > cfg["threshold"],
    lambda cfg: f"({cfg['field']} > {cfg['threshold']})",
)

register_custom(
    "lt",
    lambda cfg: _c(cfg["field"]) < cfg["threshold"],
    lambda cfg, p, c: _ok(c.get(cfg["field"]))
    and c.get(cfg["field"]) < cfg["threshold"],
    lambda cfg: f"({cfg['field']} < {cfg['threshold']})",
)

register_custom(
    "abs_gt",  # |curr| > t (harmonic-signal magnitude)
    lambda cfg: F.abs(_c(cfg["field"])) > cfg["threshold"],
    lambda cfg, p, c: _ok(c.get(cfg["field"]))
    and abs(c.get(cfg["field"])) > cfg["threshold"],
    lambda cfg: f"(ABS({cfg['field']}) > {cfg['threshold']})",
)

# ---------------------------------------------------------------------------
# sign flips (MACD histogram, VWAP deviation)
# ---------------------------------------------------------------------------
register_custom(
    "sign_flip_up",  # prev < 0 AND curr > 0
    lambda cfg: (_p(cfg["field"]) < 0) & (_c(cfg["field"]) > 0),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) < 0
    and c.get(cfg["field"]) > 0,
    lambda cfg: f"(prev_{cfg['field']} < 0 AND {cfg['field']} > 0)",
)

register_custom(
    "sign_flip_down",
    lambda cfg: (_p(cfg["field"]) > 0) & (_c(cfg["field"]) < 0),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) > 0
    and c.get(cfg["field"]) < 0,
    lambda cfg: f"(prev_{cfg['field']} > 0 AND {cfg['field']} < 0)",
)

# ---------------------------------------------------------------------------
# two-field crossings (price vs band: Bollinger strict, Donchian/Keltner
# inclusive — rules/volatility/__init__.py:16-41,116-188)
# ---------------------------------------------------------------------------
def _cross_field(cfg: dict, up: bool) -> Column:
    a, b = cfg["field_a"], cfg["field_b"]
    strict = cfg.get("strict", True)
    if up:
        hit = (_c(a) > _c(b)) if strict else (_c(a) >= _c(b))
        return (_p(a) < _p(b)) & hit
    hit = (_c(a) < _c(b)) if strict else (_c(a) <= _c(b))
    return (_p(a) > _p(b)) & hit


def _cross_field_py(cfg: dict, p: dict | None, c: dict, up: bool) -> bool:
    a, b = cfg["field_a"], cfg["field_b"]
    strict = cfg.get("strict", True)
    if not _ok(_pv(p, a), _pv(p, b), c.get(a), c.get(b)):
        return False
    if up:
        hit = c[a] > c[b] if strict else c[a] >= c[b]
        return _pv(p, a) < _pv(p, b) and hit
    hit = c[a] < c[b] if strict else c[a] <= c[b]
    return _pv(p, a) > _pv(p, b) and hit


def _cross_field_sql(cfg: dict, up: bool) -> str:
    a, b = cfg["field_a"], cfg["field_b"]
    strict = cfg.get("strict", True)
    if up:
        op = ">" if strict else ">="
        return f"(prev_{a} < prev_{b} AND {a} {op} {b})"
    op = "<" if strict else "<="
    return f"(prev_{a} > prev_{b} AND {a} {op} {b})"


register_custom(
    "cross_field_up",
    lambda cfg: _cross_field(cfg, True),
    lambda cfg, p, c: _cross_field_py(cfg, p, c, True),
    lambda cfg: _cross_field_sql(cfg, True),
)

register_custom(
    "cross_field_down",
    lambda cfg: _cross_field(cfg, False),
    lambda cfg, p, c: _cross_field_py(cfg, p, c, False),
    lambda cfg: _cross_field_sql(cfg, False),
)

# ---------------------------------------------------------------------------
# band-width regime jumps (Bollinger squeeze/expand with hysteresis)
# ---------------------------------------------------------------------------
register_custom(
    "drop_through",  # prev > hi AND curr < lo  (squeeze: 5 → 3)
    lambda cfg: (_p(cfg["field"]) > cfg["high"]) & (_c(cfg["field"]) < cfg["low"]),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) > cfg["high"]
    and c.get(cfg["field"]) < cfg["low"],
    lambda cfg: (
        f"(prev_{cfg['field']} > {cfg['high']} "
        f"AND {cfg['field']} < {cfg['low']})"
    ),
)

register_custom(
    "jump_through",  # prev < lo AND curr > hi  (expansion: 5 → 8)
    lambda cfg: (_p(cfg["field"]) < cfg["low"]) & (_c(cfg["field"]) > cfg["high"]),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) < cfg["low"]
    and c.get(cfg["field"]) > cfg["high"],
    lambda cfg: (
        f"(prev_{cfg['field']} < {cfg['low']} "
        f"AND {cfg['field']} > {cfg['high']})"
    ),
)

# ---------------------------------------------------------------------------
# prev-relative magnitude (turnover/money-flow surges)
# ---------------------------------------------------------------------------
register_custom(
    "ratio_vs_prev_gt",  # curr > prev * mult
    lambda cfg: _c(cfg["field"]) > _p(cfg["field"]) * cfg["mult"],
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and c.get(cfg["field"]) > _pv(p, cfg["field"]) * cfg["mult"],
    lambda cfg: f"({cfg['field']} > prev_{cfg['field']} * {cfg['mult']})",
)

register_custom(
    "approaching_below",  # curr < t AND prev > curr (closing in on S/R)
    lambda cfg: (_c(cfg["field"]) < cfg["threshold"])
    & (_p(cfg["field"]) > _c(cfg["field"])),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and c.get(cfg["field"]) < cfg["threshold"]
    and _pv(p, cfg["field"]) > c.get(cfg["field"]),
    lambda cfg: (
        f"({cfg['field']} < {cfg['threshold']} "
        f"AND prev_{cfg['field']} > {cfg['field']})"
    ),
)

# ---------------------------------------------------------------------------
# compound shapes (core pack: confluence, volume anomaly, money flow,
# SMC structure, strong MACD cross — rules/core/__init__.py)
# ---------------------------------------------------------------------------
register_custom(
    "confluence_momentum",  # zone-exit + fast/slow cross + mean drift
    # cfg: state_field, from_state, to_states, fast, slow, mean, up(bool)
    lambda cfg: (
        (_p(cfg["state_field"]) == cfg["from_state"])
        & _c(cfg["state_field"]).isin(list(cfg["to_states"]))
        & (
            (_p(cfg["fast"]) <= _p(cfg["slow"])) & (_c(cfg["fast"]) > _c(cfg["slow"]))
            if cfg["up"]
            else (_p(cfg["fast"]) >= _p(cfg["slow"]))
            & (_c(cfg["fast"]) < _c(cfg["slow"]))
        )
        & (
            (_c(cfg["mean"]) > _p(cfg["mean"]))
            if cfg["up"]
            else (_c(cfg["mean"]) < _p(cfg["mean"]))
        )
    ),
    lambda cfg, p, c: (
        _ok(
            _pv(p, cfg["state_field"]), c.get(cfg["state_field"]),
            _pv(p, cfg["fast"]), _pv(p, cfg["slow"]),
            c.get(cfg["fast"]), c.get(cfg["slow"]),
            _pv(p, cfg["mean"]), c.get(cfg["mean"]),
        )
        and _pv(p, cfg["state_field"]) == cfg["from_state"]
        and c.get(cfg["state_field"]) in cfg["to_states"]
        and (
            (_pv(p, cfg["fast"]) <= _pv(p, cfg["slow"]) and c[cfg["fast"]] > c[cfg["slow"]])
            if cfg["up"]
            else (
                _pv(p, cfg["fast"]) >= _pv(p, cfg["slow"]) and c[cfg["fast"]] < c[cfg["slow"]]
            )
        )
        and (
            c[cfg["mean"]] > _pv(p, cfg["mean"])
            if cfg["up"]
            else c[cfg["mean"]] < _pv(p, cfg["mean"])
        )
    ),
    lambda cfg: (
        f"(prev_{cfg['state_field']} = '{cfg['from_state']}'"
        f" AND {cfg['state_field']} IN ("
        + ", ".join(f"'{s}'" for s in cfg["to_states"])
        + ")"
        + (
            f" AND prev_{cfg['fast']} <= prev_{cfg['slow']}"
            f" AND {cfg['fast']} > {cfg['slow']}"
            f" AND {cfg['mean']} > prev_{cfg['mean']}"
            if cfg["up"]
            else f" AND prev_{cfg['fast']} >= prev_{cfg['slow']}"
            f" AND {cfg['fast']} < {cfg['slow']}"
            f" AND {cfg['mean']} < prev_{cfg['mean']}"
        )
        + ")"
    ),
)

register_custom(
    "and_gt",  # curr a > ta AND curr b > tb (whale extreme: ratio + risk)
    lambda cfg: (_c(cfg["field_a"]) > cfg["threshold_a"])
    & (_c(cfg["field_b"]) > cfg["threshold_b"]),
    lambda cfg, p, c: _ok(c.get(cfg["field_a"]), c.get(cfg["field_b"]))
    and c.get(cfg["field_a"]) > cfg["threshold_a"]
    and c.get(cfg["field_b"]) > cfg["threshold_b"],
    lambda cfg: (
        f"({cfg['field_a']} > {cfg['threshold_a']} "
        f"AND {cfg['field_b']} > {cfg['threshold_b']})"
    ),
)

register_custom(
    "lt_and_gt",  # curr a < ta AND curr b > tb (whale short + risk)
    lambda cfg: (_c(cfg["field_a"]) < cfg["threshold_a"])
    & (_c(cfg["field_b"]) > cfg["threshold_b"]),
    lambda cfg, p, c: _ok(c.get(cfg["field_a"]), c.get(cfg["field_b"]))
    and c.get(cfg["field_a"]) < cfg["threshold_a"]
    and c.get(cfg["field_b"]) > cfg["threshold_b"],
    lambda cfg: (
        f"({cfg['field_a']} < {cfg['threshold_a']} "
        f"AND {cfg['field_b']} > {cfg['threshold_b']})"
    ),
)

register_custom(
    "level_flip_with_streak",  # level crossing + streak condition
    # cfg: field, threshold, up(bool), streak_field, streak_min
    lambda cfg: (
        (
            (_p(cfg["field"]) < cfg["threshold"])
            & (_c(cfg["field"]) >= cfg["threshold"])
            & (_c(cfg["streak_field"]) >= cfg["streak_min"])
        )
        if cfg["up"]
        else (
            (_p(cfg["field"]) > cfg["threshold"])
            & (_c(cfg["field"]) <= cfg["threshold"])
            & (_c(cfg["streak_field"]) <= cfg["streak_min"])
        )
    ),
    lambda cfg, p, c: (
        _ok(_pv(p, cfg["field"]), c.get(cfg["field"]), c.get(cfg["streak_field"]))
        and (
            (
                _pv(p, cfg["field"]) < cfg["threshold"]
                and c[cfg["field"]] >= cfg["threshold"]
                and c[cfg["streak_field"]] >= cfg["streak_min"]
            )
            if cfg["up"]
            else (
                _pv(p, cfg["field"]) > cfg["threshold"]
                and c[cfg["field"]] <= cfg["threshold"]
                and c[cfg["streak_field"]] <= cfg["streak_min"]
            )
        )
    ),
    lambda cfg: (
        (
            f"(prev_{cfg['field']} < {cfg['threshold']} "
            f"AND {cfg['field']} >= {cfg['threshold']} "
            f"AND {cfg['streak_field']} >= {cfg['streak_min']})"
        )
        if cfg["up"]
        else (
            f"(prev_{cfg['field']} > {cfg['threshold']} "
            f"AND {cfg['field']} <= {cfg['threshold']} "
            f"AND {cfg['streak_field']} <= {cfg['streak_min']})"
        )
    ),
)

register_custom(
    "volume_surge",  # turnover doubling + price move + taker dominance
    # cfg: turnover, mult, change_field, change_gt|change_lt, taker, taker_gt|taker_lt
    lambda cfg: (
        (_c(cfg["turnover"]) > _p(cfg["turnover"]) * cfg["mult"])
        & (
            (_c(cfg["change_field"]) > cfg["change_gt"])
            if "change_gt" in cfg
            else (_c(cfg["change_field"]) < cfg["change_lt"])
        )
        & (
            (_c(cfg["taker"]) > cfg["taker_gt"])
            if "taker_gt" in cfg
            else (_c(cfg["taker"]) < cfg["taker_lt"])
        )
    ),
    lambda cfg, p, c: (
        _ok(_pv(p, cfg["turnover"]), c.get(cfg["turnover"]),
            c.get(cfg["change_field"]), c.get(cfg["taker"]))
        and c[cfg["turnover"]] > _pv(p, cfg["turnover"]) * cfg["mult"]
        and (
            c[cfg["change_field"]] > cfg["change_gt"]
            if "change_gt" in cfg
            else c[cfg["change_field"]] < cfg["change_lt"]
        )
        and (
            c[cfg["taker"]] > cfg["taker_gt"]
            if "taker_gt" in cfg
            else c[cfg["taker"]] < cfg["taker_lt"]
        )
    ),
    lambda cfg: "(" + " AND ".join(
        [
            f"{cfg['turnover']} > prev_{cfg['turnover']} * {cfg['mult']}",
            (
                f"{cfg['change_field']} > {cfg['change_gt']}"
                if "change_gt" in cfg
                else f"{cfg['change_field']} < {cfg['change_lt']}"
            ),
            (
                f"{cfg['taker']} > {cfg['taker_gt']}"
                if "taker_gt" in cfg
                else f"{cfg['taker']} < {cfg['taker_lt']}"
            ),
        ]
    ) + ")",
)

register_custom(
    "money_flow_surge",  # |flow| > share of turnover AND vs-prev doubling
    # cfg: flow, turnover, share, mult, positive(bool)
    lambda cfg: (
        (
            (_c(cfg["flow"]) > _c(cfg["turnover"]) * cfg["share"])
            & (_c(cfg["flow"]) > _p(cfg["flow"]) * cfg["mult"])
        )
        if cfg["positive"]
        else (
            (_c(cfg["flow"]) < -_c(cfg["turnover"]) * cfg["share"])
            & (_c(cfg["flow"]) < _p(cfg["flow"]) * cfg["mult"])
        )
    ),
    lambda cfg, p, c: (
        _ok(c.get(cfg["flow"]), c.get(cfg["turnover"]), _pv(p, cfg["flow"]))
        and (
            (
                c[cfg["flow"]] > c[cfg["turnover"]] * cfg["share"]
                and c[cfg["flow"]] > _pv(p, cfg["flow"]) * cfg["mult"]
            )
            if cfg["positive"]
            else (
                c[cfg["flow"]] < -c[cfg["turnover"]] * cfg["share"]
                and c[cfg["flow"]] < _pv(p, cfg["flow"]) * cfg["mult"]
            )
        )
    ),
    lambda cfg: (
        (
            f"({cfg['flow']} > {cfg['turnover']} * {cfg['share']} "
            f"AND {cfg['flow']} > prev_{cfg['flow']} * {cfg['mult']})"
        )
        if cfg["positive"]
        else (
            f"({cfg['flow']} < -{cfg['turnover']} * {cfg['share']} "
            f"AND {cfg['flow']} < prev_{cfg['flow']} * {cfg['mult']})"
        )
    ),
)

def _event_with_bias_col(cfg: dict) -> Column:
    hit = F.col(cfg["event_field"]).contains(cfg["needles"][0])
    for n in cfg["needles"][1:]:
        hit = hit | F.col(cfg["event_field"]).contains(n)
    cond = hit & (F.col(cfg["bias_field"]) == cfg["bias"])
    if "score_field" in cfg:
        cond = cond & (F.col(cfg["score_field"]) >= cfg["score_min"])
    return cond


def _event_with_bias_sql(cfg: dict) -> str:
    hit = " OR ".join(
        f"contains({cfg['event_field']}, '{n}')" for n in cfg["needles"]
    )
    parts = [f"({hit})", f"{cfg['bias_field']} = '{cfg['bias']}'"]
    if "score_field" in cfg:
        parts.append(f"{cfg['score_field']} >= {cfg['score_min']}")
    return "(" + " AND ".join(parts) + ")"


register_custom(
    "event_with_bias",  # event-string contains + bias label (+ min score)
    # cfg: event_field, needles, bias_field, bias, [score_field, score_min]
    _event_with_bias_col,
    lambda cfg, p, c: (
        c.get(cfg["event_field"]) is not None
        and any(n in c[cfg["event_field"]] for n in cfg["needles"])
        and c.get(cfg["bias_field"]) == cfg["bias"]
        and (
            "score_field" not in cfg
            or (
                c.get(cfg["score_field"]) is not None
                and c[cfg["score_field"]] >= cfg["score_min"]
            )
        )
    ),
    _event_with_bias_sql,
)

register_custom(
    "strong_line_cross",  # fast/slow cross with both on one side of zero
    # cfg: fast, slow, up(bool)
    lambda cfg: (
        (
            (_p(cfg["fast"]) <= _p(cfg["slow"]))
            & (_c(cfg["fast"]) > _c(cfg["slow"]))
            & (_c(cfg["fast"]) > 0)
            & (_c(cfg["slow"]) > 0)
        )
        if cfg["up"]
        else (
            (_p(cfg["fast"]) >= _p(cfg["slow"]))
            & (_c(cfg["fast"]) < _c(cfg["slow"]))
            & (_c(cfg["fast"]) < 0)
            & (_c(cfg["slow"]) < 0)
        )
    ),
    lambda cfg, p, c: (
        _ok(_pv(p, cfg["fast"]), _pv(p, cfg["slow"]),
            c.get(cfg["fast"]), c.get(cfg["slow"]))
        and (
            (
                _pv(p, cfg["fast"]) <= _pv(p, cfg["slow"])
                and c[cfg["fast"]] > c[cfg["slow"]]
                and c[cfg["fast"]] > 0
                and c[cfg["slow"]] > 0
            )
            if cfg["up"]
            else (
                _pv(p, cfg["fast"]) >= _pv(p, cfg["slow"])
                and c[cfg["fast"]] < c[cfg["slow"]]
                and c[cfg["fast"]] < 0
                and c[cfg["slow"]] < 0
            )
        )
    ),
    lambda cfg: (
        (
            f"(prev_{cfg['fast']} <= prev_{cfg['slow']} "
            f"AND {cfg['fast']} > {cfg['slow']} "
            f"AND {cfg['fast']} > 0 AND {cfg['slow']} > 0)"
        )
        if cfg["up"]
        else (
            f"(prev_{cfg['fast']} >= prev_{cfg['slow']} "
            f"AND {cfg['fast']} < {cfg['slow']} "
            f"AND {cfg['fast']} < 0 AND {cfg['slow']} < 0)"
        )
    ),
)

register_custom(
    "hist_flip_amplified",  # histogram flips sign and grows ≥ mult×
    # cfg: field, mult
    lambda cfg: (_p(cfg["field"]) < 0)
    & (_c(cfg["field"]) > 0)
    & (F.abs(_c(cfg["field"])) > F.abs(_p(cfg["field"])) * cfg["mult"]),
    lambda cfg, p, c: _ok(_pv(p, cfg["field"]), c.get(cfg["field"]))
    and _pv(p, cfg["field"]) < 0
    and c.get(cfg["field"]) > 0
    and abs(c[cfg["field"]]) > abs(_pv(p, cfg["field"])) * cfg["mult"],
    lambda cfg: (
        f"(prev_{cfg['field']} < 0 AND {cfg['field']} > 0 "
        f"AND ABS({cfg['field']}) > ABS(prev_{cfg['field']}) * {cfg['mult']})"
    ),
)
