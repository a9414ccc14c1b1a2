"""Full TA-Lib CDL candlestick-pattern set, re-derived in numpy.

The reference dispatches every TA-Lib "Pattern Recognition" function
over the tail and keeps the non-zero hits
(services/trading-service/src/indicators/batch/k_pattern.py:9-48,52-67).
This module re-derives all 61 CDL patterns from the PUBLIC TA-Lib
candle-setting definitions (ta_global.c defaults: BodyLong/BodyShort =
avg real body over 10 bars, BodyDoji = 0.1 x avg high-low over 10,
ShadowLong = 1x / ShadowVeryLong = 2x same-candle body, ShadowShort =
avg shadows over 10, ShadowVeryShort = 0.1 x avg high-low over 10,
Near = 0.2 / Far = 0.6 / Equal = 0.05 x avg high-low over 5) — pure
numpy, no talib dependency, structural conditions kept at the
documented thresholds.  Not guaranteed bit-parity with TA-Lib (the C
library iterates its averages slightly differently at series edges),
but every pattern fires on its canonical textbook shape, which is what
the reference's CONTAINS signal rules match on.

Directions follow TA-Lib's sign convention (+100 -> "bull",
-100 -> "bear"); always-positive shape patterns that the round-1 label
set already shipped keep their legacy direction (doji/harami/
spinning_top neutral, dragonfly bull, gravestone bear).
"""

from __future__ import annotations

import numpy as np

__all__ = ["Candles", "CDL_LABELS"]

# name -> max extra bars of history the detector needs (lookback)
CDL_LABELS = {
    "two_crows": 2, "three_black_crows": 3, "three_inside": 2,
    "three_line_strike": 3, "three_outside": 2,
    "three_stars_in_south": 2, "three_white_soldiers": 2,
    "abandoned_baby": 2, "advance_block": 2, "belt_hold": 0,
    "breakaway": 4, "closing_marubozu": 0,
    "concealing_baby_swallow": 3, "counterattack": 1,
    "dark_cloud_cover": 1, "doji": 0, "doji_star": 1,
    "dragonfly_doji": 0, "bullish_engulfing": 1, "bearish_engulfing": 1,
    "evening_doji_star": 2, "evening_star": 2, "gap_side_side_white": 2,
    "gravestone_doji": 0, "hammer": 1, "hanging_man": 1, "harami": 1,
    "harami_cross": 1, "high_wave": 0, "hikkake": 2, "hikkake_mod": 3,
    "homing_pigeon": 1, "identical_three_crows": 2, "in_neck": 1,
    "inverted_hammer": 1, "kicking": 1, "kicking_by_length": 1,
    "ladder_bottom": 4, "long_legged_doji": 0, "long_line": 0,
    "marubozu": 0, "mat_hold": 4, "matching_low": 1,
    "morning_doji_star": 2, "morning_star": 2, "on_neck": 1,
    "piercing": 1, "rickshaw_man": 0, "rise_fall_three_methods": 4,
    "separating_lines": 1, "shooting_star": 1, "short_line": 0,
    "spinning_top": 0, "stalled_pattern": 2, "stick_sandwich": 2,
    "takuri": 0, "tasuki_gap": 2, "thrusting": 1, "tristar": 2,
    "unique_three_river": 2, "upside_gap_two_crows": 2,
    "xside_gap_three_methods": 2,
}

# TA-Lib candle settings: name -> (range kind, avg period, factor)
_SETTINGS = {
    "body_long": ("body", 10, 1.0),
    "body_very_long": ("body", 10, 3.0),
    "body_short": ("body", 10, 1.0),
    "body_doji": ("hl", 10, 0.1),
    "shadow_long": ("body", 0, 1.0),
    "shadow_very_long": ("body", 0, 2.0),
    "shadow_short": ("shadows", 10, 1.0),
    "shadow_very_short": ("hl", 10, 0.1),
    "near": ("hl", 5, 0.2),
    "far": ("hl", 5, 0.6),
    "equal": ("hl", 5, 0.05),
}


class Candles:
    """Precomputed per-tail candle geometry + TA-Lib-style averages.

    Build once per (symbol, interval) tail, then ``detect(i)`` is O(61)
    per bar — the engine calls it for the last bar (labels) and the last
    20 bars (pattern count), so per-group cost is bounded regardless of
    history length.
    """

    def __init__(self, o, h, l, c):  # noqa: E741 - l is the OHLC low
        self.o, self.h, self.l, self.c = (
            np.asarray(x, dtype=float) for x in (o, h, l, c)
        )
        self.body = np.abs(self.c - self.o)
        self.hl = self.h - self.l
        self.tops = np.maximum(self.o, self.c)
        self.bots = np.minimum(self.o, self.c)
        self.upsh = self.h - self.tops
        self.losh = self.bots - self.l
        self.white = self.c > self.o
        self.black = self.c < self.o
        kinds = {
            "body": self.body,
            "hl": self.hl,
            "shadows": self.upsh + self.losh,
        }
        # prefix sums for O(1) trailing means
        self._cum = {k: np.concatenate(([0.0], np.cumsum(v)))
                     for k, v in kinds.items()}
        self._kinds = kinds
        self._thr_cache: dict[str, np.ndarray] = {}

    def _thr(self, setting: str) -> np.ndarray:
        """The full threshold series for one setting, built lazily ONCE
        per instance (r15: ``avg`` was ~25% of the detect budget at
        ~550k scalar calls per 1050 groups; the vectorized form runs the
        identical per-element ops — (cum[i]-cum[i-n])/n, same shadows
        halving and factor order — so every value is bit-equal)."""
        arr = self._thr_cache.get(setting)
        if arr is None:
            kind, period, factor = _SETTINGS[setting]
            k = self._kinds[kind]
            if period <= 0:
                base = k.astype(float, copy=True)
            else:
                idx = np.arange(len(k))
                n = np.minimum(period, idx)
                cum = self._cum[kind]
                with np.errstate(invalid="ignore", divide="ignore"):
                    base = (cum[idx] - cum[idx - n]) / n
                if len(k):
                    base[0] = k[0]  # no history: the candle's own range
            if kind == "shadows":
                base = base / 2.0
            arr = factor * base
            self._thr_cache[setting] = arr
        return arr

    def avg(self, setting: str, i: int) -> float:
        """factor x trailing mean of the setting's range kind over the
        avgPeriod bars strictly BEFORE i (TA-Lib's rolling total); falls
        back to the candle's own range when the period is 0 or there is
        no history, and halves the Shadows kind (two shadows per bar)."""
        return self._thr(setting)[i]

    # -- geometry predicates (TA-Lib macro equivalents) -----------------
    def long_body(self, i):
        return self.body[i] > self.avg("body_long", i)

    def short_body(self, i):
        return self.body[i] < self.avg("body_short", i)

    def doji_body(self, i):
        return self.body[i] <= self.avg("body_doji", i)

    def tiny_up(self, i):
        return self.upsh[i] < self.avg("shadow_very_short", i)

    def tiny_lo(self, i):
        return self.losh[i] < self.avg("shadow_very_short", i)

    def long_up(self, i):
        return self.upsh[i] > self.avg("shadow_long", i)

    def long_lo(self, i):
        return self.losh[i] > self.avg("shadow_long", i)

    def vlong_up(self, i):
        return self.upsh[i] > self.avg("shadow_very_long", i)

    def vlong_lo(self, i):
        return self.losh[i] > self.avg("shadow_very_long", i)

    def short_up(self, i):
        return self.upsh[i] < self.avg("shadow_short", i)

    def short_lo(self, i):
        return self.losh[i] < self.avg("shadow_short", i)

    def near(self, i):
        return self.avg("near", i)

    def far(self, i):
        return self.avg("far", i)

    def eq(self, i):
        return self.avg("equal", i)

    def rb_gap_up(self, i2, i1):
        return self.bots[i2] > self.tops[i1]

    def rb_gap_down(self, i2, i1):
        return self.tops[i2] < self.bots[i1]

    def gap_up(self, i2, i1):
        return self.l[i2] > self.h[i1]

    def gap_down(self, i2, i1):
        return self.h[i2] < self.l[i1]

    def in_body(self, x, i):
        """x lies strictly within candle i's real body."""
        return self.bots[i] < x < self.tops[i]

    def marubozu_ish(self, i):
        return self.long_body(i) and self.tiny_up(i) and self.tiny_lo(i)

    # -- the 61 detectors ------------------------------------------------
    def detect(self, i: int) -> list[tuple[str, str]]:
        """All CDL patterns firing at bar ``i`` (multi-bar first)."""
        out: list[tuple[str, str]] = []
        o, h, l, c = self.o, self.h, self.l, self.c  # noqa: E741
        body, tops, bots = self.body, self.tops, self.bots
        upsh, losh = self.upsh, self.losh
        white, black = self.white, self.black
        hit = out.append

        # ---- five-bar ----
        if i >= 4:
            # CDLBREAKAWAY: 4 same-color bars accelerating away after a
            # body gap, 5th opposite closing back inside the gap
            if (black[i - 4] and self.long_body(i - 4)
                    and black[i - 3] and self.rb_gap_down(i - 3, i - 4)
                    and bots[i - 2] < bots[i - 3]
                    and black[i - 1] and c[i - 1] < c[i - 2]
                    and white[i]
                    and tops[i - 3] < c[i] < bots[i - 4]):
                hit(("breakaway", "bull"))
            elif (white[i - 4] and self.long_body(i - 4)
                    and white[i - 3] and self.rb_gap_up(i - 3, i - 4)
                    and tops[i - 2] > tops[i - 3]
                    and white[i - 1] and c[i - 1] > c[i - 2]
                    and black[i]
                    and tops[i - 4] < c[i] < bots[i - 3]):
                hit(("breakaway", "bear"))
            # CDLLADDERBOTTOM: 3 stair-stepping black bars, a 4th black
            # with an upper shadow, then a white opening above its open
            if (all(black[j] for j in range(i - 4, i))
                    and o[i - 3] < o[i - 4] and o[i - 2] < o[i - 3]
                    and c[i - 3] < c[i - 4] and c[i - 2] < c[i - 3]
                    and not self.tiny_up(i - 1)
                    and white[i] and o[i] > o[i - 1]):
                hit(("ladder_bottom", "bull"))
            # CDLMATHOLD: long white, gap up, 3 small bars holding above
            # the white's midpoint, then a white close at a new high
            mid4 = c[i - 4] - 0.5 * body[i - 4]
            if (white[i - 4] and self.long_body(i - 4)
                    and self.rb_gap_up(i - 3, i - 4)
                    and all(self.short_body(j) for j in range(i - 3, i))
                    and min(bots[i - 3:i]) > mid4
                    and white[i] and o[i] > c[i - 1]
                    and c[i] > max(h[i - 3:i])):
                hit(("mat_hold", "bull"))
            # CDLRISEFALL3METHODS: long bar, 3 small counter-trend bars
            # inside its range, long bar resuming the trend
            smalls_in = (
                all(self.short_body(j) for j in range(i - 3, i))
                and max(h[i - 3:i]) < h[i - 4]
                and min(l[i - 3:i]) > l[i - 4]
            )
            if (white[i - 4] and self.long_body(i - 4) and smalls_in
                    and all(black[j] for j in range(i - 3, i))
                    and c[i - 3] > c[i - 2] > c[i - 1]
                    and white[i] and self.long_body(i)
                    and o[i] > c[i - 1] and c[i] > c[i - 4]):
                hit(("rise_fall_three_methods", "bull"))
            elif (black[i - 4] and self.long_body(i - 4) and smalls_in
                    and all(white[j] for j in range(i - 3, i))
                    and c[i - 3] < c[i - 2] < c[i - 1]
                    and black[i] and self.long_body(i)
                    and o[i] < c[i - 1] and c[i] < c[i - 4]):
                hit(("rise_fall_three_methods", "bear"))

        # ---- four-bar ----
        if i >= 3:
            # CDLCONCEALBABYSWALL: two black marubozu, a black gapping
            # down whose upper shadow re-enters, fully swallowed by a 4th
            if (all(black[j] for j in (i - 3, i - 2, i - 1, i))
                    and self.marubozu_ish(i - 3) and self.marubozu_ish(i - 2)
                    and self.rb_gap_down(i - 1, i - 2)
                    and h[i - 1] > c[i - 2]
                    and h[i] >= h[i - 1] and c[i] < l[i - 1]):
                hit(("concealing_baby_swallow", "bull"))
            # CDL3LINESTRIKE: 3 same-color advancing bars, 4th opposite
            # engulfing all three bodies
            if (all(white[j] for j in (i - 3, i - 2, i - 1))
                    and c[i - 3] < c[i - 2] < c[i - 1]
                    and bots[i - 3] - self.near(i - 3) <= o[i - 2]
                    <= tops[i - 3] + self.near(i - 3)
                    and bots[i - 2] - self.near(i - 2) <= o[i - 1]
                    <= tops[i - 2] + self.near(i - 2)
                    and black[i] and o[i] > c[i - 1] and c[i] < o[i - 3]):
                hit(("three_line_strike", "bull"))
            elif (all(black[j] for j in (i - 3, i - 2, i - 1))
                    and c[i - 3] > c[i - 2] > c[i - 1]
                    and bots[i - 3] - self.near(i - 3) <= o[i - 2]
                    <= tops[i - 3] + self.near(i - 3)
                    and bots[i - 2] - self.near(i - 2) <= o[i - 1]
                    <= tops[i - 2] + self.near(i - 2)
                    and white[i] and o[i] < c[i - 1] and c[i] > o[i - 3]):
                hit(("three_line_strike", "bear"))
            # CDL3BLACKCROWS: white bar then three black stair-steps with
            # bare lower shadows, each opening within the prior body
            if (white[i - 3]
                    and all(black[j] for j in (i - 2, i - 1, i))
                    and all(self.tiny_lo(j) for j in (i - 2, i - 1, i))
                    and c[i - 2] > c[i - 1] > c[i]
                    and c[i - 2] < o[i - 1] < o[i - 2]
                    and c[i - 1] < o[i] < o[i - 1]):
                hit(("three_black_crows", "bear"))
            # CDLHIKKAKEMOD: inside bar closing at its extreme, then the
            # false break of the inside bar's range
            if (h[i - 1] < h[i - 2] and l[i - 1] > l[i - 2]):
                if (c[i - 1] <= l[i - 1] + self.near(i - 1)
                        and h[i] < h[i - 1] and l[i] < l[i - 1]):
                    hit(("hikkake_mod", "bull"))
                elif (c[i - 1] >= h[i - 1] - self.near(i - 1)
                        and h[i] > h[i - 1] and l[i] > l[i - 1]):
                    hit(("hikkake_mod", "bear"))

        # ---- three-bar ----
        if i >= 2:
            long2, long1 = self.long_body(i - 2), self.long_body(i - 1)
            # CDL3WHITESOLDIERS / CDL3BLACKCROWS' mirror conditions
            if (all(white[j] for j in (i - 2, i - 1, i))
                    and all(self.tiny_up(j) for j in (i - 2, i - 1, i))
                    and c[i - 2] < c[i - 1] < c[i]
                    and o[i - 2] < o[i - 1] < c[i - 2] + self.near(i - 2)
                    and o[i - 1] < o[i] < c[i - 1] + self.near(i - 1)
                    and body[i - 1] > body[i - 2] - self.near(i - 2)
                    and body[i] > body[i - 1] - self.near(i - 1)):
                hit(("three_white_soldiers", "bull"))
            # CDLADVANCEBLOCK: three whites stalling — shrinking bodies,
            # growing upper shadows
            elif (all(white[j] for j in (i - 2, i - 1, i))
                    and c[i - 2] < c[i - 1] < c[i]
                    and o[i - 2] < o[i - 1] < c[i - 2]
                    and o[i - 1] < o[i] < c[i - 1]
                    and self.long_body(i - 2)
                    and body[i - 1] < body[i - 2] - self.far(i - 2)
                    and body[i] < body[i - 1] + self.near(i - 1)
                    and (not self.short_up(i) or not self.short_up(i - 1))):
                hit(("advance_block", "bear"))
            # CDLSTALLEDPATTERN: two long whites then a small white
            # riding the top of the advance
            elif (all(white[j] for j in (i - 2, i - 1, i))
                    and c[i - 2] < c[i - 1] < c[i]
                    and long2 and long1 and self.tiny_up(i - 1)
                    and o[i - 1] < o[i - 2] + body[i - 2]
                    and self.short_body(i)
                    and o[i] >= c[i - 1] - body[i] - self.near(i - 1)):
                hit(("stalled_pattern", "bear"))
            # CDL3INSIDE: harami then confirmation through the first open
            contained1 = (tops[i - 1] < tops[i - 2]
                          and bots[i - 1] > bots[i - 2])
            if long2 and self.short_body(i - 1) and contained1:
                if black[i - 2] and white[i] and c[i] > o[i - 2]:
                    hit(("three_inside", "bull"))
                elif white[i - 2] and black[i] and c[i] < o[i - 2]:
                    hit(("three_inside", "bear"))
            # CDL3OUTSIDE: engulfing then continuation
            if (white[i - 1] and black[i - 2]
                    and c[i - 1] > o[i - 2] and o[i - 1] < c[i - 2]
                    and c[i] > c[i - 1]):
                hit(("three_outside", "bull"))
            elif (black[i - 1] and white[i - 2]
                    and c[i - 1] < o[i - 2] and o[i - 1] > c[i - 2]
                    and c[i] < c[i - 1]):
                hit(("three_outside", "bear"))
            # CDL3STARSINSOUTH: exhausting black sequence at a low
            if (black[i - 2] and long2 and self.long_lo(i - 2)
                    and black[i - 1] and body[i - 1] < body[i - 2]
                    and c[i - 2] < o[i - 1] < o[i - 2]
                    and l[i - 1] > l[i - 2] and not self.tiny_lo(i - 1)
                    and black[i] and self.short_body(i)
                    and self.tiny_lo(i) and self.tiny_up(i)
                    and l[i] >= l[i - 1] and h[i] <= h[i - 1]):
                hit(("three_stars_in_south", "bull"))
            # CDLIDENTICAL3CROWS: three blacks, each opening at the
            # prior close
            if (all(black[j] for j in (i - 2, i - 1, i))
                    and c[i - 2] > c[i - 1] > c[i]
                    and abs(o[i - 1] - c[i - 2]) <= self.eq(i - 2)
                    and abs(o[i] - c[i - 1]) <= self.eq(i - 1)):
                hit(("identical_three_crows", "bear"))
            # CDL2CROWS / CDLUPSIDEGAP2CROWS
            if (white[i - 2] and long2
                    and black[i - 1] and self.rb_gap_up(i - 1, i - 2)
                    and black[i]):
                if (c[i - 1] < o[i] < o[i - 1]
                        and o[i - 2] < c[i] < c[i - 2]):
                    hit(("two_crows", "bear"))
                if (o[i] > o[i - 1] and c[i] < c[i - 1]
                        and c[i] > c[i - 2]):
                    hit(("upside_gap_two_crows", "bear"))
            # morning / evening stars (+ doji variants)
            if black[i - 2] and long2 and self.rb_gap_down(i - 1, i - 2):
                deep = c[i] > c[i - 2] + 0.3 * body[i - 2]
                if white[i] and deep:
                    if self.doji_body(i - 1):
                        hit(("morning_doji_star", "bull"))
                    elif self.short_body(i - 1):
                        hit(("morning_star", "bull"))
            if white[i - 2] and long2 and self.rb_gap_up(i - 1, i - 2):
                deep = c[i] < c[i - 2] - 0.3 * body[i - 2]
                if black[i] and deep:
                    if self.doji_body(i - 1):
                        hit(("evening_doji_star", "bear"))
                    elif self.short_body(i - 1):
                        hit(("evening_star", "bear"))
            # CDLABANDONEDBABY: doji island with full shadow gaps
            if self.doji_body(i - 1):
                if (black[i - 2] and long2 and self.gap_down(i - 1, i - 2)
                        and white[i] and self.gap_up(i, i - 1)
                        and c[i] > c[i - 2] + 0.3 * body[i - 2]):
                    hit(("abandoned_baby", "bull"))
                elif (white[i - 2] and long2 and self.gap_up(i - 1, i - 2)
                        and black[i] and self.gap_down(i, i - 1)
                        and c[i] < c[i - 2] - 0.3 * body[i - 2]):
                    hit(("abandoned_baby", "bear"))
            # CDLTRISTAR: three dojis, middle body-gapped away
            if (self.doji_body(i - 2) and self.doji_body(i - 1)
                    and self.doji_body(i)):
                if (self.rb_gap_up(i - 1, i - 2)
                        and tops[i] < tops[i - 1]):
                    hit(("tristar", "bear"))
                elif (self.rb_gap_down(i - 1, i - 2)
                        and bots[i] > bots[i - 1]):
                    hit(("tristar", "bull"))
            # CDLUNIQUE3RIVER: black harami digging a new low, then a
            # small white at the bottom
            if (black[i - 2] and long2 and black[i - 1]
                    and o[i - 1] < o[i - 2] and c[i - 1] > c[i - 2]
                    and l[i - 1] < l[i - 2]
                    and white[i] and self.short_body(i)
                    and o[i] > l[i - 1] and c[i] < c[i - 1]):
                hit(("unique_three_river", "bull"))
            # CDLSTICKSANDWICH: black, white trading above, black
            # matching the first close
            if (black[i - 2] and white[i - 1] and l[i - 1] > c[i - 2]
                    and black[i]
                    and abs(c[i] - c[i - 2]) <= self.eq(i - 2)):
                hit(("stick_sandwich", "bull"))
            # CDLTASUKIGAP: gap, same-direction bar, counter bar closing
            # inside the (unfilled) gap
            near1 = self.near(i - 1)
            if (self.rb_gap_up(i - 1, i - 2) and white[i - 1] and black[i]
                    and self.in_body(o[i], i - 1)
                    and tops[i - 2] < c[i] < bots[i - 1]
                    and abs(body[i] - body[i - 1]) < near1):
                hit(("tasuki_gap", "bull"))
            elif (self.rb_gap_down(i - 1, i - 2) and black[i - 1]
                    and white[i]
                    and self.in_body(o[i], i - 1)
                    and bots[i - 2] > c[i] > tops[i - 1]
                    and abs(body[i] - body[i - 1]) < near1):
                hit(("tasuki_gap", "bear"))
            # CDLGAPSIDESIDEWHITE: two similar whites gapped together
            if (white[i - 1] and white[i]
                    and abs(body[i] - body[i - 1]) < near1
                    and abs(o[i] - o[i - 1]) < near1):
                if (self.rb_gap_up(i - 1, i - 2)
                        and self.rb_gap_up(i, i - 2)):
                    hit(("gap_side_side_white", "bull"))
                elif (self.rb_gap_down(i - 1, i - 2)
                        and self.rb_gap_down(i, i - 2)):
                    hit(("gap_side_side_white", "bear"))
            # CDLXSIDEGAP3METHODS: gap then a counter bar filling it
            if (self.rb_gap_up(i - 1, i - 2)
                    and white[i - 2] and white[i - 1] and black[i]
                    and self.in_body(o[i], i - 1)
                    and self.in_body(c[i], i - 2)):
                hit(("xside_gap_three_methods", "bull"))
            elif (self.rb_gap_down(i - 1, i - 2)
                    and black[i - 2] and black[i - 1] and white[i]
                    and self.in_body(o[i], i - 1)
                    and self.in_body(c[i], i - 2)):
                hit(("xside_gap_three_methods", "bear"))
            # CDLHIKKAKE: false break of an inside bar
            if h[i - 1] < h[i - 2] and l[i - 1] > l[i - 2]:
                if h[i] < h[i - 1] and l[i] < l[i - 1]:
                    hit(("hikkake", "bull"))
                elif h[i] > h[i - 1] and l[i] > l[i - 1]:
                    hit(("hikkake", "bear"))

        # ---- two-bar ----
        if i >= 1:
            long1 = self.long_body(i - 1)
            eq1 = self.eq(i - 1)
            # engulfing (legacy split labels keep the rule-pack substring)
            if (white[i] and black[i - 1]
                    and c[i] >= o[i - 1] and o[i] <= c[i - 1]
                    and (c[i] > o[i - 1] or o[i] < c[i - 1])):
                hit(("bullish_engulfing", "bull"))
            elif (black[i] and white[i - 1]
                    and c[i] <= o[i - 1] and o[i] >= c[i - 1]
                    and (c[i] < o[i - 1] or o[i] > c[i - 1])):
                hit(("bearish_engulfing", "bear"))
            contained = (tops[i] < tops[i - 1] and bots[i] > bots[i - 1])
            if long1 and contained:
                if self.doji_body(i):
                    hit(("harami_cross",
                         "bull" if black[i - 1] else "bear"))
                elif self.short_body(i):
                    hit(("harami", "neutral"))
            # CDLDOJISTAR
            if long1 and self.doji_body(i):
                if white[i - 1] and self.rb_gap_up(i, i - 1):
                    hit(("doji_star", "bear"))
                elif black[i - 1] and self.rb_gap_down(i, i - 1):
                    hit(("doji_star", "bull"))
            # piercing / dark cloud cover
            if (black[i - 1] and long1 and white[i] and self.long_body(i)
                    and o[i] < l[i - 1]
                    and c[i - 1] + 0.5 * body[i - 1] < c[i] < o[i - 1]):
                hit(("piercing", "bull"))
            if (white[i - 1] and long1 and black[i]
                    and o[i] > h[i - 1]
                    and o[i - 1] < c[i] < c[i - 1] - 0.5 * body[i - 1]):
                hit(("dark_cloud_cover", "bear"))
            # neck-line family (black downtrend bar, white reply below)
            if black[i - 1] and long1 and white[i] and o[i] < l[i - 1]:
                if abs(c[i] - l[i - 1]) <= eq1:
                    hit(("on_neck", "bear"))
                elif c[i - 1] <= c[i] <= c[i - 1] + eq1:
                    hit(("in_neck", "bear"))
                elif (c[i] > c[i - 1] + eq1
                        and c[i] <= c[i - 1] + 0.5 * body[i - 1]):
                    hit(("thrusting", "bear"))
            # CDLCOUNTERATTACK
            if (white[i - 1] != white[i] and long1 and self.long_body(i)
                    and abs(c[i] - c[i - 1]) <= eq1):
                hit(("counterattack", "bull" if white[i] else "bear"))
            # CDLSEPARATINGLINES: equal opens, opposite colors, belt-hold
            if (white[i - 1] != white[i]
                    and abs(o[i] - o[i - 1]) <= eq1
                    and self.long_body(i)
                    and (self.tiny_lo(i) if white[i] else self.tiny_up(i))):
                hit(("separating_lines", "bull" if white[i] else "bear"))
            # CDLMATCHINGLOW / CDLHOMINGPIGEON
            if (black[i - 1] and black[i]
                    and abs(c[i] - c[i - 1]) <= eq1):
                hit(("matching_low", "bull"))
            if (black[i - 1] and long1 and black[i] and self.short_body(i)
                    and o[i] < o[i - 1] and c[i] > c[i - 1]):
                hit(("homing_pigeon", "bull"))
            # kicking marubozu pair
            if (self.marubozu_ish(i - 1) and self.marubozu_ish(i)
                    and white[i - 1] != white[i]):
                kick = None
                if black[i - 1] and white[i] and self.gap_up(i, i - 1):
                    kick = "bull"
                elif white[i - 1] and black[i] and self.gap_down(i, i - 1):
                    kick = "bear"
                if kick:
                    hit(("kicking", kick))
                    longer = i if body[i] > body[i - 1] else i - 1
                    hit(("kicking_by_length",
                         "bull" if white[longer] else "bear"))
            # hammer family (position vs previous bar gives the trend)
            if (self.short_body(i) and self.long_lo(i)
                    and self.tiny_up(i)):
                if bots[i] <= l[i - 1] + self.near(i - 1):
                    hit(("hammer", "bull"))
                if bots[i] >= h[i - 1] - self.near(i - 1):
                    hit(("hanging_man", "bear"))
            if (self.short_body(i) and self.long_up(i)
                    and self.tiny_lo(i)):
                if self.rb_gap_down(i, i - 1):
                    hit(("inverted_hammer", "bull"))
                if self.rb_gap_up(i, i - 1):
                    hit(("shooting_star", "bear"))

        # ---- one-bar ----
        if self.doji_body(i):
            if self.tiny_up(i) and not self.tiny_lo(i):
                hit(("dragonfly_doji", "bull"))
                if self.vlong_lo(i):
                    hit(("takuri", "bull"))
            elif self.tiny_lo(i) and not self.tiny_up(i):
                hit(("gravestone_doji", "bear"))
            else:
                hit(("doji", "neutral"))
            if self.long_lo(i) or self.long_up(i):
                hit(("long_legged_doji", "neutral"))
            if (self.long_lo(i) and self.long_up(i)
                    and abs((self.bots[i] + self.tops[i]) / 2.0
                            - (h[i] + l[i]) / 2.0) <= self.near(i)):
                hit(("rickshaw_man", "neutral"))
        color = "bull" if white[i] else "bear"
        if self.marubozu_ish(i):
            hit(("marubozu", color))
        elif self.long_body(i):
            if self.tiny_up(i) if white[i] else self.tiny_lo(i):
                hit(("closing_marubozu", color))
            if self.tiny_lo(i) if white[i] else self.tiny_up(i):
                hit(("belt_hold", color))
            if self.short_up(i) and self.short_lo(i):
                hit(("long_line", color))
        elif self.short_body(i) and not self.doji_body(i):
            if self.short_up(i) and self.short_lo(i):
                hit(("short_line", color))
            if upsh[i] > body[i] and losh[i] > body[i]:
                hit(("spinning_top", "neutral"))
            if self.vlong_up(i) and self.vlong_lo(i):
                hit(("high_wave", color))
        return out
