"""The repo-wide cross-engine numeric quantizer.

A tiny leaf module (no intra-package imports) so every operator family —
analytics, dedup, search, profiling, quality, sampling, text,
decontaminate, streaming — can depend on it without coupling to the heavy
analytics module or risking import cycles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def grid_round(c: Column, decimals: int) -> Column:
    """The repo's SHARED cross-engine quantizer: round-half-AWAY-FROM-ZERO
    on the pure IEEE-double grid —

        x >= 0:  floor(x·10^d + 0.5) / 10^d
        x <  0: -floor(−x·10^d + 0.5) / 10^d

    Why not the engine's ``round()``: Spark rounds the double's
    SHORTEST-DECIMAL representation HALF_UP via BigDecimal while DuckDB
    rounds the BINARY value by scaling in double — they diverge (a) on
    values whose shortest-decimal lands exactly on the half-grid
    (hypothesis-falsified live: 99997.999929/6 → ...321 vs ...322) and
    (b) at MAGNITUDE past ~9e6·10^−d, where DuckDB's ``x·10^d`` loses
    ulps that BigDecimal keeps (falsified live on a 1.26e9 trapezoid
    term). This form is the SAME few IEEE ops in every engine, so it is
    bit-identical at any magnitude, and the sign split makes ties round
    away from zero — matching both engines' native tie direction (the
    r9 one-sided ``floor(x·s + 0.5)/s`` form rounded negative ties
    toward +inf, a user-visible deviation flagged by review). NULL in →
    NULL out (the comparison is NULL, so the ``otherwise`` branch's
    arithmetic on NULL yields NULL).

    Guarded at extreme magnitude: Spark's ``floor`` returns BIGINT, so for
    |x|·10^d ≥ 2^63 the long conversion would clamp while DuckDB's
    double-valued floor sails on (found by the r10 mechanism property
    test — a latent bug in the r9 one-sided sites too). Past
    |x| ≥ 2^62/10^d the grid spacing is far below ulp(x), quantization is
    a no-op, and both engines take the same identity branch on the same
    comparison. (Residual exposure: a downstream DECIMAL cast of such an
    unquantized huge double keeps the engine-native cast rounding — the
    structural fix at that tier is integer/decimal accumulation, as in
    twap_by_group.)
    """
    grid = float(10**decimals)
    lim = float(2**62) / grid
    pos = F.floor(c * grid + F.lit(0.5)) / grid
    neg = -(F.floor((-c) * grid + F.lit(0.5)) / grid)
    return F.when(F.abs(c) < lim, F.when(c >= 0, pos).otherwise(neg)).otherwise(c)


def grid_round_sql(expr: str, decimals: int) -> str:
    """The ANSI-SQL twin of `grid_round`, for oracle queries — the SAME
    IEEE ops (abs-compare / floor / negate), so any engine computes the
    identical double, including the same identity branch past the
    2^62/10^d magnitude guard. Kept as a string builder so every oracle
    stays in lockstep with the Spark expression by construction. The
    guard limit is emitted in scientific notation: DuckDB parses
    decimal-point literals through DECIMAL (double-rounding past 2^53)
    but e-notation literals through strtod, which is exact."""
    s = 10**decimals
    lim = float(2**62) / float(s)
    return (
        f"(CASE WHEN abs({expr}) < {lim:.17e} THEN "
        f"(CASE WHEN ({expr}) >= 0 THEN floor(({expr}) * {s}.0 + 0.5) / {s}.0 "
        f"ELSE -(floor(-({expr}) * {s}.0 + 0.5) / {s}.0) END) "
        f"ELSE ({expr}) END)"
    )


def dec_double(c: Column) -> Column:
    """Engine-identical DECIMAL → DOUBLE conversion via a string
    round-trip — the class fix for the second rounding in wide-decimal
    casts (found live by the brown_forsythe parity harness, r11):

    Spark casts DECIMAL to double through ``BigDecimal.doubleValue()`` —
    ONE correctly-rounded conversion of the true rational. DuckDB casts
    its int128-backed decimals as ``(double)int128`` THEN divides by
    ``10^scale`` — TWO roundings, which past ``scaled_int > 2^53`` can
    land one ulp away from the correctly-rounded double (measured:
    3378553576.3203125 at scale 18 → ``...a4001`` in DuckDB vs the exact
    ``...a4000``; the value IS representable). An ulp at magnitude ~4e9
    spans ~500 1e-9 grid steps, so grid_round does NOT absorb it.

    decimal→string is exact plain-digit notation in both engines, and
    string→double is correctly rounded in both (Java
    ``Double.parseDouble`` / DuckDB strtod-class fast_float), so the
    round-trip IS the correctly-rounded conversion everywhere. Apply to
    any decimal whose scaled integer can pass 2^53 (scale-18 second
    moments always; scale-9 sums past ~9e6); the frames involved are
    post-reduce (1-row/k-row), so the per-row string cost is nil."""
    return c.cast("string").cast("double")


def dec_double_sql(expr: str) -> str:
    """SQL twin of `dec_double` (the grid_round/grid_round_sql pairing
    discipline): VARCHAR round-trip instead of DuckDB's double-rounding
    int128 cast."""
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"
