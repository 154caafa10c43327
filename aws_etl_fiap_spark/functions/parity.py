"""Engine-agnostic numeric expressions: identical bits on Spark and DuckDB.

Why this exists: the correctness gate hashes values EXACTLY, but engine
built-ins disagree on edge cases —

- ``ROUND(double, 2)``: Spark rounds HALF_UP on the shortest decimal
  representation (java BigDecimal.valueOf), DuckDB on the scaled double
  (``round(x*100)/100``-style). A product like 13016.75 * 0.94 = 12235.745
  rounds to 12235.75 on one engine and 12235.74 on the other.
- ``SUM(double)``: summation order differs, so results differ in last ulps;
  rounding the sum just moves the disagreement to the rounding boundary.

The fixes, all pure IEEE-754 arithmetic or exact decimal arithmetic, which
both engines implement identically:

- ``round_half_up(x, s)`` = ``FLOOR(x * 10^s + 0.5) / 10^s`` — identical
  multiply/add/floor/divide on identical doubles gives identical doubles.
  (Semantics: round half toward +inf; equals HALF_UP for non-negatives.)
- ``dec_sum(x, s)`` — sum in ``DECIMAL(38, s)`` (exact, order-independent),
  then cast to double. Correct whenever x is a fixed-point value with <= s
  decimal digits (our money columns: prices 2, price*(1-disc) 4, charge 6).
- ``dec_avg(x, s)`` — exact decimal sum divided by the non-null count in
  double; both operands identical => identical quotient.

Each helper has a ``sql_*`` twin that renders the same expression for the
DuckDB oracle, so both sides are generated from one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def round_half_up(x: Column | str, scale: int = 2) -> Column:
    """Parity-safe round-half-up(-toward-+inf) to ``scale`` decimals."""
    p = float(10**scale)
    return F.floor(_as_col(x) * p + 0.5) / p


def sql_round_half_up(expr: str, scale: int = 2) -> str:
    p = float(10**scale)
    return f"FLOOR(({expr}) * {p} + 0.5) / {p}"


def dec_sum(x: Column | str, scale: int) -> Column:
    """Exact decimal sum of a fixed-point double column, output as double."""
    return F.sum(_as_col(x).cast(f"decimal(38,{scale})")).cast("double")


def sql_dec_sum(expr: str, scale: int) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def dec_avg(x: Column | str, scale: int) -> Column:
    """Exact-sum average: decimal sum (as double) / non-null count."""
    c = _as_col(x)
    return dec_sum(c, scale) / F.count(c)


def sql_dec_avg(expr: str, scale: int) -> str:
    return f"{sql_dec_sum(expr, scale)} / COUNT({expr})"
