"""Per-group model scoring via ``groupBy().applyInPandas`` (SURVEY.md §2.10
[EXT] — the grouped-map Arrow path, reserved there for model-shaped logic that
built-in expressions can't reach).

Pattern notes for the 100 TB path:
- Each group must fit one executor's memory (Arrow materializes the whole
  group as a pandas frame). Group by bounded-cardinality keys (lang, source,
  label) — NEVER by a key whose largest group scales with the corpus.
- One shuffle on the group key, then pure vectorized numpy per group; the
  model output is a single row per group, so the post-stage is negligible.
- Parity discipline: with INTEGER features the OLS normal-equation sums are
  exact int64s; the only floating-point steps are the final divisions, which
  are single IEEE-754 ops any engine reproduces bit-for-bit. That keeps even
  this Python-side operator value-verifiable against a SQL oracle — the same
  rule functions/parity.py applies to decimal money sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_fit_per_group(
    df: DataFrame, keys: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Per-group ordinary-least-squares fit y ~ a + b*x over integer columns.

    Returns one row per group: keys + n (long), slope, intercept (double).
    Groups with a degenerate design (n < 2 or constant x) get NULL slope and
    intercept. Sums are exact (int64) so results are engine-reproducible.
    """
    import pandas as pd

    key_schema = ", ".join(f"{k} string" for k in keys)
    out_schema = f"{key_schema}, n long, slope double, intercept double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype("int64")
        y = pdf[y_col].astype("int64")
        n = int(len(pdf))
        # numpy int64 sums WRAP silently on overflow — the exactness claim
        # would break without a diagnostic (r10 review).  The worst-case
        # bound n * max|x| * max|y| is exact Python-int arithmetic; fail
        # loudly instead of returning a wrapped (wrong) fit.
        mx = int(x.abs().max()) if n else 0
        my = int(y.abs().max()) if n else 0
        if n * max(mx * mx, mx * my, mx, my) >= 2**63:
            raise ValueError(
                f"ols_fit_per_group: group of {n} rows with |x|<={mx}, "
                f"|y|<={my} can overflow int64 sums; rescale the features"
            )
        sx, sy = int(x.sum()), int(y.sum())
        sxy, sxx = int((x * y).sum()), int((x * x).sum())
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            slope = intercept = None
        else:
            # Exact integer numerator/denominator; ONE double division each,
            # then IEEE mul/sub/div — identical on any engine.
            slope = float(n * sxy - sx * sy) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n)
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update({"n": n, "slope": slope, "intercept": intercept})
        return pd.DataFrame([row])

    return (
        df.select(*keys, x_col, y_col)
        .groupBy(*keys)
        .applyInPandas(fit, out_schema)
    )
