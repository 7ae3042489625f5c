"""Dividend features (reference `engineering/dividend_features.py`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def yield_vs_median(
    ratios: DataFrame,
    lookback_years: int = 5,
    grace_days: int = 90,
    by: str = "ticker",
    out: str = "yield_vs_median",
    date_col: str = "date",
    value_col: str = "dividendYield",
) -> DataFrame:
    """(current - median)/median of positive yields within
    [end - lookback_years - grace, end] per key (ref
    compute_yield_vs_median, dividend_features.py:5-31):

      * current = last positive yield in the window;
      * median over the same filtered window (exact);
      * 0.0 when median == 0; null when <2 rows or window empty.

    Year shift uses add_months(-12*y) (ref uses date.replace(year-y),
    which is identical except on Feb 29 where replace() raises —
    SURVEY §7 calendar note).
    """
    w_end = ratios.groupBy(by).agg(
        F.max(date_col).alias("_end"), F.count(F.lit(1)).alias("_n")
    )
    joined = ratios.join(w_end, by)
    lower = F.date_sub(F.add_months(F.col("_end"), -12 * lookback_years), grace_days)
    filtered = joined.where(
        (F.col(date_col) >= lower)
        & (F.col(date_col) <= F.col("_end"))
        & F.col(value_col).isNotNull()
        & (F.col(value_col) > 0)
    )
    agg = filtered.groupBy(by).agg(
        F.max_by(value_col, date_col).alias("_cur"),
        F.median(value_col).alias("_med"),
    )
    base = w_end.select(by, "_n")
    res = base.join(agg, by, "left")
    val = (
        F.when(F.col("_n") < 2, F.lit(None))
        .when(F.col("_cur").isNull(), F.lit(None))
        .when(F.col("_med") == 0, F.lit(0.0))
        .otherwise((F.col("_cur") - F.col("_med")) / F.col("_med"))
    )
    return res.select(by, val.alias(out))
