"""Time-series window transforms (SURVEY.md §2.4 A3-A8, §2.5 W1-W4).

The reference computes these with scalar Python loops / tail slices on
tiny per-ticker frames. Here each is a Catalyst window expression —
distributed per group key, whole-stage-codegen'd, no Python in the hot
path. The drawdown loop (`price_features.py:63-73`) in particular
becomes two window expressions (running peak, then max ratio).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(by: Sequence[str] | str, order: str):
    by = [by] if isinstance(by, str) else list(by)
    return Window.partitionBy(*by).orderBy(order)


def add_lag_return(
    df: DataFrame, by, order: str, value: str, out: str = "return"
) -> DataFrame:
    """W1: simple return vs previous row: value/lag(value) - 1."""
    w = _w(by, order)
    prev = F.lag(value, 1).over(w)
    return df.withColumn(out, F.when(prev != 0, F.col(value) / prev - 1.0))


def trailing_mean(
    df: DataFrame, by, order: str, value: str, n: int, out: str | None = None
) -> DataFrame:
    """A3/W3: trailing-N-rows mean (SMA): avg over rowsBetween(-(n-1), 0)."""
    w = _w(by, order).rowsBetween(-(n - 1), Window.currentRow)
    return df.withColumn(out or f"sma_{n}", F.avg(value).over(w))


def running_peak(df: DataFrame, by, order: str, value: str, out: str = "peak") -> DataFrame:
    """W4/A8: running max from start of group to current row."""
    w = _w(by, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.max(value).over(w))


def max_drawdown(df: DataFrame, by, order: str, value: str, out: str = "max_drawdown") -> DataFrame:
    """A8: per-group max of (peak - value)/peak, peak = running max.

    Exact rewrite of the reference's peak-tracking loop
    (`price_features.py:48-74`) as two window/agg expressions.
    Returns one row per group.
    """
    by_l = [by] if isinstance(by, str) else list(by)
    with_peak = running_peak(df, by, order, value, "__peak")
    dd = F.when(F.col("__peak") != 0, (F.col("__peak") - F.col(value)) / F.col("__peak"))
    return (
        with_peak.withColumn("__dd", dd)
        .groupBy(*by_l)
        .agg(F.max("__dd").alias(out))
    )


def cumulative_product(
    df: DataFrame, by, order: str, value: str, out: str = "cum_prod", reverse: bool = False
) -> DataFrame:
    """A7: running product (split-ratio compounding, `utils.py:53`).

    Uses the native `product` aggregate over a running frame (JVM-side).
    ``reverse=True`` gives the suffix product (what backward split
    adjustment needs: each row divided by the product of all LATER
    split ratios).
    """
    by_l = [by] if isinstance(by, str) else list(by)
    order_col = F.col(order).desc() if reverse else F.col(order).asc()
    w = (
        Window.partitionBy(*by_l)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.product(value).over(w))
