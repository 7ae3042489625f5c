"""Time-series utilities: split adjustment (reference
`engineering/utils.py:21-72` — cum-product of split ratios + backward
as-of join, then divide)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvmax_spark.operators.asof import asof_join
from dvmax_spark.operators.windows import cumulative_product


def adjust_series_for_splits(
    df: DataFrame,
    splits: DataFrame,
    column: str,
    by: str = "ticker",
    date_col: str = "date",
) -> DataFrame:
    """Backward cumulative split adjustment: each value is divided by
    the product of all split ratios at dates <= its own date.

    Mirrors `adjust_series_for_splits` (utils.py:49-69): cum_prod over
    sorted splits, backward as-of join onto the series, fill 1.0,
    divide. Empty split frame => unchanged (utils.py:43-46).

    Distributed shape: cum-product is a per-key running window over the
    (tiny) splits table; the as-of join is the single-shuffle union+
    window plan — no per-key Python.
    """
    if not splits.columns or splits.isEmpty():
        return df
    cum = cumulative_product(
        splits, by=by, order=date_col, value="split_ratio", out="cumulative_ratio"
    ).select(by, date_col, "cumulative_ratio")
    joined = asof_join(
        df,
        cum,
        on=date_col,
        by=by,
        strategy="backward",
        right_cols=["cumulative_ratio"],
        suffix="_split",
    )
    adj = F.coalesce(F.col("cumulative_ratio"), F.lit(1.0))
    return (
        joined.withColumn(column, F.col(column) / adj)
        .drop("cumulative_ratio", f"{date_col}_split")
    )
