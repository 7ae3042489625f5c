"""File/tabular sources (SURVEY §2.1 S4, S7-S9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ticker_universe(spark: SparkSession, path: str) -> DataFrame:
    """S4: text-list scan with upper/trim + ticker-shape filter
    (ref load_tickers ticker_batch_runner.py:159-163 + the regex
    predicate populate_tickers.py:9-10), deduped."""
    return (
        spark.read.text(path)
        .select(F.upper(F.trim("value")).alias("ticker"))
        .where(F.col("ticker").rlike(r"^[A-Z][A-Z0-9.\-]{0,9}$"))
        .distinct()
    )


def read_remote_csv(
    spark: SparkSession, path: str, skip_rows: int = 0, header: bool = True
) -> DataFrame:
    """S9: CSV scan with leading-garbage skip (ref pd.read_csv(url,
    skiprows=10), populate_tickers.py:40-66). Spark reads local/dfs
    paths; remote URLs are downloaded by the caller first.

    Skipping happens on the raw lines BEFORE CSV parsing — otherwise
    Spark infers the column count from the garbage preamble."""
    if not skip_rows:
        return spark.read.option("header", str(header).lower()).csv(path)
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    lines = (
        spark.read.text(path)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > skip_rows)
        .select("value")
    )
    return spark.read.option("header", str(header).lower()).csv(
        lines.rdd.map(lambda r: r.value)
    )


def wide_pivot_indicators(
    long_df: DataFrame,
    key_cols: list[str],
    indicator_col: str = "indicator",
    value_col: str = "value",
    indicators: list[str] | None = None,
) -> DataFrame:
    """S7/U3: long (country, year, indicator, value) -> wide one column
    per indicator (ref pd.concat(axis=1) on year index,
    fetcher/macro.py:27-42)."""
    p = long_df.groupBy(*key_cols).pivot(indicator_col, indicators)
    return p.agg(F.first(value_col, ignorenulls=True))
