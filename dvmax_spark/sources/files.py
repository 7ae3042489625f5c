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
    Spark infers the column count from the garbage preamble.

    Scale shape: a preamble lives entirely in each file's FIRST block
    (``input_file_block_start() == 0``), so the row-number window runs
    only over first-block lines — bounded by one block (~128 MB) per
    file and parallel across files. All later blocks stream through
    untouched (no global sort, no single-task pass), and parsing is a
    JVM-side ``from_csv`` expression, not an RDD re-parse.
    """
    if not skip_rows:
        return spark.read.option("header", str(header).lower()).csv(path)
    import csv as _csv

    from pyspark.sql import Window

    lines = spark.read.text(path)
    in_first_block = F.input_file_block_start() == 0
    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    head = (
        lines.where(in_first_block)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > skip_rows)
    )
    # column names from the first kept line (one bounded driver action)
    first_kept = head.where(F.col("_rn") == skip_rows + 1).select("value").collect()
    if not first_kept:
        raise ValueError(f"skip_rows={skip_rows} leaves no rows in {path}")
    cells = next(_csv.reader([first_kept[0]["value"]]))
    if header:
        names = [c.strip().replace("`", "") or f"_c{i}" for i, c in enumerate(cells)]
        head = head.where(F.col("_rn") > skip_rows + 1)
    else:
        names = [f"_c{i}" for i in range(len(cells))]
    body = head.select("value").unionByName(
        lines.where(~in_first_block).select("value")
    )
    ddl = ", ".join(f"`{n}` STRING" for n in names)
    return body.select(F.from_csv("value", ddl).alias("_r")).select("_r.*")


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
