"""Universe bootstrap (reference `populate_tickers.py` §3.3):
multi-source ticker lists -> union + dedup + shape filter -> price-
history validation -> sorted text sink.

Sources arrive as DataFrames (scraped driver-side via
sources/files.py adapters or fixtures); validation is the V9 check —
a ticker must have >= min_closes recent non-null closes."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TICKER_RE = r"^[A-Z][A-Z0-9.\-]{0,9}$"


def combine_universe_sources(sources: list[DataFrame], col: str = "ticker") -> DataFrame:
    """U4: union + upper/trim + regex shape filter + dedup
    (populate_tickers.py:96-123)."""
    frames = [s.select(F.upper(F.trim(F.col(col))).alias("ticker")) for s in sources]
    u = reduce(lambda a, b: a.unionByName(b), frames)
    return u.where(F.col("ticker").rlike(TICKER_RE)).distinct()


def validate_with_prices(
    universe: DataFrame,
    prices: DataFrame,
    min_closes: int = 5,
    recent_days: int = 30,
) -> DataFrame:
    """V9 (populate_tickers.py:68-92): keep tickers with >= min_closes
    non-null closes in the trailing window, via one aggregation + a
    semi join (the reference loops yfinance calls per ticker)."""
    latest = prices.agg(F.max("date").alias("_end")).collect()[0]["_end"]
    recent = prices.where(
        F.col("date") >= F.date_sub(F.lit(latest), recent_days)
    ).where(F.col("close").isNotNull())
    counts = (
        recent.groupBy("ticker")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_closes)
        .select("ticker")
    )
    return universe.join(counts, "ticker", "left_semi")


def write_universe(universe: DataFrame, path: str) -> list[str]:
    """Sorted text sink (populate_tickers.py:95-99). The universe is
    driver-small by construction (thousands of symbols)."""
    tickers = sorted(r["ticker"] for r in universe.collect())
    with open(path, "w") as f:
        f.write("\n".join(tickers) + "\n")
    return tickers


def run_universe_pipeline(
    spark: SparkSession,
    sources: list[DataFrame],
    prices: DataFrame,
    out_path: str,
    min_closes: int = 5,
) -> list[str]:
    combined = combine_universe_sources(sources)
    validated = validate_with_prices(combined, prices, min_closes=min_closes)
    return write_universe(validated, out_path)
