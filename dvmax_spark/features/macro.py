"""Macro (country-year) feature engineering (reference
`macro_batch_runner.py:48-149`): per-year first-value extraction with
backfill, YoY deltas, percent→proportion conversion, NaN gate.

Vectorized over all countries and years in one plan (the reference
loops years per country)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dvmax_spark.functions.scalar import pct_to_prop

# raw World-Bank-shaped column names (FIXTURES.md §2)
GDP = "GDP (USD)"
GDP_PC = "GDP per Capita (const USD)"
INFLATION = "Inflation (%)"
UNEMPLOYMENT = "Unemployment (%)"
EXPORTS = "Exports (% GDP)"
CONSUMPTION = "Private Consumption (%GDP)"


def yearly_first_values(
    raw: DataFrame, value_cols: list[str], by: str = "country", date_col: str = "date"
) -> DataFrame:
    """A9: per (country, year) first non-null value of each indicator
    (ref extract_by_year, macro_batch_runner.py:60-64)."""
    yr = F.year(date_col).alias("year")
    aggs = [
        F.first(F.col(c), ignorenulls=True).alias(c) for c in value_cols
    ]
    return (
        raw.orderBy(date_col)
        .groupBy(by, yr)
        .agg(*aggs)
    )


def engineer_macro_features(
    raw: DataFrame, by: str = "country", date_col: str = "date"
) -> DataFrame:
    """Country-year feature rows mirroring the reference output schema
    (macro_batch_runner.py:116-127): backfilled YoY growth for GDP /
    GDP-per-capita (value may come from an earlier year => the
    `backfilled_year` column), latest inflation + inflation YoY, and
    percent→proportion conversions. Rows with any null feature are
    dropped (the reference's NaN gate, :130-134)."""
    cols = [GDP, GDP_PC, INFLATION, UNEMPLOYMENT, EXPORTS, CONSUMPTION]
    present = [c for c in cols if c in raw.columns]
    yearly = yearly_first_values(raw, present, by=by, date_col=date_col)

    w = Window.partitionBy(by).orderBy("year")
    # backfill: last non-null value at or before this year
    bf = lambda c: F.last(F.col(c), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    bf_year = F.max(F.when(F.col(GDP).isNotNull(), F.col("year"))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )

    gdp_b = bf(GDP)
    gdp_pc_b = bf(GDP_PC)
    cons_b = bf(CONSUMPTION) if CONSUMPTION in present else F.lit(None)
    exp_b = bf(EXPORTS) if EXPORTS in present else F.lit(None)
    infl = bf(INFLATION)
    unemp = bf(UNEMPLOYMENT)

    enriched = yearly.select(
        F.col("year").alias("as_of_year"),
        bf_year.alias("backfilled_year"),
        F.col(by),
        gdp_b.alias("_gdp_b"),
        gdp_pc_b.alias("_gdp_pc_b"),
        infl.alias("_infl"),
        unemp.alias("_unemp"),
        cons_b.alias("_cons_b"),
        exp_b.alias("_exp_b"),
    )
    w2 = Window.partitionBy(by).orderBy("as_of_year")
    yoy = lambda c: F.when(
        F.lag(c).over(w2).isNotNull() & (F.lag(c).over(w2) != 0),
        (c - F.lag(c).over(w2)) / F.lag(c).over(w2),
    )
    out = enriched.select(
        "as_of_year",
        "backfilled_year",
        by,
        yoy(F.col("_gdp_b")).alias("gdp_yoy_backfilled"),
        yoy(F.col("_gdp_pc_b")).alias("gdp_pc_yoy_backfilled"),
        pct_to_prop(F.col("_infl")).alias("inflation_latest"),
        (pct_to_prop(F.col("_infl")) - pct_to_prop(F.lag("_infl").over(w2))).alias(
            "inflation_yoy"
        ),
        pct_to_prop(F.col("_unemp")).alias("unemployment_latest"),
        pct_to_prop(F.col("_cons_b")).alias("consumption_backfilled"),
        pct_to_prop(F.col("_exp_b")).alias("exports_backfilled"),
    )
    # NaN/null gate: reject incomplete feature rows (macro_batch_runner.py:130-134)
    feature_cols = [c for c in out.columns if c not in ("as_of_year", "backfilled_year", by)]
    return out.na.drop(subset=feature_cols)
