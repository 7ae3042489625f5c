"""Feature-row assembly: the reference's per-ticker build loop
(`ticker_row_builder.py:26-97`) as ONE distributed plan over all
tickers (SURVEY §7 step 4: "the per-ticker feature row as one
groupBy plan, not a Python loop").

Input: the eight per-ticker source tables (each carrying a `ticker`
column). Output: (dynamic_df, static_df) — one row per ticker with the
reference's 28-column dynamic schema and the one-hot static schema —
plus validation status/violations via the declarative rule compiler.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvmax_spark.features.dividend import yield_vs_median
from dvmax_spark.features.fundamental import ebit_interest_cover, net_debt_to_ebitda
from dvmax_spark.features.growth import dividend_cagr, eps_cagr, fcf_cagr
from dvmax_spark.features.price import (
    max_drawdown_feature,
    payout_ratio,
    return_over_period,
    sector_relative_return,
    sma_delta_50_200,
    volatility,
)
from dvmax_spark.features.static import encode_static
from dvmax_spark.features.valuation import latest_pe_pfcf
from dvmax_spark.features.validation_profile import validate_dynamic_rows

NULLABLE_KEYS = [
    "eps_cagr_3y",
    "fcf_cagr_3y",
    "dividend_yield",
    "dividend_cagr_3y",
    "dividend_cagr_5y",
    "ebit_interest_cover",
]


def _cut(df: DataFrame, as_of) -> DataFrame:
    """Point-in-time cut (ticker_row_builder.py:27-31)."""
    if "date" in df.columns:
        return df.where(F.col("date") <= F.lit(as_of).cast("date"))
    return df


def build_feature_table(
    inputs: dict[str, DataFrame], as_of, by: str = "ticker"
) -> tuple[DataFrame, DataFrame]:
    """Build (dynamic, static) feature frames for every ticker at once.

    ``inputs`` keys (mirroring fetch_all_per_ticker):
      prices, dividends, splits, ratios, income, balance, profile,
      sector_index (benchmark closes keyed by sector_etf) + optional
      sector_map (ticker -> sector_etf).
    """
    prices = _cut(inputs["prices"], as_of)
    dividends = _cut(inputs["dividends"], as_of)
    splits = _cut(inputs["splits"], as_of)
    ratios = _cut(inputs["ratios"], as_of)
    income = _cut(inputs["income"], as_of)
    balance = _cut(inputs["balance"], as_of)
    profile = inputs["profile"]
    sector_index = _cut(inputs["sector_index"], as_of) if inputs.get("sector_index") is not None else None

    # fundamentals: income ⋈ balance on (ticker, date), latest row per
    # ticker carries the ratios (ticker_row_builder.py:42, safe_get)
    fundamentals = income.join(balance, [by, "date"], "inner")
    fundamentals = net_debt_to_ebitda(fundamentals)
    fundamentals = ebit_interest_cover(fundamentals)
    latest_fund = fundamentals.groupBy(by).agg(
        F.max_by("net_debt_to_ebitda", "date").alias("net_debt_to_ebitda"),
        F.max_by("ebit_interest_cover", "date").alias("ebit_interest_cover"),
        F.max_by("ebit_interest_cover_capped", "date").alias("ebit_interest_cover_capped"),
        F.max_by("ebitda", "date").alias("ebitda"),
        F.max_by(
            F.col("interestExpense") if "interestExpense" in fundamentals.columns else F.lit(None),
            "date",
        ).alias("interest_expense"),
    )

    div_yield = ratios.groupBy(by).agg(
        F.max_by("dividendYield", "date").alias("dividend_yield")
    )

    parts = [
        return_over_period(prices, as_of, months=6, by=by, out="6m_return"),
        return_over_period(prices, as_of, months=12, by=by, out="12m_return"),
        volatility(prices, by=by, out="volatility"),
        max_drawdown_feature(prices, lookback_years=1, by=by, out="max_drawdown_1y"),
        sma_delta_50_200(prices, by=by, out="sma_50_200_delta"),
        latest_fund,
        eps_cagr(income, 3, by=by),
        fcf_cagr(ratios, 3, by=by),
        div_yield,
        dividend_cagr(dividends, splits, 3, by=by),
        dividend_cagr(dividends, splits, 5, by=by),
        yield_vs_median(ratios, 5, by=by, out="yield_vs_5y_median"),
        latest_pe_pfcf(ratios, by=by),
        payout_ratio(ratios, by=by, out="payout_ratio"),
    ]
    if sector_index is not None:
        sector_map = inputs.get("sector_map")
        parts.append(
            sector_relative_return(
                prices,
                sector_index,
                lookback_days=365,
                as_of=as_of,
                by=by,
                mapping=sector_map,
                out="sector_relative_6m",
            )
        )

    base = prices.select(by).distinct()
    dynamic = reduce(lambda acc, p: acc.join(p, by, "left"), parts, base)
    if sector_index is None:
        dynamic = dynamic.withColumn("sector_relative_6m", F.lit(None).cast("double"))
    dynamic = dynamic.withColumn("as_of", F.lit(as_of).cast("date"))

    # has_* flags (ticker_row_builder.py:20-23, 79-84): 1 iff present
    # and not NaN — computed BEFORE NaN normalization (SURVEY §7)
    for key in NULLABLE_KEYS:
        c = F.col(key).cast("double")
        dynamic = dynamic.withColumn(
            f"has_{key}", F.when(c.isNull() | F.isnan(c), F.lit(0)).otherwise(F.lit(1))
        )

    dynamic = validate_dynamic_rows(dynamic, by=by)

    static = encode_static(profile, sector_col="sector", country_col="country")
    return dynamic, static
