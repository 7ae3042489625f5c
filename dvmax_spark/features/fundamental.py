"""Fundamental-statement features (reference
`engineering/fundamental_features.py`). Row-wise expressions over the
income⋈balance join — no aggregation, pure projection."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _safe_col(df: DataFrame, name: str) -> Column:
    return F.col(name) if name in df.columns else F.lit(0)


def net_debt_to_ebitda(df: DataFrame, out: str = "net_debt_to_ebitda") -> DataFrame:
    """(totalDebt - cash) / EBITDA, EBITDA ~ incomeBeforeTax +
    interestExpense + D&A; non-finite => null (ref
    compute_net_debt_to_ebitda, fundamental_features.py:5-31)."""
    ebitda = (
        _safe_col(df, "incomeBeforeTax")
        + _safe_col(df, "interestExpense")
        + _safe_col(df, "depreciationAndAmortization")
    )
    net_debt = _safe_col(df, "totalDebt") - _safe_col(df, "cashAndShortTermInvestments")
    ratio = F.when(ebitda != 0, net_debt / ebitda)  # x/0 -> null (= non-finite rule)
    ratio = F.when(F.isnan(ratio), F.lit(None)).otherwise(ratio)
    return df.withColumn(out, ratio).withColumn("ebitda", ebitda)


def ebit_interest_cover(df: DataFrame, cap: float = 1000.0) -> DataFrame:
    """EBIT / interestExpense with cap handling (ref
    compute_ebit_interest_cover, fundamental_features.py:34-66):

      * EBIT = operatingIncome, falling back to incomeBeforeTax;
      * raw   -> ebit_interest_cover_raw (null when interest 0/null);
      * value -> ebit_interest_cover (= raw below cap, else +inf);
      * flag  -> ebit_interest_cover_capped (true when raw null or >= cap);
      * has_ebit_interest_cover (raw non-null).
    """
    if "operatingIncome" in df.columns:
        ebit = F.col("operatingIncome")
    elif "incomeBeforeTax" in df.columns:
        ebit = F.col("incomeBeforeTax")
    else:
        raise ValueError("need operatingIncome or incomeBeforeTax")
    interest = F.col("interestExpense") if "interestExpense" in df.columns else F.lit(None)
    raw = F.when(interest.isNotNull() & (interest != 0), ebit / interest)
    capped_value = F.when(raw < cap, raw).otherwise(F.lit(float("inf")))
    cap_flag = F.when(raw.isNull() | (raw >= cap), F.lit(True)).otherwise(F.lit(False))
    return (
        df.withColumn("ebit_interest_cover_raw", raw)
        .withColumn("ebit_interest_cover", capped_value)
        .withColumn("ebit_interest_cover_capped", cap_flag)
        .withColumn("has_ebit_interest_cover", raw.isNotNull())
    )
