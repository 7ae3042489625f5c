"""Valuation extracts (reference `engineering/valuation_features.py`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_pe_pfcf(ratios: DataFrame, by: str = "ticker", date_col: str = "date") -> DataFrame:
    """Latest row where BOTH priceEarningsRatio and
    priceToFreeCashFlowsRatio are > 0; (0.0, 0.0) when none (ref
    extract_latest_pe_pfcf, valuation_features.py:3-30)."""
    valid = ratios.where(
        (F.col("priceEarningsRatio") > 0) & (F.col("priceToFreeCashFlowsRatio") > 0)
    )
    agg = valid.groupBy(by).agg(
        F.max_by("priceEarningsRatio", date_col).alias("_pe"),
        F.max_by("priceToFreeCashFlowsRatio", date_col).alias("_pfcf"),
    )
    base = ratios.select(by).distinct()
    return base.join(agg, by, "left").select(
        by,
        F.coalesce(F.col("_pe"), F.lit(0.0)).alias("pe_ratio"),
        F.coalesce(F.col("_pfcf"), F.lit(0.0)).alias("pfcf_ratio"),
    )
