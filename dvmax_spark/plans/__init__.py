"""Pipeline plans: the reference's three CLI entry points (SURVEY §3)
re-expressed as Spark jobs over the feature library + store."""

from dvmax_spark.plans.ticker_pipeline import (
    get_dates_between,
    has_enough_price_data,
    run_ticker_pipeline,
    write_static_ohe_projection,
)
from dvmax_spark.plans.macro_pipeline import run_macro_pipeline

__all__ = [
    "get_dates_between",
    "has_enough_price_data",
    "run_ticker_pipeline",
    "write_static_ohe_projection",
    "run_macro_pipeline",
]
