"""Ingest sources (SURVEY.md §2.1 S4-S12): driver-side fetch adapters
producing DataFrames, with the reference's retry/backoff/typed-error
machinery. Network calls are isolated behind an injectable transport so
everything is testable offline (the reference's live tests are the one
part of its strategy NOT worth copying)."""

from dvmax_spark.sources.http import HttpClient, HttpError, RetryPolicy
from dvmax_spark.sources.rest import json_records_to_df, fetch_json_source
from dvmax_spark.sources.files import (
    read_ticker_universe,
    read_remote_csv,
    wide_pivot_indicators,
)

__all__ = [
    "HttpClient",
    "HttpError",
    "RetryPolicy",
    "json_records_to_df",
    "fetch_json_source",
    "read_ticker_universe",
    "read_remote_csv",
    "wide_pivot_indicators",
]
