"""Scalar function surface (SURVEY.md §2.8) — thin, tested conventions
over native ``pyspark.sql.functions`` expressions."""

from dvmax_spark.functions.scalar import (
    safe_div,
    is_finite,
    nan_to_null,
    has_flag,
    clip_cap,
    slug,
    parse_date_flex,
    pct_to_prop,
    round_downcast,
    one_hot_exprs,
    map_lookup,
)

__all__ = [
    "safe_div",
    "is_finite",
    "nan_to_null",
    "has_flag",
    "clip_cap",
    "slug",
    "parse_date_flex",
    "pct_to_prop",
    "round_downcast",
    "one_hot_exprs",
    "map_lookup",
]
