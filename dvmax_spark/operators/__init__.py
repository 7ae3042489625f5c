"""Custom relational operators Spark lacks as primitives.

Everything here is a library-level ``DataFrame -> DataFrame`` transform
built from Catalyst expressions — no per-row Python, no custom planner
rules. Each operator shuffles at most once and is safe at cluster scale.
"""

from dvmax_spark.operators.asof import asof_join, nearest_le_lookup, grace_window_lookup
from dvmax_spark.operators.upsert import upsert_keep_last, dedup_keep_last
from dvmax_spark.operators.union_ops import align_and_union, resolve_dtype
from dvmax_spark.operators.topk import top_k_per_group
from dvmax_spark.operators.windows import (
    add_lag_return,
    trailing_mean,
    running_peak,
    max_drawdown,
    cumulative_product,
)

__all__ = [
    "asof_join",
    "nearest_le_lookup",
    "grace_window_lookup",
    "upsert_keep_last",
    "dedup_keep_last",
    "align_and_union",
    "resolve_dtype",
    "top_k_per_group",
    "add_lag_return",
    "trailing_mean",
    "running_peak",
    "max_drawdown",
    "cumulative_product",
]
