"""dvmax_spark — a PySpark-native analytics/feature-engineering engine.

A from-scratch re-expression of the capabilities of the reference system
(IMGitH/dvmax, surveyed in SURVEY.md) as idiomatic PySpark: declarative
DataFrame plans optimized by Catalyst, custom operators only where Spark
lacks a primitive (as-of join, keep-last upsert, schema-lattice union,
declarative validation), plus large-scale data-pipeline extensions
(dedup, similarity search, text analysis, streaming).

Design stance (SURVEY.md §7): not a port — the reference's eager Polars
call-order becomes a lazy Catalyst plan; its per-ticker Python loop
becomes partitioned window/groupBy computation; its hand-rolled schema
reconciliation becomes a reusable type-lattice union.
"""

from dvmax_spark.session import get_spark
from dvmax_spark.catalog import TABLES, load_table, load_tables, register_views
from dvmax_spark.operators import (
    align_and_union,
    asof_join,
    dedup_keep_last,
    top_k_per_group,
    upsert_keep_last,
)
from dvmax_spark.store import FeatureStore

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "asof_join",
    "upsert_keep_last",
    "dedup_keep_last",
    "align_and_union",
    "top_k_per_group",
    "FeatureStore",
]

__version__ = "0.1.0"
