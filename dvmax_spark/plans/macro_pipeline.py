"""Macro pipeline (reference `macro_batch_runner.py` §3.2): raw
indicator table -> country-year features -> partition-level upsert
(delete-year-then-append becomes dynamic partition overwrite)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dvmax_spark.features.macro import engineer_macro_features
from dvmax_spark.store import FeatureStore


def run_macro_pipeline(
    spark: SparkSession, raw: DataFrame, store_root: str
) -> DataFrame:
    """Engineer features for every (country, year) and upsert by key —
    replacing a year re-writes only that country partition."""
    feats = engineer_macro_features(raw)
    store = FeatureStore(
        spark,
        os.path.join(store_root, "macro"),
        keys=["country", "as_of_year"],
        partition_col="country",
    )
    store.upsert(feats)
    return store.read()
