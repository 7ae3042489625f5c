"""The main feature pipeline (reference `ticker_batch_runner.py` §3.1)
as a Spark job: where the reference loops (ticker, as_of) tasks
sequentially with a 1s sleep, this runs ONE distributed plan per as_of
date over every ticker at once, and the incremental store replaces
ledger files.

Pipeline stages (mirroring §3.1's lifecycle):
  plan grid -> min-history gate (V8) -> feature build (vectorized)
  -> validation routing (V6) -> incremental upsert (J5/J6)
  -> merged table + OHE projection -> status JSON (S10)
"""

from __future__ import annotations

import datetime
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvmax_spark.features.assemble import build_feature_table
from dvmax_spark.store import FeatureStore
from dvmax_spark.validation.rules import split_by_status

START_DATE = datetime.date(2021, 12, 31)


def get_dates_between(
    start: datetime.date = START_DATE, end: datetime.date | None = None
) -> list[datetime.date]:
    """Annual as_of grid from Dec-31 anchors (ref get_dates_between,
    ticker_batch_runner.py:150-156). Dec-31 anchors never hit the
    Feb-29 replace() hazard (SURVEY §7 calendar note)."""
    end = end or datetime.date.today()
    dates, cur = [], start
    while cur <= end:
        dates.append(cur)
        cur = cur.replace(year=cur.year + 1)
    return dates


def has_enough_price_data(
    prices: DataFrame, as_of, required_days: int = 260, by: str = "ticker"
) -> DataFrame:
    """V8 min-history gate (ref ticker_batch_runner.py:502-506): keys
    with >= required_days price rows at/before as_of."""
    return (
        prices.where(F.col("date") <= F.lit(as_of).cast("date"))
        .groupBy(by)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= required_days)
        .select(by)
    )


def run_ticker_pipeline(
    spark: SparkSession,
    inputs: dict[str, DataFrame],
    store_root: str,
    dates: list[datetime.date] | None = None,
    required_days: int = 260,
    incremental: bool = True,
) -> dict:
    """Run the full pipeline; returns run stats (the reference's
    RunStats counters, ticker_batch_runner.py:84-97)."""
    t0 = time.time()
    dates = dates or get_dates_between()
    dyn_store = FeatureStore(spark, os.path.join(store_root, "dynamic"), keys=["ticker", "as_of"])
    static_store = FeatureStore(spark, os.path.join(store_root, "static"), keys=["ticker"])

    stats = {"dates": len(dates), "rows_written": 0, "flagged": 0, "dropped": 0}
    for as_of in dates:
        eligible = has_enough_price_data(inputs["prices"], as_of, required_days).cache()
        if eligible.isEmpty():
            eligible.unpersist()
            continue
        gated = dict(inputs)
        gated["prices"] = inputs["prices"].join(F.broadcast(eligible), "ticker")
        dynamic, static = build_feature_table(gated, as_of)
        # the feature DAG is wide (one join per feature family): cache it
        # so the counts/split/write actions below execute it ONCE
        dynamic = dynamic.cache()
        counts = {
            r["validation_status"]: r["n"]
            for r in dynamic.groupBy("validation_status").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        accepted, quarantined = split_by_status(dynamic)
        stats["flagged"] += counts.get("flagged", 0)
        stats["dropped"] += counts.get("dropped", 0)
        if incremental:
            stats["rows_written"] += dyn_store.append_new_keys(accepted)
        else:
            dyn_store.upsert(accepted)
            stats["rows_written"] += accepted.count()
        if counts.get("dropped"):
            dyn_store.quarantine(quarantined)
        static_store.upsert(static)
        dynamic.unpersist()
        eligible.unpersist()

    # status sidecar (ref _write_status_files, ticker_batch_runner.py:556-566)
    stats["wall_s"] = round(time.time() - t0, 2)
    os.makedirs(os.path.join(store_root, "status"), exist_ok=True)
    with open(os.path.join(store_root, "status", "last_run.json"), "w") as f:
        json.dump(stats, f)
    return stats


def write_static_ohe_projection(
    spark: SparkSession, store_root: str
) -> DataFrame:
    """The OHE projection (ref write_static_ohe_projection,
    ticker_batch_runner.py:627-640): ticker + one-hot columns as float,
    nulls filled 0."""
    static = FeatureStore(spark, os.path.join(store_root, "static"), keys=["ticker"]).read()
    ohe_cols = [
        c for c in static.columns if c.startswith("sector_") or c.startswith("country_")
    ]
    proj = static.select(
        "ticker", *[F.coalesce(F.col(c).cast("float"), F.lit(0.0)).alias(c) for c in ohe_cols]
    )
    out = os.path.join(store_root, "static_ohe")
    proj.write.mode("overwrite").option("compression", "zstd").parquet(out)
    return proj
