"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
configs are the ones that matter on a real cluster: AQE for runtime
re-planning (partition coalescing, broadcast conversion, skew-join
splitting), Arrow for any pandas-interchange path, UTC session timezone
so results hash-match a UTC-naive oracle (DuckDB), and shuffle
parallelism sized to the hardware instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "dvmax_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    At 100 TB the same knobs apply, with cluster-level sizing:
    shuffle partitions ~ 2-3× total cores (or let AQE coalesce from a
    high initial number), ``maxPartitionBytes`` sized so a scan task is
    128-256 MB, and dynamic partition overwrite for incremental stores.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # testdata ships TIMESTAMP(NANOS) parquet which Spark rejects by
        # default; read as long and convert in the catalog loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # incremental stores replace partitions, not whole tables
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if SparkSession.getActiveSession() is None and "spark.master" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
