"""Testdata catalog: loaders + temp-view registration.

The driver ships TPC-H-ish tables plus ``events`` / ``documents`` /
``embeddings`` (TESTDATA.md). All loads are plain parquet scans so
Catalyst keeps predicate pushdown / column pruning / partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark rejects
        # unless nanosAsLong is on. It's a runtime SQL conf, so set it
        # here rather than relying on whoever built the session (the
        # driver harness passes its own vanilla SparkSession). Under
        # this conf pyspark reads NANOS(isAdjustedToUTC=false) as
        # TIMESTAMP_NTZ (wall-clock, truncated to µs) — same naive
        # semantics DuckDB gives the oracle side. Downstream epoch
        # arithmetic must stay NTZ-safe (functions.scalar.epoch_micros),
        # since unix_micros/casts would be tz-dependent.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        except Exception:
            # conf locked or still rejected: force the physical INT64
            # through an explicit schema (other columns inferred once
            # via a schema-merge with the user-supplied override)
            df = spark.read.schema(_events_long_schema(spark, path)).parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # ns since epoch -> µs timestamp (values are µs-precision;
            # integer division is exact — ns epoch exceeds double range)
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def _events_long_schema(spark: SparkSession, path: str):
    """Schema for events.parquet with ts forced to long, derived from the
    parquet footer via pyarrow (no Spark read needed)."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    arrow_schema = pq.read_schema(
        os.path.join(path, sorted(f for f in os.listdir(path) if f.endswith(".parquet"))[0])
        if os.path.isdir(path)
        else path
    )
    from pyspark.sql.pandas.types import from_arrow_schema

    fields = []
    for f in from_arrow_schema(arrow_schema):
        if f.name == "ts":
            fields.append(T.StructField("ts", T.LongType(), f.nullable))
        else:
            fields.append(f)
    return T.StructType(fields)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so SQL and DataFrame code share one catalog."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
