"""REST-JSON → DataFrame adapters (SURVEY §2.1 S5-S7).

The reference fetches JSON per ticker and infers frames
(`ticker_params/*.py`); here decoded records land in explicit-schema
DataFrames (no inference drift), driver-side for small universes. For
large universes the same client runs partition-side via mapInPandas
(fetch_json_source_distributed)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dvmax_spark.sources.http import HttpClient


def json_records_to_df(
    spark: SparkSession,
    records: list[dict[str, Any]] | None,
    schema: T.StructType,
) -> DataFrame:
    """Decoded JSON records -> typed DataFrame; None/empty -> empty frame
    with the SAME schema (the reference's empty-frame contract,
    dividends.py:19-23)."""
    rows = [
        tuple(rec.get(f.name) for f in schema.fields) for rec in (records or [])
    ]
    return spark.createDataFrame(rows, schema)


def fetch_json_source(
    spark: SparkSession,
    client: HttpClient,
    url: str,
    schema: T.StructType,
    record_path: str | None = None,
) -> DataFrame:
    """One URL -> typed DataFrame (driver-side ingest, S5)."""
    payload = client.fetch(url)
    if payload is None:
        return json_records_to_df(spark, [], schema)
    records = payload[record_path] if record_path else payload
    return json_records_to_df(spark, records, schema)


def fetch_json_source_distributed(
    keys_df: DataFrame,
    url_for_key,
    make_client,
    schema: T.StructType,
    key_col: str = "key",
) -> DataFrame:
    """Partition-side fetch (the 100 TB shape): each partition builds
    ONE client (connection reuse + per-partition rate limit) and
    fetches its keys via mapInPandas — results stream back as Arrow
    batches, no driver bottleneck.

    ``url_for_key`` and ``make_client`` must be picklable (top-level
    functions / dataclasses)."""
    import pandas as pd

    field_names = [f.name for f in schema.fields]
    out_schema = T.StructType(
        [T.StructField(key_col, T.StringType())] + list(schema.fields)
    )

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = make_client()
        for pdf in batches:
            rows = []
            for key in pdf[key_col]:
                payload = client.fetch(url_for_key(key)) or []
                for rec in payload:
                    rows.append((key, *[rec.get(n) for n in field_names]))
            yield pd.DataFrame(rows, columns=[key_col] + field_names)

    return keys_df.select(key_col).mapInPandas(fetch_partition, out_schema)
