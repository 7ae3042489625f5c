"""Schema-lattice union — type-reconciled UNION ALL BY NAME.

Reproduces the reference's schema-reconciliation machinery
(SURVEY.md §1.3: `fill_missing_columns` / `_align_schemas` /
`_common_dtype`, reference `ticker_batch_runner.py:178-187, 220-231,
285-307, 403-412, 538-548`) as one reusable transform:

  * column superset in first-seen order, missing columns filled null
  * per-column dtype resolution lattice:
      - prefer any non-null type over NullType
      - any string  => string          ("Utf8 wins")
      - mixed numerics => widest       (bool < byte < short < int <
                                        long < float < double)
      - date + timestamp => timestamp
      - anything irreconcilable => string

Pure metadata work on the driver + a chain of ``unionByName`` — zero
extra shuffles, so it costs the same as a plain union at any scale.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_ORDER = [
    T.BooleanType(),
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]


def _numeric_rank(dt: T.DataType) -> int | None:
    for i, t in enumerate(_NUMERIC_ORDER):
        if dt == t:
            return i
    if isinstance(dt, T.DecimalType):
        return len(_NUMERIC_ORDER)  # decimal widens to double in this lattice
    return None


def resolve_dtype(a: T.DataType, b: T.DataType) -> T.DataType:
    """Resolve two column dtypes per the lattice above."""
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if isinstance(a, T.StringType) or isinstance(b, T.StringType):
        return T.StringType()
    ra, rb = _numeric_rank(a), _numeric_rank(b)
    if ra is not None and rb is not None:
        merged = _NUMERIC_ORDER[max(ra, rb)] if max(ra, rb) < len(_NUMERIC_ORDER) else T.DoubleType()
        return merged
    dateish = (T.DateType, T.TimestampType)
    if isinstance(a, dateish) and isinstance(b, dateish):
        return T.TimestampType()
    return T.StringType()


def align_and_union(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union any number of frames after reconciling schemas."""
    if not dfs:
        raise ValueError("align_and_union needs at least one DataFrame")
    # column superset in first-seen order, with resolved dtypes
    order: list[str] = []
    resolved: dict[str, T.DataType] = {}
    for df in dfs:
        for field in df.schema.fields:
            if field.name not in resolved:
                order.append(field.name)
                resolved[field.name] = field.dataType
            else:
                resolved[field.name] = resolve_dtype(resolved[field.name], field.dataType)
    # NullType columns that stayed null everywhere default to string
    for name, dt in resolved.items():
        if isinstance(dt, T.NullType):
            resolved[name] = T.StringType()

    def conform(df: DataFrame) -> DataFrame:
        cols = []
        present = set(df.columns)
        for name in order:
            if name in present:
                cols.append(F.col(name).cast(resolved[name]).alias(name))
            else:
                cols.append(F.lit(None).cast(resolved[name]).alias(name))
        return df.select(*cols)

    return reduce(lambda a, b: a.unionByName(b), (conform(df) for df in dfs))
