"""Keep-last upsert / dedup — merge-by-key with explicit priority.

Reference semantics (SURVEY.md §2.3 J5, §2.4 A10): concat existing+new
then ``unique(subset=keys, keep="last")`` — last-wins depends on concat
order. The reference relies on implicit row order; Spark rows are
unordered, so priority is made EXPLICIT via a source-rank column (the
`_source_rank` design called out in SURVEY §7 hard parts).

One shuffle on the key columns; at scale this is the standard
row_number-dedup plan (AQE handles skewed keys).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK = "__src_rank"
_RN = "__rn"


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str] | str = ()
) -> DataFrame:
    """Keep one row per key. With ``order_by``, keeps the row with the
    greatest order value (deterministic); without, an arbitrary row
    (Spark ``dropDuplicates`` semantics)."""
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) == 1).drop(_RN)
    )


def upsert_keep_last(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | str = (),
) -> DataFrame:
    """Union existing+updates and keep one row per key, updates winning.

    ``order_by`` breaks ties *within* a side (greatest wins); the side
    rank always dominates, reproducing keep="last" with existing-then-new
    concat order.
    """
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    tagged = existing.withColumn(_RANK, F.lit(0)).unionByName(
        updates.withColumn(_RANK, F.lit(1)), allowMissingColumns=True
    )
    order = [F.col(_RANK).desc()] + [F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN, _RANK)
    )
