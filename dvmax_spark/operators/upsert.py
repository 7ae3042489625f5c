"""Keep-last upsert / dedup — merge-by-key with explicit priority.

Reference semantics (SURVEY.md §2.3 J5, §2.4 A10): concat existing+new
then ``unique(subset=keys, keep="last")`` — last-wins depends on concat
order. The reference relies on implicit row order; Spark rows are
unordered, so priority is made EXPLICIT via a source-rank column (the
`_source_rank` design called out in SURVEY §7 hard parts).

Plan shape: ONE hash aggregate on the key columns — ``max_by`` of the
row payload over the (source-rank, order_by…) struct. This beats the
classic row_number-dedup at scale twice over: partial aggregation
collapses duplicate keys map-side BEFORE the shuffle (row_number must
ship every row), and the reducer is a hash lookup, not a per-partition
sort. AQE still handles skewed keys. Determinism contract is the same
as row_number's: unique (rank, order_by) per key — callers supply a
collision-free ordering, as the registry conventions require.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK = "__src_rank"
_RN = "__rn"


def _keep_max(df: DataFrame, keys: Sequence[str], order_cols: list) -> DataFrame:
    """One row per key: the row whose ``order_cols`` struct is maximal
    (struct comparison is lexicographic by field). Single hash
    aggregate — map-side combine, no sort."""
    keys = list(keys)
    payload = [c for c in df.columns if c not in keys]
    kept = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.struct(*order_cols)).alias("_kept")
    )
    return kept.select(*keys, "_kept.*")


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str] | str = ()
) -> DataFrame:
    """Keep one row per key. With ``order_by``, keeps the row with the
    greatest order value (deterministic when the order is collision-free
    per key); without, an arbitrary row (Spark ``dropDuplicates``
    semantics)."""
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_by:
        return df.dropDuplicates(list(keys))
    return _keep_max(df, keys, [F.col(c) for c in order_by])


def upsert_keep_last(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | str = (),
    rank_dominates: bool = True,
) -> DataFrame:
    """Union existing+updates and keep one row per key, updates winning.

    With ``rank_dominates=True`` (default — the reference's
    keep="last" over existing-then-new concat), ``order_by`` only
    breaks ties *within* a side; an update always beats an existing
    row. With ``rank_dominates=False``, ``order_by`` wins outright and
    the side rank is only the tie-break — event-time-wins semantics
    for OUT-OF-ORDER arrivals (streaming ingest: a late batch must not
    clobber a newer stored row).
    """
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    tagged = existing.withColumn(_RANK, F.lit(0)).unionByName(
        updates.withColumn(_RANK, F.lit(1)), allowMissingColumns=True
    )
    by = [F.col(c) for c in order_by]
    order_cols = [F.col(_RANK), *by] if rank_dominates else [*by, F.col(_RANK)]
    out_cols = [c for c in tagged.columns if c != _RANK]
    return _keep_max(tagged, keys, order_cols).select(*out_cols)
