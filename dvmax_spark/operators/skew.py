"""Skew mitigation (SURVEY north-star '100 TB scale' — salting for the
hot-key cases AQE's skew-join can't fix, e.g. skewed aggregations).

Two helpers:
  * salted_aggregate — two-phase agg: per-(key, salt) partials, then
    final combine. Turns one hot key's single reducer into
    ``num_salts`` parallel partials. Works for any algebraic aggregate
    (sum/count/min/max and combinations thereof).
  * salted_broadcast_left — replicate-and-salt pattern for joining a
    skewed fact against a dimension too big to broadcast whole but
    small enough to replicate ``num_salts`` ways.

AQE (enabled in session.py) already splits skewed SHUFFLE JOIN
partitions at runtime; these cover the aggregation + custom-plan gaps.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows (runs per
    (keys, salt)). ``final_aggs``: name -> aggregate over the partial
    columns (runs per keys). Example::

        salted_aggregate(
            df, ["k"],
            partial_aggs={"s": F.sum("v"), "n": F.count(F.lit(1))},
            final_aggs={"total": F.sum("s"), "rows": F.sum("n")},
        )
    """
    salted = df.withColumn(_SALT, (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[c.alias(n) for n, c in final_aggs.items()])


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``fact`` to ``dim`` by salting the fact side and
    replicating the dim side ``num_salts`` ways, so one hot join key
    spreads over ``num_salts`` tasks. Use when the dim is too large to
    broadcast outright; otherwise just ``F.broadcast(dim)``."""
    on = list(on)
    salted_fact = fact.withColumn(_SALT, (F.rand(seed=42) * num_salts).cast("int"))
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_fact.join(replicated_dim, on + [_SALT], how).drop(_SALT)
