"""Binned range join: intervals × points without a nested-loop join.

Spark lowers a raw non-equi predicate (``ts BETWEEN start AND end``)
to BroadcastNestedLoopJoin or a cartesian product — O(|L|·|R|) work
that dies long before 100 TB. The standard fix (what the commercial
range-join hints implement under the hood) is to discretize time into
fixed-width bins and turn the range predicate into an EQUI-join:

  * each interval row explodes to one row per bin it overlaps
    (``sequence(floor(start/w), floor(end/w))``);
  * each point row computes its single bin ``floor(ts/w)``;
  * hash-join on the bin key, then re-apply the exact BETWEEN as a
    residual filter.

A qualifying (interval, point) pair meets in EXACTLY one bin — the
point's — so the join introduces no duplicates and needs no post-
dedup. Cost: O(|L| · bins_per_interval + |R|) shuffled rows, with
``bin_width`` the knob trading blow-up factor (intervals spanning many
bins) against bucket selectivity; set it near the typical interval
length so the blow-up is a small constant. Skewed bins (a burst of
points in one bin) are ordinary hash-join skew — AQE's skew-join
splitting applies, unlike the nested-loop plan it replaces.

All epoch arithmetic is NTZ-safe (functions.scalar.epoch_micros):
``unix_micros``/LTZ casts would shift by session timezone on the
driver's vanilla sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvmax_spark.functions.scalar import epoch_micros


def bin_range_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_width_s: int = 86_400,
    keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` (event rows with ``ts_col``) to ``intervals``
    (rows with ``[start_col, end_col]`` bounds, inclusive) via the
    binned equi-join above. ``keys`` are additional equality columns
    present in BOTH inputs (e.g. user_id) — they join the hash key
    alongside the bin, which is both correct and the main selectivity
    lever. Returns all columns of both inputs (``keys`` once).

    ``start_col``/``end_col`` must not collide with point columns and
    ``ts_col`` must not collide with interval columns (rename before
    calling — keeps this composable without silent ambiguity).

    ``how='inner'`` only: the residual filter belongs to the join
    condition, and outer variants would need bin-level null handling —
    compose an outer effect with a left-anti on the inner result.
    """
    if how != "inner":
        raise ValueError("bin_range_join supports how='inner' only")
    w_us = int(bin_width_s) * 1_000_000
    s_us, e_us = epoch_micros(start_col), epoch_micros(end_col)
    t_us = epoch_micros(ts_col)
    lb = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(s_us / F.lit(w_us)), F.floor(e_us / F.lit(w_us))
            )
        ),
    )
    rb = points.withColumn("_rbin", F.floor(t_us / F.lit(w_us)))
    for k in keys:
        rb = rb.withColumnRenamed(k, f"_r_{k}")
    cond = (F.col("_bin") == F.col("_rbin")) & (t_us >= s_us) & (t_us <= e_us)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    return lb.join(rb, cond, "inner").drop(
        "_bin", "_rbin", *[f"_r_{k}" for k in keys]
    )
