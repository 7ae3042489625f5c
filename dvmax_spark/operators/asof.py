"""As-of (temporal) join — the one join type the reference needs that
Spark lacks natively.

Reference semantics reproduced (see SURVEY.md §2.3):
  * J2 — backward as-of join (`join_asof(..., strategy="backward")`,
    reference `engineering/utils.py:60`): for each left row, attach the
    latest right row whose key is <= the left key, per group.
  * J3 — nearest-<= point lookup (`engineering/utils.py:14-18`).
  * J4 — grace-window lookup: last value within [t-g, t+g]
    (`growth_features.py:10-27`).

Implementation: union the two sides tagged with a side marker, then a
single `last(payload, ignorenulls=True)` running window per group.
This is ONE shuffle (by group key) regardless of table sizes, no
range-explosion, no per-row Python — it scales to arbitrarily large
sides because each group's rows stream through one sorted window pass.
An `applyInPandas`+`merge_asof` variant would move every byte through
Python; a range-join variant explodes candidate pairs. This is the
plan shape you want at 100 TB.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_MATCH_ON = "__asof_matched_on"


def _tolerance_cond(left_on: Column, matched_on: Column, tolerance, strategy: str) -> Column:
    tol = F.expr(tolerance) if isinstance(tolerance, str) else F.lit(tolerance)
    if strategy == "backward":
        return matched_on >= left_on - tol
    return matched_on <= left_on + tol


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str = (),
    strategy: str = "backward",
    right_cols: Iterable[str] | None = None,
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Attach, to each ``left`` row, columns from the as-of-matching ``right`` row.

    Parameters mirror a conventional merge_asof: ``on`` is the ordered
    key (date/timestamp/numeric), ``by`` the equality group keys,
    ``strategy`` one of backward/forward, ``tolerance`` an optional max
    distance (SQL interval string such as ``"INTERVAL 30 DAYS"`` or a
    numeric literal for numeric keys). Ties on ``on`` match (<= / >=).

    Right value columns that collide with left column names get
    ``suffix`` appended. The matched key itself is exposed as
    ``{on}{suffix}``.
    """
    if strategy not in ("backward", "forward"):
        raise ValueError(f"unsupported strategy: {strategy}")
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    right_cols = list(right_cols)

    out_names = {}
    for c in [on] + right_cols:
        out_names[c] = c + suffix if (c in left.columns or c == on) else c

    payload = F.struct(
        F.col(on).alias(_MATCH_ON), *[F.col(c).alias(c) for c in right_cols]
    )
    right_side = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(on),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    left_side = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right_side.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    # align columns for the union: right side lacks left-only columns
    for c in left.columns:
        if c not in right_side.columns:
            right_side = right_side.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    right_side = right_side.select(*left_side.columns)

    unioned = left_side.unionByName(right_side)

    order = [F.col(on).asc(), F.col(_SIDE).asc()] if strategy == "backward" else [
        F.col(on).desc(),
        F.col(_SIDE).asc(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    matched = matched.where(F.col(_SIDE) == 1)

    if tolerance is not None:
        ok = _tolerance_cond(F.col(on), F.col(_PAYLOAD)[_MATCH_ON], tolerance, strategy)
        matched = matched.withColumn(
            _PAYLOAD, F.when(ok, F.col(_PAYLOAD)).otherwise(F.lit(None))
        )

    out = matched.select(
        *[F.col(c) for c in left.columns],
        F.col(_PAYLOAD)[_MATCH_ON].alias(out_names[on]),
        *[F.col(_PAYLOAD)[c].alias(out_names[c]) for c in right_cols],
    )
    return out


def nearest_le_lookup(df: DataFrame, on: str, value_col: str, at, by: Sequence[str] | str = ()) -> DataFrame:
    """J3: per group, the value at the latest ``on`` <= ``at``.

    The reference does ``filter(date <= d)`` then takes the last row of a
    sorted frame; order-independent Spark form is ``max_by`` (no sort,
    one partial+final aggregation).
    """
    by = [by] if isinstance(by, str) else list(by)
    filtered = df.where(F.col(on) <= F.lit(at))
    agg = [
        F.max_by(value_col, on).alias(value_col),
        F.max(on).alias(on),
    ]
    return filtered.groupBy(*by).agg(*agg) if by else filtered.agg(*agg)


def grace_window_lookup(
    df: DataFrame,
    on: str,
    value_col: str,
    target,
    grace_before,
    grace_after,
    by: Sequence[str] | str = (),
) -> DataFrame:
    """J4: per group, the LAST (max-``on``) value inside [target-g, target+g].

    Grace-window endpoint semantics follow the reference
    (`growth_features.py:10-27`): last row in window, not nearest.
    """
    by = [by] if isinstance(by, str) else list(by)
    lo = F.lit(target) - (F.expr(grace_before) if isinstance(grace_before, str) else F.lit(grace_before))
    hi = F.lit(target) + (F.expr(grace_after) if isinstance(grace_after, str) else F.lit(grace_after))
    filtered = df.where(F.col(on).between(lo, hi))
    agg = [F.max_by(value_col, on).alias(value_col), F.max(on).alias(on)]
    return filtered.groupBy(*by).agg(*agg) if by else filtered.agg(*agg)
