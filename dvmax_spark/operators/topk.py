"""Top-K per group (SURVEY.md §2.5 W5).

Reference idiom: sort desc, head(k), sort asc (`ticker_params/
ratios.py:41`). Spark form: row_number over a per-group ordered window
— a single shuffle on the group key, and Catalyst rewrites the
rank-filter into a per-partition top-k (WindowGroupLimit) so no group
ever materializes more than k rows per partition at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__topk_rn"


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str] | str,
    order_by: Sequence[Column | str],
    k: int,
    keep_rank: str | None = None,
) -> DataFrame:
    group_by = [group_by] if isinstance(group_by, str) else list(group_by)
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) <= k)
    if keep_rank:
        return out.withColumnRenamed(_RN, keep_rank)
    return out.drop(_RN)
