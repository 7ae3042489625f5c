from dvmax_spark.validation.rules import (
    RangeRule,
    JumpRule,
    ConsistencyRule,
    NullifyUnstableRatio,
    apply_rules,
    split_by_status,
)

__all__ = [
    "RangeRule",
    "JumpRule",
    "ConsistencyRule",
    "NullifyUnstableRatio",
    "apply_rules",
    "split_by_status",
]
