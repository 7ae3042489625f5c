"""The reference's validation rule tables compiled to engine rules
(reference `validate_dynamic_row.py:8-61`): FEATURE_RANGES with
exclusive-lower defaults and the inclusive-lower set, the allow-missing
whitelist, tiny-denominator nullification floors, and the relative-jump
config. Violation messages are rule names (machine-checkable), not the
reference's formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dvmax_spark.validation.rules import (
    ConsistencyRule,
    JumpRule,
    NullifyUnstableRatio,
    RangeRule,
    apply_rules,
)

# (lo, hi) — hi always exclusive; lo exclusive unless in _LOWER_INCLUSIVE
FEATURE_RANGES: dict[str, tuple[float, float]] = {
    "6m_return": (-1.0, 10.0),
    "12m_return": (-1.0, 20.0),
    "volatility": (0.0, 3.0),
    "max_drawdown_1y": (0.0, 1.0),
    "sector_relative_6m": (-1.0, 1.0),
    "sma_50_200_delta": (-1.0, 1.0),
    "net_debt_to_ebitda": (-10.0, 20.0),
    "eps_cagr_3y": (-1.0, 5.0),
    "fcf_cagr_3y": (-1.0, 5.0),
    "dividend_yield": (0.0, 0.25),
    "dividend_cagr_3y": (-1.0, 3.0),
    "dividend_cagr_5y": (-1.0, 3.0),
    "yield_vs_5y_median": (-0.75, 0.75),
    "pe_ratio": (0.0, 300.0),
    "pfcf_ratio": (0.0, 500.0),
    "payout_ratio": (0.0, 2.0),
}

_LOWER_INCLUSIVE = {
    "dividend_yield",
    "max_drawdown_1y",
    "volatility",
    "payout_ratio",
    "pe_ratio",
    "pfcf_ratio",
}

_TINY = 1e-6
TINY_FCF = 1.0
TINY_EBITDA = 1.0
TINY_INTEREST_EXP = 1.0

# col -> (limit, prev_floor); ratio is |cur/prev| (one-sided, like the
# reference — not symmetric)
REL_JUMP_CFG: dict[str, tuple[float, float]] = {
    "pfcf_ratio": (15.0, 1.0),
    "net_debt_to_ebitda": (25.0, 0.5),
    "dividend_yield": (10.0, 0.005),
    "pe_ratio": (12.0, 5.0),
    "payout_ratio": (5.0, 0.2),
    "volatility": (3.0, 0.05),
}


def reference_rules(
    by: str = "ticker", order_col: str | None = None
) -> tuple[list, list]:
    """(rules, nullify) — pass order_col to enable jump checks across
    consecutive as_of rows (needs a history frame)."""
    rules: list = [
        RangeRule(col, lo, hi, lower_inclusive=col in _LOWER_INCLUSIVE, upper_inclusive=False)
        for col, (lo, hi) in FEATURE_RANGES.items()
    ]
    rules.append(
        ConsistencyRule(
            "eic_capped_le_raw",
            # capped value may not exceed raw (validate_dynamic_row.py:136-142)
            lambda df: ~(
                df["ebit_interest_cover"].isNotNull()
                & df["ebit_interest_cover_raw"].isNotNull()
                & (df["ebit_interest_cover"] > df["ebit_interest_cover_raw"] + 1e-9)
            )
            if "ebit_interest_cover_raw" in df.columns
            else df["ebit_interest_cover"].isNotNull() | df["ebit_interest_cover"].isNull(),
        )
    )
    if order_col:
        for col, (limit, floor) in REL_JUMP_CFG.items():
            rules.append(
                JumpRule(
                    col,
                    limit=limit,
                    keys=(by,),
                    order_col=order_col,
                    prev_floor=max(floor, _TINY),
                )
            )
    nullify = [
        NullifyUnstableRatio("pfcf_ratio", "free_cash_flow", TINY_FCF),
        NullifyUnstableRatio("net_debt_to_ebitda", "ebitda", TINY_EBITDA),
        NullifyUnstableRatio("ebit_interest_cover", "interest_expense", TINY_INTEREST_EXP),
    ]
    return rules, nullify


def validate_dynamic_rows(
    dynamic: DataFrame, by: str = "ticker", order_col: str | None = None
) -> DataFrame:
    """Apply the reference rule profile; nullify rules run only for the
    denominator columns present in the frame."""
    rules, nullify = reference_rules(by=by, order_col=order_col)
    present = set(dynamic.columns)
    rules = [r for r in rules if getattr(r, "col", None) in present or not hasattr(r, "col")]
    nullify = [
        n for n in nullify if n.ratio_col in present and n.denom_col in present
    ]
    return apply_rules(dynamic, rules, nullify=nullify)
