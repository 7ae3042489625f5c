"""One-ulp tolerance rule (tools/check_parity.py, VERDICT r9 #6):
pure-pandas unit tests pinning exactly what the sf>=1 sweep may
accept — a float differing by exactly one unit of its last rounded
decimal, on <= 0.1% of rows — and everything it must still fail.
No SparkSession needed."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tools.check_parity import _decimal_scale, _sf_at_least_one, one_ulp_report


def test_accepts_exactly_one_rounded_decimal_ulp():
    got = pd.DataFrame({"k": [1, 2, 3], "v": [1.23, 4.56, 7.89]})
    exp = pd.DataFrame({"k": [1, 2, 3], "v": [1.23, 4.57, 7.89]})
    ok, detail = one_ulp_report(got, exp, max_row_ppm=1_000_000)
    assert ok and detail == [("v", 1, 4.56, 4.57)]
    # mixed scales: 1.0 vs 0.99 is one ulp at the finer scale
    ok, detail = one_ulp_report(
        pd.DataFrame({"v": [1.0]}), pd.DataFrame({"v": [0.99]}),
        max_row_ppm=1_000_000,
    )
    assert ok and detail == [("v", 0, 1.0, 0.99)]
    # the documented 11-digit revenue case: .71 vs .72
    ok, _ = one_ulp_report(
        pd.DataFrame({"v": [60300455566.71]}),
        pd.DataFrame({"v": [60300455566.72]}),
        max_row_ppm=1_000_000,
    )
    assert ok


def test_rejects_everything_else():
    base = pd.DataFrame({"v": [1.23, 4.56]})
    # two ulps
    ok, why = one_ulp_report(base, pd.DataFrame({"v": [1.23, 4.58]}))
    assert not ok and "one ulp" in why
    # integer-typed diff is never a rounding artifact
    ok, why = one_ulp_report(
        pd.DataFrame({"k": [1, 2]}), pd.DataFrame({"k": [1, 3]})
    )
    assert not ok and "non-float" in why
    # NaN vs value
    ok, why = one_ulp_report(
        pd.DataFrame({"v": [np.nan, 1.0]}), pd.DataFrame({"v": [2.0, 1.0]})
    )
    assert not ok and "NaN" in why
    # both-NaN cells are equal, not diffs
    ok, detail = one_ulp_report(
        pd.DataFrame({"v": [np.nan, 1.5]}),
        pd.DataFrame({"v": [np.nan, 1.6]}),
        max_row_ppm=1_000_000,
    )
    assert ok and len(detail) == 1
    # row cap: many rows differing is a regression even if each cell
    # is one ulp (default 2,500 ppm with an 8-row absolute floor for
    # small aggregates — j1's 1-of-5 revenue row is in-class, 9 of 9
    # is not)
    ok, detail = one_ulp_report(
        pd.DataFrame({"v": [1.1] * 5}), pd.DataFrame({"v": [1.2] * 5})
    )
    assert ok and len(detail) == 5  # within the 8-row floor
    ok, why = one_ulp_report(
        pd.DataFrame({"v": [1.1] * 9}), pd.DataFrame({"v": [1.2] * 9})
    )
    assert not ok and "cap" in why


def test_scale_inference_and_sf_gate():
    assert _decimal_scale(1.23) == 2
    assert _decimal_scale(1.0) == 1
    assert _decimal_scale(123.456789) == 6
    assert _decimal_scale(1e-20) is None  # exponent form: never accepted
    assert _sf_at_least_one("/x/sf1") and _sf_at_least_one("/x/sf10")
    assert not _sf_at_least_one("/x/sf0.1")
    assert not _sf_at_least_one("/x/sf1sub10")  # subset dirs stay exact
    assert not _sf_at_least_one("/root/testdata")
