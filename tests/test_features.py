"""Golden-value feature tests: expected values ported from the
reference's unit tests (tests/dataprep/features/engineering/
test_features.py, test_growth_features.py — the executable spec per
SURVEY §5), evaluated against the distributed implementations.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def _prices(spark, rows, ticker="T"):
    return spark.createDataFrame(
        [(ticker, datetime.date.fromisoformat(d), float(c)) for d, c in rows],
        "ticker string, date date, close double",
    )


def _one(df, col):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][col]


def test_6m_return(spark):
    # ref test_compute_6m_return: 100 -> 120 over 6m => 0.2
    from dvmax_spark.features.price import return_over_period

    df = _prices(spark, [("2024-01-01", 100), ("2024-07-01", 120)])
    out = return_over_period(df, datetime.date(2024, 7, 1), months=6, out="r")
    assert _one(out, "r") == pytest.approx(0.2, rel=1e-2)


def test_6m_return_precise(spark):
    # ref test_compute_6m_return_precise_date
    from dvmax_spark.features.price import return_over_period

    df = _prices(spark, [("2024-11-17", 228.0), ("2025-05-17", 211.26)])
    out = return_over_period(df, datetime.date(2025, 5, 17), months=6, out="r")
    assert _one(out, "r") == pytest.approx((211.26 - 228.0) / 228.0, rel=1e-4)


def test_12m_return(spark):
    from dvmax_spark.features.price import return_over_period

    df = _prices(spark, [("2023-07-01", 100), ("2024-07-01", 130)])
    out = return_over_period(df, datetime.date(2024, 7, 1), months=12, out="r")
    assert _one(out, "r") == pytest.approx(0.3, rel=1e-2)


def test_max_drawdown_basic(spark):
    # ref: closes 100,150,90 => (150-90)/150
    from dvmax_spark.features.price import max_drawdown_feature

    df = _prices(spark, [("2023-01-01", 100), ("2023-06-01", 150), ("2023-12-31", 90)])
    out = max_drawdown_feature(df, lookback_years=1, out="dd")
    assert _one(out, "dd") == pytest.approx((150 - 90) / 150, rel=1e-4)


def test_max_drawdown_larger_range(spark):
    # ref test_compute_max_drawdown_larger_range: drawdown 120 -> 80
    from dvmax_spark.features.price import max_drawdown_feature

    rows = [
        ("2019-01-01", 50), ("2020-01-01", 100), ("2020-06-01", 110),
        ("2021-01-01", 95), ("2021-06-01", 120), ("2022-01-01", 80),
        ("2023-01-01", 90), ("2023-06-01", 130), ("2023-12-31", 125),
    ]
    out = max_drawdown_feature(_prices(spark, rows), lookback_years=4, out="dd")
    assert _one(out, "dd") == pytest.approx((120 - 80) / 120, rel=1e-4)


def test_volatility_nonnegative(spark):
    from dvmax_spark.features.price import volatility

    df = _prices(spark, [("2024-01-01", 100), ("2024-01-02", 101), ("2024-01-03", 102)])
    assert _one(volatility(df, out="v"), "v") >= 0


def test_sector_relative_return(spark):
    # ref test_compute_sector_relative_return_simple_case:
    # (120/100) - (210/200) computed as return difference
    from dvmax_spark.features.price import sector_relative_return

    stock = _prices(spark, [("2023-07-05", 100), ("2024-01-01", 120)])
    bench = spark.createDataFrame(
        [("XLK", datetime.date(2023, 7, 5), 200.0), ("XLK", datetime.date(2024, 1, 1), 210.0)],
        "sector_etf string, date date, close double",
    )
    mapping = spark.createDataFrame([("T", "XLK")], "ticker string, sector_etf string")
    out = sector_relative_return(
        stock, bench, lookback_days=180, as_of=datetime.date(2024, 1, 1), mapping=mapping, out="rel"
    )
    assert _one(out, "rel") == pytest.approx((120 / 100 - 1) - (210 / 200 - 1), abs=1e-9)


def test_payout_ratio_last_positive(spark):
    from dvmax_spark.features.price import payout_ratio

    df = spark.createDataFrame(
        [("T", datetime.date(2021, 1, 1), 0.3), ("T", datetime.date(2022, 1, 1), 0.4)],
        "ticker string, date date, payoutRatio double",
    )
    assert _one(payout_ratio(df, out="p"), "p") == pytest.approx(0.4)


def test_sma_delta_insufficient_rows_is_null(spark):
    from dvmax_spark.features.price import sma_delta_50_200

    df = _prices(spark, [("2024-01-01", 100), ("2024-01-02", 101)])
    assert _one(sma_delta_50_200(df, out="s"), "s") is None


def test_sma_delta_all_zero_is_zero(spark):
    # ref test_features.py:162-168: all-zero SMA -> 0.0
    from dvmax_spark.features.price import sma_delta_50_200

    base = datetime.date(2023, 1, 1)
    rows = [(str(base + datetime.timedelta(days=i)), 0.0) for i in range(220)]
    df = _prices(spark, rows)
    assert _one(sma_delta_50_200(df, out="s"), "s") == 0.0


def test_cagr_basic(spark):
    # ref test_compute_cagr_basic: eps 2->4 over 3y => (4/2)^(1/3)-1
    from dvmax_spark.features.growth import cagr_generic

    df = spark.createDataFrame(
        [
            ("T", datetime.date(2021, 1, 1), 2.0),
            ("T", datetime.date(2022, 1, 1), 2.5),
            ("T", datetime.date(2023, 1, 1), 3.0),
            ("T", datetime.date(2024, 1, 1), 4.0),
        ],
        "ticker string, date date, eps double",
    )
    out = cagr_generic(df, "eps", 3, out="c")
    assert _one(out, "c") == pytest.approx((4.0 / 2.0) ** (1 / 3) - 1, rel=1e-4)


def test_cagr_insufficient_data_null(spark):
    from dvmax_spark.features.growth import cagr_generic

    df = spark.createDataFrame(
        [("T", datetime.date(2024, 1, 1), 2.0)], "ticker string, date date, eps double"
    )
    assert _one(cagr_generic(df, "eps", 3, out="c"), "c") is None


def test_cagr_grace_window_miss_null(spark):
    # ref: looking back 5y to 2019 but earliest point 2022 => NaN
    from dvmax_spark.features.growth import cagr_generic

    df = spark.createDataFrame(
        [
            ("T", datetime.date(2022, 1, 1), 2.0),
            ("T", datetime.date(2023, 1, 1), 2.5),
            ("T", datetime.date(2024, 1, 1), 3.0),
        ],
        "ticker string, date date, eps double",
    )
    assert _one(cagr_generic(df, "eps", 5, out="c"), "c") is None


def test_dividend_cagr_with_grace_months(spark):
    # ref test_compute_dividend_cagr_basic: 1.0 -> 2.0 over 5y (grace 3mo)
    from dvmax_spark.features.growth import dividend_cagr

    df = spark.createDataFrame(
        [
            ("T", datetime.date(2019, 1, 1), 1.0),
            ("T", datetime.date(2020, 1, 1), 1.1),
            ("T", datetime.date(2024, 1, 1), 2.0),
        ],
        "ticker string, date date, dividend double",
    )
    empty_splits = spark.createDataFrame(
        [], "ticker string, date date, split_ratio double"
    )
    out = dividend_cagr(df, empty_splits, years=5)
    assert _one(out, "dividend_cagr_5y") == pytest.approx((2.0) ** (1 / 5) - 1, rel=1e-4)


def test_split_adjustment(spark):
    # 2:1 split on 2023-01-01 halves values from that date backward? No —
    # backward cumulative semantics: values AT/AFTER the split date are
    # divided by the cumulative ratio (utils.py:49-69)
    from dvmax_spark.features.tsutils import adjust_series_for_splits

    df = spark.createDataFrame(
        [
            ("T", datetime.date(2022, 6, 1), 2.0),
            ("T", datetime.date(2023, 6, 1), 2.2),
        ],
        "ticker string, date date, dividend double",
    )
    splits = spark.createDataFrame(
        [("T", datetime.date(2023, 1, 1), 2.0)], "ticker string, date date, split_ratio double"
    )
    out = adjust_series_for_splits(df, splits, "dividend").orderBy("date").collect()
    assert out[0]["dividend"] == pytest.approx(2.0)  # before split: factor 1
    assert out[1]["dividend"] == pytest.approx(1.1)  # after split: /2


def test_ebit_interest_cover_cap_and_flags(spark):
    from dvmax_spark.features.fundamental import ebit_interest_cover

    df = spark.createDataFrame(
        [
            ("T", datetime.date(2024, 1, 1), 100.0, 10.0),   # raw 10, below cap
            ("U", datetime.date(2024, 1, 1), 5000.0, 1.0),   # raw 5000 -> inf, capped
            ("V", datetime.date(2024, 1, 1), 100.0, 0.0),    # interest 0 -> null raw
        ],
        "ticker string, date date, operatingIncome double, interestExpense double",
    )
    rows = {r["ticker"]: r for r in ebit_interest_cover(df).collect()}
    assert rows["T"]["ebit_interest_cover"] == pytest.approx(10.0)
    assert rows["T"]["ebit_interest_cover_capped"] is False
    assert rows["U"]["ebit_interest_cover"] == float("inf")
    assert rows["U"]["ebit_interest_cover_capped"] is True
    assert rows["V"]["ebit_interest_cover_raw"] is None
    assert rows["V"]["ebit_interest_cover_capped"] is True


def test_yield_vs_median(spark):
    from dvmax_spark.features.dividend import yield_vs_median

    rows = [
        ("T", datetime.date(2020 + i, 1, 1), y)
        for i, y in enumerate([0.02, 0.03, 0.04, 0.03, 0.05])
    ]
    df = spark.createDataFrame(rows, "ticker string, date date, dividendYield double")
    out = yield_vs_median(df, lookback_years=5, out="y")
    # median of [0.02,0.03,0.04,0.03,0.05] = 0.03; current 0.05
    assert _one(out, "y") == pytest.approx((0.05 - 0.03) / 0.03, rel=1e-6)


def test_latest_pe_pfcf_fallback_zero(spark):
    from dvmax_spark.features.valuation import latest_pe_pfcf

    df = spark.createDataFrame(
        [("T", datetime.date(2024, 1, 1), -1.0, -2.0)],
        "ticker string, date date, priceEarningsRatio double, priceToFreeCashFlowsRatio double",
    )
    row = latest_pe_pfcf(df).collect()[0]
    assert row["pe_ratio"] == 0.0 and row["pfcf_ratio"] == 0.0


def test_static_one_hot(spark):
    from dvmax_spark.features.static import encode_static

    df = spark.createDataFrame(
        [
            ("T", "Technology", "USA"),
            ("U", "Quantum Farming", "Atlantis"),
            ("V", "Energy", "Japan"),
        ],
        "ticker string, sector string, country string",
    )
    out = {r["ticker"]: r.asDict() for r in encode_static(df).collect()}
    # reference quirk mirrored: Technology -> 'Information Technology'
    # rewrite lands OUTSIDE the vocab => sector_other
    assert out["T"]["sector_technology"] == 0
    assert out["T"]["sector_other"] == 1
    assert out["T"]["country_usa"] == 1
    assert out["V"]["sector_energy"] == 1
    assert out["V"]["sector_other"] == 0
    assert out["V"]["country_japan"] == 1
    assert out["U"]["sector_other"] == 1
    assert out["U"]["country_other"] == 1


def test_ewma_fixed_horizon_matches_sequential_reference(spark):
    """ewma_fixed_horizon == a sequential Python reference (truncated
    exponential weights, partial-window renormalization, floor div)
    on a series longer than the horizon, incl. the short head."""
    from dvmax_spark.features.price import ewma_fixed_horizon

    vals = [(i * 7919) % 1000 + 1 for i in range(40)]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k long, t long, cents long"
    )
    out = {
        r["t"]: r["ewma_cents"]
        for r in ewma_fixed_horizon(df, F.col("cents"), "k", ("t",)).collect()
    }
    W = [1 * 3**j * 4 ** (15 - j) for j in range(16)]
    for t in range(len(vals)):
        avail = min(t + 1, 16)
        num = sum(W[j] * vals[t - j] for j in range(avail))
        den = sum(W[:avail])
        assert out[t] == num // den, f"t={t}"


def test_ewma_fixed_horizon_no_overflow_at_max_money(spark):
    """Max representable order value (tens of millions of cents) times
    the full weight sum must not overflow BIGINT — regression for the
    int32 weight-literal bug found in review."""
    from dvmax_spark.features.price import ewma_fixed_horizon

    df = spark.createDataFrame(
        [(1, i, 50_000_000) for i in range(20)], "k long, t long, cents long"
    )
    rows = ewma_fixed_horizon(df, F.col("cents"), "k", ("t",)).collect()
    assert all(r["ewma_cents"] == 50_000_000 for r in rows)


def test_tfidf_cosine_ignores_corpus_wide_boilerplate(spark):
    """Docs overlapping ONLY in a token present in every document get
    no pair (idf 0 drops it from every vector); docs sharing their
    rare content tokens pair with cos ~ 1."""
    from dvmax_spark.ext.retrieval import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "the alpha beta"),
            (2, "the alpha beta"),
            (3, "the gamma delta"),
            (4, "the epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in tfidf_cosine_pairs(docs, threshold=0.5).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 1.0


def test_ewma_fixed_horizon_null_values_contribute_no_weight(spark):
    """A null value drops its weight from BOTH num and den (the EWMA of
    the remaining reachable values, renormalized); a row whose whole
    window is null yields null rather than dividing by zero. Pins the
    engine-parity semantics of the SQL twin's coalesce on every term
    including lag 0."""
    from dvmax_spark.features.price import ewma_fixed_horizon

    df = spark.createDataFrame(
        [(1, 0, None), (1, 1, 100), (1, 2, None), (1, 3, 300)],
        "k long, t long, cents long",
    )
    out = {
        r["t"]: r["ewma_cents"]
        for r in ewma_fixed_horizon(df, F.col("cents"), "k", ("t",)).collect()
    }
    W = [1 * 3**j * 4 ** (15 - j) for j in range(16)]
    assert out[0] is None  # only the null row in reach
    assert out[1] == 100  # single value
    assert out[2] == 100  # lag-1 value only (own row null)
    assert out[3] == (W[0] * 300 + W[2] * 100) // (W[0] + W[2])
