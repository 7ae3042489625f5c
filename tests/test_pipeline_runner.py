"""End-to-end pipeline runner test: the §3.1 lifecycle against the
incremental store (idempotent re-runs, gate behavior, OHE projection,
status sidecar)."""

from __future__ import annotations

import datetime
import json
import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def inputs(spark):
    days = pd.bdate_range("2020-01-01", "2022-12-31")
    prices = spark.createDataFrame(
        [("A", d.date(), 100.0 + i * 0.01) for i, d in enumerate(days)]
        # B has too little history -> gated out
        + [("B", d.date(), 50.0) for d in days[-50:]],
        "ticker string, date date, close double",
    )
    years = [2019, 2020, 2021, 2022]
    mk = lambda rows, schema: spark.createDataFrame(rows, schema)
    return {
        "prices": prices,
        "dividends": mk(
            [("A", datetime.date(y, 6, 1), 1.0 + 0.1 * i) for i, y in enumerate(years)],
            "ticker string, date date, dividend double",
        ),
        "splits": mk([], "ticker string, date date, split_ratio double"),
        "ratios": mk(
            [
                ("A", datetime.date(y, 12, 30), 15.0, 20.0, 0.4, 0.03, 2.0)
                for y in years
            ],
            "ticker string, date date, priceEarningsRatio double, "
            "priceToFreeCashFlowsRatio double, payoutRatio double, "
            "dividendYield double, freeCashFlowPerShare double",
        ),
        "income": mk(
            [
                ("A", datetime.date(y, 12, 30), 2.0, 100.0, 10.0, 20.0, 500.0)
                for y in years
            ],
            "ticker string, date date, eps double, operatingIncome double, "
            "interestExpense double, depreciationAndAmortization double, incomeBeforeTax double",
        ),
        "balance": mk(
            [("A", datetime.date(y, 12, 30), 1000.0, 300.0) for y in years],
            "ticker string, date date, totalDebt double, cashAndShortTermInvestments double",
        ),
        "profile": mk(
            [("A", "Energy", "USA"), ("B", "Utilities", "UK")],
            "ticker string, sector string, country string",
        ),
        "sector_index": None,
    }


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_pipeline_end_to_end(spark, inputs, tmp_path):
    from dvmax_spark.plans.ticker_pipeline import (
        run_ticker_pipeline,
        write_static_ohe_projection,
    )
    from dvmax_spark.store import FeatureStore

    root = str(tmp_path / "fs")
    dates = [datetime.date(2021, 12, 31), datetime.date(2022, 12, 30)]
    stats = run_ticker_pipeline(spark, inputs, root, dates=dates)

    dyn = FeatureStore(spark, os.path.join(root, "dynamic"), keys=["ticker", "as_of"]).read()
    rows = dyn.collect()
    # only A passes the 260-day gate; one row per as_of
    assert {r["ticker"] for r in rows} == {"A"}
    assert {str(r["as_of"]) for r in rows} == {"2021-12-31", "2022-12-30"}
    assert stats["rows_written"] == 2

    # idempotent re-run: incremental append skips existing keys
    stats2 = run_ticker_pipeline(spark, inputs, root, dates=dates)
    assert stats2["rows_written"] == 0
    assert FeatureStore(
        spark, os.path.join(root, "dynamic"), keys=["ticker", "as_of"]
    ).read().count() == 2

    # static + OHE projection
    proj = write_static_ohe_projection(spark, root)
    prow = {r["ticker"]: r.asDict() for r in proj.collect()}
    assert prow["A"]["sector_energy"] == 1.0
    assert all(isinstance(v, float) for k, v in prow["A"].items() if k != "ticker")

    # status sidecar exists and counts match
    status = json.load(open(os.path.join(root, "status", "last_run.json")))
    assert status["dates"] == 2

    # inspection report (reference report.py analog): grouped print of
    # one ticker row off the store; latest as_of picked by default
    import contextlib
    import io

    from dvmax_spark.cli import print_feature_report

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_feature_report(spark, root, "A", None)
    out = buf.getvalue()
    assert "Feature Report for A" in out
    assert "2022-12-30" in out  # latest row wins without --as-of
    assert "-> Dividends" in out and "dividend_yield" in out
    assert "-> Validation" in out
    with pytest.raises(SystemExit):
        print_feature_report(spark, root, "NOPE", None)


def test_macro_pipeline(spark, tmp_path):
    from dvmax_spark.plans.macro_pipeline import run_macro_pipeline

    rows = []
    for c in ("united_states", "germany"):
        for i, y in enumerate(range(2015, 2023)):
            rows.append(
                (c, datetime.date(y, 1, 1), 1000.0 * (1.03**i), 50.0, 2.0, 4.0, 12.0, 68.0)
            )
    raw = spark.createDataFrame(
        rows,
        "country string, date date, `GDP (USD)` double, "
        "`GDP per Capita (const USD)` double, `Inflation (%)` double, "
        "`Unemployment (%)` double, `Exports (% GDP)` double, "
        "`Private Consumption (%GDP)` double",
    )
    out = run_macro_pipeline(spark, raw, str(tmp_path / "m"))
    assert out.where("country = 'germany'").count() > 0
    assert set(out.columns) >= {
        "as_of_year", "backfilled_year", "country", "gdp_yoy_backfilled",
        "inflation_latest", "unemployment_latest",
    }
