"""Universe pipeline (§3.3) + CLI surface tests."""

from __future__ import annotations

import pytest

import datetime
import json
import subprocess
import sys


def test_universe_pipeline(spark, tmp_path):
    from dvmax_spark.plans.universe_pipeline import run_universe_pipeline

    s1 = spark.createDataFrame([("aapl",), ("msft",), ("bad tk!",)], "ticker string")
    s2 = spark.createDataFrame([("MSFT",), ("dead",)], "ticker string")
    days = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i) for i in range(40)]
    prices = spark.createDataFrame(
        [("AAPL", d, 10.0) for d in days]
        + [("MSFT", d, 20.0) for d in days]
        + [("DEAD", days[0], 5.0)],  # only 1 recent close -> fails V9
        "ticker string, date date, close double",
    )
    out = tmp_path / "tickers.txt"
    got = run_universe_pipeline(spark, [s1, s2], prices, str(out))
    assert got == ["AAPL", "MSFT"]
    assert out.read_text().splitlines() == ["AAPL", "MSFT"]


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_cli_universe_subprocess(tmp_path):
    """Drive the CLI as a real subprocess (the console-script surface)."""
    import pandas as pd

    src = tmp_path / "src.parquet"
    pd.DataFrame({"ticker": ["aapl", "msft"]}).to_parquet(src)
    days = pd.date_range("2024-01-01", periods=40)
    prices = tmp_path / "prices.parquet"
    pd.DataFrame(
        {
            "ticker": ["AAPL"] * 40 + ["MSFT"] * 40,
            "date": list(days.date) * 2,
            "close": [10.0] * 80,
        }
    ).to_parquet(prices)
    out = tmp_path / "tickers.txt"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "dvmax_spark.cli",
            "universe",
            "--sources",
            str(src),
            "--prices",
            str(prices),
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=240,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"n_tickers": 2}
    assert out.read_text().splitlines() == ["AAPL", "MSFT"]


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_cli_corpus_subprocess(tmp_path):
    """corpus subcommand: decontaminate -> split -> pack -> shards, end
    to end off the real documents parquet, manifest checked."""
    import os

    out = tmp_path / "shards"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "dvmax_spark.cli",
            "corpus",
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--out",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=240,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["splits"]["train"] > 0
    assert stats["n_windows"] > 0 and stats["n_shards"] >= 1
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["n_windows"] == stats["n_windows"]
    assert (out / "shards").exists()
