"""Differential correctness: every registered query with an oracle must
match DuckDB exactly at sf0.01 — the same contract the driver's t2
check enforces (SURVEY.md §2.12).
"""

from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle


def _oracle_query_names():
    from dvmax_spark.registry import all_queries

    return [n for n, s in all_queries().items() if s.sql is not None]


@pytest.mark.parametrize("name", _oracle_query_names())
def test_query_matches_oracle(spark, oracle, name):
    assert_query_matches_oracle(spark, oracle, name)


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still execute and return a stable
    schema at the smoke SF."""
    from dvmax_spark.registry import all_queries

    for name, spec in all_queries().items():
        if spec.sql is None:
            df = spec.fn(spark, "/root/testdata/sf0.01")
            assert df.columns, name
            assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 20
