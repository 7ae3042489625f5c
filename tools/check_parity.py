"""Dev loop: run every oracle-backed query against DuckDB at sf0.01 and
report ALL mismatches in one pass (pytest -x equivalent but batch).

Usage: python tools/check_parity.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from tests.conftest import SF_DIR_CORRECT, TABLES, canonicalize


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from dvmax_spark.registry import all_queries
    from dvmax_spark.session import get_spark

    spark = get_spark("parity", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR_CORRECT}/{t}.parquet'"
        )

    only = set(sys.argv[1:])
    failures = []
    for name, spec in all_queries().items():
        if spec.sql is None or (only and name not in only):
            continue
        t0 = time.perf_counter()
        try:
            got = canonicalize(spec.fn(spark, SF_DIR_CORRECT).toPandas())
            exp = canonicalize(con.execute(spec.sql).fetchdf())
            if list(got.columns) != list(exp.columns):
                raise AssertionError(f"columns {list(got.columns)} vs {list(exp.columns)}")
            if len(got) != len(exp):
                raise AssertionError(f"rows {len(got)} vs {len(exp)}")
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=False, rtol=0, atol=0
            )
            print(f"OK   {name} ({time.perf_counter() - t0:.1f}s, {len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            msg = str(e).strip().split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:12])}")
            if "--trace" in sys.argv:
                traceback.print_exc()

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
