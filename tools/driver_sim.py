"""Driver-faithful correctness simulation.

Round-1 lesson (VERDICT.md §What's wrong #1): the external driver
builds its OWN vanilla SparkSession — none of the confs set in
dvmax_spark.session.get_spark are present. check_parity.py uses
get_spark and therefore can't catch session-dependence bugs. This
script reproduces the driver's environment:

  * vanilla SparkSession (only master + shuffle partitions, NO
    nanosAsLong / ANSI / timezone confs),
  * queries taken via the __spark_entry__ contract (queries() /
    oracle_sql()), first 50 registrations only (the driver's cap),
  * order-insensitive value compare against DuckDB at sf0.01.

Usage: python tools/driver_sim.py [--all] [name ...]
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

DRIVER_QUERY_CAP = 50


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR_CORRECT}/{t}.parquet'"
        )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_all = "--all" in sys.argv
    only = set(args)

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    names = list(qs)
    if not run_all and not only:
        names = names[:DRIVER_QUERY_CAP]

    # smoke: entry()
    t0 = time.perf_counter()
    n = entrymod.entry(spark).count()
    print(f"entry(): {n} rows ({time.perf_counter() - t0:.1f}s)")

    failures, rows_only = [], []
    for name in names:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got_df = qs[name](spark, SF_DIR_CORRECT)
            got = canonicalize(got_df.toPandas())
            if name not in sqls:
                rows_only.append(name)
                print(f"rows {name}: {len(got)} rows ({time.perf_counter() - t0:.1f}s)")
                continue
            exp = canonicalize(con.execute(sqls[name]).fetchdf())
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
    print(f"{len(rows_only)} rows-only: {rows_only}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
