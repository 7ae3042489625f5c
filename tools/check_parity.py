"""Dev loop: run every oracle-backed query against DuckDB at sf0.01 and
report ALL mismatches in one pass (pytest -x equivalent but batch).

Usage: python tools/check_parity.py [--sf-dir DIR] [name ...]

``--sf-dir`` points both engines at a different table directory — e.g.
the generated second-decade corpus (tools/gen_sf1_corpus.py), turning
the sweep into a scale-parity check: the same 210 oracle pairs,
value-exact at 6M-row lineitem instead of 60k. Fixture-backed oracles
(bpe_train / bpe_fertility / pack_spfhp) are sf-pinned and raise their
_sfguard error at any other sf — skipped automatically there.
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

    argv = sys.argv[1:]
    sf_dir = SF_DIR_CORRECT
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = os.path.abspath(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    # sf-pinned fixture oracles guard themselves (loud _sfguard error);
    # at a non-default sf they are skipped rather than reported red
    SF_PINNED = {"x_bpe_train", "x_bpe_fertility", "x_pack_spfhp"}

    spark = get_spark("parity", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    only = {a for a in argv if not a.startswith("--")}
    failures, skipped = [], []
    for name, spec in all_queries().items():
        if spec.sql is None or (only and name not in only):
            continue
        if sf_dir != SF_DIR_CORRECT and name in SF_PINNED:
            skipped.append(name)
            continue
        t0 = time.perf_counter()
        try:
            got = canonicalize(spec.fn(spark, sf_dir).toPandas())
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

    if skipped:
        print(f"{len(skipped)} sf-pinned skipped at {sf_dir}: {skipped}")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
