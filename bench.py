"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count() action (forces the full plan,
returns no rows to the driver). A warmup query amortizes JVM/codegen
startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dvmax_spark.registry import all_queries
    from dvmax_spark.session import get_spark

    spark = get_spark("dvmax_bench")

    specs = {n: s for n, s in all_queries().items() if s.bench}

    # warmup: JVM + codegen + parquet footer reads
    next(iter(specs.values())).fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in specs.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
