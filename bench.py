"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed against the noop sink (forces the complete
plan including final sorts, returns nothing to the driver — unlike
count(), which lets Catalyst prune sorts/columns). Each query runs
twice and reports the min, separating plan cost from container noise
(GC, neighbor load). A warmup query amortizes JVM/codegen startup.
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

    def run(spec) -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup: JVM + codegen + parquet footer reads
    run(next(iter(specs.values())))

    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in specs.items():
        dt = round(min(run(spec), run(spec)), 3)
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
                "n": 2,  # min-of-2 runs per query (container-noise guard)
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
