"""Time named declared queries with the bench's methodology (noop
sink, min over N passes, warm session) without running the full bench
— the per-change measurement loop of the r10 optimization round
(guide §1). Dev tool; the artifact of record stays bench.py.

Usage: python tools/time_queries.py [-n PASSES] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from dvmax_spark.registry import REGISTRY  # noqa: F401
    import dvmax_spark.session as sess

    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]

    from dvmax_spark.session import get_spark

    spark = get_spark("time_queries")
    from dvmax_spark.registry import all_queries

    specs = all_queries()
    # warmup: touch the JVM + parquet footers once
    for name in args:
        if name not in specs:
            print(f"unknown query: {name}", file=sys.stderr)
            sys.exit(2)
    results: dict[str, float] = {}
    for p in range(n):
        for name in args:
            spark.sparkContext.setJobDescription(f"time:{name}#{p}")
            t0 = time.perf_counter()
            df = specs[name].fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[name] = min(results.get(name, 1e9), dt)
            print(f"pass{p} {name}: {dt:.3f}s", flush=True)
    print("--- min ---")
    for name in args:
        print(f"{name}: {results[name]:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
