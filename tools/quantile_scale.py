"""group_quantiles_exact scale evidence: exact per-group quartiles
over 10M rows with one group holding 80% of them, against the built-in
percentile aggregate (which buffers each whole group inside one task's
OpenHashMap — the 8M-row hot group becomes a single-task pool).

Checks bit equality of p25/p50/p75 between the two forms (integral
double values, dyadic rationals => both engines' R-7 arithmetic is
exact) and prints both walls.

Usage: python tools/quantile_scale.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import functions as F

    from dvmax_spark.operators.distrank import group_quantiles_exact
    from dvmax_spark.session import get_spark

    spark = get_spark("quantile_scale", shuffle_partitions=32)
    df = (
        spark.range(N)
        .withColumn(
            "g",
            F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(
                F.concat(F.lit("g"), (F.col("id") % 1_000).cast("string"))
            ),
        )
        .withColumn("v", (F.pmod(F.col("id") * 2654435761, F.lit(10_007))).cast("double"))
        .repartition(32)
        .localCheckpoint()
    )

    t0 = time.perf_counter()
    got = group_quantiles_exact(
        df,
        ["g"],
        "v",
        [F.col("id").asc()],
        [(1, 4), (1, 2), (3, 4)],
        ["p25", "p50", "p75"],
    ).localCheckpoint()
    wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    exp = df.groupBy("g").agg(
        F.expr("percentile(v, 0.25)").alias("e25"),
        F.expr("percentile(v, 0.5)").alias("e50"),
        F.expr("percentile(v, 0.75)").alias("e75"),
    ).localCheckpoint()
    wall_builtin = time.perf_counter() - t0

    mism = (
        got.join(exp, "g")
        .where(
            (F.col("p25") != F.col("e25"))
            | (F.col("p50") != F.col("e50"))
            | (F.col("p75") != F.col("e75"))
        )
        .count()
    )
    assert mism == 0, f"{mism} groups mismatch builtin percentile"
    print(
        f"rows={N} groups~1k hot_share=0.8 "
        f"distributed_wall={wall:.1f}s builtin_percentile_wall={wall_builtin:.1f}s "
        f"mismatches=0"
    )


if __name__ == "__main__":
    main()
