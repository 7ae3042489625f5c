"""with_group_cumsum scale evidence: exact per-group running sum over
10M rows with an adversarially skewed group layout (one group holds
80% of all rows, ~100k tail groups hold the rest) — the shape where
the naive per-group window serializes 8M rows through one task pool.

Checks: bit equality against the single-window form on the full 10M
rows, per-group final totals vs an independent groupBy sum, and
strict monotonicity (v >= 1 so every running value is distinct within
its group). Walls for both forms are printed for contrast.

Usage: python tools/cumsum_scale.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dvmax_spark.operators.distrank import with_group_cumsum
    from dvmax_spark.session import get_spark

    spark = get_spark("cumsum_scale", shuffle_partitions=32)
    # 80% of rows in one hot group; the rest spread over ~100k tails.
    # Deterministic pseudo-random order key, unique tie-break on id.
    df = (
        spark.range(N)
        .withColumn("r", F.pmod(F.col("id") * 2654435761, F.lit(2**31)))
        .withColumn(
            "g",
            F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(
                F.concat(F.lit("g"), (F.col("id") % 100_000).cast("string"))
            ),
        )
        .withColumn("v", (F.col("id") % 97 + 1).cast("long"))
        .repartition(32)
        .localCheckpoint()
    )
    order = [F.col("r").asc(), F.col("id").asc()]

    t0 = time.perf_counter()
    got = with_group_cumsum(df, ["g"], order, "v", "cum").localCheckpoint()
    wall = time.perf_counter() - t0

    # per-group final total == independent groupBy sum; running values
    # all distinct within the group (v >= 1 => strictly increasing)
    per = got.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("cum").alias("nd"),
        F.max("cum").alias("final"),
    )
    ind = df.groupBy("g").agg(F.sum("v").alias("total"))
    bad = per.join(ind, "g").where(
        (F.col("final") != F.col("total")) | (F.col("nd") != F.col("n"))
    )
    n_bad = bad.count()
    assert n_bad == 0, bad.limit(5).collect()

    # contrast: the naive per-group window (8M-row pool in one task)
    t0 = time.perf_counter()
    exp = df.withColumn(
        "cum",
        F.sum("v").over(
            Window.partitionBy("g")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).localCheckpoint()
    wall_single = time.perf_counter() - t0

    mism = got.select("id", "cum").join(
        exp.select("id", F.col("cum").alias("cum2")), "id"
    ).where(F.col("cum") != F.col("cum2")).count()
    assert mism == 0, f"{mism} mismatches vs single-window form"

    print(
        f"rows={N} groups~100k hot_share=0.8 "
        f"distributed_wall={wall:.1f}s single_window_wall={wall_single:.1f}s "
        f"mismatches=0 per_group_totals=exact running_values=distinct"
    )


if __name__ == "__main__":
    main()
