"""distrank scale evidence: exact global rank over 10M rows (two
decades above the bench SF's corpus sizes) without a single-partition
window — wall time plus full-exactness checks (bijection 1..N and
monotonicity across range-partition boundaries), and the wall of the
single-window form for contrast.

Usage: python tools/distrank_scale.py [n_rows]
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

    from dvmax_spark.operators.distrank import with_global_rank
    from dvmax_spark.session import get_spark

    spark = get_spark("distrank_scale", shuffle_partitions=32)
    # deterministic pseudo-random order key, unique tie-break on id
    df = (
        spark.range(N)
        .withColumn("v", F.pmod(F.col("id") * 2654435761, F.lit(2**31)))
        .repartition(32)
        .localCheckpoint()
    )
    order = [F.col("v").asc(), F.col("id").asc()]

    t0 = time.perf_counter()
    ranked = with_global_rank(df, order, "rn").localCheckpoint()
    wall = time.perf_counter() - t0

    # bijection: N ranks, min 1, max N, all distinct
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("rn").alias("nd"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
    ).first()
    assert (agg["n"], agg["nd"], agg["lo"], agg["hi"]) == (N, N, 1, N), agg
    # monotone w.r.t. the order key: sorting by rank must sort by (v, id)
    # — check adjacent-rank inversions exactly with one self-join on rn+1
    nxt = ranked.select(
        (F.col("rn") - 1).alias("rn"), F.col("v").alias("v2"), F.col("id").alias("id2")
    )
    inversions = (
        ranked.join(nxt, "rn")
        .where(
            (F.col("v2") < F.col("v"))
            | ((F.col("v2") == F.col("v")) & (F.col("id2") < F.col("id")))
        )
        .count()
    )
    assert inversions == 0, inversions
    print(f"with_global_rank over {N:,} rows: {wall:.1f} s — bijection 1..N exact, 0 order inversions")

    t0 = time.perf_counter()
    single = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    single.write.format("noop").mode("overwrite").save()
    print(f"single-partition window (contrast): {time.perf_counter() - t0:.1f} s")
    spark.stop()


if __name__ == "__main__":
    main()
