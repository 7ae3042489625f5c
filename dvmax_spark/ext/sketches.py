"""[EXT] Mergeable distinct-count sketches (Apache DataSketches HLL,
built into Spark: ``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB pattern this enables: distinct counts don't decompose —
``countDistinct`` over a year of events must rescan the year. Sketches
do: pre-aggregate one small binary sketch per (group, partition) as
data lands, PERSIST the sketches (they're just bytes in parquet), and
answer any rollup later by unioning sketches — no rescan, no raw-data
shuffle. Union is associative/commutative, so the same sketch column
serves daily, monthly, and all-time rollups.

Accuracy: lgConfigK=12 (Spark default) gives ~1.6% relative standard
error regardless of cardinality; the estimate is deterministic for a
given input multiset (tests assert a 5% envelope vs exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """One HLL sketch per (group, day) — the persistable partial
    aggregate. Single map-side-combined shuffle on (group, day)."""
    return df.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(
        F.hll_sketch_agg(F.col(id_col)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_distinct_from_sketches(sketches: DataFrame, group_col: str) -> DataFrame:
    """Merge persisted per-day sketches to a per-group distinct-count
    estimate — touches |groups| x |days| sketch rows, never the raw
    events."""
    return sketches.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


# ----------------------------------------------------- quantile sketches

def daily_quantile_sketches(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """One KLL quantile sketch (DataSketches) per (group, day) — the
    persistable partial for percentile rollups. Same no-rescan pattern
    as the HLL distinct counts: exact percentiles need a per-group
    sort of the raw events; KLL sketches merge like any partial
    aggregate, so a year of p99s touches |groups|×|days| sketch rows."""
    return df.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(
        F.kll_sketch_agg_double(F.col(val_col).cast("double")).alias("qsketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_quantiles_from_sketches(
    sketches: DataFrame, group_col: str, quantiles: tuple[float, ...] = (0.5, 0.9)
) -> DataFrame:
    """Merge persisted per-day KLL sketches and read out quantile
    estimates per group."""
    # kll_sketch_merge_double is a BINARY scalar merge (no agg form in
    # this Spark): fold the per-day sketch list. |days| per group is
    # small by construction — the fold is over a bounded array. The
    # list is SORTED by day before folding so collect_list's partition-
    # arrival order isn't an extra variance source; note KLL estimates
    # are still randomized by design (compaction coin flips — repeated
    # merges of identical inputs differ within the rank-error bound,
    # verified empirically on this Spark), so consumers must rely on
    # the error envelope (tests/test_ext.py), never exact values.
    merged = (
        sketches.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("day"), F.col("qsketch")))
            ).alias("dls"),
            F.sum("n_rows").alias("n_rows"),
        )
        .withColumn("ls", F.expr("transform(dls, s -> s.qsketch)"))
        .withColumn(
            "m",
            F.expr(
                "aggregate(slice(ls, 2, size(ls) - 1), element_at(ls, 1),"
                " (acc, x) -> kll_sketch_merge_double(acc, x))"
            ),
        )
    )
    cols = [F.col(group_col), F.col("n_rows")]
    for q in quantiles:
        cols.append(
            F.round(
                F.kll_sketch_get_quantile_double(F.col("m"), F.lit(q)), 6
            ).alias(f"p{round(q * 100)}_est")
        )
    return merged.select(*cols)


# ------------------------------------------------------- theta set algebra

def audience_sketches(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """One theta sketch of distinct ids per group — unlike HLL, theta
    sketches support INTERSECTION and DIFFERENCE, which distinct
    counts can't answer mergeably at all (|A∩B| needs the id sets)."""
    return df.groupBy(group_col).agg(
        F.theta_sketch_agg(F.col(id_col)).alias("tsketch")
    )


def audience_overlap(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """Pairwise audience-overlap estimates between groups: |A|, |B|,
    |A∪B|, |A∩B|, |A\\B| from theta sketches. The sketch table is one
    row per group (tiny) — the pair join is broadcast; the only pass
    over the raw data is the sketch aggregation itself."""
    sk = audience_sketches(df, group_col, id_col)
    a = sk.select(F.col(group_col).alias("grp_a"), F.col("tsketch").alias("sk_a"))
    b = sk.select(F.col(group_col).alias("grp_b"), F.col("tsketch").alias("sk_b"))
    pairs = a.crossJoin(F.broadcast(b)).where(F.col("grp_a") < F.col("grp_b"))
    est = F.theta_sketch_estimate
    return pairs.select(
        "grp_a",
        "grp_b",
        F.round(est(F.col("sk_a")), 1).alias("est_a"),
        F.round(est(F.col("sk_b")), 1).alias("est_b"),
        F.round(est(F.theta_union(F.col("sk_a"), F.col("sk_b"))), 1).alias("est_union"),
        F.round(est(F.theta_intersection(F.col("sk_a"), F.col("sk_b"))), 1).alias(
            "est_intersect"
        ),
        F.round(est(F.theta_difference(F.col("sk_a"), F.col("sk_b"))), 1).alias(
            "est_a_minus_b"
        ),
    ).orderBy("grp_a", "grp_b")
