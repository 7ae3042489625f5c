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


# ----------------------------------------------------- count-min sketch

def _cms_hash(key: Column, row: int, width: int) -> Column:
    """Portable md5-derived bucket for hash row ``row`` — engine-
    independent (same construction as dedup's _portable_hash), so the
    whole sketch has an exact SQL twin."""
    return (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(F.lit(f"{row}:"), key.cast("string")), "utf-8")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_table(df: DataFrame, key_col: str, width: int = 64, depth: int = 4) -> DataFrame:
    """Count-Min sketch of key OCCURRENCES: ``depth`` independent hash
    rows × ``width`` counters (row, col, counter).

    Unlike HLL/KLL/theta, CMS counters are plain SUMS — the sketch is
    merge-invariant under ANY partitioning or partial aggregation, so
    it is exactly deterministic and carries a value-exact DuckDB
    oracle (the rest of the sketch family is error-band tested
    instead). Scale shape: exact per-key partial counts first (one
    hash-agg — the explode to depth rows happens on the |keys|-sized
    aggregate, not the event stream), then a (row, col) re-aggregate
    into depth×width cells; estimates never underestimate
    (est >= true count, property-tested)."""
    per = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    rows = [
        per.select(
            F.lit(j).alias("row"),
            _cms_hash(F.col(key_col), j, width).alias("col"),
            F.col("n"),
        )
        for j in range(depth)
    ]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionAll(r)
    return u.groupBy("row", "col").agg(F.sum("n").cast("long").alias("counter"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    width: int = 64,
    depth: int = 4,
    cms: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` exact heavy hitters with their CMS ESTIMATES — the
    standard sketch-accuracy report (est = min over rows of the probed
    counter; overest = est - true >= 0 always). Pass ``cms`` to probe
    a PREBUILT sketch table (e.g. one maintained from a stream by
    stream_into_cms) instead of sketching ``df`` — merge-invariance
    makes the two byte-identical, which t_stream_cms proves against
    the same exact oracle."""
    per = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    # distributed top-k (TakeOrderedAndProject with a collision-free
    # tie-break), NOT an unpartitioned row_number window — the window
    # form funnels every key through one partition at scale
    top = per.orderBy(F.col("n_events").desc(), F.col(key_col).asc()).limit(k)
    if cms is None:
        cms = cms_table(df, key_col, width, depth)
    probes = None
    for j in range(depth):
        p = top.select(
            key_col,
            "n_events",
            F.lit(j).alias("row"),
            _cms_hash(F.col(key_col), j, width).alias("col"),
        )
        probes = p if probes is None else probes.unionAll(p)
    est = (
        probes.join(F.broadcast(cms), ["row", "col"])
        .groupBy(key_col, "n_events")
        .agg(F.min("counter").alias("est"))
    )
    return est.select(
        key_col,
        "n_events",
        "est",
        (F.col("est") - F.col("n_events")).alias("overest"),
    ).orderBy(F.col("n_events").desc(), F.col(key_col).asc())


def cms_heavy_hitters_sql(
    key_col: str = "user_id",
    table: str = "events",
    k: int = 10,
    width: int = 64,
    depth: int = 4,
) -> str:
    def h(j: int, key: str) -> str:
        return (
            f"(('0x' || substr(md5('{j}:' || CAST({key} AS VARCHAR)), 1, 15))::BIGINT"
            f" % {width})"
        )

    rows_sql = " UNION ALL ".join(
        f"SELECT {j} AS row, {h(j, key_col)} AS col, n FROM per" for j in range(depth)
    )
    probes_sql = " UNION ALL ".join(
        f"SELECT {key_col}, n_events, {j} AS row, {h(j, key_col)} AS col FROM top"
        for j in range(depth)
    )
    return f"""
    WITH per AS (
      SELECT {key_col}, count(*) AS n FROM {table} GROUP BY {key_col}
    ),
    cells AS ({rows_sql}),
    cms AS (
      SELECT row, col, CAST(sum(n) AS BIGINT) AS counter
      FROM cells GROUP BY row, col
    ),
    top AS (
      SELECT {key_col}, CAST(n AS BIGINT) AS n_events
      FROM per ORDER BY n DESC, {key_col} ASC LIMIT {k}
    ),
    probes AS ({probes_sql}),
    est AS (
      SELECT p.{key_col}, p.n_events, min(c.counter) AS est
      FROM probes p JOIN cms c USING (row, col)
      GROUP BY p.{key_col}, p.n_events
    )
    SELECT {key_col}, n_events, est, est - n_events AS overest
    FROM est ORDER BY n_events DESC, {key_col} ASC
    """
