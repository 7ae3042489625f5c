"""Exact global rank WITHOUT a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no partition key moves the
whole input through one task (Spark logs ``WindowExec: No Partition
Defined``) — a driver-adjacent bottleneck at 100 TB. This operator
computes the *identical* exact rank with the classic distributed
recipe (the same shape Spark's own ``SortExec``-based total ordering
uses):

  1. range-shuffle the rows on the ordering key
     (``repartitionByRange`` — sampled boundaries, parallel sort);
  2. pin the partitioning (``localCheckpoint``) so step 3 and step 4
     see the same physical layout;
  3. count rows per physical partition (tiny: one row per partition)
     and turn the counts into cumulative offsets on the driver —
     a bounded collect of ``numPartitions`` rows, the same bounded-
     collect class as the BPE merge table;
  4. per-partition ``row_number`` (window PARTITIONED by
     ``spark_partition_id()`` — parallel, no global sort) plus the
     broadcast offset.

Exactness requires the ordering to be TOTAL (callers must include a
unique tie-break column, which every caller in this repo already does
for cross-engine float policy). With a total order the result is
bit-identical to the single-window ``row_number`` regardless of where
the sampled range boundaries land, so DuckDB oracles need no change.

Cost: one range shuffle + one hash shuffle on partition id (both
fully parallel) instead of one all-to-one shuffle. The localCheckpoint
materializes the ranked projection once — pass a pre-pruned projection
(id + ordering columns), not the full table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Add exact 1-based global ``row_number`` over ``order_by`` —
    which MUST be a total order (include a unique tie-break) — without
    any unpartitioned window. See module docstring for the recipe.
    ``checkpoint_mode='reliable'`` pins the ranged layout on shared
    storage instead of executor memory (operators/lineage.py)."""
    from dvmax_spark.operators.lineage import cut_lineage

    order_by = list(order_by)
    spark = df.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # e.g. "auto" under some AQE setups
            num_partitions = 32
    ranged = cut_lineage(
        df.repartitionByRange(num_partitions, *order_by),
        mode=checkpoint_mode,
        eager=True,
    )
    pid = ranged.withColumn("_gr_pid", F.spark_partition_id())
    # Bounded collect: one row per physical partition (== num_partitions).
    counts = {
        r["_gr_pid"]: r["n"]
        for r in pid.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    # broadcast-join the offsets (a when-chain would nest one branch per
    # partition — a Catalyst expression-depth hazard at real partition
    # counts; the tiny join is flat at any count)
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_gr_pid int, _gr_off long"
    )
    local = F.row_number().over(
        Window.partitionBy("_gr_pid").orderBy(*order_by)
    )
    return (
        pid.join(F.broadcast(off_df), "_gr_pid", "left")
        .withColumn(
            out_col,
            (F.coalesce(F.col("_gr_off"), F.lit(0)) + local.cast("long")).alias(
                out_col
            ),
        )
        .drop("_gr_pid", "_gr_off")
    )


def with_hash_slice(
    df: DataFrame,
    cols: Sequence[str],
    n: int,
    out_col: str = "_b",
) -> DataFrame:
    """Deterministic 1-based slice assignment by key hash — pure
    map-side (zero shuffles, zero windows, zero extra jobs). The right
    stager for SLICING-INVARIANT consumers (incremental MVs, rollups,
    idempotent decontamination, exact streaming clustering): the
    result is contractually independent of how rows are batched —
    that invariance IS the tested claim — so slice composition is
    free to be a hash. Order-SENSITIVE stagers (time-contiguous
    session streams) use :func:`with_exact_ntile` instead."""
    return df.withColumn(
        out_col,
        (F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n)) + 1).cast("int"),
    )


def with_group_cumsum(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Exact per-group running sum — ``sum(value) OVER (PARTITION BY
    group ORDER BY order ROWS UNBOUNDED PRECEDING)`` — without ever
    forming a per-GROUP window pool (a hot group = one giant pool = the
    same single-task bottleneck :func:`with_global_rank` exists to
    avoid). Recipe:

      1. range-shuffle on (group, order) — groups land CONTIGUOUS
         across partition boundaries, so a hot group spreads over many
         partitions instead of pooling in one;
      2. pin the layout (lineage cut) so steps 3-4 see the same
         physical partitioning;
      3. per-(partition, group) sums (map-side combine collapses each
         task to its distinct groups before a tiny shuffle), then
         per-group cross-partition offsets via a window whose pool is
         provably ≤ ``num_partitions`` rows. Only groups that SPAN a
         partition boundary have a non-null offset, and range
         partitioning crosses each of the ``num_partitions - 1``
         boundaries with at most one group — so the offset table is
         ≤ ``num_partitions - 1`` rows: always broadcastable;
      4. per-(partition, group) running sum (pool bounded by the
         physical partition size, never by group size) + the broadcast
         offset.

    Exactness: bit-identical to the single-window form for integral /
    decimal ``value_col`` (float sums inherit the usual associativity
    caveat — the offset regroups additions) given a TOTAL ``order_by``
    within each group (include a unique tie-break). Null semantics
    match the window form too: a null GROUP key is one group (the
    offset re-join is null-safe), and null VALUES follow SQL's
    null-skipping sum (the running value is null only while the group
    has seen no non-null value yet). ``group_by=[]`` degenerates to an
    exact GLOBAL cumsum (the offset window keys on a constant; its
    pool is the ≤ ``num_partitions``-row sums table, not the input)."""
    from dvmax_spark.operators.lineage import cut_lineage

    group_by = list(group_by)
    order_by = list(order_by)
    spark = df.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            num_partitions = 32
    range_keys = [F.col(g) for g in group_by] + order_by
    ranged = cut_lineage(
        df.repartitionByRange(num_partitions, *range_keys),
        mode=checkpoint_mode,
        eager=True,
    )
    pid = ranged.withColumn("_gc_pid", F.spark_partition_id())
    psums = pid.groupBy("_gc_pid", *group_by).agg(F.sum(value_col).alias("_gc_s"))
    off_part = [F.col(g) for g in group_by] or [F.lit(0)]
    w_off = (
        Window.partitionBy(*off_part)
        .orderBy("_gc_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = psums.select(
        F.col("_gc_pid").alias("_gc_opid"),
        *[F.col(g).alias(f"_gc_g{i}") for i, g in enumerate(group_by)],
        F.sum("_gc_s").over(w_off).alias("_gc_off"),
    ).where(F.col("_gc_off").isNotNull())
    w_run = (
        Window.partitionBy("_gc_pid", *group_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pid.withColumn("_gc_run", F.sum(value_col).over(w_run))
    # null-SAFE offset join: a null group key is one group to the
    # window/groupBy above, so the re-join must treat it as one group
    # too (a plain equi-join would drop a null-keyed group's offsets)
    cond = F.col("_gc_pid") == F.col("_gc_opid")
    for i, g in enumerate(group_by):
        cond = cond & F.col(g).eqNullSafe(F.col(f"_gc_g{i}"))
    # null-skipping sum semantics, exactly as the single window: null
    # only while NO non-null value has been seen in the group so far
    # (offset rows exist iff an earlier partition saw one)
    cum = F.when(
        F.col("_gc_run").isNull() & F.col("_gc_off").isNull(), F.lit(None)
    ).otherwise(F.coalesce(F.col("_gc_run"), F.lit(0)) + F.coalesce(F.col("_gc_off"), F.lit(0)))
    return (
        run.join(F.broadcast(offs), cond, "left")
        .withColumn(out_col, cum)
        .drop(
            "_gc_pid",
            "_gc_run",
            "_gc_off",
            "_gc_opid",
            *[f"_gc_g{i}" for i in range(len(group_by))],
        )
    )


def with_group_rank(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Exact 1-based per-group ``row_number`` — ``row_number() OVER
    (PARTITION BY group ORDER BY order)`` — without a per-GROUP window
    pool: :func:`with_group_cumsum` over a constant 1 (``order_by``
    must be total within each group). Use when a group can be a whale
    (per-domain ranking on a crawl where one domain is half the
    corpus); for groups bounded by construction the plain partitioned
    window is cheaper."""
    marked = df.withColumn("_gr_one", F.lit(1).cast("long"))
    out = with_group_cumsum(
        marked,
        group_by,
        order_by,
        "_gr_one",
        out_col=out_col,
        num_partitions=num_partitions,
        checkpoint_mode=checkpoint_mode,
    )
    return out.drop("_gr_one")


def with_group_ntile(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Exact ``ntile(n) OVER (PARTITION BY group ORDER BY ...)``
    without per-group window pools: :func:`with_group_rank` for the
    in-group position, a per-group count (one aggregate row per group,
    partial-agg'd), and ntile's published arithmetic in bigint — the
    grouped completion of :func:`with_exact_ntile`. The count re-join
    keys on the group (null-safe, matching the rank's grouping); it is
    a plain shuffle join so a billion tiny groups work as well as five
    whale groups."""
    ranked = with_group_rank(
        df,
        group_by,
        order_by,
        out_col="_gn_rn",
        num_partitions=num_partitions,
        checkpoint_mode=checkpoint_mode,
    )
    group_by = list(group_by)
    counts = ranked.groupBy(*[F.col(g).alias(f"_gn_g{i}") for i, g in enumerate(group_by)]).agg(
        F.count(F.lit(1)).alias("_gn_n")
    )
    cond = F.lit(True)
    for i, g in enumerate(group_by):
        cond = cond & F.col(g).eqNullSafe(F.col(f"_gn_g{i}"))
    joined = (
        ranked.join(counts, cond, "inner")
        .withColumn("_gn_small", F.greatest(F.expr(f"_gn_n div {n}"), F.lit(1)))
        .withColumn("_gn_big", F.expr(f"_gn_n div {n}") + 1)
        .withColumn("_gn_cut", (F.col("_gn_n") % n) * F.col("_gn_big"))
    )
    bucket = F.when(
        F.col("_gn_rn") <= F.col("_gn_cut"),
        F.expr("(_gn_rn - 1) div _gn_big") + 1,
    ).otherwise(
        F.col("_gn_n") % n + F.expr("(_gn_rn - 1 - _gn_cut) div _gn_small") + 1
    )
    return joined.withColumn(out_col, bucket.cast("int")).drop(
        "_gn_rn",
        "_gn_n",
        "_gn_small",
        "_gn_big",
        "_gn_cut",
        *[f"_gn_g{i}" for i in range(len(group_by))],
    )


def group_quantiles_exact(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    tiebreak: Sequence[Column],
    qs: Sequence[tuple[int, int]],
    out_cols: Sequence[str],
    num_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """EXACT continuous quantiles per group, whale-group-safe: rank
    each group's values ONCE with :func:`with_group_rank` (no per-group
    pool), gather only the bracketing rank(s) per requested quantile,
    and interpolate — the R-7 convention both Spark ``percentile`` and
    DuckDB ``quantile_cont`` implement: position ``p = 1 + (n-1)·q``,
    result ``v[⌊p⌋] + (v[⌊p⌋+1] - v[⌊p⌋])·frac``.

    Each quantile is a RATIONAL ``(k, m)`` (0 ≤ k ≤ m), so the bracket
    position and remainder are bigint: ``lo = 1 + ((n-1)·k) div m``,
    ``rem = ((n-1)·k) mod m`` — exact at any group size (a double
    ``(n-1)*q`` is only exact below 2^53 and for dyadic q). The single
    float op is the final interpolation; for integral-valued data and
    dyadic rationals (quartiles, medians) it is bit-identical across
    engines.

    ``tiebreak`` must make (value, tiebreak) total per group — value
    ties can't change which VALUES bracket a position, but the rank
    substrate requires a total order. Contrast with the built-in
    percentile/median aggregates, which buffer each whole group inside
    one task: here the largest single pool is a physical partition.

    Returns one row per group: (group..., n_rows, *out_cols).
    """
    if len(qs) != len(out_cols):
        raise ValueError("qs and out_cols must align")
    for k, m in qs:
        if not (0 <= k <= m) or m <= 0:
            raise ValueError(f"quantile {k}/{m} outside [0, 1]")
    ranked = with_group_rank(
        df,
        group_by,
        [F.col(value_col).asc(), *tiebreak],
        out_col="_gq_rk",
        num_partitions=num_partitions,
        checkpoint_mode=checkpoint_mode,
    )
    group_by = list(group_by)
    counts = ranked.groupBy(
        *[F.col(g).alias(f"_gq_g{i}") for i, g in enumerate(group_by)]
    ).agg(F.count(F.lit(1)).alias("_gq_n"))
    cond = F.lit(True)
    for i, g in enumerate(group_by):
        cond = cond & F.col(g).eqNullSafe(F.col(f"_gq_g{i}"))
    joined = ranked.join(counts, cond, "inner")
    keep = F.lit(False)
    los, rems = [], []
    for k, m in qs:
        lo = F.expr(f"1 + ((_gq_n - 1) * {k}) div {m}")
        rem = F.expr(f"((_gq_n - 1) * {k}) % {m}")
        los.append(lo)
        rems.append(rem)
        keep = keep | (F.col("_gq_rk") == lo) | ((rem > 0) & (F.col("_gq_rk") == lo + 1))
    aggs = [F.max("_gq_n").alias("n_rows")]
    for (k, m), out, lo, rem in zip(qs, out_cols, los, rems):
        v_lo = F.min(F.when(F.col("_gq_rk") == lo, F.col(value_col)))
        v_hi = F.min(F.when((rem > 0) & (F.col("_gq_rk") == lo + 1), F.col(value_col)))
        # rem is constant within a group (a function of _gq_n); max()
        # carries it through the aggregate
        frac = F.max(rem).cast("double") / m
        aggs.append((v_lo + F.coalesce((v_hi - v_lo) * frac, F.lit(0.0))).alias(out))
    return joined.where(keep).groupBy(*group_by).agg(*aggs).orderBy(*group_by)


def group_median_exact(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    tiebreak: Sequence[Column],
    out_col: str = "median",
    num_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """EXACT median per group, whale-group-safe —
    :func:`group_quantiles_exact` at the rational 1/2. Returns one row
    per group: (group..., n_rows, out_col)."""
    return group_quantiles_exact(
        df,
        group_by,
        value_col,
        tiebreak,
        [(1, 2)],
        [out_col],
        num_partitions=num_partitions,
        checkpoint_mode=checkpoint_mode,
    )


def with_exact_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY ...)`` via :func:`with_global_rank`
    plus ntile's published arithmetic (first ``N mod n`` buckets take
    ``ceil(N/n)`` rows, the rest ``floor(N/n)``) — bit-identical to the
    single-window form for a total order, no unpartitioned window."""
    ranked = with_global_rank(
        df,
        order_by,
        out_col="_gr_rn",
        num_partitions=num_partitions,
        checkpoint_mode=checkpoint_mode,
    )
    total = ranked.agg(F.count(F.lit(1)).alias("_gr_n"))
    # All arithmetic in bigint `div`/`%` — double division is only exact
    # while N < 2^53, which would break the module's bit-exactness
    # contract at extreme scale.
    joined = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("_gr_small", F.greatest(F.expr(f"_gr_n div {n}"), F.lit(1)))
        .withColumn("_gr_big", F.expr(f"_gr_n div {n}") + 1)
        .withColumn("_gr_cut", (F.col("_gr_n") % n) * F.col("_gr_big"))
    )
    bucket = F.when(
        F.col("_gr_rn") <= F.col("_gr_cut"),
        F.expr("(_gr_rn - 1) div _gr_big") + 1,
    ).otherwise(
        F.col("_gr_n") % n + F.expr("(_gr_rn - 1 - _gr_cut) div _gr_small") + 1
    )
    return joined.withColumn(out_col, bucket.cast("int")).drop(
        "_gr_rn", "_gr_n", "_gr_small", "_gr_big", "_gr_cut"
    )
