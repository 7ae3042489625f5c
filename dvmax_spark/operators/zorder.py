"""Z-order (Morton) data layout — multi-dimensional file clustering.

At 100 TB the scan you never run is the cheapest operator: laying out
files along a space-filling curve over two (or more) filter columns
lets BOTH predicates prune files, where a single-column sort serves
only one. This module computes exact Morton keys with pure integer
bit arithmetic — expressible identically in Spark and ANSI-ish SQL, so
the layout report is value-exact cross-engine (unlike engine-hashed
clustering). Writers would `repartitionByRange(morton).sortWithinPartitions
(morton).write...` — the report here quantifies the pruning a given
layout buys (per-file min/max envelopes are exactly what parquet
footers give the scanner).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns (a even positions, b odd) — the classic 2-D Morton code.
    Exact bigint arithmetic; inputs must already be quantized to
    ``[0, 2**bits)`` (mod or range-bucket them first)."""
    out = F.lit(0).cast("long")
    for k in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a.cast("long"), k).bitwiseAND(F.lit(1)), 2 * k)
            + F.shiftleft(
                F.shiftright(b.cast("long"), k).bitwiseAND(F.lit(1)), 2 * k + 1
            )
        )
    return out


def morton_key_sql(a: str, b: str, bits: int = 8) -> str:
    """The identical Morton expression as SQL text (DuckDB/ANSI bit
    operators) — keeps the two engines exact by construction."""
    terms = []
    for k in range(bits):
        terms.append(f"((({a} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({b} >> {k}) & 1) << {2 * k + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout_report(
    df: DataFrame,
    dim_a: Column,
    dim_b: Column,
    bits: int = 8,
    n_files: int = 16,
    box_a: tuple[int, int] = (64, 79),
    box_b: tuple[int, int] = (128, 143),
) -> DataFrame:
    """Simulate a Z-ordered file layout and report, per file, the
    min/max envelope of both dimensions plus whether a rectangular
    query box would scan it (the exact decision a parquet reader makes
    from footer min/max stats). ``dim_a``/``dim_b`` must be quantized
    to ``[0, 2**bits)``. File assignment is pure arithmetic on the key
    — ``file = morton * n_files div 4**bits`` — no rank, no window, no
    global structure (the writer-side claim made by mixture_schedule's
    stride keys applies verbatim)."""
    space = 4**bits
    d = df.select(dim_a.alias("qa"), dim_b.alias("qb")).withColumn(
        "m", morton_key(F.col("qa"), F.col("qb"), bits)
    )
    d = d.withColumn("file_id", F.expr(f"(m * {n_files}) div {space}"))
    lo_a, hi_a = box_a
    lo_b, hi_b = box_b
    scans = (
        (F.col("min_a") <= hi_a)
        & (F.col("max_a") >= lo_a)
        & (F.col("min_b") <= hi_b)
        & (F.col("max_b") >= lo_b)
    ).cast("int")
    return (
        d.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("qa").alias("min_a"),
            F.max("qa").alias("max_a"),
            F.min("qb").alias("min_b"),
            F.max("qb").alias("max_b"),
        )
        .withColumn("scans_box", scans)
        .select(
            "file_id", "n_rows", "min_a", "max_a", "min_b", "max_b", "scans_box"
        )
        .orderBy("file_id")
    )


def zorder_layout_sql(
    table: str = "orders",
    bits: int = 8,
    n_files: int = 16,
    box_a: tuple[int, int] = (64, 79),
    box_b: tuple[int, int] = (128, 143),
) -> str:
    """DuckDB twin of the orders-table layout report used by
    x_zorder_layout (custkey mod 2^bits x order-day mod 2^bits)."""
    space = 4**bits
    mod = 2**bits
    mkey = morton_key_sql("qa", "qb", bits)
    lo_a, hi_a = box_a
    lo_b, hi_b = box_b
    return f"""
    WITH q AS (
      SELECT o_custkey % {mod} AS qa,
             date_diff('day', DATE '1992-01-01', o_orderdate::DATE) % {mod} AS qb
      FROM {table}
    ), keyed AS (
      SELECT qa, qb, ({mkey} * {n_files}) // {space} AS file_id FROM q
    ), files AS (
      SELECT file_id, count(*) AS n_rows,
             min(qa) AS min_a, max(qa) AS max_a,
             min(qb) AS min_b, max(qb) AS max_b
      FROM keyed GROUP BY file_id
    )
    SELECT file_id, n_rows, min_a, max_a, min_b, max_b,
           CAST(min_a <= {hi_a} AND max_a >= {lo_a}
                AND min_b <= {hi_b} AND max_b >= {lo_b} AS INT) AS scans_box
    FROM files ORDER BY file_id
    """
