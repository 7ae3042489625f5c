"""Second batch of core-operator queries: grouping sets, set
operations, remaining validation operators (V3/V8), dict-lookup
mapping, flexible date parsing, and a feature-library composite —
each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dvmax_spark.catalog import load_table
from dvmax_spark.functions.scalar import map_lookup, parse_date_flex
from dvmax_spark.registry import query


@query(
    "a_rollup",
    ids=("A2", "A12"),
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def a_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping sets (SURVEY §2.4 'free in Spark, declared [EXT]'):
    rollup totals at (flag, status), (flag), and grand-total levels."""
    li = load_table(spark, "lineitem", sf)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "u_intersect_except",
    ids=("U4",),
    sql="""
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         high_bal    AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM with_orders INTERSECT SELECT k FROM high_bal)
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (SELECT k FROM high_bal EXCEPT SELECT k FROM with_orders)
    ORDER BY op
    """,
)
def u_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (SURVEY §2.7 [EXT] — built-in
    in Spark, absent in the reference)."""
    o = load_table(spark, "orders", sf).select(F.col("o_custkey").alias("k")).distinct()
    c = load_table(spark, "customer", sf).where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("k")
    )
    inter = o.intersect(c).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    exc = c.exceptAll(o).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return inter.unionByName(exc).orderBy("op")


@query(
    "v3_nullify_unstable",
    ids=("V3",),
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CASE WHEN abs(l_tax) <= 0.02 THEN NULL
                ELSE l_extendedprice / l_tax END AS price_per_tax,
           CASE WHEN abs(l_tax) <= 0.02 THEN 'nullified:price_per_tax' ELSE '' END AS violations
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity
    """,
)
def v3_nullify_unstable(spark: SparkSession, sf: str) -> DataFrame:
    """Tiny-denominator ratio nullification (ref
    `_maybe_nullify_unstable_ratios`, validate_dynamic_row.py:72-97)
    via the NullifyUnstableRatio rule."""
    from dvmax_spark.validation.rules import NullifyUnstableRatio, apply_rules

    li = load_table(spark, "lineitem", sf).withColumn(
        "price_per_tax", F.col("l_extendedprice") / F.col("l_tax")
    )
    out = apply_rules(
        li, [], nullify=[NullifyUnstableRatio("price_per_tax", "l_tax", floor=0.02)]
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity", "price_per_tax", "violations"
    ).orderBy("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "v8_min_history_gate",
    ids=("V8", "V9", "A1"),
    sql="""
    SELECT user_id, count(*) AS n_events
    FROM events
    WHERE ts <= TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY user_id
    HAVING count(*) >= 60
    ORDER BY user_id
    """,
)
def v8_min_history_gate(spark: SparkSession, sf: str) -> DataFrame:
    """Min-history gate (ref has_enough_price_data,
    ticker_batch_runner.py:502-506): keys with enough rows before the
    cutoff."""
    ev = load_table(spark, "events", sf)
    return (
        ev.where(F.col("ts") <= F.lit("2024-01-25 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") >= 60)
        .orderBy("user_id")
    )


@query(
    "p11_map_lookup",
    ids=("P11",),
    sql="""
    SELECT o_orderkey,
           CASE o_orderpriority
             WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
             WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE 99 END AS prio_rank
    FROM orders ORDER BY o_orderkey
    """,
)
def p11_map_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Dict-lookup mapping via an inline literal map (ref SECTOR_TO_ETF
    application, constants.py:1-23 / sector.py:36)."""
    o = load_table(spark, "orders", sf)
    ranks = {
        "1-URGENT": "1",
        "2-HIGH": "2",
        "3-MEDIUM": "3",
        "4-NOT SPECIFIED": "4",
        "5-LOW": "5",
    }
    return o.select(
        "o_orderkey",
        F.coalesce(
            map_lookup("o_orderpriority", ranks).cast("int"), F.lit(99)
        ).alias("prio_rank"),
    ).orderBy("o_orderkey")


@query(
    "f1_date_parse_flex",
    ids=("F1", "F9"),
    sql="""
    WITH s AS (
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS clean,
             'as of ' || strftime(o_orderdate, '%Y-%m-%d') || ' (final)' AS messy
      FROM orders
    )
    SELECT o_orderkey,
           CAST(strptime(clean, '%Y-%m-%d') AS DATE) AS parsed_clean,
           CAST(strptime(regexp_extract(messy, '(\\d{4})-(\\d{2})-(\\d{2})', 0), '%Y-%m-%d') AS DATE) AS parsed_messy
    FROM s ORDER BY o_orderkey
    """,
)
def f1_date_parse_flex(spark: SparkSession, sf: str) -> DataFrame:
    """Strict + regex-fallback date parsing (ref strptime fast path +
    the regex slow path, macro_batch_runner.py:11-45)."""
    o = load_table(spark, "orders", sf)
    s = o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("clean"),
        F.concat(
            F.lit("as of "), F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit(" (final)")
        ).alias("messy"),
    )
    return s.select(
        "o_orderkey",
        parse_date_flex("clean").alias("parsed_clean"),
        parse_date_flex("messy").alias("parsed_messy"),
    ).orderBy("o_orderkey")


@query(
    "fx_price_features",
    ids=("A3", "A4", "A8", "J3", "W1", "W4"),
    bench=True,
    sql="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS date, round(avg(value), 6) AS close
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), rets AS (
      SELECT user_id, date, close,
             close / nullif(lag(close) OVER w, 0) - 1 AS r,
             max(close) OVER (PARTITION BY user_id ORDER BY date
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY date)
    )
    SELECT user_id,
           round(coalesce(stddev_samp(r) * sqrt(252), 0.0), 4) AS volatility,
           round(coalesce(max(CASE WHEN peak != 0 THEN (peak - close) / peak END), 0.0), 6) AS max_drawdown,
           max_by(close, date) AS last_close
    FROM rets GROUP BY user_id ORDER BY user_id
    """,
)
def fx_price_features(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-library composite with an oracle: daily aggregation of
    the events series -> volatility + running-peak max drawdown +
    nearest-<= close, via the SAME library transforms the ticker
    pipeline uses (features/price.py)."""
    ev = load_table(spark, "events", sf)
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("date")
    ).agg(F.round(F.avg("value"), 6).alias("close"))

    # single pass: the daily agg shuffles on user_id once; the window
    # (lag + running peak share one frame) and the final groupBy reuse
    # that partitioning — one scan, one shuffle total
    w = Window.partitionBy("user_id").orderBy("date")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    enriched = daily.select(
        "user_id",
        "date",
        "close",
        (F.col("close") / F.nullif(F.lag("close", 1).over(w), F.lit(0)) - 1).alias("ret"),
        F.max("close").over(wrun).alias("peak"),
    )
    out = enriched.groupBy("user_id").agg(
        F.coalesce(F.stddev_samp("ret") * F.sqrt(F.lit(252.0)), F.lit(0.0)).alias(
            "volatility"
        ),
        F.coalesce(
            F.max(
                F.when(
                    F.col("peak") != 0, (F.col("peak") - F.col("close")) / F.col("peak")
                )
            ),
            F.lit(0.0),
        ).alias("max_drawdown"),
        F.max_by("close", "date").alias("last_close"),
    )
    return out.select(
        "user_id",
        F.round("volatility", 4).alias("volatility"),
        F.round("max_drawdown", 6).alias("max_drawdown"),
        "last_close",
    ).orderBy("user_id")
