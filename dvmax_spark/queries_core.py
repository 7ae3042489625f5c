"""Core operator queries (SURVEY.md §2.1-§2.9) with DuckDB oracles.

Each query exercises one operator family from the reference inventory
on the driver's TPC-H-ish testdata, per the FIXTURES.md §4 mapping.
Reference file:line citations sit on each function so parity can be
checked against SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dvmax_spark.catalog import load_table
from dvmax_spark.functions.scalar import one_hot_exprs, safe_div
from dvmax_spark.operators.asof import asof_join
from dvmax_spark.operators.topk import top_k_per_group
from dvmax_spark.operators.union_ops import align_and_union
from dvmax_spark.operators.upsert import upsert_keep_last
from dvmax_spark.operators.windows import max_drawdown, trailing_mean
from dvmax_spark.registry import query
from dvmax_spark.validation.rules import RangeRule, apply_rules

# ---------------------------------------------------------------- scans


@query(
    "s1_scan_project",
    ids=("S1", "P1", "O1", "O2"),
    bench=True,
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
    """,
)
def s1_scan_project(spark: SparkSession, sf: str) -> DataFrame:
    """Parquet scan + column projection (ref `pl.read_parquet` + select,
    ticker_batch_runner.py:269; prices.py:34). Column pruning reaches the
    scan (ReadSchema shows 4 cols)."""
    li = load_table(spark, "lineitem", sf)
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag").orderBy(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "a1_pricing_summary",
    ids=("A1", "A2", "A3", "A4", "P2", "F4", "F5", "O1"),
    bench=True,
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                       AS avg_qty,
           round(avg(l_extendedprice), 4)                                  AS avg_price,
           round(avg(l_discount), 6)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q1-shaped summary: the flagship scan→filter→agg→sort plan.
    Covers the reference's count/mean/std family (price_features.py:38-45,
    117-124) as partial+final hash aggregation (map-side combine, one
    shuffle on the 2 group keys)."""
    li = load_table(spark, "lineitem", sf)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "p2_filter_predicates",
    ids=("P2", "P3", "P4", "A1", "A2"),
    sql="""
    SELECT count(*)                          AS n,
           round(sum(l_extendedprice), 2)    AS total,
           CAST(min(l_shipdate) AS DATE)     AS first_ship,
           CAST(max(l_shipdate) AS DATE)     AS last_ship
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
      AND l_discount > 0.05
      AND l_quantity IS NOT NULL
    """,
)
def p2_filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """Date-range + value predicates + null filter (ref `_slice`
    dividends.py:80-83; `> 0` filters valuation_features.py:17-20) —
    all pushed to the parquet scan."""
    li = load_table(spark, "lineitem", sf)
    d = F.col("l_shipdate").cast("date")
    return (
        li.where(
            d.between(F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
            & (F.col("l_discount") > 0.05)
            & F.col("l_quantity").isNotNull()
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
            F.min(d).alias("first_ship"),
            F.max(d).alias("last_ship"),
        )
    )


# ---------------------------------------------------------------- joins


@query(
    "j1_inner_join_agg",
    ids=("J1", "A2", "F4"),
    bench=True,
    sql="""
    SELECT o.o_orderpriority                                            AS priority,
           count(*)                                                     AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)        AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def j1_inner_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join fact⋈fact (ref income⋈balance on date,
    ticker_row_builder.py:42). Shuffle-hash/sort-merge on l_orderkey;
    AQE may convert to broadcast at small SF."""
    li = load_table(spark, "lineitem", sf)
    o = load_table(spark, "orders", sf)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("priority")
    )


@query(
    "j7_dim_enrichment",
    ids=("J7", "J1", "A2"),
    bench=True,
    sql="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_customers, round(avg(c.c_acctbal), 4) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def j7_dim_enrichment(spark: SparkSession, sf: str) -> DataFrame:
    """Dim-enrichment star join (ref fact⋈static⋈macro, SURVEY §2.3 J7).
    Both dims are broadcast — zero shuffles for the joins, one for the agg."""
    c = load_table(spark, "customer", sf)
    n = load_table(spark, "nation", sf)
    r = load_table(spark, "region", sf)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("region", "nation")
    )


@query(
    "j6_anti_join",
    ids=("J6",),
    sql="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_without_orders
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01'
    )
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def j6_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join (ref skip-already-materialized keys,
    ticker_batch_runner.py:433-443). Anti-joins against a date slice so
    the expected output is non-empty — a 0-row hash match is weak
    evidence of anti-join semantics."""
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf).where(
        F.col("o_orderdate").cast("date") >= F.lit("1998-01-01").cast("date")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
        .orderBy("segment")
    )


@query(
    "j_semi_join",
    ids=("J6",),
    sql="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_active
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
    )
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def j_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (EXISTS) — the complement of J6, exposed for
    completeness (SURVEY §2.3 'engine exposes all join types')."""
    c = load_table(spark, "customer", sf)
    o = load_table(spark, "orders", sf).where(
        F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("segment")
    )


@query(
    "j2_asof_backward",
    ids=("J2",),
    bench=True,
    sql="""
    SELECT v.event_id, v.user_id, v.ts,
           p.value AS purchase_value, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND p.ts <= v.ts
    ORDER BY v.event_id
    """,
)
def j2_asof_backward(spark: SparkSession, sf: str) -> DataFrame:
    """Backward as-of join (ref `join_asof(..., strategy="backward")`,
    engineering/utils.py:60): each view event gets the latest same-user
    purchase at ts <= view.ts. Single shuffle on user_id (union+window
    plan — see operators/asof.py)."""
    ev = load_table(spark, "events", sf)
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(
        views, purchases, on="ts", by="user_id", strategy="backward", right_cols=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
        F.col("ts_right").alias("purchase_ts"),
    ).orderBy("event_id")


@query(
    "j_asof_forward",
    ids=("J2",),
    sql="""
    SELECT v.event_id, v.user_id, v.ts,
           p.value AS next_purchase_value, p.ts AS next_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND p.ts >= v.ts
    ORDER BY v.event_id
    """,
)
def j_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of join (the strategy='forward' branch of
    operators/asof.py — ref join_asof direction flag): each view event
    gets the EARLIEST same-user purchase at ts >= view.ts (time-to-
    conversion shape). Same single-shuffle union+window plan as j2."""
    ev = load_table(spark, "events", sf)
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(
        views, purchases, on="ts", by="user_id", strategy="forward", right_cols=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("next_purchase_value"),
        F.col("ts_right").alias("next_purchase_ts"),
    ).orderBy("event_id")


@query(
    "j3_nearest_le_lookup",
    ids=("J3", "A6"),
    sql="""
    SELECT user_id,
           max_by(value, ts) AS value,
           max(ts)           AS ts
    FROM events
    WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def j3_nearest_le_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-<= point lookup (ref `find_nearest_price`,
    engineering/utils.py:14-18): filter + max_by, no sort."""
    from dvmax_spark.operators.asof import nearest_le_lookup

    ev = load_table(spark, "events", sf)
    return nearest_le_lookup(
        ev, on="ts", value_col="value", at="2024-01-15 00:00:00", by="user_id"
    ).orderBy("user_id")


@query(
    "j4_grace_window_lookup",
    ids=("J4", "A6"),
    sql="""
    SELECT user_id, max_by(value, ts) AS value, max(ts) AS ts
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 3 DAY
                 AND TIMESTAMP '2024-01-15 00:00:00' + INTERVAL 3 DAY
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def j4_grace_window_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Grace-window lookup (ref `find_value_near_date`,
    growth_features.py:10-27): LAST value within [t-g, t+g]."""
    from dvmax_spark.operators.asof import grace_window_lookup

    ev = load_table(spark, "events", sf)
    return grace_window_lookup(
        ev,
        on="ts",
        value_col="value",
        target="2024-01-15 00:00:00",
        grace_before="INTERVAL 3 DAYS",
        grace_after="INTERVAL 3 DAYS",
        by="user_id",
    ).orderBy("user_id")


@query(
    "j5_upsert_keep_last",
    ids=("J5", "U1", "A10"),
    bench=True,
    sql="""
    WITH existing AS (
      SELECT l_orderkey, l_linenumber, max(l_quantity) AS qty, 0 AS src
      FROM lineitem GROUP BY l_orderkey, l_linenumber
    ), updates AS (
      SELECT l_orderkey, l_linenumber, max(l_quantity) * 2 AS qty, 1 AS src
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey, l_linenumber
    ), tagged AS (
      SELECT * FROM existing UNION ALL SELECT * FROM updates
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber ORDER BY src DESC) AS rn
      FROM tagged
    )
    SELECT l_orderkey, l_linenumber, qty, src
    FROM ranked WHERE rn = 1
    ORDER BY l_orderkey, l_linenumber
    """,
)
def j5_upsert_keep_last(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-last upsert (ref concat + unique(keep="last"),
    ticker_batch_runner.py:310, 495): updates win over existing rows on
    the merge key; priority explicit via source rank.

    The two inputs share ONE aggregation pass over lineitem (r10,
    guide §2.3/§2.4): max(qty) and the R-rows max ride the same
    groupBy as plain and conditional aggregates (max ignores the
    when's nulls, so the conditional max over all rows equals the max
    over the filtered rows), and the two legs are post-aggregate
    projections whose identical partial-agg exchange ReuseExchange
    materializes once — one lineitem scan + one exchange instead of
    two of each. Rows are identical: keys with no R row drop out of
    the updates leg via the null filter, exactly as the filtered
    aggregate produced no row for them."""
    li = load_table(spark, "lineitem", sf)
    base = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.max("l_quantity").alias("_q0"),
        F.max(F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))).alias(
            "_qr"
        ),
    )
    existing = base.select(
        "l_orderkey",
        "l_linenumber",
        F.col("_q0").alias("qty"),
        F.lit(0).alias("src"),
    )
    updates = base.where(F.col("_qr").isNotNull()).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("_qr") * 2).alias("qty"),
        F.lit(1).alias("src"),
    )
    merged = upsert_keep_last(existing, updates, keys=["l_orderkey", "l_linenumber"])
    return merged.select("l_orderkey", "l_linenumber", "qty", "src").orderBy(
        "l_orderkey", "l_linenumber"
    )


@query(
    "j8_benchmark_relative",
    ids=("J8", "A6"),
    sql="""
    WITH per_type AS (
      SELECT event_type,
             min_by(value, ts) AS first_v,
             max_by(value, ts) AS last_v
      FROM events GROUP BY event_type
    ), rets AS (
      SELECT event_type, (last_v - first_v) / first_v AS ret FROM per_type
    )
    SELECT r.event_type,
           round(r.ret, 6) AS ret,
           round(r.ret - b.ret, 6) AS rel_to_view
    FROM rets r CROSS JOIN (SELECT ret FROM rets WHERE event_type = 'view') b
    ORDER BY r.event_type
    """,
)
def j8_benchmark_relative(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-relative return (ref `compute_sector_relative_return`,
    price_features.py:78-106): per-series (last-first)/first, minus the
    benchmark series' value. min_by/max_by avoid any sort."""
    ev = load_table(spark, "events", sf)
    per_type = ev.groupBy("event_type").agg(
        F.min_by("value", "ts").alias("first_v"), F.max_by("value", "ts").alias("last_v")
    )
    rets = per_type.select(
        "event_type", ((F.col("last_v") - F.col("first_v")) / F.col("first_v")).alias("ret")
    )
    bench_ret = rets.where(F.col("event_type") == "view").select(
        F.col("ret").alias("bench_ret")
    )
    return (
        rets.crossJoin(F.broadcast(bench_ret))
        .select(
            "event_type",
            F.round("ret", 6).alias("ret"),
            F.round(F.col("ret") - F.col("bench_ret"), 6).alias("rel_to_view"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- windows


@query(
    "w1_lag_returns",
    ids=("W1", "F12", "A2"),
    bench=True,
    sql="""
    WITH r AS (
      SELECT user_id,
             CASE WHEN lag(value) OVER w != 0
                  THEN value / (lag(value) OVER w) - 1 END AS ret
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, count(ret) AS n_returns, round(avg(ret), 4) AS avg_ret
    FROM r GROUP BY user_id ORDER BY user_id
    """,
)
def w1_lag_returns(spark: SparkSession, sf: str) -> DataFrame:
    """Lag-based simple returns (ref close/close.shift(1)-1,
    price_features.py:43) with explicit zero-denominator guard (F12)."""
    from dvmax_spark.operators.windows import add_lag_return

    ev = load_table(spark, "events", sf)
    with_ret = add_lag_return(ev, by="user_id", order="ts", value="value", out="ret")
    return (
        with_ret.groupBy("user_id")
        .agg(F.count("ret").alias("n_returns"), F.round(F.avg("ret"), 4).alias("avg_ret"))
        .orderBy("user_id")
    )


@query(
    "a3_sma_trailing",
    ids=("A3", "W3"),
    bench=True,
    sql="""
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS sma_5
    FROM events
    ORDER BY event_id
    """,
)
def a3_sma_trailing(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-rows SMA (ref closes[-50:].mean(), price_features.py:117-124)
    as a rows-frame window."""
    ev = load_table(spark, "events", sf)
    out = trailing_mean(ev, by="user_id", order="ts", value="value", n=5, out="sma_5")
    return out.select("event_id", F.round("sma_5", 4).alias("sma_5")).orderBy("event_id")


@query(
    "a4_volatility",
    ids=("A4", "F4"),
    sql="""
    WITH r AS (
      SELECT user_id,
             CASE WHEN lag(value) OVER w != 0
                  THEN value / (lag(value) OVER w) - 1 END AS ret
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, round(stddev_samp(ret) * sqrt(252), 4) AS volatility
    FROM r GROUP BY user_id ORDER BY user_id
    """,
)
def a4_volatility(spark: SparkSession, sf: str) -> DataFrame:
    """Annualized volatility (ref returns.std()*252**0.5,
    price_features.py:38-45)."""
    from dvmax_spark.operators.windows import add_lag_return

    ev = load_table(spark, "events", sf)
    with_ret = add_lag_return(ev, by="user_id", order="ts", value="value", out="ret")
    return (
        with_ret.groupBy("user_id")
        .agg(F.round(F.stddev_samp("ret") * F.sqrt(F.lit(252.0)), 4).alias("volatility"))
        .orderBy("user_id")
    )


@query(
    "a5_yield_vs_median",
    ids=("A5", "A6"),
    sql="""
    SELECT user_id,
           round(median(value), 4) AS median_value,
           round(max_by(value, ts) / median(value) - 1, 4) AS last_vs_median
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def a5_yield_vs_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median + last-vs-median ratio (ref dividendYield.median()
    and yield_vs_5y_median, dividend_features.py:27-31)."""
    ev = load_table(spark, "events", sf)
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(F.median("value"), 4).alias("median_value"),
            F.round(F.max_by("value", "ts") / F.median("value") - 1, 4).alias(
                "last_vs_median"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "a7_cumprod",
    ids=("A7", "W4", "W1"),
    sql="""
    WITH ratios AS (
      SELECT user_id, ts,
             value / nullif(lag(value) OVER (PARTITION BY user_id ORDER BY ts), 0) AS ratio
      FROM events
    ), cp AS (
      SELECT user_id, ts,
             product(ratio) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ratio
      FROM ratios
    )
    SELECT user_id, round(max_by(cum_ratio, ts), 6) AS final_cum_ratio
    FROM cp GROUP BY user_id ORDER BY user_id
    """,
)
def a7_cumprod(spark: SparkSession, sf: str) -> DataFrame:
    """Running product (ref split_ratio.cum_prod(), engineering/utils.py:53)
    via the native product aggregate over a running frame."""
    from dvmax_spark.operators.windows import cumulative_product

    ev = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy("ts")
    # nullif guards the zero divisor: ANSI Spark raises DIVIDE_BY_ZERO
    # (DuckDB would yield inf) — both engines instead skip the null
    # ratio in the running product, consistently
    ratios = ev.select(
        "user_id",
        "ts",
        (F.col("value") / F.nullif(F.lag("value", 1).over(w), F.lit(0))).alias("ratio"),
    )
    cp = cumulative_product(ratios, by="user_id", order="ts", value="ratio", out="cum_ratio")
    return (
        cp.groupBy("user_id")
        .agg(F.round(F.max_by("cum_ratio", "ts"), 6).alias("final_cum_ratio"))
        .orderBy("user_id")
    )


@query(
    "a8_max_drawdown",
    ids=("A8", "W4"),
    bench=True,
    sql="""
    WITH pk AS (
      SELECT o_custkey,
             o_totalprice,
             max(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM orders
    )
    SELECT o_custkey, round(max((peak - o_totalprice) / peak), 6) AS max_drawdown
    FROM pk GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def a8_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    """Running-peak max drawdown (ref peak-tracking loop,
    price_features.py:48-74) as two window exprs — no Python loop."""
    o = load_table(spark, "orders", sf)
    # deterministic order: (o_orderdate, o_orderkey); totalprice > 0 always
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_peak = o.withColumn("peak", F.max("o_totalprice").over(w))
    return (
        with_peak.groupBy("o_custkey")
        .agg(
            F.round(
                F.max((F.col("peak") - F.col("o_totalprice")) / F.col("peak")), 6
            ).alias("max_drawdown")
        )
        .orderBy("o_custkey")
    )


@query(
    "a9_group_year_first",
    ids=("A9", "F3"),
    sql="""
    WITH ranked AS (
      SELECT extract(year FROM o_orderdate) AS yr, o_totalprice,
             row_number() OVER (PARTITION BY extract(year FROM o_orderdate)
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT yr, round(o_totalprice, 2) AS first_price
    FROM ranked WHERE rn = 1 ORDER BY yr
    """,
)
def a9_group_year_first(spark: SparkSession, sf: str) -> DataFrame:
    """Group-by-year first-value extract (ref `extract_by_year`,
    macro_batch_runner.py:60-64) with a deterministic order."""
    o = load_table(spark, "orders", sf)
    yr = F.year("o_orderdate").alias("yr")
    w = Window.partitionBy(F.year("o_orderdate")).orderBy("o_orderdate", "o_orderkey")
    return (
        o.where(F.col("o_totalprice").isNotNull())
        .select(yr, "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("yr", F.round("o_totalprice", 2).alias("first_price"))
        .orderBy("yr")
    )


@query(
    "a10_dedup_distinct",
    ids=("A10",),
    sql="""
    SELECT DISTINCT o_custkey, o_orderpriority
    FROM orders
    ORDER BY o_custkey, o_orderpriority
    """,
)
def a10_dedup_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-on-key dedup (ref unique(subset=...),
    ticker_batch_runner.py:250)."""
    o = load_table(spark, "orders", sf)
    return (
        o.select("o_custkey", "o_orderpriority")
        .dropDuplicates()
        .orderBy("o_custkey", "o_orderpriority")
    )


@query(
    "w5_topk_per_group",
    ids=("W5", "O3", "O4"),
    bench=True,
    sql="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_date, o_totalprice, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY o_custkey, rnk
    """,
)
def w5_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k per group (ref sort desc → head(k), ratios.py:41): latest 3
    orders per customer; Catalyst turns the rank filter into a
    WindowGroupLimit so only k rows per group survive each partition."""
    o = load_table(spark, "orders", sf)
    out = top_k_per_group(
        o,
        group_by="o_custkey",
        order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
        k=3,
        keep_rank="rnk",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_date"),
        "o_totalprice",
        "rnk",
    ).orderBy("o_custkey", "rnk")


@query(
    "w2_jump_check",
    ids=("W2", "V4"),
    sql="""
    WITH j AS (
      SELECT event_id, user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    )
    SELECT event_id, user_id,
           round(greatest(value / nullif(prev, 0), nullif(prev, 0) / nullif(value, 0)), 4) AS jump_ratio
    FROM j
    WHERE prev IS NOT NULL AND prev > 0.01 AND value > 0
      AND greatest(value / nullif(prev, 0), nullif(prev, 0) / nullif(value, 0)) > 100
    ORDER BY event_id
    """,
)
def w2_jump_check(spark: SparkSession, sf: str) -> DataFrame:
    """Relative-jump check vs previous row (ref `_check_relative_jumps`,
    validate_dynamic_row.py:119-133): flag |ratio| > limit with a
    prev-floor guard."""
    ev = load_table(spark, "events", sf)
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("value", 1).over(w)
    # nullif guards: predicate conjunct order is not contractual after
    # optimization, so the ratio must be safe to evaluate on prev=0 /
    # value=0 rows (ANSI Spark raises DIVIDE_BY_ZERO); null ratios
    # compare false and drop out, same as the explicit guards
    safe_prev = F.nullif(F.col("prev"), F.lit(0))
    safe_val = F.nullif(F.col("value"), F.lit(0))
    guarded = F.greatest(F.col("value") / safe_prev, safe_prev / safe_val)
    return (
        ev.select("event_id", "user_id", "value", prev.alias("prev"))
        .where(
            F.col("prev").isNotNull()
            & (F.col("prev") > 0.01)
            & (F.col("value") > 0)
            & (guarded > 100)
        )
        .select(
            "event_id",
            "user_id",
            F.round(guarded, 4).alias("jump_ratio"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- set ops


@query(
    "u1_union_align",
    ids=("U1", "U2", "U4", "P7"),
    sql="""
    WITH u AS (
      SELECT 'customer' AS src, c_custkey AS key, c_acctbal AS acctbal, c_mktsegment AS segment
      FROM customer
      UNION ALL
      SELECT 'supplier' AS src, s_suppkey AS key, s_acctbal AS acctbal, NULL AS segment
      FROM supplier
    )
    SELECT src, count(*) AS n, round(sum(acctbal), 2) AS total_bal,
           count(segment) AS n_with_segment
    FROM u GROUP BY src ORDER BY src
    """,
)
def u1_union_align(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-aligning union (ref fill_missing_columns + vertical_relaxed
    concat, ticker_batch_runner.py:178-187, 474): supplier lacks the
    segment column; the type-lattice union fills it."""
    c = load_table(spark, "customer", sf).select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = load_table(spark, "supplier", sf).select(
        F.lit("supplier").alias("src"),
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("acctbal"),
    )
    u = align_and_union([c, s])
    return (
        u.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("acctbal"), 2).alias("total_bal"),
            F.count("segment").alias("n_with_segment"),
        )
        .orderBy("src")
    )


@query(
    "u3_pivot",
    ids=("U3", "P10"),
    sql="""
    SELECT user_id % 10 AS bucket,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events GROUP BY user_id % 10 ORDER BY bucket
    """,
)
def u3_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (ref horizontal concat on index, fetcher/macro.py:41):
    wide event-type counts per bucket."""
    ev = load_table(spark, "events", sf)
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("bucket"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )
    return out.select(
        "bucket",
        F.col("click").cast("long").alias("click"),
        F.col("error").cast("long").alias("error"),
        F.col("purchase").cast("long").alias("purchase"),
        F.col("signup").cast("long").alias("signup"),
        F.col("view").cast("long").alias("view"),
    ).orderBy("bucket")


# ---------------------------------------------------------------- scalar fns


@query(
    "f_scalar_sampler",
    ids=("F1", "F2", "F3", "F4", "F6", "F9", "F10", "P5", "P6", "P7"),
    sql="""
    SELECT o_orderkey,
           extract(year FROM o_orderdate)                       AS order_year,
           CAST(o_orderdate + INTERVAL 6 MONTH AS DATE)          AS plus_6m,
           CAST(o_orderdate AS DATE) + 30                        AS plus_30d,
           upper(substr(o_orderpriority, 3))                     AS prio_name,
           concat_ws(';', o_orderstatus, o_orderpriority)        AS status_prio,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                                 AS size_bucket,
           o_totalprice / 100                                    AS price_pct,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')          AS status_resolved
    FROM orders
    ORDER BY o_orderkey
    """,
)
def f_scalar_sampler(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-function surface sampler: calendar arithmetic with month
    clamping (ref relativedelta — add_months matches), year extract,
    string ops, conditional buckets, coalesce/nullif, pct conversion
    (SURVEY §2.8)."""
    o = load_table(spark, "orders", sf)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.add_months(d.cast("date"), 6).alias("plus_6m"),
        F.date_add(d.cast("date"), 30).alias("plus_30d"),
        F.upper(F.substring("o_orderpriority", 3, 100)).alias("prio_name"),
        F.concat_ws(";", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_bucket"),
        (F.col("o_totalprice") / 100).alias("price_pct"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_resolved"
        ),
    ).orderBy("o_orderkey")


@query(
    "f11_json_extract",
    ids=("F11",),
    sql="""
    SELECT event_type,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def f11_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON decode (ref API JSON parsing, base.py:74-81): extract a
    typed field from a JSON string column."""
    ev = load_table(spark, "events", sf)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "f4_cagr",
    ids=("F4", "A6", "F2"),
    sql="""
    WITH ends AS (
      SELECT user_id,
             min_by(value, ts) AS start_v, max_by(value, ts) AS end_v,
             min(ts) AS start_ts, max(ts) AS end_ts
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           round(CASE WHEN start_v > 0 AND end_v > 0
                        AND epoch_us(end_ts) > epoch_us(start_ts)
                      THEN ln(end_v / start_v)
                           / ((epoch_us(end_ts) - epoch_us(start_ts)) / 31557600000000.0)
                 END, 4) AS log_cagr
    FROM ends ORDER BY user_id
    """,
)
def f4_cagr(spark: SparkSession, sf: str) -> DataFrame:
    """CAGR-family growth rate (ref (end/start)**(1/years)-1,
    growth_features.py:53) with the reference's NaN rules (undefined on
    non-positive endpoints) expressed as null.

    Declared on the LOG scale (ln-ratio / years): pow() is not
    bit-identical across libm implementations and the 30-day test span
    amplifies ulp noise through huge exponents; log-scale keeps the
    oracle hash-stable while exercising the same operator chain. The
    engine's feature library exposes the plain pow form (features/growth).
    """
    ev = load_table(spark, "events", sf)
    ends = ev.groupBy("user_id").agg(
        F.min_by("value", "ts").alias("start_v"),
        F.max_by("value", "ts").alias("end_v"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )
    from dvmax_spark.functions.scalar import epoch_micros

    years = (epoch_micros("end_ts") - epoch_micros("start_ts")) / F.lit(31557600000000.0)
    log_cagr = F.when(
        (F.col("start_v") > 0) & (F.col("end_v") > 0) & (years > 0),
        F.log(F.col("end_v") / F.col("start_v")) / years,
    )
    return ends.select("user_id", F.round(log_cagr, 4).alias("log_cagr")).orderBy("user_id")


# ---------------------------------------------------------------- validation


@query(
    "v1_range_validation",
    ids=("V1", "V2", "V5", "V6", "F9"),
    bench=True,
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
           CASE WHEN (l_discount < 0 OR l_discount > 0.08)
                  OR (l_quantity < 1 OR l_quantity > 45)
                  OR (l_tax < 0 OR l_tax > 0.07)
                THEN 'flagged' ELSE 'ok' END AS validation_status,
           concat_ws(';',
             CASE WHEN l_discount < 0 OR l_discount > 0.08 THEN 'range:l_discount' END,
             CASE WHEN l_quantity < 1 OR l_quantity > 45   THEN 'range:l_quantity' END,
             CASE WHEN l_tax      < 0 OR l_tax      > 0.07 THEN 'range:l_tax'      END
           ) AS violations
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
    """,
)
def v1_range_validation(spark: SparkSession, sf: str) -> DataFrame:
    """Range-rule validation (ref FEATURE_RANGES + status routing,
    validate_dynamic_row.py:8-32, 100-116): declarative rule table
    compiled to one select of when-expressions."""
    li = load_table(spark, "lineitem", sf)
    rules = [
        RangeRule("l_discount", lo=0.0, hi=0.08),
        RangeRule("l_quantity", lo=1.0, hi=45.0),
        RangeRule("l_tax", lo=0.0, hi=0.07),
    ]
    out = apply_rules(li, rules)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        "l_tax",
        "validation_status",
        "violations",
    ).orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")


@query(
    "p10_one_hot",
    ids=("P10", "P9", "P11"),
    sql="""
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS seg_automobile,
           CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END AS seg_building,
           CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END AS seg_furniture,
           CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END AS seg_household,
           CASE WHEN c_mktsegment IS NOT NULL
                 AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD')
                THEN 1 ELSE 0 END AS seg_other
    FROM customer ORDER BY c_custkey
    """,
)
def p10_one_hot(spark: SparkSession, sf: str) -> DataFrame:
    """One-hot over a fixed vocabulary + _other bucket (ref
    `_encode_one_hot`, static_features.py:12-25). MACHINERY is left out
    of the vocab to exercise the other-bucket."""
    c = load_table(spark, "customer", sf)
    vocab = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]
    return c.select(
        "c_custkey", *one_hot_exprs("c_mktsegment", vocab, prefix="seg")
    ).orderBy("c_custkey")
