"""Price-series features (reference `engineering/price_features.py`).

Each returns one row per key. Reference guard behaviors are kept
exactly: 0.0 (not null) where the reference returns 0.0 on missing
data, null where it returns NaN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def return_over_period(
    prices: DataFrame,
    as_of,
    months: int,
    by: str = "ticker",
    out: str = "return",
    date_col: str = "date",
    value_col: str = "close",
) -> DataFrame:
    """(price_now - price_past)/price_past with nearest-<= lookups at
    as_of and as_of - months (ref compute_return_over_period,
    price_features.py:9-27; month arithmetic = relativedelta ≡
    add_months). Missing either endpoint => 0.0 (ref returns 0.0 on
    ValueError)."""
    past_date = F.add_months(F.lit(as_of).cast("date"), -months)
    d = F.col(date_col)
    eligible = prices.where(d <= F.lit(as_of).cast("date"))
    agg = eligible.groupBy(by).agg(
        F.max_by(value_col, date_col).alias("_now"),
        F.max_by(
            F.when(d <= past_date, F.col(value_col)), F.when(d <= past_date, d)
        ).alias("_past"),
    )
    ret = F.when(
        F.col("_now").isNotNull() & F.col("_past").isNotNull() & (F.col("_past") != 0),
        (F.col("_now") - F.col("_past")) / F.col("_past"),
    ).otherwise(F.lit(0.0))
    return agg.select(by, ret.alias(out))


def volatility(
    prices: DataFrame,
    by: str = "ticker",
    out: str = "volatility",
    date_col: str = "date",
    value_col: str = "close",
    periods_per_year: int = 252,
) -> DataFrame:
    """Annualized stddev of daily simple returns (ref compute_volatility,
    price_features.py:38-45). <2 returns => 0.0 (ref: std of empty ->
    None -> 0.0)."""
    w = Window.partitionBy(by).orderBy(date_col)
    rets = prices.withColumn("_ret", F.col(value_col) / F.lag(value_col, 1).over(w) - 1)
    agg = rets.groupBy(by).agg(F.stddev_samp("_ret").alias("_std"))
    return agg.select(
        by,
        F.coalesce(F.col("_std") * F.sqrt(F.lit(float(periods_per_year))), F.lit(0.0)).alias(
            out
        ),
    )


def max_drawdown_feature(
    prices: DataFrame,
    lookback_years: int,
    grace_days: int = 15,
    by: str = "ticker",
    out: str = "max_drawdown",
    date_col: str = "date",
    value_col: str = "close",
) -> DataFrame:
    """Max (peak-price)/peak over [end - 365*y - grace, end] per key
    (ref compute_max_drawdown, price_features.py:48-74 — the Python
    peak loop as two window exprs). <2 rows in window => 0.0."""
    end = Window.partitionBy(by)
    with_end = prices.withColumn("_end", F.max(date_col).over(end))
    start = F.date_sub(F.col("_end"), 365 * lookback_years + grace_days)
    windowed = with_end.where(
        (F.col(date_col) >= start) & (F.col(date_col) <= F.col("_end"))
    )
    w = (
        Window.partitionBy(by)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_peak = windowed.withColumn("_peak", F.max(value_col).over(w))
    dd = F.when(
        F.col("_peak") != 0, (F.col("_peak") - F.col(value_col)) / F.col("_peak")
    )
    agg = with_peak.groupBy(by).agg(
        F.max(dd).alias("_dd"), F.count(F.lit(1)).alias("_n")
    )
    return agg.select(
        by,
        F.when(F.col("_n") >= 2, F.coalesce(F.col("_dd"), F.lit(0.0)))
        .otherwise(F.lit(0.0))
        .alias(out),
    )


def sector_relative_return(
    stock: DataFrame,
    benchmark: DataFrame,
    lookback_days: int,
    as_of,
    by: str = "ticker",
    bench_key: str = "sector_etf",
    mapping: DataFrame | None = None,
    out: str = "sector_relative",
    date_col: str = "date",
    value_col: str = "close",
) -> DataFrame:
    """Stock return minus benchmark return over [as_of - lookback, as_of]
    (ref compute_sector_relative_return, price_features.py:78-106):
    first/last close each side, 0.0 on <2 rows or non-positive endpoints.

    ``mapping`` (by, bench_key) joins each stock to its benchmark series
    (ref SECTOR_TO_ETF); omit it if ``benchmark`` already carries ``by``.
    """
    cutoff = F.date_sub(F.lit(as_of).cast("date"), lookback_days)
    in_win = (F.col(date_col) >= cutoff) & (F.col(date_col) <= F.lit(as_of).cast("date"))

    def ends(df: DataFrame, key: str, prefix: str) -> DataFrame:
        return (
            df.where(in_win)
            .groupBy(key)
            .agg(
                F.min_by(value_col, date_col).alias(f"{prefix}_start"),
                F.max_by(value_col, date_col).alias(f"{prefix}_end"),
                F.count(F.lit(1)).alias(f"{prefix}_n"),
            )
        )

    s = ends(stock, by, "s")
    b = ends(benchmark, bench_key, "b")
    if mapping is not None:
        s = s.join(F.broadcast(mapping), by, "left")
    joined = s.join(F.broadcast(b), bench_key, "left") if bench_key in s.columns else s.crossJoin(F.broadcast(b))
    ok = (
        (F.col("s_n") >= 2)
        & (F.col("b_n") >= 2)
        & (F.col("s_start") > 0)
        & (F.col("s_end") > 0)
        & (F.col("b_start") > 0)
        & (F.col("b_end") > 0)
    )
    rel = (F.col("s_end") / F.col("s_start") - 1) - (F.col("b_end") / F.col("b_start") - 1)
    return joined.select(by, F.when(ok, rel).otherwise(F.lit(0.0)).alias(out))


def payout_ratio(
    ratios: DataFrame, by: str = "ticker", out: str = "payout_ratio", date_col: str = "date"
) -> DataFrame:
    """Last positive payoutRatio, else 0.0 (ref compute_payout_ratio,
    price_features.py:109-114)."""
    valid = ratios.where(F.col("payoutRatio").isNotNull() & (F.col("payoutRatio") > 0))
    agg = valid.groupBy(by).agg(F.max_by("payoutRatio", date_col).alias("_v"))
    base = ratios.select(by).distinct()
    return base.join(agg, by, "left").select(
        by, F.coalesce(F.col("_v"), F.lit(0.0)).alias(out)
    )


def sma_delta_50_200(
    prices: DataFrame,
    by: str = "ticker",
    out: str = "sma_50_200_delta",
    date_col: str = "date",
    value_col: str = "close",
) -> DataFrame:
    """(SMA50 - SMA200)/SMA200 over the LAST 50/200 rows per key (ref
    compute_sma_delta_50_250, price_features.py:117-124). <200 rows =>
    null (ref raises; the row builder treats it as missing). SMA200==0
    => 0.0."""
    w = Window.partitionBy(by).orderBy(F.col(date_col).desc())
    ranked = prices.withColumn("_rn", F.row_number().over(w))
    agg = ranked.groupBy(by).agg(
        F.avg(F.when(F.col("_rn") <= 50, F.col(value_col))).alias("_sma50"),
        F.avg(F.when(F.col("_rn") <= 200, F.col(value_col))).alias("_sma200"),
        F.count(F.lit(1)).alias("_n"),
    )
    delta = (
        F.when(F.col("_n") < 200, F.lit(None))
        .when(F.col("_sma200") == 0, F.lit(0.0))
        .otherwise((F.col("_sma50") - F.col("_sma200")) / F.col("_sma200"))
    )
    return agg.select(by, delta.alias(out))


def ewma_fixed_horizon(
    df: DataFrame,
    value_cents,
    key_col: str,
    order_cols: tuple[str, ...],
    horizon: int = 16,
    alpha_num: int = 1,
    alpha_den: int = 4,
    out: str = "ewma_cents",
) -> DataFrame:
    """Per-row exponentially weighted moving average with the weight
    series truncated at ``horizon`` lags — the distributable form of
    EWMA (the infinite-history recurrence is inherently sequential;
    truncating at h lags bounds the frame so it becomes a plain
    window function, and with alpha=1/4 the lag-16 weight is already
    (3/4)^16 ≈ 1%, i.e. the truncation error is below cents).

    EXACT integer arithmetic end to end: weight of lag j is the
    integer a_num*(den-num)^j*den^(h-1-j) (the rational
    alpha*(1-alpha)^j scaled by den^h), the numerator is a bigint
    dot-product of lagged cent values, and rows with fewer than
    ``horizon`` predecessors renormalize by the partial weight sum —
    so the result ``(num div den)`` is bit-equal across engines (the
    same `div` convention as ext/traindata.py). Null values contribute
    no weight (same as a missing lag); an all-null window yields null.
    Requires NON-NEGATIVE values: Spark `div` truncates toward zero
    while DuckDB `//` floors, so negative numerators would diverge.
    Scale shape: ONE window node (all 2h lag terms share the frame),
    zero extra shuffles beyond the partitionBy.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    weights = [
        alpha_num * (alpha_den - alpha_num) ** j * alpha_den ** (horizon - 1 - j)
        for j in range(horizon)
    ]
    num = None
    den = None
    for j, wt in enumerate(weights):
        x = F.lag(value_cents, j).over(w) if j else value_cents
        # weight literals must be BIGINT: the full weight sum is
        # den^horizon - (den-num)^horizon (4^16 here), past int32
        wl = F.lit(wt).cast("long")
        # EVERY term coalesces (including j=0): a null current value
        # contributes no weight, same as a missing lag — matching the
        # SQL twin exactly (an uncoalesced j=0 would null the whole
        # row's EWMA on one engine only)
        term = F.coalesce(x * wl, F.lit(0).cast("long"))
        avail = F.when(x.isNotNull(), wl).otherwise(F.lit(0).cast("long"))
        num = term if num is None else num + term
        den = avail if den is None else den + avail
    return (
        df.withColumn("_ewma_num", num)
        .withColumn("_ewma_den", den)
        # all-null window (every value in reach is null) => no weight:
        # emit null, don't divide by zero (ANSI would raise)
        .withColumn(
            out,
            F.when(F.col("_ewma_den") > 0, F.expr("_ewma_num div _ewma_den")),
        )
        .drop("_ewma_num", "_ewma_den")
    )


def ewma_fixed_horizon_sql_terms(
    value_cents_sql: str,
    partition_sql: str,
    order_sql: str,
    horizon: int = 16,
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> tuple[str, str]:
    """DuckDB twin of :func:`ewma_fixed_horizon`: returns (num_sql,
    den_sql) window expressions built from the SAME integer weight
    constants, for embedding in an oracle query. ``num // den`` in
    DuckDB matches Spark's `div` on non-negative ints. If the value
    column can be null, guard the division with
    ``CASE WHEN ({den}) > 0 THEN ... END`` exactly as the Spark side
    does — an all-null window has zero weight."""
    weights = [
        alpha_num * (alpha_den - alpha_num) ** j * alpha_den ** (horizon - 1 - j)
        for j in range(horizon)
    ]
    over = f"OVER (PARTITION BY {partition_sql} ORDER BY {order_sql})"
    num_terms, den_terms = [], []
    for j, wt in enumerate(weights):
        x = value_cents_sql if j == 0 else f"lag({value_cents_sql}, {j}) {over}"
        # weight literals CAST to BIGINT: DuckDB types bare int literals
        # INT32 and the weight sum (den^horizon) overflows int32
        num_terms.append(f"coalesce({x} * CAST({wt} AS BIGINT), 0)")
        den_terms.append(
            f"CASE WHEN {x} IS NOT NULL THEN CAST({wt} AS BIGINT) ELSE 0 END"
        )
    return " + ".join(num_terms), " + ".join(den_terms)
