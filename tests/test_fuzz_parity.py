"""Seeded differential fuzzing: randomly composed filter -> groupBy ->
aggregate -> sort queries generated from ONE tiny AST, rendered both
as a Spark DataFrame chain and as DuckDB SQL, compared value-exactly.

The hand-written oracle queries pin the operators we thought of;
the fuzzer covers the compositions we didn't. Everything generated is
EXACT by construction (integer counts, cents-exact money sums via the
round(x*100) convention, min/max of orderable types, no floats), so
any mismatch is a real engine-semantics bug, not rounding noise.

Seeds are fixed: failures reproduce exactly; bump N_QUERIES or add
seeds to widen the net.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # long-tail tier (tests/conftest.py)


import random

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_CORRECT, canonicalize

N_QUERIES = 40

# (name, spark value expr factory, sql value expr, kind)
_ORDERS_COLS = [
    ("o_orderstatus", "cat"),
    ("o_orderpriority", "cat"),
]
_PREDICATES = [
    # (spark col fn, sql text) pairs, exact-semantics only
    (
        lambda: F.col("o_totalprice") > 150000.0,
        "o_totalprice > 150000.0",
    ),
    (
        lambda: F.col("o_totalprice") <= 60000.0,
        "o_totalprice <= 60000.0",
    ),
    (
        lambda: F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"),
        "o_orderdate >= TIMESTAMP '1996-01-01'",
    ),
    (
        lambda: F.col("o_orderdate") < F.lit("1994-07-01").cast("timestamp"),
        "o_orderdate < TIMESTAMP '1994-07-01'",
    ),
    (
        lambda: F.col("o_orderstatus") == "F",
        "o_orderstatus = 'F'",
    ),
    (
        lambda: F.col("o_orderpriority") != "3-MEDIUM",
        "o_orderpriority <> '3-MEDIUM'",
    ),
    (
        lambda: F.col("o_custkey") % 7 == 3,
        "o_custkey % 7 = 3",
    ),
    (
        lambda: F.col("o_orderkey") % 5 < 2,
        "o_orderkey % 5 < 2",
    ),
]
_AGGS = [
    (
        "n_rows",
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "CAST(count(*) AS BIGINT) AS n_rows",
    ),
    (
        "total_cents",
        lambda: F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        " AS total_cents",
    ),
    (
        "min_key",
        lambda: F.min("o_orderkey").alias("min_key"),
        "min(o_orderkey) AS min_key",
    ),
    (
        "max_date",
        lambda: F.max("o_orderdate").alias("max_date"),
        "max(o_orderdate) AS max_date",
    ),
    (
        "n_cust",
        lambda: F.countDistinct("o_custkey").alias("n_cust"),
        "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust",
    ),
]


def _gen(rng: random.Random):
    """One random query: subset of predicates (AND), optional group
    keys, 1-3 aggregates. Returns (build_spark_fn, sql_text)."""
    preds = rng.sample(_PREDICATES, rng.randint(0, 3))
    keys = [c for c, _ in _ORDERS_COLS if rng.random() < 0.5]
    aggs = rng.sample(_AGGS, rng.randint(1, 3))

    def build(spark):
        df = spark.read.parquet(f"{SF_DIR_CORRECT}/orders.parquet")
        for p, _ in preds:
            df = df.where(p())
        if keys:
            out = df.groupBy(*keys).agg(*[a() for _, a, _ in aggs])
            return out.orderBy(*keys)
        return df.agg(*[a() for _, a, _ in aggs])

    where = " AND ".join(s for _, s in preds) or "1=1"
    select_keys = (", ".join(keys) + ", ") if keys else ""
    group = f"GROUP BY {', '.join(keys)} ORDER BY {', '.join(keys)}" if keys else ""
    sql = (
        f"SELECT {select_keys}{', '.join(s for _, _, s in aggs)} "
        f"FROM orders WHERE {where} {group}"
    )
    return build, sql


def test_fuzzed_filter_group_agg_parity(spark, oracle):
    rng = random.Random(20260815)
    mismatches = []
    for i in range(N_QUERIES):
        build, sql = _gen(rng)
        got = canonicalize(build(spark).toPandas())
        exp = canonicalize(oracle.execute(sql).fetchdf())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True
            )
        except AssertionError as e:
            mismatches.append((i, sql, str(e).splitlines()[0]))
    assert not mismatches, mismatches


_LI_PREDICATES = [
    (
        lambda: F.col("l_quantity") < 25.0,
        "l_quantity < 25.0",
    ),
    (
        lambda: F.col("l_discount") >= 0.05,
        "l_discount >= 0.05",
    ),
    (
        lambda: F.col("l_returnflag") == "R",
        "l_returnflag = 'R'",
    ),
    (
        lambda: F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"),
        "l_shipdate >= TIMESTAMP '1995-01-01'",
    ),
    (
        lambda: F.col("l_linenumber") <= 3,
        "l_linenumber <= 3",
    ),
]
_JOIN_AGGS = [
    (
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "CAST(count(*) AS BIGINT) AS n_rows",
    ),
    (
        lambda: F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
        " AS price_cents",
    ),
    (
        lambda: F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias(
            "qty_cents"
        ),
        "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents",
    ),
    (
        lambda: F.countDistinct("o_orderkey").alias("n_orders"),
        "CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders",
    ),
]


def test_fuzzed_join_parity(spark, oracle):
    """Random orders JOIN lineitem compositions: predicates on either
    side of the join, grouped or global exact aggregates — the
    cross-table compositions the hand-written TPC-H subset samples
    only at a few points."""
    rng = random.Random(815)
    mismatches = []
    for i in range(25):
        o_preds = rng.sample(_PREDICATES, rng.randint(0, 2))
        l_preds = rng.sample(_LI_PREDICATES, rng.randint(0, 2))
        keys = [k for k in ("o_orderstatus", "l_returnflag") if rng.random() < 0.5]
        aggs = rng.sample(_JOIN_AGGS, rng.randint(1, 2))

        orders = spark.read.parquet(f"{SF_DIR_CORRECT}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR_CORRECT}/lineitem.parquet")
        for p, _ in o_preds:
            orders = orders.where(p())
        for p, _ in l_preds:
            li = li.where(p())
        j = orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        if keys:
            out = j.groupBy(*keys).agg(*[a() for a, _ in aggs]).orderBy(*keys)
        else:
            out = j.agg(*[a() for a, _ in aggs])

        where = " AND ".join(
            [s for _, s in o_preds] + [s for _, s in l_preds]
        ) or "1=1"
        select_keys = (", ".join(keys) + ", ") if keys else ""
        group = (
            f"GROUP BY {', '.join(keys)} ORDER BY {', '.join(keys)}" if keys else ""
        )
        sql = (
            f"SELECT {select_keys}{', '.join(s for _, s in aggs)} "
            f"FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
            f"WHERE {where} {group}"
        )
        got = canonicalize(out.toPandas())
        exp = canonicalize(oracle.execute(sql).fetchdf())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True
            )
        except AssertionError as e:
            mismatches.append((i, sql, str(e).splitlines()[0]))
    assert not mismatches, mismatches


def test_fuzzed_window_parity(spark, oracle):
    """Random window-function compositions over per-customer order
    sequences: lag/lead offsets, running exact-cents sums, row_number /
    rank / dense_rank with fully-specified deterministic orderings,
    trailing-rows frames — the frame/tie semantics corner where
    engines classically diverge. All values exact integers."""
    from pyspark.sql import Window

    rng = random.Random(4040)
    cents_spark = F.round(F.col("o_totalprice") * 100).cast("long")
    cents_sql = "CAST(round(o_totalprice * 100) AS BIGINT)"
    over = "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"

    def w():
        return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")

    choices = [
        (
            lambda k: F.lag(cents_spark, k).over(w()),
            lambda k: f"lag({cents_sql}, {k}) {over}",
        ),
        (
            lambda k: F.lead(cents_spark, k).over(w()),
            lambda k: f"lead({cents_sql}, {k}) {over}",
        ),
        (
            lambda k: F.sum(cents_spark).over(
                w().rowsBetween(Window.unboundedPreceding, 0)
            ),
            lambda k: f"sum({cents_sql}) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        ),
        (
            lambda k: F.sum(cents_spark).over(w().rowsBetween(-k, 0)),
            lambda k: f"sum({cents_sql}) OVER (PARTITION BY o_custkey "
            f"ORDER BY o_orderdate, o_orderkey "
            f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)",
        ),
        (
            lambda k: F.row_number().over(w()),
            lambda k: f"row_number() {over}",
        ),
        (
            lambda k: F.min(cents_spark).over(
                w().rowsBetween(Window.unboundedPreceding, 0)
            ),
            lambda k: f"min({cents_sql}) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        ),
    ]
    mismatches = []
    for i in range(15):
        picks = rng.sample(choices, rng.randint(1, 3))
        ks = [rng.randint(1, 4) for _ in picks]
        cap = rng.choice([100, 500])  # bound output via custkey subset

        df = spark.read.parquet(f"{SF_DIR_CORRECT}/orders.parquet").where(
            F.col("o_custkey") < cap
        )
        cols = [
            f(k).alias(f"w{j}") for j, ((f, _), k) in enumerate(zip(picks, ks))
        ]
        out = df.select("o_orderkey", *cols).orderBy("o_orderkey")

        sel = ", ".join(
            s(k) + f" AS w{j}" for j, ((_, s), k) in enumerate(zip(picks, ks))
        )
        sql = (
            f"SELECT o_orderkey, {sel} FROM orders "
            f"WHERE o_custkey < {cap} ORDER BY o_orderkey"
        )
        got = canonicalize(out.toPandas())
        exp = canonicalize(oracle.execute(sql).fetchdf())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True
            )
        except AssertionError as e:
            mismatches.append((i, sql, str(e).splitlines()[0]))
    assert not mismatches, mismatches


def test_fuzzed_string_ops_parity(spark, oracle):
    """Random compositions of exact-semantics string functions over
    document text (F9 family): substring/upper/lower/length/trim/
    replace/concat — 1-based positions only (0/negative substring
    semantics legitimately differ across engines and are avoided, as
    the engine code does)."""
    rng = random.Random(99)
    ops = [
        (
            lambda p, l: F.substring(F.col("text"), p, l),
            lambda p, l: f"substr(text, {p}, {l})",
        ),
        (
            lambda p, l: F.upper(F.substring(F.col("text"), p, l)),
            lambda p, l: f"upper(substr(text, {p}, {l}))",
        ),
        (
            lambda p, l: F.length(F.col("text")).cast("long"),
            lambda p, l: "CAST(length(text) AS BIGINT)",
        ),
        (
            lambda p, l: F.regexp_replace(F.col("text"), " ", "_"),
            lambda p, l: "replace(text, ' ', '_')",
        ),
        (
            lambda p, l: F.concat(F.lower(F.substring(F.col("text"), p, l)), F.lit("#x")),
            lambda p, l: f"lower(substr(text, {p}, {l})) || '#x'",
        ),
        (
            lambda p, l: F.trim(F.substring(F.col("text"), p, l)),
            lambda p, l: f"trim(substr(text, {p}, {l}))",
        ),
    ]
    mismatches = []
    for i in range(20):
        picks = rng.sample(ops, rng.randint(1, 3))
        args = [(rng.randint(1, 20), rng.randint(1, 30)) for _ in picks]
        df = spark.read.parquet(f"{SF_DIR_CORRECT}/documents.parquet")
        cols = [
            f(p, l).alias(f"s{j}")
            for j, ((f, _), (p, l)) in enumerate(zip(picks, args))
        ]
        out = df.select("doc_id", *cols).orderBy("doc_id")
        sel = ", ".join(
            s(p, l) + f" AS s{j}"
            for j, ((_, s), (p, l)) in enumerate(zip(picks, args))
        )
        sql = f"SELECT doc_id, {sel} FROM documents ORDER BY doc_id"
        got = canonicalize(out.toPandas())
        exp = canonicalize(oracle.execute(sql).fetchdf())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True
            )
        except AssertionError as e:
            mismatches.append((i, sql, str(e).splitlines()[0]))
    assert not mismatches, mismatches


def test_fuzzed_islands_runs_parity(spark, oracle):
    """Random islands-and-gaps compositions — the run-merge window
    pattern the ExactSubstr family is built on (rid = pos − row_number
    per doc, per-run count/min aggregates, run-length gates): token
    positions of the documents table survive a random exact predicate,
    consecutive survivors merge into maximal runs, and per-doc run
    statistics must match DuckDB bit-for-bit. All-integer by
    construction (positions, counts, lexicographic token compares)."""
    from pyspark.sql import Window

    rng = random.Random(7171)

    # (spark predicate factory, sql predicate text factory)
    preds = [
        (
            lambda m, j: F.col("pos") % m != j,
            lambda m, j: f"pos % {m} <> {j}",
        ),
        (
            lambda m, j: F.length("tok") % 2 == (j % 2),
            lambda m, j: f"length(tok) % 2 = {j % 2}",
        ),
        (
            lambda m, j: F.col("tok") >= "m",
            lambda m, j: "tok >= 'm'",
        ),
        (
            lambda m, j: F.col("tok") < "t",
            lambda m, j: "tok < 't'",
        ),
    ]
    mismatches = []
    for i in range(12):
        n_pred = rng.randint(1, 2)
        picks = rng.sample(preds, n_pred)
        ms = [rng.randint(2, 5) for _ in picks]
        js = [rng.randint(0, 1) for _ in picks]
        conj = rng.choice(["AND", "OR"]) if n_pred == 2 else "AND"
        L = rng.randint(2, 6)
        s_mod, s_val = rng.choice([(3, 0), (4, 1), (2, 0)])

        toks = (
            spark.read.parquet(f"{SF_DIR_CORRECT}/documents.parquet")
            .where(F.col("doc_id") % s_mod == s_val)
            .select(
                "doc_id",
                F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
            )
        )
        sp = picks[0][0](ms[0], js[0])
        if n_pred == 2:
            sp = (sp & picks[1][0](ms[1], js[1])) if conj == "AND" else (
                sp | picks[1][0](ms[1], js[1])
            )
        filt = toks.where(sp)
        w_rn = Window.partitionBy("doc_id").orderBy("pos")
        runs = (
            filt.withColumn("rid", F.col("pos") - F.row_number().over(w_rn))
            .groupBy("doc_id", "rid")
            .agg(
                F.count(F.lit(1)).alias("run_len"),
                F.min("pos").alias("run_start"),
            )
            .where(F.col("run_len") >= L)
        )
        out = (
            runs.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_runs"),
                F.max("run_len").cast("long").alias("max_run"),
                F.sum("run_len").cast("long").alias("covered"),
                F.min("run_start").cast("long").alias("first_start"),
            )
            .orderBy("doc_id")
        )
        sql_pred = picks[0][1](ms[0], js[0])
        if n_pred == 2:
            sql_pred = f"({sql_pred}) {conj} ({picks[1][1](ms[1], js[1])})"
        sql = f"""
        WITH t AS (
          SELECT doc_id, str_split(text, ' ') AS tk FROM documents
          WHERE doc_id % {s_mod} = {s_val}
        ),
        toks AS (
          SELECT doc_id, pos - 1 AS pos, tk[pos] AS tok
          FROM t, unnest(range(1, len(tk) + 1)) u(pos)
        ),
        filt AS (SELECT doc_id, pos FROM toks WHERE {sql_pred}),
        runs0 AS (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rid
          FROM filt
        ),
        runs AS (
          SELECT doc_id, rid, count(*) AS run_len, min(pos) AS run_start
          FROM runs0 GROUP BY doc_id, rid
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_runs,
               CAST(max(run_len) AS BIGINT) AS max_run,
               CAST(sum(run_len) AS BIGINT) AS covered,
               CAST(min(run_start) AS BIGINT) AS first_start
        FROM runs WHERE run_len >= {L}
        GROUP BY doc_id ORDER BY doc_id
        """
        got = canonicalize(out.toPandas())
        exp = canonicalize(oracle.execute(sql).fetchdf())
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True
            )
        except AssertionError as e:
            mismatches.append((i, sql_pred, L, str(e).splitlines()[0]))
    assert not mismatches, mismatches
