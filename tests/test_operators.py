"""Unit tests for the custom operators: as-of join strategies/ties/
tolerance, keep-last upsert determinism, schema-lattice union,
validation severity routing, top-k."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def _frames(self, spark):
        left = _df(
            spark,
            [("a", 10, "L1"), ("a", 20, "L2"), ("a", 5, "L0"), ("b", 15, "L3")],
            "k string, t long, tag string",
        )
        right = _df(
            spark,
            [("a", 8, 1.0), ("a", 20, 2.0), ("b", 30, 3.0)],
            "k string, t long, v double",
        )
        return left, right

    def test_backward_with_tie(self, spark):
        from dvmax_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = {
            r["tag"]: r
            for r in asof_join(left, right, on="t", by="k", strategy="backward").collect()
        }
        assert out["L0"]["v"] is None  # nothing at/before 5
        assert out["L1"]["v"] == 1.0  # t=8
        assert out["L2"]["v"] == 2.0  # tie t=20 matches (<=)
        assert out["L3"]["v"] is None  # b: right at 30 > 15

    def test_forward(self, spark):
        from dvmax_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = {
            r["tag"]: r
            for r in asof_join(left, right, on="t", by="k", strategy="forward").collect()
        }
        assert out["L0"]["v"] == 1.0  # next at 8
        assert out["L1"]["v"] == 2.0  # next at 20 (8 < 10)
        assert out["L2"]["v"] == 2.0  # tie at 20
        assert out["L3"]["v"] == 3.0  # next at 30

    def test_backward_tolerance(self, spark):
        from dvmax_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = {
            r["tag"]: r
            for r in asof_join(
                left, right, on="t", by="k", strategy="backward", tolerance=1
            ).collect()
        }
        assert out["L1"]["v"] is None  # 10-8=2 > 1
        assert out["L2"]["v"] == 2.0  # exact match within tolerance

    def test_column_collision_suffix(self, spark):
        from dvmax_spark.operators.asof import asof_join

        left = _df(spark, [("a", 10, 9.9)], "k string, t long, v double")
        right = _df(spark, [("a", 8, 1.0)], "k string, t long, v double")
        out = asof_join(left, right, on="t", by="k").collect()[0]
        assert out["v"] == 9.9 and out["v_right"] == 1.0 and out["t_right"] == 8


class TestUpsert:
    def test_updates_win_and_order_by_breaks_ties(self, spark):
        from dvmax_spark.operators.upsert import upsert_keep_last

        existing = _df(
            spark,
            [(1, "old", 1), (2, "keep", 1)],
            "id long, val string, ver int",
        )
        updates = _df(
            spark,
            [(1, "new-v1", 1), (1, "new-v2", 2)],
            "id long, val string, ver int",
        )
        out = {
            r["id"]: r["val"]
            for r in upsert_keep_last(existing, updates, keys=["id"], order_by="ver").collect()
        }
        assert out == {1: "new-v2", 2: "keep"}

    def test_missing_columns_filled(self, spark):
        from dvmax_spark.operators.upsert import upsert_keep_last

        existing = _df(spark, [(1, "a")], "id long, val string")
        updates = _df(spark, [(2, "b", 5.0)], "id long, val string, extra double")
        rows = {r["id"]: r for r in upsert_keep_last(existing, updates, ["id"]).collect()}
        assert rows[1]["extra"] is None and rows[2]["extra"] == 5.0


class TestAlignUnion:
    def test_type_lattice(self, spark):
        from dvmax_spark.operators.union_ops import align_and_union, resolve_dtype

        a = _df(spark, [(1, 1.5, "x")], "i int, f double, s string")
        b = _df(spark, [(2, 2, 3)], "i bigint, f int, s int")
        u = align_and_union([a, b])
        assert dict(u.dtypes) == {"i": "bigint", "f": "double", "s": "string"}
        assert u.count() == 2

        assert resolve_dtype(T.NullType(), T.IntegerType()) == T.IntegerType()
        assert resolve_dtype(T.StringType(), T.DoubleType()) == T.StringType()
        assert resolve_dtype(T.BooleanType(), T.IntegerType()) == T.IntegerType()
        assert resolve_dtype(T.DateType(), T.TimestampType()) == T.TimestampType()
        assert resolve_dtype(T.DateType(), T.DoubleType()) == T.StringType()

    def test_missing_columns_first_seen_order(self, spark):
        from dvmax_spark.operators.union_ops import align_and_union

        a = _df(spark, [(1, "x")], "id int, a string")
        b = _df(spark, [(2, "y")], "id int, b string")
        u = align_and_union([a, b])
        assert u.columns == ["id", "a", "b"]
        rows = {r["id"]: r for r in u.collect()}
        assert rows[1]["b"] is None and rows[2]["a"] is None


class TestValidation:
    def test_severity_routing_and_messages(self, spark):
        from dvmax_spark.validation.rules import RangeRule, apply_rules, split_by_status

        df = _df(spark, [(1, 0.05), (2, 0.5), (3, None)], "id long, x double")
        out = apply_rules(
            df,
            [
                RangeRule("x", lo=0.0, hi=0.1),
                RangeRule("x", lo=None, hi=0.9, allow_missing=False, severity="dropped"),
            ],
        )
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["validation_status"] == "ok" and rows[1]["violations"] == ""
        assert rows[2]["validation_status"] == "flagged"
        assert rows[2]["violations"] == "range:x"
        assert rows[3]["validation_status"] == "dropped"  # missing not allowed
        accepted, quarantined = split_by_status(out)
        assert accepted.count() == 2 and quarantined.count() == 1

    def test_nullify_unstable(self, spark):
        from dvmax_spark.validation.rules import NullifyUnstableRatio, apply_rules

        df = _df(spark, [(1, 5.0, 0.5), (2, 5.0, 100.0)], "id long, ratio double, den double")
        out = apply_rules(
            df, [], nullify=[NullifyUnstableRatio("ratio", "den", floor=1.0)]
        )
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["ratio"] is None and "nullified:ratio" in rows[1]["violations"]
        assert rows[2]["ratio"] == 5.0 and rows[2]["violations"] == ""

    def test_jump_rule(self, spark):
        from dvmax_spark.validation.rules import JumpRule, apply_rules

        df = _df(
            spark,
            [("t", 1, 1.0), ("t", 2, 100.0), ("t", 3, 101.0)],
            "k string, seq long, x double",
        )
        out = apply_rules(df, [JumpRule("x", limit=50.0, keys=("k",), order_col="seq")])
        rows = {r["seq"]: r["validation_status"] for r in out.collect()}
        assert rows[1] == "ok" and rows[2] == "flagged" and rows[3] == "ok"


class TestTopK:
    def test_rank_kept(self, spark):
        from dvmax_spark.operators.topk import top_k_per_group

        df = _df(
            spark,
            [("a", i, float(i)) for i in range(10)] + [("b", 1, 7.0)],
            "g string, i long, v double",
        )
        out = top_k_per_group(df, "g", [F.col("v").desc()], k=2, keep_rank="rnk")
        got = {(r["g"], r["rnk"]): r["v"] for r in out.collect()}
        assert got[("a", 1)] == 9.0 and got[("a", 2)] == 8.0 and got[("b", 1)] == 7.0


def test_upsert_modes_match_sequential_semantics(spark):
    """Property (randomized rounds, fixed seed): both merge modes must
    equal their sequential reference semantics —
      rank_dominates=True  == 'replay updates after existing'
      rank_dominates=False == 'greatest order_by wins globally, update
                               breaks exact ties'."""
    import random

    from dvmax_spark.operators.upsert import upsert_keep_last

    rng = random.Random(13)
    for _ in range(5):
        existing = [(k, rng.randint(0, 9), f"e{k}") for k in rng.sample(range(12), 6)]
        updates = [(k, rng.randint(0, 9), f"u{k}") for k in rng.sample(range(12), 6)]
        df_e = spark.createDataFrame(existing, "k int, ver int, who string")
        df_u = spark.createDataFrame(updates, "k int, ver int, who string")

        # sequential reference: dict replay
        ref_rank: dict[int, tuple] = {}
        for k, v, w in sorted(existing, key=lambda r: r[1]):
            ref_rank[k] = (v, w)
        for k, v, w in sorted(updates, key=lambda r: r[1]):
            ref_rank[k] = (v, w)  # updates always win; highest ver within side

        got_rank = {
            r["k"]: (r["ver"], r["who"])
            for r in upsert_keep_last(df_e, df_u, keys=["k"], order_by="ver").collect()
        }
        assert got_rank == ref_rank

        ref_time: dict[int, tuple] = {}
        rows = [(k, v, w, 0) for k, v, w in existing] + [(k, v, w, 1) for k, v, w in updates]
        for k, v, w, side in sorted(rows, key=lambda r: (r[1], r[3])):
            ref_time[k] = (v, w)  # greatest (ver, side) wins
        got_time = {
            r["k"]: (r["ver"], r["who"])
            for r in upsert_keep_last(
                df_e, df_u, keys=["k"], order_by="ver", rank_dominates=False
            ).collect()
        }
        assert got_time == ref_time


def test_asof_join_matches_reference_model(spark):
    """Randomized reference-model check for the as-of join: backward and
    forward, with and without tolerance, against a brute-force Python
    model (unique right timestamps per key, so matches are unique)."""
    import random

    from dvmax_spark.operators.asof import asof_join

    rng = random.Random(29)
    for _ in range(3):
        keys = ["a", "b", "c"]
        left = [
            (k, t) for k in keys for t in rng.sample(range(100), 10)
        ]
        right = [
            (k, t, t * 10.0) for k in keys for t in rng.sample(range(100), 8)
        ]
        df_l = spark.createDataFrame(left, "k string, t int")
        df_r = spark.createDataFrame(right, "k string, t int, v double")
        rmap = {}
        for k, t, v in right:
            rmap.setdefault(k, []).append((t, v))

        def model(strategy, tol):
            out = {}
            for k, t in left:
                cands = rmap.get(k, [])
                if strategy == "backward":
                    cands = [c for c in cands if c[0] <= t and (tol is None or c[0] >= t - tol)]
                    pick = max(cands) if cands else None
                else:
                    cands = [c for c in cands if c[0] >= t and (tol is None or c[0] <= t + tol)]
                    pick = min(cands) if cands else None
                out[(k, t)] = pick
            return out

        for strategy in ("backward", "forward"):
            for tol in (None, 5):
                got = {
                    (r["k"], r["t"]): (
                        None if r["t_right"] is None else (r["t_right"], r["v"])
                    )
                    for r in asof_join(
                        df_l, df_r, on="t", by="k", strategy=strategy, tolerance=tol
                    ).collect()
                }
                assert got == model(strategy, tol), (strategy, tol)


def test_observation_metrics_single_pass(spark):
    """A12 run counters via the Observation API: accumulator-style
    metrics (rows seen, nulls, value sum) collected DURING the one
    action instead of a second aggregation pass — at 100 TB the
    difference between one scan and two."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from dvmax_spark.catalog import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    n_out = observed.where(F.col("value") > 0).count()  # the real action
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["n_null_value"] == 0
    assert n_out <= m["n_rows"]
    exp = round(ev.agg(F.sum("value")).first()[0], 2)
    assert abs(m["sum_value"] - exp) < 0.02


def test_bin_range_join_matches_naive_and_handles_bin_edges(spark):
    """bin_range_join == the naive BETWEEN join on adversarial
    boundaries: points exactly on interval endpoints (inclusive),
    intervals spanning multiple bins, and bin-edge timestamps — each
    qualifying pair must appear exactly once (the point's bin)."""
    import datetime as dt

    from dvmax_spark.operators.range_join import bin_range_join

    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)
    iv = spark.createDataFrame(
        [
            ("u1", 1, mk(0), mk(3600)),       # exactly one bin-width long
            ("u1", 2, mk(1800), mk(9000)),    # spans 3 bins
            ("u2", 3, mk(0), mk(3600)),       # same window, other user
        ],
        "user_id string, iv_id int, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    pts = spark.createDataFrame(
        [
            ("u1", 10, mk(0)),      # on start boundary (inclusive)
            ("u1", 11, mk(3600)),   # on end boundary AND a bin edge
            ("u1", 12, mk(7200)),   # inside iv 2's third bin
            ("u1", 13, mk(9001)),   # just past iv 2's end
            ("u2", 14, mk(100)),    # matches only via u2
        ],
        "user_id string, pt_id int, ts timestamp_ntz",
    )
    got = {
        (r.iv_id, r.pt_id)
        for r in bin_range_join(
            iv, pts, "start_ts", "end_ts", "ts", bin_width_s=3600,
            keys=("user_id",),
        ).collect()
    }
    # naive reference computed by hand: inclusive both ends, user-keyed
    assert got == {(1, 10), (1, 11), (2, 11), (2, 12), (3, 14)}


# --------------------------------------------------- distributed rank

def test_distributed_rank_matches_single_window(spark):
    """with_global_rank must be bit-identical to the unpartitioned
    row_number for a total order — on multi-partition random data,
    desc ordering, and with a physical plan whose only Window is
    partitioned by spark_partition_id (no SinglePartition sort)."""
    import random

    from pyspark.sql import Window

    from dvmax_spark.operators.distrank import with_global_rank

    random.seed(7)
    rows = [(i, random.random()) for i in range(5007)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(13)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = with_global_rank(df, order, "rn")
    exp = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("id").asc()))
    )
    assert got.join(exp, "id").where(got["rn"] != exp["rn"]).count() == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert len(win_lines) == 1 and "_gr_pid" in win_lines[0], plan
    # empty input survives (offset map empty)
    assert with_global_rank(df.where(F.lit(False)), order).count() == 0


def test_distributed_ntile_matches_single_window(spark):
    """with_exact_ntile reproduces ntile's published arithmetic for
    every N-vs-n regime: even split, ragged split, and n > N."""
    import random

    from pyspark.sql import Window

    from dvmax_spark.operators.distrank import with_exact_ntile

    random.seed(11)
    rows = [(i, random.random()) for i in range(1004)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(7)
    order = [F.col("v").asc(), F.col("id").asc()]
    for n in (4, 5, 7, 1004, 2000):
        got = with_exact_ntile(df, order, n, "b")
        exp = df.withColumn(
            "b", F.ntile(n).over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
        )
        assert got.join(exp, "id").where(got["b"] != exp["b"]).count() == 0, n


def test_distributed_group_cumsum_matches_single_window(spark):
    """with_group_cumsum equals the per-group windowed running sum
    exactly on a skewed corpus (one group holds ~80% of rows — the
    shape the operator exists for), equals the GLOBAL running sum when
    group_by=[], survives empty input, and its big-table window
    partitions by physical partition id, never by group."""
    import random

    from pyspark.sql import Window

    from dvmax_spark.operators.distrank import with_group_cumsum

    rng = random.Random(23)
    rows = [
        (
            i,
            "hot" if rng.random() < 0.8 else f"g{rng.randint(0, 40)}",
            rng.randint(1, 100),
        )
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(11)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = with_group_cumsum(df, ["g"], order, "v", out_col="c")
    exp = df.withColumn(
        "c",
        F.sum("v").over(
            Window.partitionBy("g")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert got.join(exp, "id").where(got["c"] != exp["c"]).count() == 0
    # the running-sum window (the one over the full table) must key on
    # the physical partition id — group-sized pools never form
    plan = got._jdf.queryExecution().executedPlan().toString()
    run_lines = [l for l in plan.splitlines() if "Window [" in l and "_gc_run" in l]
    assert run_lines and all("_gc_pid" in l for l in run_lines), plan
    # group_by=[] degenerates to the exact global cumsum
    gg = with_group_cumsum(df, [], [F.col("id").asc()], "v", out_col="c")
    ge = df.withColumn(
        "c",
        F.sum("v").over(
            Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert gg.join(ge, "id").where(gg["c"] != ge["c"]).count() == 0
    # empty input survives (offset table empty)
    assert with_group_cumsum(df.where(F.lit(False)), ["g"], order, "v").count() == 0


def test_distributed_group_cumsum_null_semantics(spark):
    """Null EDGE parity with the single-window form: a null group key
    is one group (the offset re-join is null-safe — a plain equi-join
    would silently drop its cross-partition offsets), and null values
    follow SQL's null-skipping sum (running value null only while the
    group has seen no non-null value yet). Forced to span partitions
    via num_partitions > distinct keys."""
    import random

    from pyspark.sql import Window

    from dvmax_spark.operators.distrank import with_group_cumsum

    rng = random.Random(41)
    rows = []
    for i in range(600):
        g = None if rng.random() < 0.5 else f"g{rng.randint(0, 2)}"
        # long null runs at the FRONT of the order so some partition's
        # whole prefix (and some whole partitions) are null-valued
        v = None if i % 600 < 200 and rng.random() < 0.9 else rng.randint(0, 5)
        rows.append((i, g, v))
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(5)
    order = [F.col("id").asc()]
    got = with_group_cumsum(df, ["g"], order, "v", out_col="c", num_partitions=16)
    exp = df.withColumn(
        "c",
        F.sum("v").over(
            Window.partitionBy("g")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    bad = (
        got.select("id", "c")
        .join(exp.select("id", F.col("c").alias("c2")), "id")
        .where(~F.col("c").eqNullSafe(F.col("c2")))
    )
    assert bad.count() == 0, bad.orderBy("id").limit(5).collect()


def test_distributed_group_rank_matches_single_window(spark):
    """with_group_rank equals the per-group row_number exactly on a
    skewed layout (hot group spans many partitions)."""
    import random

    from pyspark.sql import Window

    from dvmax_spark.operators.distrank import with_group_rank

    rng = random.Random(57)
    rows = [
        (i, "hot" if rng.random() < 0.7 else f"g{rng.randint(0, 9)}", rng.random())
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(9)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = with_group_rank(df, ["g"], order, "rn", num_partitions=16)
    exp = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy(*order))
    )
    assert got.join(exp, "id").where(got["rn"] != exp["rn"]).count() == 0
    assert "_gr_one" not in got.columns


def test_distributed_group_ntile_matches_single_window(spark):
    """with_group_ntile reproduces ntile's arithmetic per group: even
    and ragged splits, n larger than a group, null group keys, and a
    hot group spanning many partitions."""
    import random

    from pyspark.sql import Window

    from dvmax_spark.operators.distrank import with_group_ntile

    rng = random.Random(73)
    rows = []
    for i in range(2500):
        r = rng.random()
        g = "hot" if r < 0.6 else (None if r < 0.7 else f"g{rng.randint(0, 6)}")
        rows.append((i, g, rng.random()))
    # one singleton group (n >> group size)
    rows.append((99999, "solo", 0.5))
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(9)
    order = [F.col("v").asc(), F.col("id").asc()]
    for n in (3, 4, 7, 500):
        got = with_group_ntile(df, ["g"], order, n, "b", num_partitions=16)
        exp = df.withColumn(
            "b", F.ntile(n).over(Window.partitionBy("g").orderBy(*order))
        )
        assert got.join(exp, "id").where(got["b"] != exp["b"]).count() == 0, n


def test_group_median_exact_matches_builtin(spark):
    """group_median_exact equals the built-in (pooled) median per
    group: odd and even group sizes, duplicated values, a singleton
    group, and a null group key."""
    import random

    from dvmax_spark.operators.distrank import group_median_exact

    rng = random.Random(83)
    rows = []
    for i in range(3001):
        g = None if rng.random() < 0.2 else f"g{rng.randint(0, 4)}"
        rows.append((i, g, float(rng.randint(0, 50))))
    rows.append((99999, "solo", 7.0))
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(7)
    got = group_median_exact(
        df, ["g"], "v", [F.col("id").asc()], out_col="med", num_partitions=16
    )
    exp = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.median("v").alias("med")
    )
    bad = (
        got.join(exp.withColumnRenamed("med", "med2").withColumnRenamed("n_rows", "n2"),
                 got["g"].eqNullSafe(exp["g"]))
        .where((F.col("med") != F.col("med2")) | (F.col("n_rows") != F.col("n2")))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_group_quantiles_exact_matches_builtin(spark):
    """group_quantiles_exact equals the built-in percentile at the
    same rationals (R-7 interpolation), across ragged group sizes and
    the q=0 / q=1 edges, from one rank pass."""
    import random

    from dvmax_spark.operators.distrank import group_quantiles_exact

    rng = random.Random(91)
    rows = [
        (i, f"g{rng.randint(0, 6)}", float(rng.randint(0, 40))) for i in range(2003)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(7)
    got = group_quantiles_exact(
        df,
        ["g"],
        "v",
        [F.col("id").asc()],
        [(0, 1), (1, 4), (1, 2), (3, 4), (1, 1)],
        ["p0", "p25", "p50", "p75", "p100"],
        num_partitions=16,
    )
    exp = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n2"),
        F.expr("percentile(v, 0.0)").alias("e0"),
        F.expr("percentile(v, 0.25)").alias("e25"),
        F.expr("percentile(v, 0.5)").alias("e50"),
        F.expr("percentile(v, 0.75)").alias("e75"),
        F.expr("percentile(v, 1.0)").alias("e100"),
    )
    bad = got.join(exp, "g").where(
        (F.col("n_rows") != F.col("n2"))
        | (F.col("p0") != F.col("e0"))
        | (F.col("p25") != F.col("e25"))
        | (F.col("p50") != F.col("e50"))
        | (F.col("p75") != F.col("e75"))
        | (F.col("p100") != F.col("e100"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_distributed_rank_fuzz_vs_single_window(spark):
    """Differential fuzz: random data shapes (duplicated order-key
    values, nulls, skewed distributions, tiny and odd-sized inputs,
    random asc/desc directions) — the distributed rank must equal the
    single-window row_number EXACTLY whenever the order is made total
    by the id tie-break. Deterministic seeds; 6 shapes x 2 direction
    mixes."""
    import random

    from pyspark.sql import Window

    from dvmax_spark.operators.distrank import with_global_rank

    shapes = []
    rng = random.Random(99)
    # heavy duplicates (10 distinct values over 2000 rows)
    shapes.append([(i, float(rng.randint(0, 9))) for i in range(2000)])
    # all-equal order key (pure tie-break ordering)
    shapes.append([(i, 1.0) for i in range(257)])
    # skew: 90% one value
    shapes.append(
        [(i, 5.0 if rng.random() < 0.9 else rng.random()) for i in range(1500)]
    )
    # nulls mixed in
    shapes.append(
        [(i, None if rng.random() < 0.2 else rng.random()) for i in range(800)]
    )
    # tiny
    shapes.append([(0, 3.0), (1, 1.0)])
    # single row
    shapes.append([(42, 0.5)])
    for si, rows in enumerate(shapes):
        df = spark.createDataFrame(rows, "id long, v double").repartition(7)
        for vdir in ("asc", "desc"):
            vcol = getattr(F.col("v"), vdir)()
            order = [vcol, F.col("id").asc()]
            got = with_global_rank(df, order, "rn")
            exp = df.withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(getattr(F.col("v"), vdir)(), F.col("id").asc())
                ),
            )
            bad = got.join(exp.withColumnRenamed("rn", "rn2"), "id").where(
                F.col("rn") != F.col("rn2")
            ).count()
            assert bad == 0, (si, vdir, bad)


# ------------------------------------------------------- z-order layout

def test_zorder_layout_prunes_both_dimensions(spark):
    """The multi-dimensional-layout claim, quantified: on orders
    (custkey mod 256 x order-day mod 256, 16 files), Z-order scans
    4/16 files for a 16-value box on EITHER dimension alone and 1/16
    for the 2-D box, while the custkey-sorted layout scans 16/16 for
    any day-only box (its files all span the full day range). Exact
    footer-stat arithmetic, no sampling."""
    from dvmax_spark.catalog import load_table
    from dvmax_spark.operators.distrank import with_exact_ntile
    from dvmax_spark.operators.zorder import zorder_layout_report

    o = load_table(spark, "orders", "/root/testdata/sf0.01")
    qa = F.col("o_custkey") % 256
    qb = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")) % 256
    rep = zorder_layout_report(o, qa, qb, bits=8, n_files=16).collect()
    assert len(rep) == 16 and sum(r.n_rows for r in rep) == o.count()

    def scans(env, la, ha, lb, hb):
        return sum(
            1
            for r in env
            if r.min_a <= ha and r.max_a >= la and r.min_b <= hb and r.max_b >= lb
        )

    assert scans(rep, 64, 79, 128, 143) == 1  # 2-D box: one file
    assert scans(rep, 64, 79, 0, 255) == 4  # dim-a-only box
    assert scans(rep, 0, 255, 128, 143) == 4  # dim-b-only box

    d = o.select(qa.alias("qa"), qb.alias("qb"))
    ck_sorted = with_exact_ntile(
        d, [F.col("qa").asc(), F.col("qb").asc()], 16, "file_id"
    )
    env = ck_sorted.groupBy("file_id").agg(
        F.min("qa").alias("min_a"),
        F.max("qa").alias("max_a"),
        F.min("qb").alias("min_b"),
        F.max("qb").alias("max_b"),
    ).collect()
    assert scans(env, 0, 255, 128, 143) == 16  # single-sort can't prune dim b


def test_hash_slice_is_deterministic_and_covering(spark):
    """with_hash_slice: every row gets exactly one slice in [1, n],
    assignment is identical across calls (pure function of the key),
    and at corpus scale every slice is non-empty."""
    from dvmax_spark.operators.distrank import with_hash_slice

    df = spark.range(5000).withColumnRenamed("id", "k")
    a = with_hash_slice(df, ["k"], 3)
    b = with_hash_slice(df, ["k"], 3)
    assert a.where((F.col("_b") < 1) | (F.col("_b") > 3)).count() == 0
    assert (
        a.join(b.withColumnRenamed("_b", "_b2"), "k")
        .where(F.col("_b") != F.col("_b2"))
        .count()
        == 0
    )
    sizes = {r["_b"]: r["n"] for r in a.groupBy("_b").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == {1, 2, 3} and min(sizes.values()) > 1000  # roughly even
