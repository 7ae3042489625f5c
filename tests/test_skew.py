"""Salted aggregation / join equivalence with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_aggregate_matches_plain(spark):
    from dvmax_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [("hot", float(i % 7)) for i in range(5000)] + [("cold", 1.0)] * 3,
        "k string, v double",
    )
    plain = {
        r["k"]: (r["total"], r["rows"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("rows"))
        .collect()
    }
    salted = {
        r["k"]: (r["total"], r["rows"])
        for r in salted_aggregate(
            df,
            ["k"],
            partial_aggs={"s": F.sum("v"), "n": F.count(F.lit(1))},
            final_aggs={"total": F.sum("s"), "rows": F.sum("n")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    from dvmax_spark.operators.skew import salted_broadcast_left

    fact = spark.createDataFrame(
        [("hot", i) for i in range(2000)] + [("cold", -1)], "k string, payload int"
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, label string")
    plain = sorted(
        (r["k"], r["payload"], r["label"]) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["label"])
        for r in salted_broadcast_left(fact, dim, ["k"]).collect()
    )
    assert salted == plain
