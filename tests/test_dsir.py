"""DSIR importance resampling (ext/dsir.py) properties.

x_dsir_select is value-exact vs its DuckDB twin (driver sweep); these
tests pin the semantic invariants the hash comparison can't express:
the weights point TOWARD the target distribution, selection size is
exactly floor(N*pct/100), gram-less docs are neutral, and the hot
path stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dvmax_spark.catalog import load_table
from dvmax_spark.ext.dsir import dsir_logweights, dsir_select

SF = "/root/testdata/sf0.01"


def test_weights_favor_target_distribution(spark):
    docs = load_table(spark, "documents", SF)
    w = dsir_logweights(docs, target=F.col("lang") == "en")
    per_lang = (
        docs.select("doc_id", "lang")
        .join(w, "doc_id")
        .groupBy("lang")
        .agg(F.avg("logw_x1e6").alias("m"))
        .collect()
    )
    means = {r["lang"]: r["m"] for r in per_lang}
    # target-language docs must score higher than every other language
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, (lang, means)


def test_selection_size_exact(spark):
    docs = load_table(spark, "documents", SF)
    out = dsir_select(docs, target=F.col("lang") == "en", pct=25)
    tot = out.agg(
        F.sum("n_docs").alias("n"), F.sum("n_selected").alias("k")
    ).collect()[0]
    assert tot["k"] == tot["n"] * 25 // 100


def test_gramless_doc_gets_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, "single", "en"), (2, "two tokens here and more", "en"),
         (3, "two tokens here and more", "de")],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in dsir_logweights(
        docs, target=F.col("lang") == "en"
    ).collect()}
    assert rows[1]["n_grams"] == 0 and rows[1]["logw_x1e6"] == 0
    assert rows[2]["n_grams"] == 4


def test_dsir_plan_stays_jvm_side(spark):
    docs = load_table(spark, "documents", SF)
    out = dsir_select(docs, target=F.col("lang") == "en", pct=25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the bucket log-ratio table must come back as a broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan
