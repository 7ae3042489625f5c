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


def test_stream_into_dsir_model_equals_batch(spark, tmp_path):
    """Micro-batched model maintenance must reproduce the one-shot
    batch model EXACTLY (integer monoid), survive a crashed promote,
    and score identically to the batch path."""
    import os
    import shutil

    from dvmax_spark.ext.dsir import dsir_bucket_counts, dsir_logweights, dsir_score
    from dvmax_spark.streaming.ingest import stream_into_dsir_model

    docs = load_table(spark, "documents", SF).select("doc_id", "text", "lang")
    pdf = docs.toPandas()
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    path = str(tmp_path / "model")

    def _feed(sl, name):
        spark.createDataFrame(sl).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / name)
        )
        for f in os.listdir(str(tmp_path / name)):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(str(tmp_path / name), f),
                    os.path.join(in_dir, name + ".parquet"),
                )

    def _drain():
        stream = spark.readStream.schema("doc_id long, text string, lang string").parquet(in_dir)
        q = stream_into_dsir_model(
            stream, path, target=F.col("lang") == "en",
            checkpoint_dir=str(tmp_path / "ck"), query_name="dsir_t",
        )
        q.awaitTermination(120)

    _feed(pdf.iloc[:200], "b1")
    _drain()
    os.rename(path, path + ".old")  # crash window mid-promote
    _feed(pdf.iloc[200:], "b2")
    _drain()

    streamed = {
        r["b"]: (r["c_r"], r["c_t"]) for r in spark.read.parquet(path).collect()
    }
    batch = {
        r["b"]: (r["c_r"], r["c_t"])
        for r in dsir_bucket_counts(docs, target=F.col("lang") == "en").collect()
    }
    assert streamed == batch
    # scoring against the streamed model == the one-shot batch weights
    model = spark.read.parquet(path).select("b", "c_r", "c_t")
    a = {r["doc_id"]: r["logw_x1e6"] for r in dsir_score(docs, model).collect()}
    b = {r["doc_id"]: r["logw_x1e6"]
         for r in dsir_logweights(docs, target=F.col("lang") == "en").collect()}
    assert a == b


def test_dsir_select_kll_agrees_with_exact(spark):
    """The sketch-thresholded 100 TB form must agree with the exact
    global-rank form within the KLL rank-error envelope: total
    n_selected within 1% of N of the exact top-pct count, per-group
    counts within the same absolute slack, and identical n_docs."""
    from dvmax_spark.ext.dsir import dsir_select_kll

    docs = load_table(spark, "documents", SF)
    exact = {
        r["source"]: r
        for r in dsir_select(docs, target=F.col("lang") == "en", pct=25).collect()
    }
    kll = {
        r["source"]: r
        for r in dsir_select_kll(docs, target=F.col("lang") == "en", pct=25).collect()
    }
    assert set(exact) == set(kll)
    n_all = sum(r["n_docs"] for r in exact.values())
    slack = max(2, n_all // 100)  # KLL default K: rank error << 1%
    for src, e in exact.items():
        k = kll[src]
        assert k["n_docs"] == e["n_docs"], src
        assert abs(k["n_selected"] - e["n_selected"]) <= slack, (src, e, k)
    tot_e = sum(r["n_selected"] for r in exact.values())
    tot_k = sum(r["n_selected"] for r in kll.values())
    assert abs(tot_k - tot_e) <= slack, (tot_e, tot_k)
