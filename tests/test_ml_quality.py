"""Quality classifier (ml/quality.py) + hard-negative mining
(ext/similarity.hard_negatives) properties.

x_quality_classifier is rows-only by design (LBFGS float
aggregation): its correctness evidence is the agreement floors here.
x_hard_negatives is value-exact vs its DuckDB twin (driver sweep);
tests pin the structural invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvmax_spark.catalog import load_table
from dvmax_spark.ext.similarity import hard_negatives
from dvmax_spark.ml.quality import quality_classifier_report, quality_classifier_scores

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def scores(spark):
    return quality_classifier_scores(load_table(spark, "documents", SF)).cache()


def test_holdout_agreement_beats_majority(scores):
    r = scores.agg(
        F.sum((~F.col("is_train")).cast("int")).alias("held"),
        F.sum(
            ((~F.col("is_train")) & (F.col("gate_keep") == F.col("pred_keep"))).cast(
                "int"
            )
        ).alias("agree"),
        F.avg(F.col("gate_keep").cast("int")).alias("gate_rate"),
    ).collect()[0]
    assert r["held"] > 50  # the 30% holdout actually exists
    acc = r["agree"] / r["held"]
    majority = max(r["gate_rate"], 1 - r["gate_rate"])
    # measured ~0.81 at sf0.01; floor leaves room for LBFGS ulp drift
    assert acc >= 0.70
    assert acc > majority  # learned signal, not the constant classifier
    assert majority < 0.70  # the floor above is non-vacuous vs majority


def test_probabilities_and_split(scores):
    r = scores.agg(
        F.min("p_keep").alias("pmin"),
        F.max("p_keep").alias("pmax"),
        F.avg(F.col("is_train").cast("int")).alias("train_frac"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert 0.0 <= r["pmin"] and r["pmax"] <= 1.0
    assert 0.6 < r["train_frac"] < 0.8  # deterministic 70% hash split
    assert r["n"] == 500  # every doc scored, none dropped
    # prediction is the 0.5-threshold of p_keep
    bad = scores.where(
        (F.col("p_keep") > 0.5) != F.col("pred_keep")
    ).count()
    assert bad == 0


def test_report_consistency(spark, scores):
    rep = quality_classifier_report(load_table(spark, "documents", SF))
    r = rep.agg(
        F.sum("n_docs").alias("n"),
        F.sum("n_holdout").alias("h"),
        F.sum("n_holdout_agree").alias("a"),
    ).collect()[0]
    assert r["n"] == 500
    assert 0 < r["a"] <= r["h"] < r["n"]
    # gate labels are deterministic: per-source gate counts must match
    # an independent aggregation of the scores frame
    gate = {
        row["source"]: row["g"]
        for row in scores.groupBy("source")
        .agg(F.sum(F.col("gate_keep").cast("int")).alias("g"))
        .collect()
    }
    for row in rep.collect():
        assert row["n_gate_keep"] == gate[row["source"]]


def test_hard_negatives_structure(spark):
    emb = load_table(spark, "embeddings", SF)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, query_ids=range(10), k=5).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == set(range(10))
    for q_id, rows in by_q.items():
        assert [r["rnk"] for r in rows] == list(range(1, 6))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        for r in rows:
            # the defining property: mined negatives NEVER share the
            # query's label, and carry their true label
            assert r["neg_label"] != labels[q_id]
            assert r["neg_label"] == labels[r["c_id"]]
            assert r["c_id"] != q_id


def test_hard_negatives_harder_than_random(spark):
    """Mined negatives must be dramatically more similar than the
    other-label average — i.e. actually 'hard'."""
    emb = load_table(spark, "embeddings", SF)
    mined = (
        hard_negatives(emb, query_ids=range(10), k=5)
        .agg(F.avg("cosine").alias("m"))
        .collect()[0]["m"]
    )
    from dvmax_spark.ext.similarity import as_double, dot, norm

    vecs = emb.select("vec_id", "label", as_double("embedding").alias("v"))
    q = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("q_v"),
        norm(F.col("v")).alias("q_n"),
    )
    c = vecs.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        F.col("v").alias("c_v"),
        norm(F.col("v")).alias("c_n"),
    )
    rand_avg = (
        F.broadcast(q)
        .crossJoin(c)
        .where((F.col("q_id") != F.col("c_id")) & (F.col("q_label") != F.col("c_label")))
        .agg(
            F.avg(
                dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n"))
            ).alias("m")
        )
        .collect()[0]["m"]
    )
    assert mined > rand_avg + 0.1


def test_training_triplets_structure(spark):
    from dvmax_spark.ext.similarity import training_triplets

    emb = load_table(spark, "embeddings", SF)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = training_triplets(emb, query_ids=range(5), k_pos=2, k_neg=2).collect()
    assert len(rows) == 5 * 2 * 2  # full pos × neg cross per anchor
    for r in rows:
        assert labels[r["pos_id"]] == labels[r["q_id"]]
        assert labels[r["neg_id"]] != labels[r["q_id"]]
        assert r["pos_id"] != r["q_id"] and r["neg_id"] != r["q_id"]
        assert abs(r["margin"] - (r["pos_cos"] - r["neg_cos"])) < 1e-12


def test_triplets_empty_query_guard(spark):
    from dvmax_spark.ext.similarity import training_triplets, training_triplets_sql
    from dvmax_spark.ext.similarity import hard_negatives, hard_negatives_sql

    emb = load_table(spark, "embeddings", SF)
    for fn in (lambda: training_triplets(emb, []), lambda: training_triplets_sql([]),
               lambda: hard_negatives(emb, []), lambda: hard_negatives_sql([])):
        with pytest.raises(ValueError):
            fn()


def test_quantization_recall_bounds(spark):
    """int8 max-abs quantization at 64 dims must keep most of the
    top-5 (overlap >= 3 of 5 on average) with small cosine drift, and
    a self-consistency check: quantizing with levels=1e9 (lossless at
    float32 precision scale) gives perfect overlap and ~0 error."""
    from dvmax_spark.ext.similarity import quantization_recall

    emb = load_table(spark, "embeddings", SF)
    rows = quantization_recall(emb, query_ids=range(10), k=5).collect()
    assert len(rows) == 10
    assert all(0 <= r["n_overlap"] <= 5 for r in rows)
    assert sum(r["n_overlap"] for r in rows) >= 30
    assert all(r["max_err_x1e4"] <= 200 for r in rows)  # < 0.02 cosine drift


def test_quantization_recall_empty_guard(spark):
    from dvmax_spark.ext.similarity import quantization_recall, quantization_recall_sql

    emb = load_table(spark, "embeddings", SF)
    with pytest.raises(ValueError):
        quantization_recall(emb, [])
    with pytest.raises(ValueError):
        quantization_recall_sql([])


def test_quality_classifier_survives_observation_poisoned_session(spark):
    """REGRESSION (root cause of the 'deep-session flake'): after ANY
    query runs with an Observation (the A12 metrics op), the
    SparkSession's ObservationManager makes the session
    non-serializable — and LogisticRegressionModel retains a
    trainingSummary that references the session, so any
    model.transform PLAN then fails task serialization
    ('Task not serializable ... ObservationManager'). The classifier
    therefore scores with coefficient LITERALS (model-free plan);
    this test poisons the session explicitly and must still score."""
    from pyspark.sql import Observation

    from dvmax_spark.ml.quality import quality_classifier_report

    obs = Observation("poison_serialization")
    spark.range(10).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get["n"] == 10

    docs = spark.createDataFrame(
        [(i, "the a of and in to is words here " * 4, "s0") for i in range(60)],
        "doc_id long, text string, source string",
    )
    rows = quality_classifier_report(docs).collect()
    assert rows and rows[0]["n_docs"] == 60
