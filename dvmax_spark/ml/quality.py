"""[EXT] FastText-style text-quality classifier (CCNet / LLaMA-1
recipe: train a cheap linear classifier on weak labels, score the
whole corpus, keep what the model likes).

The weak labels come from the deterministic Gopher gate
(ext/textstats.gopher_rules) — the standard bootstrap when no human
labels exist; the classifier generalizes the gate from hard
thresholds to a soft probability that survives distribution drift
better than the raw rules.

Spark-first shape: tokenization is `F.split` (JVM), features are
MLlib `HashingTF` (the hashing trick — no vocab pass, fixed-width
vectors, same trick as ext/textstats.feature_hash), the learner is
LogisticRegression (distributed LBFGS over Tungsten vectors). The
ONLY corpus passes are: one gate scan for labels, one featurize scan,
one scoring scan. At 100 TB the train split is a deterministic hash
sample (no shuffle — hash_bucket filter), and scoring is a map-only
transform.

Determinism note: labels and the split are bit-deterministic;
LBFGS aggregates float gradients tree-wise, so coefficients can
drift by ulps across partitionings — the registered query therefore
aggregates to per-source counts (rows-only by design) and tests
assert held-out AGREEMENT thresholds, not exact coefficients.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvmax_spark.ext.textstats import gopher_rules
from dvmax_spark.ext.traindata import hash_bucket


def _featurized(docs: DataFrame, num_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    words = docs.select(
        "doc_id",
        "source",
        F.filter(F.split(F.col("text"), " "), lambda w: w != "").alias("words"),
    )
    tf = HashingTF(inputCol="words", outputCol="features", numFeatures=num_features)
    return tf.transform(words)


def quality_classifier_scores(
    docs: DataFrame,
    num_features: int = 1024,
    train_pct: int = 70,
    reg_param: float = 0.01,
) -> DataFrame:
    """Train on a deterministic ``train_pct``% hash split of the
    Gopher-gate labels, score EVERY doc; returns
    (doc_id, source, gate_keep, pred_keep, p_keep, is_train).

    ``p_keep`` is the classifier's keep-probability — the soft score a
    curation pipeline thresholds or importance-samples against
    (CCNet keeps the head of the quality distribution rather than
    hard-gating).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import vector_to_array

    labels = gopher_rules(docs).select(
        "doc_id", F.col("keep").cast("double").alias("label")
    )
    feats = _featurized(docs, num_features).join(labels, "doc_id")
    is_train = hash_bucket("doc_id", 100) < train_pct
    staged = feats.select(
        "doc_id", "source", "features", "label", is_train.alias("is_train")
    ).cache()
    try:
        lr = LogisticRegression(
            maxIter=30, regParam=reg_param, featuresCol="features", labelCol="label"
        )
        model = lr.fit(staged.where("is_train"))
        # Score with the COEFFICIENTS as Catalyst literals, NOT
        # model.transform: the fitted model retains its
        # trainingSummary, which references the SparkSession, whose
        # ObservationManager is not java-serializable — so once any
        # Observation has been used in the session, every task
        # serialization of a model-transform plan fails with
        # "Task not serializable" (seen in the full test suite after
        # the A12 metrics tests ran). Expression scoring keeps the
        # plan model-free: margin = b + coef . x, prediction at the
        # default 0.5 threshold == margin > 0.
        coef = [float(c) for c in model.coefficients.toArray().tolist()]
        b = float(model.intercept)
        arr = vector_to_array(F.col("features"))
        coef_lit = F.array(*[F.lit(c) for c in coef])
        margin = F.lit(b) + F.aggregate(
            F.zip_with(arr, coef_lit, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        p_keep = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_margin")))
        return (
            staged.withColumn("_margin", margin)
            .select(
                "doc_id",
                "source",
                F.col("label").cast("boolean").alias("gate_keep"),
                (F.col("_margin") > 0).alias("pred_keep"),
                p_keep.alias("p_keep"),
                "is_train",
            )
        )
    finally:
        staged.unpersist()


def quality_classifier_report(docs: DataFrame, **kwargs) -> DataFrame:
    """Per-source audit of the trained classifier vs the gate it was
    distilled from: doc counts, gate/model keep counts, and held-out
    agreement counts — the mixture-owner's drift dashboard."""
    s = quality_classifier_scores(docs, **kwargs)
    held = (~F.col("is_train")).cast("int")
    agree = (F.col("gate_keep") == F.col("pred_keep")).cast("int")
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("gate_keep").cast("int")).alias("n_gate_keep"),
            F.sum(F.col("pred_keep").cast("int")).alias("n_pred_keep"),
            F.sum(held).alias("n_holdout"),
            F.sum(held * agree).alias("n_holdout_agree"),
        )
        .orderBy("source")
    )
