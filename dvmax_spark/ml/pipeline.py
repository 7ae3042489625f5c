"""[EXT] MLlib pipeline over the embeddings testdata (BASELINE north
star: 'MLlib pipeline + DataFrame ops'; README Phase 3's XGBoost walk-
forward becomes seeded GBTClassifier + ordered splits — gradient-
boosted trees are MLlib's native stand-in for XGBoost).

All seeds fixed: training is deterministic for a given input."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.ml.classification import GBTClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.functions import array_to_vector


def embeddings_to_features(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """array<float> -> MLlib vector column (the VectorAssembler step for
    array-typed features)."""
    return emb.withColumn(
        "features", array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    )


def walk_forward_splits(
    df: DataFrame, order_col: str, n_splits: int = 3
) -> list[tuple[DataFrame, DataFrame]]:
    """Ordered walk-forward splits (README Phase 3's time-based CV):
    split k trains on the first k/(n+1) quantiles and tests on the
    next slice — no lookahead."""
    qs = df.approxQuantile(order_col, [i / (n_splits + 1) for i in range(1, n_splits + 1)], 0.0)
    splits = []
    bounds = [float("-inf")] + qs + [float("inf")]
    for k in range(1, n_splits + 1):
        train = df.where(F.col(order_col) <= bounds[k])
        test = df.where(
            (F.col(order_col) > bounds[k]) & (F.col(order_col) <= bounds[k + 1])
        )
        splits.append((train, test))
    return splits


def train_eval_classifier(
    emb: DataFrame,
    label_col: str = "label",
    order_col: str = "vec_id",
    n_splits: int = 3,
) -> DataFrame:
    """Walk-forward train/eval; returns one row per split with accuracy
    and f1 (the scoring-report shape of README Phase 4). GBT is a
    binary learner, so the 0-9 class id is binarized (>= 5) — the
    standard up/down target of the reference's direction classifier."""
    # cache once: the quantile pass plus every split's isEmpty / fit /
    # two evaluator passes / counts would otherwise each re-derive the
    # feature pipeline from the source embeddings (~7 recomputations
    # per split)
    feats = embeddings_to_features(emb).select(
        "features",
        (F.col(label_col).cast("double") >= 5.0).cast("double").alias("label"),
        order_col,
    ).cache()
    rows = []
    try:
        for k, (train, test) in enumerate(
            walk_forward_splits(feats, order_col, n_splits)
        ):
            if train.isEmpty() or test.isEmpty():
                continue
            model = GBTClassifier(maxIter=10, maxDepth=3, seed=7).fit(train)
            pred = model.transform(test).cache()
            try:
                acc = MulticlassClassificationEvaluator(metricName="accuracy").evaluate(pred)
                f1 = MulticlassClassificationEvaluator(metricName="f1").evaluate(pred)
                rows.append(
                    (k, train.count(), test.count(), round(acc, 4), round(f1, 4))
                )
            finally:
                pred.unpersist()
    finally:
        feats.unpersist()
    spark = emb.sparkSession
    return spark.createDataFrame(
        rows, "split int, n_train long, n_test long, accuracy double, f1 double"
    )
