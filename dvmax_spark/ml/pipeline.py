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


def walk_forward_fold_table(
    df: DataFrame, order_col: str = "vec_id", n_splits: int = 3
) -> DataFrame:
    """The deterministic HALF of the walk-forward pipeline as a pure
    DataFrame: one row per split with the train-end boundary value and
    the exact train/test row counts — everything about the folds that
    is engine-independent (the GBT metrics are not; they live in
    :func:`train_eval_classifier`).

    Spark's ``approxQuantile(p, relativeError=0.0)`` over a column of
    UNIQUE values returns the element at 1-based rank ``ceil(p*n)``
    (verified empirically for the split probabilities used here), so
    for unique ``order_col`` the fold table below is bit-identical to
    the splits :func:`walk_forward_splits` materializes:
    ``n_train(k) = r_k = ceil((k/m)*n)`` with ``m = n_splits+1``,
    ``n_test(k) = r_{k+1} - r_k`` (``r_m = n``), and ``train_end`` is
    the value at rank ``r_k``. Agreement is pinned by a test.

    Scale shape: a distributed exact rank (:func:`with_global_rank` —
    range shuffle + broadcast offsets, no single-partition window),
    one 1-row broadcast for ``n``, one broadcast join of ``n_splits``
    rows onto the ranked column. No driver-side collect."""
    from dvmax_spark.operators.distrank import with_global_rank

    m = n_splits + 1
    ranked = with_global_rank(
        df.select(order_col), [F.col(order_col)], out_col="_rnk"
    )
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    spark = df.sparkSession
    # (k/m)*n in IEEE double, exactly the arithmetic approxQuantile's
    # caller + rank rule perform — and exactly what the DuckDB oracle
    # runs (+,-,*,/ are bit-identical across engines)
    folds = (
        spark.range(1, n_splits + 1)
        .select(F.col("id").cast("long").alias("split"))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "n_train",
            F.ceil(F.col("split").cast("double") / m * F.col("_n")),
        )
        .withColumn(
            "_r_next",
            F.when(
                F.col("split") < n_splits,
                F.ceil((F.col("split") + 1).cast("double") / m * F.col("_n")),
            ).otherwise(F.col("_n")),
        )
    )
    return (
        folds.join(ranked, folds["n_train"] == ranked["_rnk"])
        .select(
            "split",
            F.col(order_col).cast("long").alias("train_end"),
            F.col("n_train").cast("long").alias("n_train"),
            (F.col("_r_next") - F.col("n_train")).cast("long").alias("n_test"),
        )
    )


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
