"""[EXT] MLlib modeling path (SURVEY §2.13, BASELINE north star):
array-embedding features -> VectorAssembler-style pipeline ->
classifier -> walk-forward evaluation."""

from dvmax_spark.ml.pipeline import (
    embeddings_to_features,
    train_eval_classifier,
    walk_forward_splits,
)

__all__ = ["embeddings_to_features", "train_eval_classifier", "walk_forward_splits"]
