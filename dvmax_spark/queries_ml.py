"""[EXT] ML + remaining approximate/engine-specific queries —
rows-only driver checks (nondeterministic across engines or not
SQL-expressible), property-tested in tests/test_ext.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvmax_spark.catalog import load_table
from dvmax_spark.registry import query


@query("x_ml_walk_forward", ids=("X13",), sql=None)
def x_ml_walk_forward(spark: SparkSession, sf: str) -> DataFrame:
    """MLlib walk-forward classification over the embeddings table
    (BASELINE north-star modeling path). Deterministic seeds, but
    training isn't SQL-expressible -> rows-only check."""
    from dvmax_spark.ml.pipeline import train_eval_classifier

    emb = load_table(spark, "embeddings", sf)
    return train_eval_classifier(emb, n_splits=2).orderBy("split")


@query("a_approx_count_distinct", ids=("A10",), sql=None)
def a_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ approximate distinct (SURVEY §2.4 [EXT]) — approximate by
    construction so excluded from the hash oracle (§2.12); the exact
    variant is oracle-checked in x_exact_dedup. Accuracy asserted in
    tests (within 5% of exact)."""
    li = load_table(spark, "lineitem", sf)
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@query("x_embedding_near_dup", ids=("X6",), sql=None)
def x_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (the
    embedding leg of the dedup suite)."""
    from dvmax_spark.ext.similarity import embedding_near_dup_pairs

    emb = load_table(spark, "embeddings", sf)
    # synthetic embeddings are near-orthogonal: 0.45 is the "near-dup"
    # band for this data (real corpora would use ~0.95)
    return embedding_near_dup_pairs(emb, threshold=0.45, n_planes=4).orderBy(
        "id_a", "id_b"
    )


@query("x_cosine_topk_ivf", ids=("X6",), sql=None)
def x_cosine_topk_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: KMeans coarse quantizer (deterministic seed) ->
    exact cosine within the probed cluster only. The classic
    inverted-file index shape: at 100 TB the centroid table broadcasts
    and the candidate join shuffles once on cluster id."""
    from dvmax_spark.ext.similarity import cosine_topk_ivf

    emb = load_table(spark, "embeddings", sf)
    return cosine_topk_ivf(emb, query_ids=range(10), k=3, n_clusters=8).orderBy(
        "q_id", "rnk"
    )


@query(
    "x_bpe_token_count",
    ids=("X7",),
    sql="""
    SELECT doc_id,
           len(list_filter(str_split(regexp_replace(text, '([^a-zA-Z0-9_ ])', ' \\1 ', 'g'), ' '),
                           t -> t != '')) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def x_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish token counting (punctuation-splitting regex — the cheap
    stand-in for subword counts)."""
    from dvmax_spark.ext.textstats import bpe_ish_tokens

    docs = load_table(spark, "documents", sf)
    return docs.select(
        "doc_id", F.size(bpe_ish_tokens("text")).alias("n_bpe_tokens")
    ).orderBy("doc_id")
