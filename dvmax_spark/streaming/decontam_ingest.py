"""Streaming benchmark decontamination: the X18 gate as an INGEST
operator rather than a batch sweep.

Production shape: benchmark/eval sets change rarely; the corpus
arrives continuously. So the eval side is a PERSISTED distinct-gram
table built once (``build_eval_grams``), and every incoming micro-batch
broadcast-semi-joins its grams against it — the corpus side never
shuffles, the eval side is read once per batch and broadcast
(benchmarks are ~10⁵ grams; see SCALING.md X18).

Exactly-once: both sinks (clean docs, quarantined docs) write via
batch-keyed dynamic partition overwrite on ``ingest_batch=<id>`` —
the streaming/dedup_ingest.py contract: a micro-batch replayed after a
crash rewrites exactly its own partitions, so output is byte-stable at
any crash point. Unlike dedup ingest there is NO cross-batch state to
heal (each doc's verdict depends only on itself and the frozen eval
grams), which is what makes this the simplest member of the streaming
curation family.

Updating the eval set = rebuild the gram table (atomic overwrite) and
optionally re-sweep history with the batch decontaminate() — the
stream only guards NEW arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvmax_spark.ext.dedup import shingles


def build_eval_grams(
    eval_df: DataFrame, path: str, n: int = 5, text_col: str = "text"
) -> None:
    """Persist the eval set's DISTINCT word n-grams (the small,
    rarely-changing side of the gate)."""
    (
        eval_df.select(F.explode(shingles(text_col, n)).alias("g"))
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def stream_decontam_ingest(
    stream_docs: DataFrame,
    eval_grams_path: str,
    out_dir: str,
    quarantine_dir: str,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    query_name: str = "decontam_ingest",
    available_now: bool = True,
):
    """foreachBatch gate: contaminated docs (≥1 shared n-gram with the
    persisted eval grams) land in ``quarantine_dir``, clean docs in
    ``out_dir``, both batch-keyed for idempotent replay."""
    spark = stream_docs.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ev = F.broadcast(spark.read.parquet(eval_grams_path))
        grams = batch_df.select(
            F.col(id_col), F.explode(shingles(text_col, n)).alias("g")
        )
        bad = grams.join(ev, "g", "left_semi").select(id_col).distinct()
        bad = bad.localCheckpoint()  # both sinks consume the verdict once
        quarantined = batch_df.join(bad, id_col, "left_semi")
        clean = batch_df.join(bad, id_col, "left_anti")

        def _write(df: DataFrame, path: str) -> None:
            (
                df.withColumn("ingest_batch", F.lit(str(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(path)
            )

        _write(quarantined, quarantine_dir)
        _write(clean, out_dir)

    writer = stream_docs.writeStream.foreachBatch(_sink).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_substr_decontam(
    stream_docs: DataFrame,
    index,
    out_dir: str,
    min_len: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    query_name: str = "substr_decontam",
    available_now: bool = True,
):
    """SPAN-level streaming decontamination / incremental ExactSubstr:
    each micro-batch is cleaned against a persisted
    :class:`~dvmax_spark.ext.retrieval.GramIndex` — maximal runs >=
    ``min_len`` of reference grams are excised with exact boundaries
    (exact_substr_clean_vs semantics) and the per-doc result rows
    (n_tokens, n_removed, n_runs, max_run_len, clean_hash) land in a
    batch-keyed partition of ``out_dir``.

    Like the doc-level gate above, each doc's verdict depends only on
    itself and the frozen gram index — no cross-batch state — so
    batch-keyed dynamic partition overwrite makes output byte-stable
    under crash replay AND under a fresh-checkpoint re-drain at the
    SAME slicing (pinned by test); the union of all batches equals the
    one-shot batch sweep at any slicing (the value-exact oracle
    t_stream_substr_decontam runs). A re-drain that slices batches
    DIFFERENTLY writes the same docs under different batch keys —
    clear ``out_dir`` together with the checkpoint when resetting, the
    contract shared by every batch-keyed sink in this family."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cleaned = index.clean_new(batch_df, min_len=min_len, id_col=id_col,
                                  text_col=text_col)
        (
            cleaned.withColumn("ingest_batch", F.lit(str(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .option("compression", "zstd")
            .parquet(out_dir)
        )

    writer = stream_docs.writeStream.foreachBatch(_sink).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
