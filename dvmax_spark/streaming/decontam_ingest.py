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
