"""Streaming near-duplicate ingest: a document stream drains through
``foreachBatch`` against a persisted :class:`MinHashIndex` — GREEDY
online dedup, the standard ingest contract: the FIRST-ADMITTED copy of
a near-dup family survives; later arrivals route to a dup sink.

This is deliberately NOT connected-components dedup (that is the batch
operator ``dedup_clusters``): online arrival can't see future edges,
so a chain a~b, b~c admits both a and c when b was dropped — greedy
semantics, documented and pinned by test. For clone families (the
overwhelmingly common case) greedy and component dedup agree and the
min-id representative survives when arrival order follows ids.

Delivery semantics: a replayed micro-batch re-presents already-admitted
doc ids; the id anti-join against the index turns the replay into a
no-op (effectively-once on doc ids), same contract as
``stream_upsert_into_store``.

Scale notes (100 TB): per-batch work is O(batch) signatures + one
band-key join against the index + the id anti-join. The id anti-join
scans index ids; at cluster scale keep a dedicated admitted-ids table
(or a rebuilt-per-epoch bloom filter) instead of distinct-ing the band
table — noted here because toy scale hides that cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvmax_spark.ext.dedup import MinHashIndex, minhash_lsh_pairs


def stream_dedup_ingest(
    stream_docs: DataFrame,
    index: MinHashIndex,
    out_dir: str,
    dup_dir: str,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
    query_name: str = "dedup_ingest",
    available_now: bool = True,
):
    """Attach a document stream to ``index`` and start the query.

    Per micro-batch: exact-id dedup within the batch → replay guard
    (ids already in the index are no-ops) → within-batch near-dups
    (min id survives) → index near-dups (first-admitted survives) →
    novel docs append to ``out_dir`` AND into the index; displaced
    docs append to ``dup_dir`` with the id they duplicated.
    Returns the StreamingQuery (caller awaits termination).
    """
    idc = index.id_col

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.dropDuplicates([idc])
        if os.path.isdir(index.path):
            seen = index.spark.read.parquet(index.path).select(idc).distinct()
            fresh = batch.join(seen, idc, "left_anti")
        else:
            fresh = batch
        fresh = fresh.localCheckpoint()  # cut lineage: reused 4x below
        if fresh.isEmpty():
            return
        # within-batch near-dups: keep the min id of each candidate
        # pair. Docs shorter than the shingle width can't minhash-match
        # (all-null signature -> shared empty band key would produce
        # spurious pairs) — exclude them from matching, admit them.
        matchable = fresh.where(
            F.size(F.split(F.col(index.text_col), " ")) >= index.shingle_n
        )
        pairs = minhash_lsh_pairs(
            matchable,
            id_col=idc,
            text_col=index.text_col,
            num_hashes=index.num_hashes,
            bands=index.bands,
            shingle_n=index.shingle_n,
            threshold=threshold,
        )
        intra = pairs.select(
            F.col("id_b").alias(idc), F.col("id_a").alias("dup_of")
        )
        # vs the already-admitted corpus: first-admitted wins
        if os.path.isdir(index.path):
            cross = index.match_new(fresh, threshold=threshold).select(
                F.col("new_id").alias(idc), F.col("old_id").alias("dup_of")
            )
            displaced = intra.unionByName(cross)
        else:
            displaced = intra
        displaced = (
            displaced.groupBy(idc).agg(F.min("dup_of").alias("dup_of"))
        ).localCheckpoint()
        dups = fresh.join(displaced, idc, "inner")
        novel = fresh.join(displaced, idc, "left_anti")
        dups.write.mode("append").option("compression", "zstd").parquet(dup_dir)
        novel.write.mode("append").option("compression", "zstd").parquet(out_dir)
        if os.path.isdir(index.path):
            index.append(novel)
        else:
            index.build(novel)

    writer = stream_docs.writeStream.foreachBatch(_sink).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
