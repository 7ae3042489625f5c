"""Streaming near-duplicate ingest: a document stream drains through
``foreachBatch`` against a persisted :class:`MinHashIndex` — GREEDY
online dedup, the standard ingest contract: docs are (logically)
processed in id order, and a doc is displaced iff it is near-dup of an
ALREADY-ADMITTED doc (index member or smaller surviving batch peer).

This is deliberately NOT connected-components dedup (that is the batch
operator ``dedup_clusters``): greedy online semantics admit both
endpoints of a chain a~b, b~c when the middle was displaced — b's
near-dups are judged against SURVIVORS only. The within-batch survivor
set is the exact sequential-greedy result (lexicographic MIS over the
candidate-pair graph), computed by earliest-witness fixpoint iteration
— depth-k chain nodes are correct after k rounds, so ``max_iter``
bounds chain length exactly like ``dedup_clusters``. Because the
semantics equal sequential processing in id order, the outcome is
INDEPENDENT of how the stream is sliced into micro-batches (pinned by
test).

Delivery semantics: every processed id (admitted or displaced) is
recorded in a ``<index>_seen`` ledger; replayed micro-batches anti-join
it and become full no-ops — novel sink, dup sink, AND index stay
byte-stable across replays (pinned by test). Every per-batch write
(novel, dups, index, ledger) is a batch-keyed DYNAMIC partition
overwrite on an ``ingest_batch=<id>`` partition, so a batch replayed
after a mid-batch crash (some sinks written, ledger not yet) REWRITES
its own partitions with identical content instead of appending a
second copy — idempotence holds regardless of where the crash landed,
not just between batches. (Replay determinism: recomputation is pure,
and when the crashed attempt already admitted docs to the index, the
replay passes ``exclude_self`` to ``match_new`` so stored rows with
the batch's OWN doc ids are invisible to cross-matching — without
that, a corpus-displaced doc could pick up a smaller-id batch peer as
its ``dup_of`` and the rewritten dups partition would be
membership-equal but not byte-identical to a crash-free run. The
exclusion is id-based rather than batch-key-based because micro-batch
counters restart with a fresh checkpoint: a prior run's live
``ingest_batch=0`` partition must stay matchable.)

Scale notes (100 TB): per-batch work is O(batch) signatures + one
band-key join against the index + the ledger anti-join. The ledger is
an id-only parquet table; at mega-scale swap the per-batch distinct
scan for a bloom filter rebuilt per epoch. Docs shorter than the
shingle width can't minhash-match: they are admitted directly and
excluded from matching AND from the band table (an all-null signature
would pollute one shared empty band key per band).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dvmax_spark.ext.dedup import MinHashIndex, minhash_lsh_pairs


def _greedy_survivors(ids: DataFrame, edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Lexicographic MIS over ``edges`` (id_a < id_b) restricted to
    ``ids`` — the exact survivor set of sequential greedy processing in
    id order. Earliest-witness fixpoint: S <- ids \\ {d : edge (s, d),
    s in S}; nodes at greedy depth k are stable after k rounds."""
    surv = ids
    for _ in range(max_iter):
        displaced = (
            edges.join(surv.withColumnRenamed("id", "id_a"), "id_a")
            .select(F.col("id_b").alias("id"))
            .distinct()
        )
        nxt = ids.join(displaced, "id", "left_anti").localCheckpoint(eager=True)
        if nxt.count() == surv.count():
            surv = nxt
            break
        surv = nxt
    return surv


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

    Per micro-batch: exact-id dedup within the batch → ledger replay
    guard → cross-displacement vs the index (admitted corpus always
    wins) → within-batch sequential-greedy survivors → novel docs
    append to ``out_dir`` AND (if matchable) the index; displaced docs
    append to ``dup_dir`` with the smallest admitted doc they
    duplicate. Returns the StreamingQuery (caller awaits termination).
    """
    idc = index.id_col
    ledger = index.path + "_seen"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # heal a crashed compact BEFORE the isdir guard below — without
        # this, a compact() that died between its two renames makes the
        # index look absent: cross-matching is skipped and a fresh
        # one-batch index is written, and the NEXT swap would delete the
        # stranded history in '.old' (r4 review finding)
        from dvmax_spark.fsops import recover_swap

        recover_swap(index.path)
        if batch_df.isEmpty():
            return
        batch = batch_df.dropDuplicates([idc])
        if os.path.isdir(ledger):
            seen = index.spark.read.parquet(ledger).select(idc).distinct()
            fresh = batch.join(seen, idc, "left_anti")
        else:
            fresh = batch
        fresh = fresh.localCheckpoint()
        if fresh.isEmpty():
            return
        matchable = fresh.where(
            F.size(F.split(F.col(index.text_col), " ")) >= index.shingle_n
        )
        # cross-displacement: the admitted corpus always outranks the batch
        if os.path.isdir(index.path):
            cross = (
                index.match_new(
                    matchable, threshold=threshold, exclude_self=True
                )
                .groupBy(F.col("new_id").alias(idc))
                .agg(F.min("old_id").alias("dup_of"))
                .localCheckpoint()
            )
        else:
            cross = (
                fresh.select(idc).limit(0).withColumn("dup_of", F.col(idc))
            )
        # within-batch: sequential-greedy survivors over candidate pairs,
        # excluding cross-displaced docs (they are not admitted, so they
        # cannot displace their batch peers)
        contenders = matchable.join(cross, idc, "left_anti")
        pairs = minhash_lsh_pairs(
            contenders,
            id_col=idc,
            text_col=index.text_col,
            num_hashes=index.num_hashes,
            bands=index.bands,
            shingle_n=index.shingle_n,
            threshold=threshold,
        ).localCheckpoint()
        surv = _greedy_survivors(
            contenders.select(F.col(idc).alias("id")), pairs
        )
        intra = (
            pairs.join(surv.withColumnRenamed("id", "id_a"), "id_a")
            .groupBy(F.col("id_b").alias(idc))
            .agg(F.min("id_a").alias("dup_of"))
        )
        displaced = cross.unionByName(intra).groupBy(idc).agg(
            F.min("dup_of").alias("dup_of")
        )
        dups = fresh.join(displaced, idc, "inner")
        novel = fresh.join(displaced, idc, "left_anti")

        def _batch_write(df: DataFrame, path: str) -> None:
            (
                df.withColumn("ingest_batch", F.lit(str(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .option("compression", "zstd")
                .parquet(path)
            )

        _batch_write(dups, dup_dir)
        _batch_write(novel, out_dir)
        admit = novel.join(
            matchable.select(idc), idc, "left_semi"
        )  # shorts stay out of the band table
        index.append(admit, batch_key=batch_id)
        _batch_write(fresh.select(idc), ledger)

    writer = stream_docs.writeStream.foreachBatch(_sink).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_components(
    stream_docs: DataFrame,
    index: MinHashIndex,
    labels_path: str,
    threshold: float = 0.1,
    checkpoint_dir: str | None = None,
    query_name: str = "components_ingest",
    available_now: bool = True,
):
    """Streaming EXACT near-dup clustering: maintain the min-id
    connected-component LABEL table of the full LSH pair graph as
    documents arrive — the exact-semantics sibling of
    :func:`stream_dedup_ingest`'s greedy-online dedup. Per micro-batch:

      1. cross edges vs the admitted corpus via the banded index
         (``match_new`` — corpus signatures never recompute),
      2. within-batch edges via ``minhash_lsh_pairs``,
      3. the persisted labels merge both through
         :func:`~dvmax_spark.ext.dedup.incremental_components` — only
         components the batch touches recompute (star compression),
      4. the batch's signatures append to the index (batch-keyed).

    The maintained labels equal clustering the ENTIRE corpus-so-far
    from scratch at ANY batch slicing: every pair (a, b) of the
    full-corpus LSH output appears exactly when the later of a, b
    arrives (cross) or both share a batch (within), and CC is
    insensitive to edge arrival order. That slice-invariance is what
    gives the streamed clustering the same exact recursive-CTE oracle
    as the batch x_dedup_clusters (t_stream_components runs it).

    Exactly-once WITHOUT markers: every step is naturally idempotent —
    the index append is a batch-keyed dynamic partition overwrite, and
    RE-MERGING already-merged edges into a CC labeling is a no-op — so
    crash replays and even fresh-checkpoint re-drains converge to the
    same labels. ``max_bucket`` is deliberately None on both pair
    paths: bucket caps are census-dependent, and exactness here trades
    the cap for the oracle (cap-aware streaming stays with
    stream_dedup_ingest).
    """
    import shutil

    from dvmax_spark.ext.dedup import incremental_components
    from dvmax_spark.fsops import recover_swap, swap_dir

    idc = index.id_col

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        recover_swap(index.path)
        recover_swap(labels_path)
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([idc])
        matchable = batch.where(
            F.size(F.split(F.col(index.text_col), " ")) >= index.shingle_n
        ).localCheckpoint()
        if matchable.isEmpty():
            return
        if os.path.isdir(index.path):
            cross = index.match_new(
                matchable, threshold=threshold, max_bucket=None, exclude_self=True
            ).select(F.col("new_id").alias("id_a"), F.col("old_id").alias("id_b"))
        else:
            cross = None
        within = minhash_lsh_pairs(
            matchable,
            id_col=idc,
            text_col=index.text_col,
            num_hashes=index.num_hashes,
            bands=index.bands,
            shingle_n=index.shingle_n,
            threshold=threshold,
            max_bucket=None,
        ).select("id_a", "id_b")
        edges = within if cross is None else within.unionAll(cross)
        edges = edges.localCheckpoint()
        if os.path.isdir(labels_path):
            labels0 = spark.read.parquet(labels_path)
        else:
            idt = matchable.schema[idc].dataType.simpleString()
            labels0 = spark.createDataFrame([], f"id {idt}, label {idt}")
        if not edges.isEmpty():
            labels1, _ = incremental_components(labels0, edges)
            staging = labels_path + ".staging"
            shutil.rmtree(staging, ignore_errors=True)
            labels1.write.mode("overwrite").option("compression", "zstd").parquet(
                staging
            )
            retired = swap_dir(labels_path, staging)
            if retired:
                shutil.rmtree(retired, ignore_errors=True)
        index.append(matchable, batch_key=f"s{batch_id}")

    writer = stream_docs.writeStream.foreachBatch(_sink).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
