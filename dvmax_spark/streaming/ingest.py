"""Streaming ingest into the incremental FeatureStore.

The streaming counterpart of the batch pipelines: a Structured
Streaming source drains through ``foreachBatch`` into
:class:`~dvmax_spark.store.FeatureStore` with keep-last merge
semantics — the same upsert contract the batch path uses (reference
concat+unique keep='last', ticker_batch_runner.py:310), now fed by a
stream.

Delivery semantics: file/Kafka sources replay a failed micro-batch, so
the sink must be idempotent — and a keyed upsert IS idempotent
(re-merging the same rows is a no-op), which upgrades Structured
Streaming's at-least-once ``foreachBatch`` to effectively-once on
keys. Within a batch, rows are pre-deduped with ``dedup_keep_last`` so
a key appearing twice in one micro-batch resolves deterministically
before the store merge.

Scale notes (100 TB): per-batch work is one within-batch dedup
(hash-agg on the keys) plus the store merge, which rewrites only the
partitions the batch touches under dynamic partition overwrite for the
append path; for insert-only streams prefer ``mode='append'`` which
anti-joins against existing keys instead of merging. Checkpointing
lives with the stream (the ``checkpointLocation``), so a restarted
query resumes at the right offset and replays at most one batch —
absorbed by idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dvmax_spark.operators.upsert import dedup_keep_last
from dvmax_spark.store import FeatureStore


def _marker_skips(meta_path: str, batch_id: int, sink: str) -> bool:
    """Shared replay guard for the marker-committed merge sinks
    (sketches/cms/dsir/bm25 stats). Reads the committed batch id from
    ``meta_path`` and returns True iff ``batch_id`` is EXACTLY the
    committed one — the legal foreachBatch replay-of-the-newest-batch
    case. ``batch_id`` BELOW the marker raises instead of silently
    skipping: micro-batch counters restart at 0 with a FRESH
    checkpoint, and a ``>=`` test would then drop genuinely-new early
    batches with no error (the r4 ADVICE finding; mirrors
    stream_into_ivf's monotone guard). No marker yet -> apply."""
    import json

    try:
        with open(meta_path) as fh:
            marker = int(json.load(fh)["batch_id"])
    except (OSError, ValueError, KeyError, TypeError):
        return False
    if batch_id == marker:
        return True
    if batch_id < marker:
        raise ValueError(
            f"{sink}: micro-batch {batch_id} is older than the committed "
            f"marker {marker} — micro-batch counters restarted (a fresh "
            "checkpoint against an already-written store). Applying it "
            "would silently skip or double-merge batches. Use ONE "
            "checkpoint per store lifetime, or rebuild the store."
        )
    return False


def stream_upsert_into_store(
    stream_df: DataFrame,
    store: FeatureStore,
    order_by: list[str] | str = (),
    checkpoint_dir: str | None = None,
    query_name: str = "store_ingest",
    mode: str = "upsert",
    available_now: bool = True,
):
    """Attach ``stream_df`` to ``store`` and start the query.

    mode='upsert'  -> keep-last merge per key (updates win, batch
                      order resolved by ``order_by``);
    mode='append'  -> insert-only (existing keys skipped) — cheaper:
                      no rewrite of untouched data.
    ``available_now=True`` drains everything currently available and
    stops (batch-like catch-up runs); pass False for a continuous
    query the caller manages.
    Returns the StreamingQuery (caller awaits termination).
    """
    if mode not in ("upsert", "append"):
        raise ValueError(f"unknown mode: {mode!r}")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = dedup_keep_last(batch_df, store.keys, order_by)
        if mode == "upsert":
            # event-time wins across batches (rank_dominates=False):
            # micro-batch arrival order is NOT data order for file/Kafka
            # replays, so a late batch must not clobber a newer row —
            # this is also what makes replayed batches true no-ops.
            store.upsert(batch, order_by=order_by, rank_dominates=not order_by)
        else:
            store.append_new_keys(batch)

    writer = stream_df.writeStream.foreachBatch(_sink).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_rollup(
    stream_df: DataFrame,
    rollup,
    checkpoint_dir: str,
    query_name: str = "rollup_ingest",
    available_now: bool = True,
):
    """Maintain a :class:`~dvmax_spark.plans.rollup.ContinuousRollup`
    from a stream: each micro-batch is delta-aggregated and
    monoid-merged into the persisted rollup (a streaming materialized
    view). NOTE: unlike the keyed upsert above, a partial-aggregate
    merge is NOT idempotent under batch replay — foreachBatch can
    replay the LAST batch after a crash, double-counting it. Exactly-
    once here needs the batch_id committed ATOMICALLY WITH the rollup
    state: refresh(meta=...) writes it inside the staging dir before
    the swap, so there is no window in which the data is applied but
    the marker says otherwise. Returns the StreamingQuery (caller
    awaits termination)."""

    def _applied(batch_id: int) -> bool:
        meta = rollup.read_meta()
        return meta is not None and meta.get("batch_id", -1) >= batch_id

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _applied(batch_id) or batch_df.isEmpty():
            return
        rollup.refresh(batch_df, meta={"batch_id": batch_id})

    writer = (
        stream_df.writeStream.queryName(query_name)
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_sketches(
    stream_df: DataFrame,
    path: str,
    group_col: str,
    ts_col: str,
    id_col: str,
    checkpoint_dir: str,
    query_name: str = "sketch_ingest",
    available_now: bool = True,
):
    """Maintain the persisted HLL sketch table (ext/sketches.py) from a
    stream: each micro-batch's per-(group, day) sketches monoid-merge
    (``hll_union_agg``) into the store behind a staging + atomic-rename
    swap — a streaming DISTINCT-COUNT materialized view whose readers
    (rollup_distinct_from_sketches) never rescan raw events. Exactly-
    once: sketch union is not idempotent under foreachBatch's replay of
    the last batch, so the applied batch id is committed as _meta.json
    INSIDE the staging dir — marker and data swap in the same atomic
    rename, leaving no applied-but-unmarked crash window (underscore
    files are invisible to Spark's parquet reader, like _SUCCESS).
    A crash BETWEEN the promote's two renames is healed on the next
    batch by fsops.recover_swap (the table — marker included — rolls
    back from '.old'), so no crash point can lose accumulated
    sketches.

    Contract: ONE checkpoint per store lifetime. Replaying the newest
    committed batch is a no-op; an OLDER batch id (fresh checkpoint
    against an existing store) raises instead of silently skipping or
    double-merging (see _marker_skips)."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from dvmax_spark.ext.sketches import daily_distinct_sketches
    from dvmax_spark.fsops import recover_swap, swap_dir

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        recover_swap(path)  # heal a crashed promote BEFORE the marker check
        meta = os.path.join(path, "_meta.json")
        if _marker_skips(meta, batch_id, "stream_into_sketches") or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new = daily_distinct_sketches(batch_df, group_col, ts_col, id_col)
        if os.path.isdir(path):
            cur = spark.read.parquet(path)
            merged = (
                cur.unionByName(new)
                .groupBy(group_col, "day")
                .agg(
                    F.hll_union_agg("sketch").alias("sketch"),
                    F.sum("n_rows").alias("n_rows"),
                )
            )
        else:
            merged = new
        staging = path + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").option("compression", "zstd").parquet(staging)
        with open(os.path.join(staging, "_meta.json"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        retired = swap_dir(path, staging)
        if retired:
            shutil.rmtree(retired, ignore_errors=True)

    writer = (
        stream_df.writeStream.queryName(query_name)
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_ivf(
    stream_df: DataFrame,
    index,
    checkpoint_dir: str,
    query_name: str = "ivf_ingest",
    available_now: bool = True,
):
    """Maintain a persisted :class:`~dvmax_spark.ext.similarity.IVFIndex`
    from an embedding stream: each micro-batch is assigned under the
    EXISTING quantizer and admitted via the index's batch-keyed append
    — a dynamic partition overwrite of ``ingest_batch=s<id>/bucket=<b>``,
    so foreachBatch's replay-of-the-last-batch rewrites its own
    partitions byte-stably. No marker file is needed: the write itself
    is idempotent (the streaming-dedup-ingest contract, not the
    sketch sink's merge-marker one, because appends don't read-modify-
    write prior state).

    The index must have been built with a batch key (one consistent
    partition-directory depth; ``IVFIndex.build(emb, batch_key="base")``).

    Guard (the join-MV counter trap): micro-batch ids restart at 0
    with a FRESH checkpoint, and a dynamic overwrite under a reused
    key would silently replace an earlier run's partitions with
    different vectors. Batch ids must therefore be monotone vs the
    stream keys already in the index — replaying the NEWEST committed
    batch is legal (that is exactly the crash-replay case), anything
    older raises instead of corrupting the lists.
    """
    import os

    def _max_stream_key(path: str) -> int | None:
        try:
            keys = [
                int(d.split("=s", 1)[1])
                for d in os.listdir(path)
                if d.startswith("ingest_batch=s")
            ]
            return max(keys) if keys else None
        except (OSError, ValueError):
            return None

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prev = _max_stream_key(index.path + "/lists")
        if prev is not None and batch_id < prev:
            raise ValueError(
                f"stream_into_ivf: micro-batch {batch_id} is older than the "
                f"newest committed stream batch s{prev} — a fresh checkpoint "
                "against an already-written index would overwrite committed "
                "list partitions. Use one checkpoint per index lifetime, or "
                "rebuild the index."
            )
        index.append(batch_df, batch_key=f"s{batch_id}")

    writer = (
        stream_df.writeStream.queryName(query_name)
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_cms(
    stream_df: DataFrame,
    path: str,
    key_col: str,
    *,
    checkpoint_dir: str,
    width: int = 64,
    depth: int = 4,
    query_name: str = "cms_ingest",
    available_now: bool = True,
):
    """Maintain a persisted Count-Min sketch table from a stream: each
    micro-batch's (row, col) cell counts SUM into the store — a
    streaming FREQUENCY materialized view next to the HLL distinct
    one (stream_into_sketches). Because CMS cells are plain sums, the
    streamed table is BYTE-IDENTICAL to a batch sketch of the same
    rows (merge-invariance) — t_stream_cms proves it against the
    batch path's exact SQL oracle.

    Exactly-once: cell summing is not idempotent under foreachBatch's
    replay, so the applied batch id commits as ``_meta.json`` INSIDE
    the staging dir — marker and data swap in the same atomic rename
    (the stream_into_sketches contract), and a crashed promote heals
    via fsops.recover_swap before the marker check.

    Contract shared with the other marker sinks: ONE checkpoint per
    store lifetime (``checkpoint_dir`` is required — the exactly-once
    marker is meaningless without one). A fresh checkpoint restarts
    micro-batch ids at 0; the guard raises on an id BELOW the marker
    instead of silently skipping genuinely-new early batches
    (_marker_skips).
    """
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from dvmax_spark.ext.sketches import cms_table
    from dvmax_spark.fsops import recover_swap, swap_dir

    if not checkpoint_dir:
        raise ValueError(
            "stream_into_cms: checkpoint_dir is required — the sink's "
            "exactly-once marker contract assumes a durable checkpoint "
            "(and pyspark fails opaquely on a null checkpointLocation)."
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        recover_swap(path)
        meta = os.path.join(path, "_meta.json")
        if _marker_skips(meta, batch_id, "stream_into_cms") or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new = cms_table(batch_df, key_col, width, depth)
        if os.path.isdir(path):
            cur = spark.read.parquet(path)
            merged = (
                cur.unionByName(new)
                .groupBy("row", "col")
                .agg(F.sum("counter").cast("long").alias("counter"))
            )
        else:
            merged = new
        staging = path + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").option("compression", "zstd").parquet(staging)
        with open(os.path.join(staging, "_meta.json"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        retired = swap_dir(path, staging)
        if retired:
            shutil.rmtree(retired, ignore_errors=True)

    writer = (
        stream_df.writeStream.queryName(query_name)
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_dsir_model(
    stream_df: DataFrame,
    path: str,
    target,
    checkpoint_dir: str,
    n: int = 2,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "dsir_model_ingest",
    available_now: bool = True,
):
    """Maintain the DSIR importance model (ext/dsir.py's per-bucket
    ``(b, c_r, c_t)`` sufficient statistics) from a document stream:
    each micro-batch's bucket counts integer-sum-merge into the
    persisted model, so importance weights for NEW data are always
    scoreable against everything ingested so far without rescanning
    the corpus — the model is a monoid, which is the whole reason the
    bucket-count formulation scales. ``target`` is the boolean Column
    marking target-domain rows (evaluated per batch).

    Exactly-once via the same contract as stream_into_sketches:
    count-merge is not idempotent under foreachBatch replay, so the
    applied batch id commits as _meta.json INSIDE the staging dir and
    swaps atomically with the data; a crash between the promote's two
    renames heals via fsops.recover_swap on the next batch.

    Contract: ONE checkpoint per model lifetime — replay of the newest
    committed batch is a no-op, an older batch id raises
    (_marker_skips) instead of silently dropping data."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from dvmax_spark.ext.dsir import dsir_bucket_counts
    from dvmax_spark.fsops import recover_swap, swap_dir

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        recover_swap(path)
        meta = os.path.join(path, "_meta.json")
        if _marker_skips(meta, batch_id, "stream_into_dsir_model") or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new = dsir_bucket_counts(
            batch_df, target, n=n, buckets=buckets, id_col=id_col, text_col=text_col
        )
        if os.path.isdir(path):
            cur = spark.read.parquet(path)
            merged = (
                cur.unionByName(new)
                .groupBy("b")
                .agg(F.sum("c_r").alias("c_r"), F.sum("c_t").alias("c_t"))
            )
        else:
            merged = new
        staging = path + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").option("compression", "zstd").parquet(staging)
        with open(os.path.join(staging, "_meta.json"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        retired = swap_dir(path, staging)
        if retired:
            shutil.rmtree(retired, ignore_errors=True)

    writer = (
        stream_df.writeStream.queryName(query_name)
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_bm25(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "bm25_ingest",
    available_now: bool = True,
):
    """Maintain a persisted BM25 inverted index from a document
    stream: per micro-batch the batch docs' postings
    ``(token, doc_id, dl, tf)`` land in a batch-keyed partition of
    ``path/postings`` (replay-idempotent dynamic partition overwrite —
    the dedup_ingest contract), and the corpus scalars
    ``(n_docs, len_sum)`` integer-merge into a marker-committed
    ``path/stats`` table (exactly-once, the stream_into_sketches
    contract). Any later query then BM25-scores against everything
    ingested so far via ext.retrieval.bm25_from_index — no document is
    ever rescanned, because tf/dl are per-doc (computable from the
    batch alone) and (n_docs, len_sum, df) are count monoids.

    Crash windows: postings commit BEFORE the stats marker, and the
    postings write is idempotent, so a replay after any crash point
    rewrites the identical partition and then applies (or skips) the
    stats merge — the pair can never double-count or diverge.

    Re-delivered documents: a doc id seen in an EARLIER batch already
    has postings and is counted in (n_docs, len_sum) — ingesting it
    again would double-count df/avgdl and skew every subsequent score.
    Incoming batches therefore anti-join a ``path/seen`` id ledger (the
    dedup_ingest pattern) and within-batch duplicate ids collapse to
    one row first. The ledger is batch-keyed (dynamic partition
    overwrite, replay-idempotent) and the anti-join EXCLUDES the
    current batch's own partition, so a replay after a mid-batch crash
    (ledger written, stats marker not) recomputes the identical fresh
    set instead of seeing its own ids and dropping the batch.

    Contract: ONE checkpoint per index lifetime — replay of the newest
    committed batch is a no-op, an older batch id raises
    (_marker_skips).
    """
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from dvmax_spark.fsops import recover_swap, swap_dir

    postings_dir = os.path.join(path, "postings")
    stats_dir = os.path.join(path, "stats")
    ledger_dir = os.path.join(path, "seen")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        recover_swap(stats_dir)
        meta = os.path.join(stats_dir, "_meta.json")
        if _marker_skips(meta, batch_id, "stream_into_bm25") or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([id_col])
        if os.path.isdir(ledger_dir):
            seen = (
                spark.read.parquet(ledger_dir)
                .where(F.col("ingest_batch") != F.lit(str(batch_id)))
                .select(id_col)
            )
            fresh = batch.join(seen, id_col, "left_anti")
        else:
            fresh = batch
        # recomputed on replay from the same batch data — deterministic,
        # so every per-batch partition rewrite below is byte-stable
        fresh = fresh.localCheckpoint()
        if fresh.isEmpty():  # all re-deliveries: nothing to merge
            return
        toks = fresh.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), " ")).alias("dl"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        post = (
            toks.groupBy("token", id_col, "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("ingest_batch", F.lit(str(batch_id)))
        )
        (
            post.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .option("compression", "zstd")
            .parquet(postings_dir)
        )
        (
            fresh.select(id_col)
            .withColumn("ingest_batch", F.lit(str(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .option("compression", "zstd")
            .parquet(ledger_dir)
        )
        new = fresh.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("len_sum"),
        )
        if os.path.isdir(stats_dir):
            cur = spark.read.parquet(stats_dir)
            merged = cur.unionByName(new).agg(
                F.sum("n_docs").alias("n_docs"), F.sum("len_sum").alias("len_sum")
            )
        else:
            merged = new
        staging = stats_dir + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").option("compression", "zstd").parquet(staging)
        with open(os.path.join(staging, "_meta.json"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        retired = swap_dir(stats_dir, staging)
        if retired:
            shutil.rmtree(retired, ignore_errors=True)

    writer = (
        stream_df.writeStream.queryName(query_name)
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
