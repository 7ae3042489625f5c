"""Structured Streaming verification (SURVEY §7 step 6): the same
transform produces identical results on a readStream source as on the
batch frame (batch-equivalence — streaming has no reference semantics
to copy, per SURVEY §2.11)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Streaming file source needs a directory; split the events table
    into a few files to exercise multi-batch triggers."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    from dvmax_spark.session import get_spark

    spark = get_spark("stream_prep")
    from dvmax_spark.catalog import load_table

    load_table(spark, "events", SF).repartition(4).write.mode("overwrite").parquet(out)
    # drop the _SUCCESS marker so only parquet files remain
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(out, f))
    return out


def _read_stream(spark, events_dir):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def _run_to_memory(df, name, mode="complete"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def _canon(df, keys):
    return sorted(
        tuple(r[k] for k in keys) for r in df.collect()
    )


def test_tumbling_window_batch_equivalence(spark, events_dir):
    from dvmax_spark.catalog import load_table
    from dvmax_spark.streaming.ops import tumbling_counts

    batch = tumbling_counts(load_table(spark, "events", SF))
    stream = tumbling_counts(_read_stream(spark, events_dir))
    got = _run_to_memory(stream, "t_tumble")
    keys = ["window_start", "event_type", "n", "total_value"]
    assert _canon(got, keys) == _canon(batch, keys)


def test_streaming_dedup(spark, events_dir):
    from dvmax_spark.streaming.ops import streaming_dedup

    # files arrive in arbitrary (not time) order: the watermark must
    # cover the full data span or older batches are dropped as late
    stream = streaming_dedup(_read_stream(spark, events_dir), watermark="40 days")
    got = _run_to_memory(stream, "t_dedup", mode="append")
    n = got.count()
    from dvmax_spark.catalog import load_table

    expected = load_table(spark, "events", SF).select("event_id").distinct().count()
    assert n == expected


def test_sliding_window_runs_streaming(spark, events_dir):
    from dvmax_spark.catalog import load_table
    from dvmax_spark.streaming.ops import sliding_counts

    batch = sliding_counts(load_table(spark, "events", SF))
    stream = sliding_counts(_read_stream(spark, events_dir))
    got = _run_to_memory(stream, "t_slide")
    keys = ["window_start", "event_type", "n"]
    assert _canon(got, keys) == _canon(batch, keys)


def test_session_window_batch(spark):
    """session_window semantics vs hand-rolled lag+cumsum sessionization
    (the oracle construction) on the batch frame."""
    from dvmax_spark.catalog import load_table
    from dvmax_spark.streaming.ops import session_counts_batch
    from pyspark.sql import Window

    ev = load_table(spark, "events", SF)
    native = session_counts_batch(ev, gap="30 minutes")

    w = Window.partitionBy("user_id").orderBy("ts")
    lagged = ev.withColumn("_prev", F.lag("ts").over(w))
    flagged = lagged.withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull()
            | (F.col("ts") >= F.col("_prev") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    manual = sess.groupBy("user_id", "_sid").agg(
        F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events")
    )
    keys = ["user_id", "session_start", "n_events"]
    assert _canon(native, keys) == _canon(manual, keys)


def test_stateful_apply_in_pandas_with_state(spark, events_dir):
    """Custom stateful operator: running per-user event count via
    applyInPandasWithState (the reference-free stateful surface)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def count_events(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    stream = _read_stream(spark, events_dir)
    counted = stream.groupBy("user_id").applyInPandasWithState(
        count_events, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    got = _run_to_memory(counted, "t_state", mode="update")
    # final state per user must equal the batch counts
    from dvmax_spark.catalog import load_table

    batch = (
        load_table(spark, "events", SF).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    final = {
        r["user_id"]: r["n_events"]
        for r in got.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    }
    for r in batch.collect():
        assert final[r["user_id"]] == r["n"]


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Stream-stream inner join (views x purchases, same user, purchase
    within 1h AFTER the view) must equal the batch join over the same
    data. Both sides carry watermarks so Spark can bound the join state
    — the required shape for unbounded stream-stream joins at scale."""
    from dvmax_spark.catalog import load_table

    def views(df):
        return df.where(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )

    def purchases(df):
        return df.where(F.col("event_type") == "purchase").select(
            F.col("user_id"),
            F.col("ts").alias("buy_ts"),
            F.col("value").alias("buy_value"),
        )

    from dvmax_spark.streaming.ops import interval_join

    joined = interval_join(
        views(_read_stream(spark, events_dir)),
        purchases(_read_stream(spark, events_dir)),
        keys=["user_id"],
        left_ts="view_ts",
        right_ts="buy_ts",
        lower="0 seconds",
        upper="1 hour",
        # files arrive in arbitrary order: watermark must span the data
        watermark="40 days",
    )
    got = _run_to_memory(joined, "t_ssj", mode="append")

    ev = load_table(spark, "events", SF)
    expect = interval_join(
        views(ev), purchases(ev), keys=["user_id"],
        left_ts="view_ts", right_ts="buy_ts", lower="0 seconds", upper="1 hour",
    )
    keys = ["view_id", "user_id", "buy_ts", "buy_value"]
    assert _canon(got, keys) == _canon(expect, keys)
    assert got.count() > 0  # the window actually matched something


def test_watermark_append_mode_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics: a window only emits once the
    watermark passes its end, and rows later than the watermark are
    dropped — the contract that bounds state at 100 TB. Driven with a
    two-batch file source so the watermark actually advances."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    d = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    os.makedirs(d)
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.DoubleType())]
    )

    out = str(tmp_path / "late_out")

    def run():
        stream = spark.readStream.schema(schema).parquet(d)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.sum("v").alias("total"))
            .select(F.col("w.start").alias("start"), "total")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        emitted = spark.read.parquet(out)
        return {str(r["start"]): r["total"] for r in emitted.collect()}

    # run 1: on-time rows to 10:59 -> watermark persisted at 10:49; no
    # window end <= 10:49 yet, so append emits nothing
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:59:00"]),
            "v": [1.0, 2.0],
        }
    ).to_parquet(os.path.join(d, "b1.parquet"), coerce_timestamps="us", allow_truncated_timestamps=True)
    assert run() == {}

    # run 2 (same checkpoint -> watermark restored): a row >1h LATE
    # (09:30 < 10:49) plus a fresh 12:00 row advancing the watermark
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 09:30:00", "2024-01-01 12:00:00"]),
            "v": [100.0, 3.0],
        }
    ).to_parquet(os.path.join(d, "b2.parquet"), coerce_timestamps="us", allow_truncated_timestamps=True)
    rows = run()
    # 10:00 window closes at watermark 11:50 with its on-time total
    # ONLY; the late 09:30 row was dropped (no 09:00 window row); the
    # 12:00 window is still open, so append hasn't emitted it
    assert rows == {"2024-01-01 10:00:00": 3.0}


def test_stream_upsert_into_store_keep_last(spark, events_dir, tmp_path):
    """Streaming ingest -> FeatureStore: drain the events stream into a
    keyed store with keep-last merge; the result must equal the batch
    keep-last over the same data (exactly-once on keys despite the
    multi-micro-batch file source)."""
    from dvmax_spark.catalog import load_table
    from dvmax_spark.store import FeatureStore
    from dvmax_spark.streaming.ingest import stream_upsert_into_store

    store = FeatureStore(spark, str(tmp_path / "fs"), keys=["user_id"])
    stream = _read_stream(spark, events_dir).select("user_id", "ts", "value")
    q = stream_upsert_into_store(
        stream,
        store,
        order_by="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="ingest_test",
    )
    q.awaitTermination(120)

    batch = load_table(spark, "events", SF).select("user_id", "ts", "value")
    expect = {
        (r["user_id"],): (r["ts"], r["value"])
        for r in batch.groupBy("user_id")
        .agg(F.max_by(F.struct("ts", "value"), "ts").alias("k"))
        .select("user_id", "k.ts", "k.value")
        .collect()
    }
    got = {(r["user_id"],): (r["ts"], r["value"]) for r in store.read().collect()}
    # per-user latest row wins; same keys, same (ts) — value may differ
    # only if two events share a user's max ts (none in the testdata)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0], k

    # append mode: replaying the same stream dir into an insert-only
    # store adds nothing new on the second pass (idempotent on keys)
    store2 = FeatureStore(spark, str(tmp_path / "fs2"), keys=["user_id"])
    q2 = stream_upsert_into_store(
        stream, store2, order_by="ts",
        checkpoint_dir=str(tmp_path / "ckpt2"), query_name="ingest_append",
        mode="append",
    )
    q2.awaitTermination(120)
    assert store2.read().count() == len(expect)


def test_stream_into_sketches_matches_batch_distinct(spark, events_dir, tmp_path):
    """Streaming sketch maintenance: drain the events stream into the
    persisted HLL sketch table; the merged rollup's per-group distinct
    estimates must sit within the HLL envelope of the batch-exact
    counts, and sketch-row n_rows must reconcile exactly."""
    from dvmax_spark.catalog import load_table
    from dvmax_spark.ext.sketches import rollup_distinct_from_sketches
    from dvmax_spark.streaming.ingest import stream_into_sketches

    path = str(tmp_path / "sketches")
    stream = _read_stream(spark, events_dir).select("event_type", "ts", "user_id")
    q = stream_into_sketches(
        stream,
        path,
        group_col="event_type",
        ts_col="ts",
        id_col="user_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="sketch_ingest_test",
    )
    q.awaitTermination(120)

    rolled = {
        r.event_type: (r.est_distinct, r.n_rows)
        for r in rollup_distinct_from_sketches(
            spark.read.parquet(path), "event_type"
        ).collect()
    }
    batch = load_table(spark, "events", SF)
    exact = {
        r.event_type: (r.d, r.n)
        for r in batch.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"), F.count(F.lit(1)).alias("n")
        )
        .collect()
    }
    assert set(rolled) == set(exact)
    for k, (est, n_rows) in rolled.items():
        d, n = exact[k]
        assert n_rows == n, k
        assert abs(est - d) <= d * 0.05 + 2, (k, est, d)


def test_stream_decontam_fresh_checkpoint_replay_is_idempotent(spark, tmp_path):
    """The decontam gate has NO cross-batch state (verdicts depend only
    on the doc and the frozen eval grams), so even a FRESH-checkpoint
    re-drain rewrites identical batch partitions — full idempotency,
    stronger than the rollup/join-MV contracts."""
    import os

    from dvmax_spark.streaming.decontam_ingest import (
        build_eval_grams,
        stream_decontam_ingest,
    )

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    docs = [
        (1, "alpha beta gamma delta epsilon contaminated doc body"),
        (2, "totally unrelated clean words in this document here"),
        (3, "more clean text that shares nothing with the benchmark"),
    ]
    base = str(tmp_path)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    import pandas as pd

    now = None
    for i, row in enumerate(docs):
        p = os.path.join(in_dir, f"{i:03d}.parquet")
        pd.DataFrame([row], columns=["doc_id", "text"]).to_parquet(p)
        if now is None:
            now = os.stat(p).st_mtime
        os.utime(p, (now + i, now + i))
    build_eval_grams(ev, os.path.join(base, "ev"), n=5)

    def _drain(ck):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = stream_decontam_ingest(
            stream,
            os.path.join(base, "ev"),
            out_dir=os.path.join(base, "clean"),
            quarantine_dir=os.path.join(base, "quar"),
            n=5,
            checkpoint_dir=os.path.join(base, ck),
            query_name=f"decontam_test_{ck}",
        )
        q.awaitTermination(120)

    _drain("ck1")
    clean1 = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(base, "clean")).collect()
    )
    quar1 = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(base, "quar")).collect()
    )
    assert quar1 == [1] and clean1 == [2, 3]
    _drain("ck2")  # fresh checkpoint: same batch ids, same partitions
    clean2 = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(base, "clean")).collect()
    )
    quar2 = sorted(
        r.doc_id for r in spark.read.parquet(os.path.join(base, "quar")).collect()
    )
    assert (clean2, quar2) == (clean1, quar1)


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_stream_into_ivf_matches_batch_appends(spark, tmp_path):
    """Streaming embedding ingest into the persisted IVF index: after
    draining the stream, probes must equal a batch-built index holding
    the same vectors; and a stale micro-batch id (fresh-checkpoint
    restart against a written index) must refuse rather than overwrite
    committed list partitions."""
    import numpy as np

    from dvmax_spark.ext.similarity import IVFIndex
    from dvmax_spark.streaming.ingest import stream_into_ivf

    rng = np.random.default_rng(17)
    vecs = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(90)]
    base = spark.createDataFrame(vecs[:40], "vec_id long, embedding array<double>")
    later = vecs[40:]

    # stream side: base build + 2 staged slices drained via readStream
    s_idx = IVFIndex(spark, str(tmp_path / "s_idx"), n_clusters=4)
    s_idx.build(base, batch_key="base")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = None
    for i, sl in enumerate([later[:25], later[25:]]):
        pdf = spark.createDataFrame(sl, "vec_id long, embedding array<double>").toPandas()
        dst = os.path.join(in_dir, f"{i:03d}.parquet")
        pdf.to_parquet(dst)
        if now is None:
            now = os.stat(dst).st_mtime
        os.utime(dst, (now + i, now + i))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = stream_into_ivf(stream, s_idx, checkpoint_dir=str(tmp_path / "ckpt"))
        q.awaitTermination(120)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    # batch side: same quantizer (same seed + same build data), same rows
    b_idx = IVFIndex(spark, str(tmp_path / "b_idx"), n_clusters=4)
    b_idx.build(base, batch_key="base")
    b_idx.append(
        spark.createDataFrame(later, "vec_id long, embedding array<double>"),
        batch_key="s0",
    )
    queries = base.where(F.col("vec_id") < 8)
    got = sorted(map(tuple, s_idx.probe(queries, k=3, nprobe=2).collect()))
    want = sorted(map(tuple, b_idx.probe(queries, k=3, nprobe=2).collect()))
    assert got == want and len(got) == 24

    # fresh-checkpoint restart against the written index: micro-batch
    # ids restart at 0 < committed s1 — the guard must refuse instead
    # of overwriting committed list partitions
    with pytest.raises(Exception, match="older than the newest"):
        stream2 = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q2 = stream_into_ivf(stream2, s_idx, checkpoint_dir=str(tmp_path / "ckpt2"))
        try:
            q2.awaitTermination(120)
            if q2.exception() is not None:
                raise RuntimeError(q2.exception().desc)
        finally:
            q2.stop()


def test_stream_into_cms_equals_batch_sketch(spark, events_dir, tmp_path):
    """The streamed CMS store must be BYTE-IDENTICAL to a batch sketch
    of the same rows (cells are sums — merge-invariant across any
    micro-batch slicing), and a replayed marker batch must be a
    no-op."""
    import json

    from dvmax_spark.catalog import load_table
    from dvmax_spark.ext.sketches import cms_table
    from dvmax_spark.streaming.ingest import stream_into_cms

    path = str(tmp_path / "cms_store")
    stream = (
        spark.readStream.schema(load_table(spark, "events", SF).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_dir)
    )
    q = stream_into_cms(
        stream, path, "user_id", width=32, depth=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {
        (r["row"], r["col"]): r["counter"]
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r["row"], r["col"]): r["counter"]
        for r in cms_table(load_table(spark, "events", SF), "user_id", 32, 3).collect()
    }
    assert got == want
    # marker: the last applied batch id is committed with the data;
    # a replay of that id must leave the store untouched
    meta = json.load(open(os.path.join(path, "_meta.json")))
    assert meta["batch_id"] >= 0
