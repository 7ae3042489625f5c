"""Custom stateful streaming operator (applyInPandasWithState, T3):
state must carry across micro-batches, flush sentinels must close open
sessions deterministically, and results must be invariant to where the
micro-batch boundaries fall (the batch-equivalence contract)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dvmax_spark.streaming.stateful import (
    FLUSH,
    run_sessionize_stream,
    sessionize_stateful,
    with_flush_sentinels,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, minutes_after_t0, user_id, value)"""
    data = [
        (eid, T0 + dt.timedelta(minutes=m), uid, "click", float(v))
        for eid, m, uid, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def _expected_sessions(spark, ev, gap_seconds):
    """Reference model: gaps-and-islands with Spark window functions."""
    w = Window.partitionBy("user_id").orderBy("ts")
    g = ev.withColumn(
        "brk",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") >= F.lag("ts").over(w) + F.expr(f"INTERVAL {gap_seconds} SECOND")),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in g.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }


def _got_sessions(res):
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in res.collect()
    }


def test_session_spans_micro_batch_boundary(spark, tmp_path):
    # user 7: events at minute 0, 10, 20 — one session, but staged so
    # the time-ordered file split puts min 0,10 and min 20 in DIFFERENT
    # micro-batches; merging them proves state survives the batch gap.
    ev = _events(
        spark,
        [(1, 0, 7, 1.0), (2, 10, 7, 2.0), (3, 20, 7, 3.0), (4, 600, 7, 4.0)],
    )
    res = run_sessionize_stream(
        spark, ev, gap_seconds=1800, n_files=2, base_dir=str(tmp_path / "s1")
    )
    got = _got_sessions(res)
    assert got == {
        (7, T0, T0 + dt.timedelta(minutes=20), 3, 6.0),
        (7, T0 + dt.timedelta(minutes=600), T0 + dt.timedelta(minutes=600), 1, 4.0),
    }


def test_flush_closes_open_sessions_and_never_emits_itself(spark):
    # batch-mode invocation (no streaming needed to test the function
    # body): one open session per user, flush closes both; no session
    # row may carry the sentinel's far-future timestamp as a start.
    ev = _events(spark, [(1, 0, 1, 1.0), (2, 5, 1, 1.5), (3, 0, 2, 9.0)])
    flushed = with_flush_sentinels(ev)
    res = sessionize_stateful(flushed, gap_seconds=1800)
    got = _got_sessions(res)
    assert got == {
        (1, T0, T0 + dt.timedelta(minutes=5), 2, 2.5),
        (2, T0, T0, 1, 9.0),
    }
    assert flushed.where(F.col("event_type") == FLUSH).count() == 2


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_batch_boundary_invariance(spark, tmp_path):
    # identical input split 2 ways vs 5 ways must give identical
    # sessions — micro-batch placement is an execution detail, not a
    # semantic one.
    import random

    rng = random.Random(42)
    rows = []
    eid = 0
    for uid in range(1, 9):
        m = 0
        for _ in range(rng.randint(5, 25)):
            m += rng.choice([1, 3, 7, 45, 120])  # minutes; gap=30min splits
            eid += 1
            rows.append((eid, m, uid, rng.randint(0, 100) / 10.0))
    ev = _events(spark, rows)
    a = _got_sessions(
        run_sessionize_stream(spark, ev, gap_seconds=1800, n_files=2, base_dir=str(tmp_path / "a"))
    )
    b = _got_sessions(
        run_sessionize_stream(spark, ev, gap_seconds=1800, n_files=5, base_dir=str(tmp_path / "b"))
    )
    assert a == b
    assert a == _expected_sessions(spark, ev, 1800)


def test_streaming_matches_reference_on_real_events(spark):
    from dvmax_spark.catalog import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value",
    )
    got = _got_sessions(run_sessionize_stream(spark, ev, gap_seconds=4 * 3600, n_files=3))
    assert got == _expected_sessions(spark, ev, 4 * 3600)


def test_mid_stream_flush_splits_session(spark):
    # a flush BETWEEN events (within the gap) must close the running
    # session and start a fresh one after — the barrier semantics the
    # vectorized break detection has to honor exactly.
    ev = _events(spark, [(1, 0, 5, 1.0), (2, 4, 5, 2.0), (4, 8, 5, 4.0)])
    flush_row = spark.createDataFrame(
        [(3, T0 + dt.timedelta(minutes=6), 5, FLUSH, 0.0)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )
    res = sessionize_stateful(ev.unionByName(flush_row), gap_seconds=1800)
    got = _got_sessions(res)
    # session 1 closed by the flush at minute 6; the minute-8 event
    # starts a new session that stays OPEN (dropped at batch end)
    assert got == {(5, T0, T0 + dt.timedelta(minutes=4), 2, 3.0)}
