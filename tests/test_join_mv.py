"""Incremental join materialization (plans/join_mv.py): the delta rule
must converge to the full re-join for any batch slicing/arrival order,
and a refresh replayed after a crash at any write boundary must be
value-stable (batch-keyed dynamic partition overwrite + prior-state
partition pruning)."""

from __future__ import annotations

import pytest

import os
import shutil

from pyspark.sql import functions as F

from dvmax_spark.plans.join_mv import IncrementalJoinMV


def _mk(spark, tmp_path, name="mv"):
    return IncrementalJoinMV(spark, str(tmp_path / name), key="k")


def _a(spark, rows):
    return spark.createDataFrame(rows, "k long, a_val string")


def _b(spark, rows):
    return spark.createDataFrame(rows, "k long, b_val string")


def _collect(mv):
    return sorted(map(tuple, mv.read().select("k", "a_val", "b_val").collect()))


def test_converges_to_full_join_any_arrival_order(spark, tmp_path):
    """Keys arriving a-side-first, b-side-first, same-batch, and
    many-to-many must all land in M exactly as the full join has
    them."""
    mv = _mk(spark, tmp_path)
    # batch 1: k=1 only on A; k=3 complete pair; k=4 two A rows
    mv.refresh(1, _a(spark, [(1, "a1"), (3, "a3"), (4, "a4x"), (4, "a4y")]),
               _b(spark, [(3, "b3"), (2, "b2")]))
    # batch 2: k=1's B side arrives late; k=2's A side arrives late;
    # k=4 gains a B row (must pair with BOTH stored A rows)
    mv.refresh(2, _a(spark, [(2, "a2")]), _b(spark, [(1, "b1"), (4, "b4")]))
    # batch 3: empty deltas are legal
    mv.refresh(3, _a(spark, []).limit(0), _b(spark, []).limit(0))
    full_a = [(1, "a1"), (3, "a3"), (4, "a4x"), (4, "a4y"), (2, "a2")]
    full_b = [(3, "b3"), (2, "b2"), (1, "b1"), (4, "b4")]
    expected = sorted(
        map(tuple, _a(spark, full_a).join(_b(spark, full_b), "k").collect())
    )
    assert _collect(mv) == expected


def test_replay_after_crash_before_m_write_is_stable(spark, tmp_path):
    """Crash window: batch 2 wrote its A and B partitions but died
    before writing M's. Replaying refresh(2) must produce exactly the
    crash-free result — prior state is pruned to batches < 2, so the
    half-written batch can't contaminate its own delta join."""
    a1, b1 = [(1, "a1"), (2, "a2")], [(1, "b1")]
    a2, b2 = [(3, "a3")], [(2, "b2"), (3, "b3")]

    ref = _mk(spark, tmp_path, "ref")
    ref.refresh(1, _a(spark, a1), _b(spark, b1))
    ref.refresh(2, _a(spark, a2), _b(spark, b2))
    want = _collect(ref)

    mv = _mk(spark, tmp_path, "crash")
    mv.refresh(1, _a(spark, a1), _b(spark, b1))
    mv.refresh(2, _a(spark, a2), _b(spark, b2))
    # simulate the crash: erase M's batch-2 partition (the last write),
    # leaving A/B batch-2 partitions in place — then replay
    shutil.rmtree(os.path.join(mv.m_path, "_batch=2"))
    mv.refresh(2, _a(spark, a2), _b(spark, b2))
    assert _collect(mv) == want


def test_replay_of_completed_batch_is_idempotent(spark, tmp_path):
    """Re-running a fully-committed refresh (at-least-once delivery)
    must not duplicate any M rows."""
    mv = _mk(spark, tmp_path)
    mv.refresh(1, _a(spark, [(1, "a1")]), _b(spark, [(1, "b1")]))
    mv.refresh(2, _a(spark, [(2, "a2")]), _b(spark, [(2, "b2")]))
    once = _collect(mv)
    mv.refresh(2, _a(spark, [(2, "a2")]), _b(spark, [(2, "b2")]))
    assert _collect(mv) == once


def test_retraction_mode_update_and_cancel(spark, tmp_path):
    """Bag-algebra joins: a -1 customer retraction must cancel ALL
    M rows it produced (one per matching order), an update pair must
    move those rows to the new value, and read_net must drop exact
    cancellations."""
    mv = IncrementalJoinMV(spark, str(tmp_path / "ret"), key="k", mult_col="mult")
    a = spark.createDataFrame(
        [(1, "o1", 1), (1, "o2", 1), (2, "o3", 1)], "k long, oid string, mult long"
    )
    b = spark.createDataFrame(
        [(1, "segA", 1), (2, "segB", 1)], "k long, seg string, mult long"
    )
    mv.refresh(1, a, b)
    # update k=1's segment: retract old, insert new (no order deltas)
    empty_a = a.limit(0)
    b2 = spark.createDataFrame(
        [(1, "segA", -1), (1, "segC", 1)], "k long, seg string, mult long"
    )
    mv.refresh(2, empty_a, b2)
    net = sorted(
        map(tuple, mv.read_net().select("k", "oid", "seg", "mult").collect())
    )
    assert net == [(1, "o1", "segC", 1), (1, "o2", "segC", 1), (2, "o3", "segB", 1)]
    # linear aggregate over the raw log agrees without netting
    agg = {
        r["seg"]: r["n"]
        for r in mv.read().groupBy("seg").agg(F.sum("mult").alias("n")).collect()
        if r["n"] != 0
    }
    assert agg == {"segC": 2, "segB": 1}


def test_regressing_batch_id_is_rejected(spark, tmp_path):
    """A batch id behind the committed max (fresh-checkpoint counter
    restart) must raise instead of silently double-adding rows;
    replaying the most recent batch stays legal."""
    import pytest

    mv = _mk(spark, tmp_path)
    mv.refresh(1, _a(spark, [(1, "a1")]), _b(spark, [(1, "b1")]))
    mv.refresh(2, _a(spark, [(2, "a2")]), _b(spark, [(2, "b2")]))
    with pytest.raises(ValueError, match="regresses"):
        mv.refresh(1, _a(spark, [(1, "a1")]), _b(spark, [(1, "b1")]))
    mv.refresh(2, _a(spark, [(2, "a2")]), _b(spark, [(2, "b2")]))  # replay ok


def test_stream_into_join_mv_matches_batch_join(spark, tmp_path):
    """The streaming wrapper (tagged union -> foreachBatch -> refresh)
    must land the MV on exactly the one-shot join of everything the
    stream delivered, across micro-batch boundaries; a second
    availableNow run on the SAME checkpoint (nothing new) must change
    nothing."""
    import pandas as pd

    from dvmax_spark.plans.join_mv import IncrementalJoinMV, stream_into_join_mv

    schema = "side string, k long, a_val string, b_val string"
    rows = [
        ("A", 1, "a1", None), ("B", 3, None, "b3"),
        ("A", 3, "a3", None), ("B", 1, None, "b1"),
        ("A", 2, "a2", None), ("B", 2, None, "b2"),
        ("A", 1, "a1x", None), ("B", 4, None, "b4"),
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = None
    for i in range(4):  # 4 slices of 2 rows -> multiple micro-batches
        pd.DataFrame(
            rows[2 * i : 2 * i + 2], columns=["side", "k", "a_val", "b_val"]
        ).to_parquet(os.path.join(in_dir, f"{i:03d}.parquet"))
        p = os.path.join(in_dir, f"{i:03d}.parquet")
        if now is None:
            now = os.stat(p).st_mtime
        os.utime(p, (now + i, now + i))

    mv = IncrementalJoinMV(spark, str(tmp_path / "mv"), key="k")
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        def _start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            )
            return stream_into_join_mv(
                stream, mv, checkpoint_dir=str(tmp_path / "ckpt"),
                query_name="join_mv_stream_test",
            )

        q = _start()
        q.awaitTermination(180)
        a_rows = [(r[1], r[2]) for r in rows if r[0] == "A"]
        b_rows = [(r[1], r[3]) for r in rows if r[0] == "B"]
        expected = sorted(
            map(tuple,
                spark.createDataFrame(a_rows, "k long, a_val string")
                .join(spark.createDataFrame(b_rows, "k long, b_val string"), "k")
                .collect())
        )
        got = sorted(map(tuple, mv.read().select("k", "a_val", "b_val").collect()))
        assert got == expected
        # same checkpoint, no new files: a second run is a no-op
        q2 = _start()
        q2.awaitTermination(180)
        assert sorted(
            map(tuple, mv.read().select("k", "a_val", "b_val").collect())
        ) == expected
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_compact_folds_history_and_nets_retractions(spark, tmp_path):
    """compact() must fold all but the newest batch into _batch=0,
    NET retraction pairs away, keep results identical, and leave
    later refreshes working (prior-state pruning sees the base as
    batch 0). A crashed swap (simulated by stranding '.old') heals on
    the next read."""
    import os as _os

    from dvmax_spark.fsops import RETIRED_SUFFIX

    mv = IncrementalJoinMV(spark, str(tmp_path / "cmp"), key="k", mult_col="mult")
    a = spark.createDataFrame([(1, "o1", 1), (2, "o2", 1)], "k long, oid string, mult long")
    b = spark.createDataFrame([(1, "s1", 1), (2, "s2", 1)], "k long, seg string, mult long")
    mv.refresh(1, a, b)
    # batch 2 retracts k=2 entirely
    mv.refresh(2, a.limit(0), spark.createDataFrame([(2, "s2", -1)], "k long, seg string, mult long"))
    mv.refresh(3, spark.createDataFrame([(3, "o3", 1)], "k long, oid string, mult long"),
               spark.createDataFrame([(3, "s3", 1)], "k long, seg string, mult long"))
    before = sorted(map(tuple, mv.read_net().collect()))
    mv.compact(keep_last=1)
    batches = sorted(
        d for d in _os.listdir(mv.m_path) if d.startswith("_batch=")
    )
    assert batches == ["_batch=0", "_batch=3"], batches
    assert sorted(map(tuple, mv.read_net().collect())) == before
    # the k=2 (+1, -1) pair must be GONE from the folded base, not net
    base = spark.read.parquet(mv.m_path).where(F.col("_batch") == 0)
    assert base.where(F.col("k") == 2).count() == 0
    # crashed swap heals: strand M under '.old' as fsops would leave it
    _os.rename(mv.m_path, mv.m_path + RETIRED_SUFFIX)
    assert sorted(map(tuple, mv.read_net().collect())) == before
    # and refresh still works against the healed, renumbered log
    mv.refresh(4, spark.createDataFrame([(1, "o1b", 1)], "k long, oid string, mult long"),
               b.limit(0))
    after = {t[:3] for t in map(tuple, mv.read_net().collect())}
    assert (1, "o1b", "s1") in after


def test_input_guards(spark, tmp_path):
    """compact(keep_last=0) would fold the in-flight batch; a reserved
    _batch column in a delta would be silently clobbered - both must
    raise."""
    import pytest

    mv = _mk(spark, tmp_path, "guards")
    mv.refresh(1, _a(spark, [(1, "a1")]), _b(spark, [(1, "b1")]))
    with pytest.raises(ValueError, match="keep_last"):
        mv.compact(keep_last=0)
    bad = _a(spark, [(2, "a2")]).withColumn("_batch", F.lit(9))
    with pytest.raises(ValueError, match="reserved"):
        mv.refresh(2, bad, _b(spark, [(2, "b2")]))


def test_stream_crash_after_refresh_replays_exactly(spark, tmp_path):
    """Chaos: the foreachBatch sink dies AFTER the MV committed a
    micro-batch but BEFORE the checkpoint advanced — on restart Spark
    re-delivers that batch and refresh() must absorb the replay
    byte-stably (overwrite own partitions, prior state pruned). Final
    MV must equal the crash-free join."""
    import os

    import pandas as pd
    import pytest

    from dvmax_spark.plans.join_mv import IncrementalJoinMV, stream_into_join_mv

    schema = "side string, k long, a_val string, b_val string"
    rows = [
        ("A", 1, "a1", None), ("B", 1, None, "b1"),
        ("A", 2, "a2", None), ("B", 2, None, "b2"),
        ("A", 1, "a1x", None), ("B", 3, None, "b3"),
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    now = None
    for i in range(3):
        p = os.path.join(in_dir, f"{i:03d}.parquet")
        pd.DataFrame(rows[2 * i : 2 * i + 2],
                     columns=["side", "k", "a_val", "b_val"]).to_parquet(p)
        if now is None:
            now = os.stat(p).st_mtime
        os.utime(p, (now + i, now + i))

    crash_flag = str(tmp_path / "crash_once")
    open(crash_flag, "w").close()

    class CrashyMV(IncrementalJoinMV):
        def refresh(self, batch_id, da, db):
            super().refresh(batch_id, da, db)
            # die exactly once, right after batch 1's COMMITTED write
            if batch_id == 1 and os.path.exists(crash_flag):
                os.remove(crash_flag)
                raise RuntimeError("injected crash after MV write")

    mv = CrashyMV(spark, str(tmp_path / "mv"), key="k")
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        def _run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            )
            q = stream_into_join_mv(
                stream, mv, checkpoint_dir=str(tmp_path / "ckpt"),
                query_name="join_mv_chaos",
            )
            q.awaitTermination(180)

        with pytest.raises(Exception, match="injected crash"):
            _run()
        _run()  # restart on the SAME checkpoint: batch 1 replays
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    a_rows = [(r[1], r[2]) for r in rows if r[0] == "A"]
    b_rows = [(r[1], r[3]) for r in rows if r[0] == "B"]
    expected = sorted(map(tuple,
        spark.createDataFrame(a_rows, "k long, a_val string")
        .join(spark.createDataFrame(b_rows, "k long, b_val string"), "k")
        .collect()))
    got = sorted(map(tuple, mv.read().select("k", "a_val", "b_val").collect()))
    assert got == expected


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_random_slicings_always_converge(spark, tmp_path):
    """Seeded randomized slicings: however A- and B-rows are scattered
    across 3 batches (including empty deltas and many-to-many keys),
    the MV must equal the one-shot join. Catches delta-rule edge cases
    a hand-picked arrival order misses."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        a_rows = [(rng.randint(1, 8), f"a{seed}_{i}") for i in range(25)]
        b_rows = [(rng.randint(1, 8), f"b{seed}_{i}") for i in range(15)]
        a_batches = [[], [], []]
        b_batches = [[], [], []]
        for r in a_rows:
            a_batches[rng.randint(0, 2)].append(r)
        for r in b_rows:
            b_batches[rng.randint(0, 2)].append(r)
        mv = _mk(spark, tmp_path, f"rand{seed}")
        empty_a, empty_b = _a(spark, []).limit(0), _b(spark, []).limit(0)
        for i in range(3):
            da = _a(spark, a_batches[i]) if a_batches[i] else empty_a
            db = _b(spark, b_batches[i]) if b_batches[i] else empty_b
            mv.refresh(i + 1, da, db)
        expected = sorted(
            map(tuple, _a(spark, a_rows).join(_b(spark, b_rows), "k").collect())
        )
        assert _collect(mv) == expected, f"seed {seed} diverged"
