"""Lineage cuts for iterative operators — the local/reliable knob.

Every iterative operator in the package (distributed exact rank,
connected components, PageRank, BPE training) must truncate its plan
once per round or the lineage grows linearly with iterations (Catalyst
re-analyzes an ever-deeper tree and a recomputation would replay every
round). Two ways to cut it:

* ``local`` (default) — ``DataFrame.localCheckpoint``: blocks pinned
  in EXECUTOR memory/disk. Fastest (no external write), but the blocks
  die with their executor: on a real cluster an executor loss mid-loop
  fails the job (Spark cannot recompute a local checkpoint). The right
  trade single-node and for short loops on stable clusters.
* ``reliable`` — ``DataFrame.checkpoint``: blocks written to the
  directory registered via ``spark.sparkContext.setCheckpointDir``
  (HDFS / object store at cluster scale). Survives executor loss —
  the loop resumes from the last completed round's files — at the
  cost of one distributed write+read per cut. The right trade for
  long loops at 100 TB where losing an executor is routine.

Both modes return a DataFrame with identical contents and identical
downstream behavior (partitioning is preserved); a parametrized test
pins result equality. Operators expose this as
``checkpoint_mode='local'|'reliable'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_MODES = ("local", "reliable")


def cut_lineage(df: DataFrame, mode: str = "local", eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage per the module-doc trade-offs."""
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "checkpoint_mode='reliable' requires a reliable checkpoint "
                "directory: call spark.sparkContext.setCheckpointDir(<path on "
                "shared storage>) first"
            )
        return df.checkpoint(eager=eager)
    raise ValueError(f"unknown checkpoint_mode {mode!r}; use one of {CHECKPOINT_MODES}")
