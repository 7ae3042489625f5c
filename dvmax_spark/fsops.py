"""Crash-safe directory-swap primitives shared by every staging→main
table promote in the package (``FeatureStore._swap_in``,
``MinHashIndex.compact``/``compact_batches``, ``stream_into_sketches``).

POSIX ``rename`` is atomic per path, but promoting a staging directory
takes TWO renames (``main → main.old``, ``staging → main``) and a crash
between them leaves the table path absent with the previous state
stranded in ``.old``. Without recovery that window is silent data loss:
a restarting writer sees "no table", rebuilds from scratch, and its
next promote ``rmtree``'s the stranded history (the round-3 ADVICE
finding against stream_into_sketches).

The contract here closes the window:

* ``recover_swap(path)`` — call before READING or re-promoting; if the
  table is absent but ``.old`` exists, the retired state is renamed
  back into place (with any in-dir commit markers, so exactly-once
  bookkeeping is restored with it).
* ``swap_dir(path, staging)`` — heals first, then retires the current
  table to ``.old`` and promotes staging. The ``.old`` dir is returned
  still on disk; the caller disposes of it (delete, or rename into a
  snapshot log) only AFTER the promote completed, so at every crash
  point either ``path`` or ``path + '.old'`` holds a complete copy of
  the pre-promote state.

Readers on the same filesystem can still observe a brief
path-not-found between the two renames (documented, not hidden): true
multi-process atomicity needs a metadata/manifest layer (what Delta/
Iceberg do, and what HDFS/S3 committers provide on a cluster). For the
single-writer local store these primitives guarantee durability —
no crash point loses the previous state — which is the property the
exactly-once sinks build on.
"""

from __future__ import annotations

import os
import shutil

RETIRED_SUFFIX = ".old"


def recover_swap(path: str) -> bool:
    """Heal a crashed two-rename swap: if ``path`` is absent but
    ``path + '.old'`` exists, roll the retired state back into place.
    Returns True when a recovery was performed.

    Concurrency note: this makes readers potentially WRITE (one
    rename). The store's contract is single-writer/single-process (see
    module docstring) — but a reader racing another reader's recovery,
    or observing a writer mid-promote, must not crash: the rename loser
    gets FileNotFoundError (its sibling already healed) or the healed
    path reappears — both are treated as "nothing to recover". A
    reader racing an in-flight WRITER can still mis-heal (rename .old
    back between the writer's two renames, failing the writer's
    promote loudly with ENOTEMPTY) — that is the documented
    multi-writer limit, not a silent-loss path: the writer errors, no
    state is deleted, and the next operation heals."""
    retired = path + RETIRED_SUFFIX
    if not os.path.isdir(path) and os.path.isdir(retired):
        try:
            os.rename(retired, path)
        except OSError:
            # lost a recovery race (sibling healed first / writer
            # completed its promote): the table is whole either way
            return False
        return True
    return False


def swap_dir(path: str, staging: str) -> str | None:
    """Promote ``staging`` to ``path`` (heals a prior crashed swap
    first). The displaced current table is retired to ``path + '.old'``
    and its path returned (``None`` when ``path`` didn't exist yet);
    the CALLER disposes of it — ``shutil.rmtree`` it, or rename it into
    a snapshot log — so history is only deleted after the new state is
    fully promoted."""
    recover_swap(path)
    retired = path + RETIRED_SUFFIX
    shutil.rmtree(retired, ignore_errors=True)
    had_current = os.path.isdir(path)
    if had_current:
        os.rename(path, retired)
    os.rename(staging, path)
    return retired if had_current else None
