"""Crash-safe table-promote primitives shared by every staging→main
swap in the package (``FeatureStore._swap_in``, ``MinHashIndex.compact``
/``compact_batches``, ``NearDupGraph.build``, ``ContinuousRollup``,
``IncrementalJoinMV``, the streaming marker sinks).

Layout (r5): the table path is a SYMLINK to a sibling versioned
directory — ``tbl -> tbl.v3`` — and a promote is

  1. ``rename(staging, tbl.v4)``       (new version lands complete)
  2. ``symlink tbl.lnk -> tbl.v4``; ``rename(tbl.lnk, tbl)``

Step 2's rename atomically REPLACES the old symlink (POSIX rename onto
an existing link), so there is no instant at which the table path fails
to resolve to a complete version — the absent-path window of the old
two-rename directory swap, and the reader mis-heal race it forced
(r4 VERDICT, fsops.py:54), are gone. The displaced version directory is
returned still on disk; the caller disposes of it (delete, or rename
into a snapshot log) only AFTER the promote, so at every crash point
some complete version holds the pre-promote state.

Everything reads *through* the symlink (``os.path.isdir``, Spark's
parquet reader, in-table ``_meta.json`` markers, partition-dir
listings), so callers are layout-agnostic. Legacy real-directory
tables migrate on their first swap: the current dir is adopted as
``tbl.v1`` and the pointer created — that one migration retains the
old rename window, healed by ``recover_swap`` like before.

Crash matrix:

* crash after step 1: the pointer still serves the old version; the
  new dir is an un-promoted orphan. The caller's replay re-runs the
  batch (its commit marker never swapped in) and promotes the next
  version number; orphans are pruned on the next successful swap.
* crash inside the legacy migration (path renamed away, pointer not
  yet created): ``recover_swap`` re-points at the newest version.
* pre-migration legacy crash (state stranded in ``.old``):
  ``recover_swap`` keeps the old heal — renamed back into place.

Concurrent READERS on the same filesystem always resolve a complete
table. Deleting the displaced version while a reader is mid-scan is
the standard snapshot-retention race (what Delta's VACUUM documents);
callers that need concurrent long scans keep the displaced dir (the
FeatureStore renames it into its snapshot log). WRITERS stay
single-process per table — unchanged contract.
"""

from __future__ import annotations

import os
import re
import shutil

RETIRED_SUFFIX = ".old"
_POINTER_TMP = ".lnk"
_VER_RE = re.compile(r"^\.v(\d+)$")


def list_versions(path: str) -> dict[int, str]:
    """Existing sibling version directories ``{n: '<path>.v<n>'}``."""
    base = os.path.basename(path)
    parent = os.path.dirname(path) or "."
    out: dict[int, str] = {}
    try:
        names = os.listdir(parent)
    except OSError:
        return out
    for nm in names:
        if not nm.startswith(base + ".v"):
            continue
        m = _VER_RE.match(nm[len(base):])
        full = os.path.join(parent, nm)
        if m and os.path.isdir(full):
            out[int(m.group(1))] = full
    return out


def current_version_dir(path: str) -> str | None:
    """The version directory the table pointer currently serves, or
    None (legacy real-dir layout, or no table)."""
    if not os.path.islink(path):
        return None
    target = os.path.join(os.path.dirname(path) or ".", os.readlink(path))
    return target if os.path.isdir(target) else None


def _point(path: str, target_dir: str) -> None:
    """Atomically (re)point ``path`` at ``target_dir`` — one rename,
    valid whether or not a pointer already exists."""
    tmp = path + _POINTER_TMP
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(os.path.basename(target_dir), tmp)
    os.rename(tmp, path)


def recover_swap(path: str) -> bool:
    """Heal a crashed promote: if the table path does not resolve,
    re-point it at the newest complete version directory (versioned
    layout) or roll the legacy ``.old`` state back into place.
    Returns True when a recovery was performed.

    A healthy pointer/table is never touched, so unlike the old
    two-rename layout a reader can no longer mis-heal an in-flight
    writer's promote — the pointer flip is atomic and there is no
    absent-path window to race (legacy tables retain the old window
    for their one migration swap)."""
    if os.path.isdir(path):  # resolves (real dir or live symlink)
        return False
    vers = list_versions(path)
    if vers:
        if os.path.islink(path):  # dangling pointer
            try:
                os.remove(path)
            except OSError:
                pass
        try:
            _point(path, vers[max(vers)])
        except OSError:
            # lost a heal race: sibling healed first / writer finished
            return False
        return True
    retired = path + RETIRED_SUFFIX
    if os.path.isdir(retired):
        try:
            os.rename(retired, path)
        except OSError:
            return False
        return True
    return False


def swap_dir(path: str, staging: str, prune_strays: bool = True) -> str | None:
    """Promote ``staging`` to ``path`` (heals a crashed swap first).
    The displaced version directory is returned still on disk (``None``
    when no table existed); the CALLER disposes of it — ``rmtree`` it,
    or rename it into a snapshot log — so history is only deleted after
    the new state is fully promoted.

    ``prune_strays`` (default) removes other leftover version dirs —
    un-promoted orphans from a crash after step 1, or a displaced dir a
    crashed caller never disposed. Callers that ADOPT displaced dirs
    (the FeatureStore's snapshot log) pass False and sweep strays
    themselves, so a crash between their swap and the adoption rename
    can never silently delete a version they meant to keep."""
    recover_swap(path)
    # a stale legacy '.old' is fully superseded once a promote succeeds;
    # clearing it here keeps recover_swap from ever resurrecting it
    # (it can be a renamed-away POINTER, not just a dir — crash sims do
    # `rename(tbl, tbl + '.old')` on the symlink)
    old = path + RETIRED_SUFFIX
    if os.path.islink(old):
        os.remove(old)
    else:
        shutil.rmtree(old, ignore_errors=True)
    vers = list_versions(path)
    nmax = max(vers) if vers else 0
    if os.path.isdir(path) and not os.path.islink(path):
        # legacy real-dir layout: adopt the current table as a version,
        # then create the pointer (the one remaining windowed migration
        # — a crash between these renames heals via recover_swap)
        nmax += 1
        legacy = f"{path}.v{nmax}"
        os.rename(path, legacy)
        _point(path, legacy)
        vers[nmax] = legacy
    displaced = current_version_dir(path)
    new_dir = f"{path}.v{nmax + 1}"
    os.rename(staging, new_dir)
    _point(path, new_dir)  # the one atomic pointer flip
    if prune_strays:
        for d in vers.values():
            if d != displaced and d != new_dir:
                shutil.rmtree(d, ignore_errors=True)
    return displaced
