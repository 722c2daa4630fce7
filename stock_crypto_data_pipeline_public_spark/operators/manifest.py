"""Pointer-file (manifest) table commits: atomicity without directory rename.

``swap_into_place`` (incremental.py) keeps a complete table visible at every
instant on a POSIX filesystem, but its primitive — directory rename — is not
atomic on object stores (S3A renames are copy+delete per object), and the
declared production target is object storage (SCALE.md). This module is the
table-format-free answer: commit = replacing ONE small manifest file.

Layout::

    table_root/
        _current        <- one line: the name of the live generation dir
        gen-000001/     <- a complete, immutable parquet table
        gen-000002/

Writers build the next generation in a fresh directory (never touching the
live one), then flip ``_current``. Readers resolve ``_current`` and scan
that generation. The flip is ``os.replace`` of a one-file manifest locally;
on an object store it maps to a single small PUT — the one atomic primitive
S3 does provide (strong read-after-write since 2020). Every failure mode is
benign:

- crash while writing the generation → ``_current`` still names the old
  complete generation; the orphan directory is garbage, collected by the
  next successful commit
- crash between generation write and pointer flip → same
- crash after the flip → commit is complete; the previous generation is
  retained for one commit so in-flight readers finish their scan

This is deliberately the skeleton of what Delta/Iceberg do (log/metadata
pointer → immutable data files); deploying a table format replaces this
module, not the query plans. Reference parity: the reference's dbt
``materialized='table'`` relies on the warehouse's transactional swap
(dbt-duckdb CREATE OR REPLACE); this supplies the equivalent guarantee over
plain parquet.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

CURRENT = "_current"
LOG = "_log"
_GEN_PREFIX = "gen-"


def is_manifest_table(path: str) -> bool:
    return os.path.isfile(os.path.join(path, CURRENT))


def current_generation(path: str) -> str | None:
    """Absolute path of the live generation, or None if ``path`` is not a
    manifest table (or the pointer names a missing directory — treated as
    corruption and raised, never silently read as empty)."""
    if not is_manifest_table(path):
        return None
    with open(os.path.join(path, CURRENT)) as f:
        gen = f.read().strip()
    gen_path = os.path.join(path, gen)
    if not gen or not os.path.isdir(gen_path):
        raise ValueError(
            f"manifest {path!r} points at missing generation {gen!r}"
        )
    return gen_path


def resolve_table(path: str) -> str:
    """The directory a reader should scan: the live generation for a
    manifest table, the path itself for a plain parquet table — so readers
    are layout-agnostic."""
    return current_generation(path) or path


def read_table(
    spark: SparkSession, path: str, generation: int | None = None
) -> DataFrame:
    """Read the live table state, or — for manifest tables — a RETAINED
    older generation (``generation`` = its number, from :func:`history`):
    shallow time travel, bounded by ``keep_history`` exactly like a
    vacuumed Delta table. Asking for a GC'd or unknown generation raises
    rather than silently reading the wrong data."""
    if generation is None:
        return spark.read.parquet(resolve_table(path))
    gen = f"{_GEN_PREFIX}{generation:06d}"
    gen_path = os.path.join(path, gen)
    # only COMMITTED generations are readable: a directory left by a
    # crashed commit (never flipped to, not yet GC'd) may hold a partial
    # write — membership in the log (or being current) is the proof the
    # generation was complete when the pointer moved
    committed: set[str] = set()
    log_path = os.path.join(path, LOG)
    if os.path.isfile(log_path):
        with open(log_path) as f:
            committed = {line.strip() for line in f if line.strip()}
    cur = current_generation(path)
    if cur is not None:
        committed.add(os.path.basename(cur))
    if gen not in committed or not os.path.isdir(gen_path):
        retained = sorted(
            int(g[len(_GEN_PREFIX):])
            for g in _generations(path)
            if g in committed
        )
        raise ValueError(
            f"generation {generation} of {path!r} is unknown, uncommitted, "
            f"or already GC'd (readable: {retained})"
        )
    return spark.read.parquet(gen_path)


def history(path: str) -> list[dict]:
    """Commit history of a manifest table, newest first: one entry per
    commit still recorded in the log, flagged ``retained`` if its data
    directory survives GC (only retained generations are readable)."""
    log_path = os.path.join(path, LOG)
    if not os.path.isfile(log_path):
        return []
    with open(log_path) as f:
        committed = [line.strip() for line in f if line.strip()]
    on_disk = set(_generations(path))
    return [
        {"generation": int(g[len(_GEN_PREFIX):]), "retained": g in on_disk}
        for g in reversed(committed)
    ]


def _generations(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        d
        for d in os.listdir(path)
        if d.startswith(_GEN_PREFIX) and os.path.isdir(os.path.join(path, d))
    )


def commit_generation(
    path: str,
    write_fn: Callable[[str], None],
    keep_history: int = 1,
) -> str:
    """Commit a new table state: ``write_fn(gen_dir)`` writes the complete
    next generation into a fresh directory, then the ``_current`` pointer
    flips to it in one small-file replace. Returns the committed
    generation path.

    Retains the ``keep_history`` most recent previously-committed
    generations (readers may be mid-scan on the last one; older retained
    ones are readable via ``read_table(path, generation=...)`` — shallow
    time travel) and deletes everything else, including orphans from
    crashed commits — GC runs AFTER the flip, so a crash during GC leaves
    only extra data, never less. ``keep_history=0`` keeps only the new
    generation.

    Single-writer protocol (like the rename swap it replaces): concurrent
    committers could allocate the same generation number. Serialize
    commits per table — the scheduler/stream sink already does — or add a
    lock service; readers need no coordination in either case.
    """
    os.makedirs(path, exist_ok=True)
    gens = _generations(path)
    prev = current_generation(path)  # readers may be mid-scan on it
    n = int(gens[-1][len(_GEN_PREFIX):]) + 1 if gens else 1
    gen = f"{_GEN_PREFIX}{n:06d}"
    gen_path = os.path.join(path, gen)
    write_fn(gen_path)

    # THE commit: replace the one-file manifest (os.replace locally; a
    # single small PUT on an object store)
    tmp = os.path.join(path, CURRENT + ".tmp")
    with open(tmp, "w") as f:
        f.write(gen + "\n")
    os.replace(tmp, os.path.join(path, CURRENT))
    # commit log (after the flip — a crash before this line only loses the
    # HISTORY entry, never the commit): the log records generations that
    # actually WERE current, so orphans from crashed commits never gain a
    # history row and are always GC'd below. If the PREVIOUS current gen
    # is missing from the log (crash in exactly this window last commit),
    # heal it first so it keeps its history row and GC protection.
    log_path = os.path.join(path, LOG)
    logged: list[str] = []
    if os.path.isfile(log_path):
        with open(log_path) as f:
            logged = [line.strip() for line in f if line.strip()]
    with open(log_path, "a") as f:
        if prev is not None and os.path.basename(prev) not in logged:
            f.write(os.path.basename(prev) + "\n")
        f.write(gen + "\n")

    # post-commit GC: keep the new gen plus the keep_history most recent
    # COMMITTED predecessors (readers may be mid-scan on the last; older
    # retained ones serve time travel); everything else — including
    # never-pointed-to orphans — is garbage. GC after the flip: a crash
    # here leaves extra data, never less.
    with open(log_path) as f:
        committed = [line.strip() for line in f if line.strip()]
    survivors = {gen} | set(committed[-(keep_history + 1):])
    if prev is not None:  # never GC the gen in-flight readers resolved
        survivors.add(os.path.basename(prev))
    for d in _generations(path):
        if d not in survivors:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return gen_path


def vacuum(path: str, keep_history: int = 1) -> dict:
    """Standalone generation GC (Delta VACUUM parity): delete retained
    generations beyond the ``keep_history`` most recent committed
    predecessors — and any never-committed orphans from crashed writers —
    WITHOUT making a commit. Commit-time GC already enforces the same
    policy; vacuum is for tightening retention after the fact (e.g.
    ``keep_history=0`` following a ``delete_where`` erasure, so the
    pre-delete audit generation stops existing). The live generation is
    never removed; the ``_log`` history is kept (``history()`` flags
    vacuumed entries as ``retained: False``). Returns
    ``{"removed": [...], "retained": [...]}`` generation names.
    """
    if not is_manifest_table(path):
        raise ValueError(f"{path!r} is not a manifest table (no {CURRENT} file)")
    cur = os.path.basename(current_generation(path))
    committed: list[str] = []
    log_path = os.path.join(path, LOG)
    if os.path.isfile(log_path):
        with open(log_path) as f:
            committed = [line.strip() for line in f if line.strip()]
    if cur not in committed:  # heal the crash-between-flip-and-log window
        committed.append(cur)
    survivors = {cur} | set(committed[-(keep_history + 1):])
    removed, retained = [], []
    for d in _generations(path):
        if d in survivors:
            retained.append(d)
        else:
            removed.append(d)
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return {"removed": removed, "retained": retained}
