"""Seeded shuffle-shard manifests: reproducible training order at corpus
scale, with append-only growth.

``build_shuffle_manifest`` realizes a uniform pseudo-random permutation of a
document corpus as (shard, pos) coordinates: permutation key
md5(seed || doc_id), shard from the key's first byte mod S, position = rank
of the key WITHIN its shard. Reading shard files in (shard, pos) order
replays the same global shuffle on any engine, any cluster size, any retry —
unlike ``orderBy(rand())``, whose key changes on every speculative
re-execution.

``extend_shuffle_manifest`` grows an existing manifest without touching it:
new docs hash to their shard and are APPENDED after the shard's current
maximum position, ranked by the same permutation key within the new batch.
Existing (doc_id, shard, pos) rows are byte-stable — a training run that
checkpointed at epoch N resumes against the grown corpus with every already-
consumed sample at the same coordinate. Replay-safe: docs already present in
the manifest are dropped by anti-join, so re-submitting a batch is a no-op
(same contract as dedup.incremental_neardup). Batch arrival ORDER is part of
the permutation definition (appended blocks keep arrival order, like log
offsets); only within a batch is the order seeded-random.

Scale: build sorts n/S rows per shard partition (the minimum possible — that
sort IS the byte order the trainer consumes); extend shuffles only the NEW
batch plus an S-row broadcast of per-shard maxima, never the existing
manifest.

Reference parity: beyond-reference (the reference's training-side tooling
stops at chunking, scripts/chatbot/src/chunking_strategies.py); this is the
corpus-serving sibling of t13's hash split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

DEFAULT_SEED = "shuffle:42:"
DEFAULT_SHARDS = 8


def perm_key(seed: str = DEFAULT_SEED, col: str = "doc_id") -> Column:
    """md5(seed || id) — the portable permutation key (hex string order)."""
    return F.md5(F.concat(F.lit(seed), F.col(col).cast("string")))


def shard_of(pkey: Column, n_shards: int = DEFAULT_SHARDS) -> Column:
    """Shard from the key's first byte, mod ``n_shards`` — same nibble
    arithmetic as the t13 split bucket, portable to any SQL engine."""
    nib = lambda pos: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(pkey, pos, 1)
    ) - 1
    return F.pmod(nib(1) * 16 + nib(2), F.lit(n_shards)).cast("int")


def build_shuffle_manifest(
    docs: DataFrame,
    seed: str = DEFAULT_SEED,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """(doc_id, shard, pos): the seeded global permutation, realized
    per-shard. Concatenating shards 0..S-1 in pos order is a uniform
    shuffle of the corpus."""
    keyed = docs.select("doc_id", perm_key(seed).alias("pkey"))
    sharded = keyed.select(
        "doc_id", "pkey", shard_of(F.col("pkey"), n_shards).alias("shard")
    )
    w = W.partitionBy("shard").orderBy(F.asc("pkey"), F.asc("doc_id"))
    return sharded.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


def _appended_rows(
    manifest: DataFrame,
    new_docs: DataFrame,
    seed: str = DEFAULT_SEED,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """The NEW (doc_id, shard, pos) rows that growing ``manifest`` by
    ``new_docs`` produces — already-manifested ids drop out (replay-safe
    anti-join), the rest rank by permutation key after their shard's
    current maximum position."""
    fresh = new_docs.select("doc_id").join(
        manifest.select("doc_id"), "doc_id", "left_anti"
    )
    keyed = fresh.select("doc_id", perm_key(seed).alias("pkey"))
    sharded = keyed.select(
        "doc_id", "pkey", shard_of(F.col("pkey"), n_shards).alias("shard")
    )
    base_max = manifest.groupBy("shard").agg(F.max("pos").alias("max_pos"))
    w = W.partitionBy("shard").orderBy(F.asc("pkey"), F.asc("doc_id"))
    return (
        sharded.join(F.broadcast(base_max), "shard", "left")
        .select(
            "doc_id",
            "shard",
            (
                F.coalesce(F.col("max_pos"), F.lit(0).cast("long"))
                + F.row_number().over(w)
            )
            .cast("long")
            .alias("pos"),
        )
    )


def extend_shuffle_manifest(
    manifest: DataFrame,
    new_docs: DataFrame,
    seed: str = DEFAULT_SEED,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Append ``new_docs`` to an existing manifest without disturbing any
    existing coordinate. Already-manifested doc_ids are ignored (replay-safe
    anti-join). Returns the full grown manifest."""
    return manifest.select("doc_id", "shard", "pos").unionByName(
        _appended_rows(manifest, new_docs, seed, n_shards)
    )


def append_to_manifest(
    spark,
    new_docs: DataFrame,
    manifest_dir: str,
    seed: str = DEFAULT_SEED,
    n_shards: int = DEFAULT_SHARDS,
) -> int:
    """Persisted form: grow the shard-partitioned manifest at
    ``manifest_dir`` by appending ONLY the new rows — per-batch work and
    write volume ∝ batch size, never the corpus. A replayed batch (crash
    after the append, before the stream checkpoint commit) anti-joins to
    nothing and appends zero rows, so the persisted manifest never holds
    duplicate coordinates. Returns the number of rows appended.

    The first-run check is an explicit path-existence test, NOT a bare
    except around the read: swallowing a transient/corrupt read error as
    "empty manifest" would re-append every doc from position 1 — duplicate
    coordinates, the one thing this operator exists to prevent. A real
    read failure therefore propagates."""
    import os

    if os.path.exists(manifest_dir):
        base = spark.read.parquet(manifest_dir).select("doc_id", "shard", "pos")
    else:
        base = new_docs.select("doc_id").limit(0).select(
            "doc_id",
            F.lit(0).cast("int").alias("shard"),
            F.lit(0).cast("long").alias("pos"),
        )
    appended = _appended_rows(base, new_docs, seed, n_shards)
    # bounded: one batch of rows — count then write via a cached frame so
    # the anti-join/rank runs once
    appended = appended.persist()
    try:
        n = appended.count()
        if n:
            appended.write.mode("append").partitionBy("shard").parquet(manifest_dir)
    finally:
        appended.unpersist()
    return n
