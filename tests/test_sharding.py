"""Shuffle-shard manifest contracts: validity, coordinate stability under
growth, replay safety, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators.sharding import (
    build_shuffle_manifest,
    extend_shuffle_manifest,
)
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

N_SHARDS = 8


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id")


def _assert_valid_manifest(rows):
    """Positions are dense 1..n_s within every shard; doc_ids unique."""
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_build_is_valid_and_deterministic(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = build_shuffle_manifest(docs, n_shards=N_SHARDS).collect()
    b = build_shuffle_manifest(docs, n_shards=N_SHARDS).collect()
    _assert_valid_manifest(a)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r.shard for r in a} <= set(range(N_SHARDS))


def test_seed_change_reshuffles(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: (r.shard, r.pos) for r in build_shuffle_manifest(docs).collect()}
    c = {
        r.doc_id: (r.shard, r.pos)
        for r in build_shuffle_manifest(docs, seed="other:7:").collect()
    }
    assert a.keys() == c.keys()
    assert any(a[d] != c[d] for d in a)  # a different permutation


def test_extend_keeps_existing_coordinates_byte_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    base = build_shuffle_manifest(old, n_shards=N_SHARDS)
    grown = extend_shuffle_manifest(base, new, n_shards=N_SHARDS).collect()
    _assert_valid_manifest(grown)
    base_map = {r.doc_id: (r.shard, r.pos) for r in base.collect()}
    grown_map = {r.doc_id: (r.shard, r.pos) for r in grown}
    # every pre-existing doc keeps its exact coordinate
    for doc_id, coord in base_map.items():
        assert grown_map[doc_id] == coord
    # new docs landed strictly after the old block of their shard
    max_old = {}
    for shard, pos in base_map.values():
        max_old[shard] = max(max_old.get(shard, 0), pos)
    for doc_id, (shard, pos) in grown_map.items():
        if doc_id not in base_map:
            assert pos > max_old.get(shard, 0)


def test_extend_is_replay_safe(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    base = build_shuffle_manifest(old)
    once = extend_shuffle_manifest(base, new)
    twice = extend_shuffle_manifest(once, new)  # resubmit the same batch
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_extend_into_empty_shard_starts_at_one(spark):
    base = build_shuffle_manifest(
        spark.range(0).select(F.col("id").alias("doc_id"))
    )
    new = spark.range(5).select(F.col("id").alias("doc_id"))
    grown = extend_shuffle_manifest(base, new).collect()
    _assert_valid_manifest(grown)
    assert len(grown) == 5



def test_streaming_manifest_sink_grows_append_only(spark, sf_dir, tmp_path):
    """The manifest grows WITH the doc stream: two availableNow drains
    (restart on the same checkpoint between them) leave a valid manifest
    covering every doc, with the first drain's coordinates byte-stable."""
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        file_stream,
        run_shuffle_manifest_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    in_dir = str(tmp_path / "in")
    man_dir = str(tmp_path / "manifest")
    ckpt = str(tmp_path / "ckpt")

    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(in_dir)
    run_shuffle_manifest_sink(
        file_stream(spark, in_dir, docs.schema), man_dir, ckpt, n_shards=4
    ).awaitTermination()
    first = {r.doc_id: (r.shard, r.pos) for r in spark.read.parquet(man_dir).collect()}
    _assert_valid_manifest(spark.read.parquet(man_dir).collect())

    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(in_dir)
    run_shuffle_manifest_sink(
        file_stream(spark, in_dir, docs.schema), man_dir, ckpt, n_shards=4
    ).awaitTermination()
    rows = spark.read.parquet(man_dir).collect()
    _assert_valid_manifest(rows)
    grown = {r.doc_id: (r.shard, r.pos) for r in rows}
    assert len(grown) == docs.count()
    for doc_id, coord in first.items():
        assert grown[doc_id] == coord


def test_append_to_manifest_replay_appends_zero(spark, sf_dir, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators.sharding import (
        append_to_manifest,
    )

    docs = _docs(spark, sf_dir)
    man_dir = str(tmp_path / "m")
    n1 = append_to_manifest(spark, docs, man_dir, n_shards=4)
    assert n1 == docs.count()
    n2 = append_to_manifest(spark, docs, man_dir, n_shards=4)  # replay
    assert n2 == 0
    _assert_valid_manifest(spark.read.parquet(man_dir).collect())

def test_append_to_manifest_propagates_read_errors(spark, tmp_path):
    """A corrupt/unreadable existing manifest must RAISE, not be treated
    as empty — silently restarting positions at 1 would mint duplicate
    coordinates."""
    from stock_crypto_data_pipeline_public_spark.operators.sharding import (
        append_to_manifest,
    )

    man_dir = tmp_path / "m"
    man_dir.mkdir()
    (man_dir / "part-00000.parquet").write_bytes(b"not a parquet file")
    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(Exception):
        append_to_manifest(spark, docs, str(man_dir))


def test_cli_shuffle_manifest_refuses_self_overwrite(spark, tmp_path, capsys):
    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_shuffle_manifest

    class _A:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    d = str(tmp_path / "docs")
    spark.range(3).select(F.col("id").alias("doc_id")).write.parquet(d)
    m = str(tmp_path / "m")
    rc = cmd_shuffle_manifest(
        _A(docs=d, out=m, manifest=m, id_col="doc_id",
           seed="shuffle:42:", shards=4),
        spark,
    )
    assert rc == 1
    assert "must differ" in capsys.readouterr().out


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
