"""Maintenance operators: small-file compaction + range-sorted layout.

Checks the two properties the operators exist for — file-count reduction
with bit-identical data, and per-file disjoint sort-key ranges (the parquet
footer-stats contract that enables file skipping in any engine)."""

import os

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators.maintenance import (
    _data_files,
    compact_partitioned_table,
    compact_table,
    table_stats,
    write_range_sorted,
    write_zordered,
)


def _fragmented_table(spark, path, n_files=40, n_rows=4000):
    (
        spark.range(n_rows)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(n_files)
        .write.parquet(path, mode="overwrite")
    )


def _sorted_rows(spark, path):
    return spark.read.parquet(path).orderBy("id").collect()


def test_compact_reduces_files_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, path)
    before_rows = _sorted_rows(spark, path)
    before = table_stats(path)
    assert before["n_files"] >= 40

    stats = compact_table(spark, path, target_bytes=before["bytes"])
    assert stats["n_files_before"] >= 40
    assert stats["n_files_after"] == 1
    assert _sorted_rows(spark, path) == before_rows
    # idempotent: compacting a compact table is a no-op shape
    stats2 = compact_table(spark, path, target_bytes=before["bytes"])
    assert stats2["n_files_after"] == 1
    # no staging/old debris left behind
    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if "__" in d] == []


def test_compact_respects_target_bytes(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _fragmented_table(spark, path)
    total = table_stats(path)["bytes"]
    stats = compact_table(spark, path, target_bytes=total // 4 + 1)
    assert 2 <= stats["n_files_after"] <= 8  # ceil(bytes/target) ≈ 4


def _file_ranges(spark, path, col):
    ranges = []
    for f in _data_files(path):
        row = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).first()
        ranges.append((row["lo"], row["hi"]))
    return sorted(r for r in ranges if r[0] is not None)


@pytest.mark.parametrize("via_compact", [False, True])
def test_range_sorted_files_are_disjoint(spark, tmp_path, via_compact):
    path = str(tmp_path / f"sorted_{via_compact}")
    _fragmented_table(spark, path)
    before_rows = _sorted_rows(spark, path)
    if via_compact:
        compact_table(
            spark, path, target_bytes=table_stats(path)["bytes"] // 4 + 1,
            sort_cols=["id"],
        )
    else:
        df = spark.read.parquet(path)
        write_range_sorted(df, path + ".out", ["id"], n_partitions=4)
        path = path + ".out"
    ranges = _file_ranges(spark, path, "id")
    assert len(ranges) >= 2
    for (_, hi_prev), (lo, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo, f"overlapping file ranges: {ranges}"
    assert _sorted_rows(spark, path) == before_rows


def _files_hit(spark, path, col, lo, hi):
    """Files whose footer [min, max] on ``col`` intersects [lo, hi] — the
    set ANY footer-stats-pruning reader must scan for that predicate."""
    return sum(1 for flo, fhi in _file_ranges(spark, path, col) if fhi >= lo and flo <= hi)


def test_zorder_skips_files_on_every_clustered_column(spark, tmp_path):
    """On a 64x64 uniform grid in 16 files: a linear sort on x answers a
    y-stripe predicate only by scanning EVERY file, while the z-ordered
    layout confines both an x-stripe and a y-stripe to a fraction of the
    files — the property z-ordering exists for."""
    n = 64
    grid = (
        spark.range(n * n)
        .select(
            F.col("id"),
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
        .repartition(32)  # start from an unclustered layout
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    # rel_err=0 → exact quantiles, so buckets align with the value grid and
    # the only slack left is repartitionByRange's sampled boundaries
    write_zordered(grid, zpath, ["x", "y"], n_partitions=16, bits=6, rel_err=0.0)
    write_range_sorted(grid, lpath, ["x"], n_partitions=16)

    n_files = len(_data_files(zpath))
    # range bounds may merge adjacent tiles (empty trailing partitions)
    assert 13 <= n_files <= 16
    # stripe = 1/8 of the domain on one column, all of the other
    z_x = _files_hit(spark, zpath, "x", 0, 7)
    z_y = _files_hit(spark, zpath, "y", 0, 7)
    # ideal tiling is 4/16 files per stripe; allow quantile-boundary slack
    assert z_x <= 6, f"x-stripe hits {z_x}/16 z-ordered files"
    assert z_y <= 6, f"y-stripe hits {z_y}/16 z-ordered files"
    # the linear layout skips on its leading key but NOT on y
    n_linear = len(_data_files(lpath))
    assert _files_hit(spark, lpath, "x", 0, 7) <= 4
    assert _files_hit(spark, lpath, "y", 0, 7) == n_linear

    # clustering is a layout change only: data is bit-identical
    assert _sorted_rows(spark, zpath) == grid.orderBy("id").collect()


def test_zorder_rejects_key_wider_than_long(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").alias("a"), F.col("id").alias("b"),
        F.col("id").alias("c"), F.col("id").alias("d"),
    )
    with pytest.raises(ValueError, match="> 62"):
        write_zordered(df, str(tmp_path / "x"), ["a", "b", "c", "d"], 4, bits=16)


def test_compact_refuses_partitioned_root_but_takes_partition_dir(spark, tmp_path):
    """Compacting a hive-partitioned ROOT would flatten the layout (partition
    columns become data columns); the operator must refuse and accept the
    per-partition form instead."""
    path = str(tmp_path / "parted")
    (
        spark.range(2000)
        .select(F.col("id"), (F.col("id") % 3).alias("d"))
        .repartition(10)
        .write.partitionBy("d")
        .parquet(path, mode="overwrite")
    )
    with pytest.raises(ValueError, match="partitioned table root"):
        compact_table(spark, path)
    # pointing at one partition directory is the supported per-partition form
    part = path + "/d=1"
    rows_before = sorted(r["id"] for r in spark.read.parquet(part).collect())
    stats = compact_table(spark, part, target_bytes=1 << 40)
    assert stats["n_files_after"] == 1
    assert sorted(r["id"] for r in spark.read.parquet(part).collect()) == rows_before


def test_zorder_refuses_partitioned_root_but_takes_partition_dir(spark, tmp_path):
    """zorder_table (and thus the CLI zorder subcommand) carries the same
    partitioned-root guard as compact_table: rewriting the root would read
    partition columns as data and destroy directory-level pruning."""
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import (
        zorder_table,
    )

    path = str(tmp_path / "parted")
    (
        spark.range(2000)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("x"),
            (F.col("id") % 11).alias("y"),
            (F.col("id") % 3).alias("d"),
        )
        .repartition(10)
        .write.partitionBy("d")
        .parquet(path, mode="overwrite")
    )
    with pytest.raises(ValueError, match="partitioned table root"):
        zorder_table(spark, path, ["x", "y"], n_partitions=4)
    # the layout survives the refused call untouched
    assert sorted(
        d for d in __import__("os").listdir(path) if d.startswith("d=")
    ) == ["d=0", "d=1", "d=2"]
    # per-partition form works and preserves the rows
    part = path + "/d=1"
    rows_before = sorted(r["id"] for r in spark.read.parquet(part).collect())
    stats = zorder_table(spark, part, ["x", "y"], n_partitions=4)
    assert stats["n_files_after"] >= 1
    assert sorted(r["id"] for r in spark.read.parquet(part).collect()) == rows_before


# --------------------------------------------------------------------------
# delete_where: SQL DELETE semantics over plain and manifest tables
# --------------------------------------------------------------------------
def _keyed_table(spark, path, n=100):
    (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, F.lit(None))
            .otherwise(F.col("id") % 3)
            .alias("k"),
        )
        .write.parquet(path, mode="overwrite")
    )


def test_delete_where_plain_table(spark, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import delete_where

    path = str(tmp_path / "t")
    _keyed_table(spark, path)
    stats = delete_where(spark, path, "k = 1")
    # k = 1 is TRUE for ids where id%3==1 and id%10!=0: DELETE removes
    # exactly those; NULL-k rows (id%10==0) must survive a k=1 predicate
    survivors = spark.read.parquet(path)
    assert survivors.filter("k = 1").count() == 0
    assert survivors.filter("k IS NULL").count() == 10
    assert stats["n_before"] == 100
    assert stats["n_after"] == survivors.count() == 100 - stats["n_deleted"]


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import delete_where

    path = str(tmp_path / "t")
    _keyed_table(spark, path)
    # "k < 0" is NULL for NULL-k rows -> kept (SQL DELETE), FALSE elsewhere
    stats = delete_where(spark, path, "k < 0")
    assert stats["n_deleted"] == 0 and stats["n_after"] == 100


def test_delete_where_all_rows_leaves_valid_empty_table(spark, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import delete_where

    path = str(tmp_path / "t")
    _keyed_table(spark, path)
    stats = delete_where(spark, path, "id >= 0")
    assert stats["n_after"] == 0
    df = spark.read.parquet(path)  # schema survives, table stays readable
    assert df.count() == 0 and set(df.columns) == {"id", "k"}


def test_delete_where_manifest_table_commits_next_generation(spark, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators import manifest as MF
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import delete_where

    path = str(tmp_path / "mt")
    src = spark.range(50).select(F.col("id"), (F.col("id") % 5).alias("k"))
    MF.commit_generation(path, lambda gen: src.write.parquet(gen))
    gens_before = [h["generation"] for h in MF.history(path)]
    stats = delete_where(spark, path, "k = 2")
    assert stats["n_deleted"] == 10
    assert MF.read_table(spark, path).filter("k = 2").count() == 0
    # the pre-delete state is still readable (audit trail) until GC
    prev_gen = max(gens_before)
    assert MF.read_table(spark, path, generation=prev_gen).count() == 50
    assert max(h["generation"] for h in MF.history(path)) == prev_gen + 1


def test_delete_where_rejects_partitioned_root_and_bad_condition(spark, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import delete_where

    root = str(tmp_path / "hive")
    (
        spark.range(20)
        .select(F.col("id"), (F.col("id") % 2).alias("p"))
        .write.partitionBy("p")
        .parquet(root, mode="overwrite")
    )
    with pytest.raises(ValueError, match="partition"):
        delete_where(spark, root, "id = 1")
    flat = str(tmp_path / "flat")
    _keyed_table(spark, flat)
    with pytest.raises(TypeError):
        delete_where(spark, flat, 42)


def test_compact_partitioned_table_manifest_layout(spark, tmp_path):
    """r9 verdict item 6: the s12 training-order manifest (shard=N hive
    layout, one file appended per epoch per shard) compacts per-partition
    with rows — hence training coordinates — byte-identical, layout
    preserved, and the pass idempotent."""
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import (
        compact_partitioned_table,
    )
    from stock_crypto_data_pipeline_public_spark.operators.sharding import (
        append_to_manifest,
    )

    def read_manifest(spark, d):
        return spark.read.parquet(d).select("doc_id", "shard", "pos")

    mdir = str(tmp_path / "manifest")
    # three "epochs" of streaming appends → ≥3 files per touched shard
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        docs = spark.range(lo, hi).select(F.col("id").cast("string").alias("doc_id"))
        append_to_manifest(spark, docs, mdir, seed="shuffle:42:", n_shards=4)

    before = read_manifest(spark, mdir).orderBy("shard", "pos").collect()
    files_before = len(_data_files(mdir))
    assert files_before > 4  # fragmented: multiple epochs per shard

    stats = compact_partitioned_table(spark, mdir)
    assert stats["n_partitions"] == 4
    assert stats["n_files_after"] == 4  # one file per shard
    # the hive layout survives (directory pruning intact)
    assert sorted(
        d for d in os.listdir(mdir) if d.startswith("shard=")
    ) == [f"shard={i}" for i in range(4)]
    # every (doc_id, shard, pos) coordinate byte-identical
    assert read_manifest(spark, mdir).orderBy("shard", "pos").collect() == before

    # idempotent: a second pass keeps one file per shard and the rows
    stats2 = compact_partitioned_table(spark, mdir)
    assert stats2["n_files_after"] == 4
    assert read_manifest(spark, mdir).orderBy("shard", "pos").collect() == before
    # appends still work after compaction (coordinates keep growing)
    docs = spark.range(120, 130).select(F.col("id").cast("string").alias("doc_id"))
    append_to_manifest(spark, docs, mdir, seed="shuffle:42:", n_shards=4)
    assert read_manifest(spark, mdir).count() == 130


def test_compact_partitioned_table_rejects_flat_dir(spark, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import (
        compact_partitioned_table,
    )

    flat = str(tmp_path / "flat")
    _fragmented_table(spark, flat, n_files=4, n_rows=40)
    with pytest.raises(ValueError, match="partition"):
        compact_partitioned_table(spark, flat)


def test_drift_log_compacts_via_compact_table(spark, tmp_path):
    """r9 verdict item 6, s09 half: the ANN drift log is a plain
    unpartitioned append log (one 1-row file per epoch), so compact_table
    IS its maintenance entry point — rows identical, one file after,
    idempotent."""
    log = str(tmp_path / "drift_log")
    schema = (
        "epoch_id long, n_added long, mean_assign_sim double, "
        "build_center_sim double, recommend_rebuild boolean"
    )
    for e in range(5):
        spark.createDataFrame(
            [(e, 10 + e, 0.9 - e * 0.01, 0.95, False)], schema
        ).write.mode("append").parquet(log)
    before = spark.read.parquet(log).orderBy("epoch_id").collect()
    assert len(_data_files(log)) >= 5

    stats = compact_table(spark, log)
    assert stats["n_files_after"] == 1
    assert spark.read.parquet(log).orderBy("epoch_id").collect() == before
    stats2 = compact_table(spark, log)
    assert stats2["n_files_after"] == 1
    assert spark.read.parquet(log).orderBy("epoch_id").collect() == before


def test_compact_partitioned_table_recurses_to_leaf_partitions(spark, tmp_path):
    """Multi-level hive layouts (date=.../hour=...) compact at the LEAF
    dirs — rows and both partition levels byte-identical, idempotent."""
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import (
        compact_partitioned_table,
    )

    root = str(tmp_path / "two_level")
    for _ in range(3):  # three appends → ≥3 files per leaf
        (
            spark.range(40)
            .selectExpr("id", "id % 2 AS d", "id % 3 AS h")
            .write.mode("append")
            .partitionBy("d", "h")
            .parquet(root)
        )
    before = spark.read.parquet(root).orderBy("id", "d", "h").collect()
    stats = compact_partitioned_table(spark, root)
    assert stats["n_partitions"] == 6  # 2 d-values x 3 h-values
    assert stats["n_files_after"] == 6
    assert set(stats["partitions"]) == {
        f"d={d}/h={h}" for d in range(2) for h in range(3)
    }
    assert spark.read.parquet(root).orderBy("id", "d", "h").collect() == before
    stats2 = compact_partitioned_table(spark, root)
    assert stats2["n_files_after"] == 6


def test_compact_partitioned_refuses_mixed_layout(spark, tmp_path):
    """r10 ADVICE: loose data files beside key=value dirs are a corrupt
    layout — fail loudly instead of partially compacting. Commit markers
    (_SUCCESS, dotfiles) don't count as data."""
    root = str(tmp_path / "mixed")
    spark.range(10).withColumn("k", F.col("id") % 2).write.partitionBy(
        "k"
    ).parquet(root)
    # commit markers are fine
    compact_partitioned_table(spark, root)
    # a loose data file is not
    with open(os.path.join(root, "stray.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    with pytest.raises(ValueError, match="mixes data files"):
        compact_partitioned_table(spark, root)
