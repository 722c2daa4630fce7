"""The __main__ CLI: generate -> build --test -> test over a tmp warehouse."""

from __future__ import annotations

from stock_crypto_data_pipeline_public_spark.__main__ import (
    cmd_build,
    cmd_generate,
    cmd_models,
    cmd_test,
)


class _A:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_cli_generate_build_test_roundtrip(spark, tmp_path, capsys):
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    marts = str(tmp_path / "marts")

    rc = cmd_generate(
        _A(landing=landing, seed=7, corporates=5, customers=25, transactions=80,
           run_ts="20240102_030405"),
        spark,
    )
    assert rc == 0

    rc = cmd_build(
        _A(landing=landing, warehouse=wh, select=None, tags=None, write=marts, test=True),
        spark,
    )
    assert rc == 0, capsys.readouterr().out
    out = capsys.readouterr().out
    assert "built" in out and "quality checks passed" in out

    # marts were materialized
    assert spark.read.parquet(f"{marts}/fct_transactions").count() > 0

    # standalone test command over the built warehouse
    assert cmd_test(_A(warehouse=wh), spark) == 0

    # replay the same landing files: idempotent, still green
    rc = cmd_build(
        _A(landing=landing, warehouse=wh, select=None, tags=None, write=None, test=False),
        spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "+0 rows" in out  # every table appended nothing on replay


def test_cli_tag_selection_builds_subset(spark, tmp_path, capsys):
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    cmd_generate(
        _A(landing=landing, seed=3, corporates=4, customers=12, transactions=30,
           run_ts="20240101_000000"),
        spark,
    )
    rc = cmd_build(
        _A(landing=landing, warehouse=wh, select=None, tags=["hub"], write=None, test=False),
        spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "hub_customer" in out and "fct_transactions" not in out


def test_cli_models_lists_registry(capsys):
    assert cmd_models(_A()) == 0
    out = capsys.readouterr().out
    assert "fct_transactions" in out and "mart" in out


def test_cli_state_modified_flow(tmp_path, capsys):
    """The reference's CI selection (dbt -s state:modified+): write the
    manifest, no drift lists nothing, a dropped fingerprint lists the model
    plus its descendants."""
    import json

    man = str(tmp_path / "manifest.json")
    assert cmd_models(_A(write_manifest=man)) == 0
    capsys.readouterr()
    assert cmd_models(_A(modified_since=man, no_plus=False)) == 0
    assert capsys.readouterr().out.strip() == ""

    m = json.load(open(man))
    del m["hub_customer"]
    man2 = str(tmp_path / "m2.json")
    json.dump(m, open(man2, "w"))
    assert cmd_models(_A(modified_since=man2, no_plus=False)) == 0
    listed = capsys.readouterr().out.split()
    assert "hub_customer" in listed and "dim_customer" in listed
    assert cmd_models(_A(modified_since=man2, no_plus=True)) == 0
    assert capsys.readouterr().out.split() == ["hub_customer"]


def test_cli_incremental_and_compact(spark, tmp_path, capsys):
    """`incremental` ticks the vault (idempotent on replay) and `--compact`
    runs the maintenance pass; `compact` works standalone on one table."""
    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_compact, cmd_incremental

    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    vault = str(tmp_path / "vault")
    assert cmd_generate(
        _A(landing=landing, seed=9, corporates=5, customers=20, transactions=60,
           run_ts="20240103_040506"),
        spark,
    ) == 0
    assert cmd_build(
        _A(landing=landing, warehouse=wh, select=None, tags=None, write=None, test=False),
        spark,
    ) == 0
    rc = cmd_incremental(_A(warehouse=wh, vault=vault, compact=False, min_files=8), spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "incremental run complete" in out and "hub_customer" in out
    # replay: zero rows appended, compaction path exercised
    rc = cmd_incremental(_A(warehouse=wh, vault=vault, compact=True, min_files=1), spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "+0 rows" in out and ("compacted" in out or "nothing fragmented" in out)
    # standalone compact over one raw table
    rc = cmd_compact(
        _A(path=f"{vault}/hub_customer", target_bytes=1 << 40, sort_cols=None), spark
    )
    assert rc == 0
    assert "-> 1 files" in capsys.readouterr().out
    # per-partition compact over a hive-partitioned append log (the s12
    # shard-manifest layout; r9 verdict item 6)
    hive = str(tmp_path / "hive_log")
    for _ in range(3):
        spark.range(20).selectExpr("id", "id % 2 AS shard").write.mode(
            "append"
        ).partitionBy("shard").parquet(hive)
    rc = cmd_compact(
        _A(
            path=hive,
            target_bytes=1 << 40,
            sort_cols=None,
            per_partition=True,
        ),
        spark,
    )
    assert rc == 0
    assert "across 2 partitions" in capsys.readouterr().out
    assert spark.read.parquet(hive).count() == 60


def test_cli_zorder_and_profile(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.__main__ import (
        cmd_profile,
        cmd_zorder,
    )

    path = str(tmp_path / "tbl")
    n = 64
    (
        spark.range(n * n)
        .select(
            F.col("id"),
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
        .repartition(16)
        .write.parquet(path)
    )
    rows_before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    assert cmd_zorder(_A(path=path, by=["x", "y"], files=8), spark) == 0
    out = capsys.readouterr().out
    assert "z-ordered" in out and "-> " in out
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == rows_before
    import os
    assert not any("__staging__" in d for d in os.listdir(str(tmp_path)))

    assert cmd_profile(_A(path=path), spark) == 0
    out = capsys.readouterr().out
    assert "x" in out and f"rows={n*n}" in out and "~distinct=" in out


def test_cli_drift(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_drift
    from stock_crypto_data_pipeline_public_spark.operators.annindex import (
        build_ann_index,
    )
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    centroids = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    idx = str(tmp_path / "idx")
    build_ann_index(spark, emb.filter(F.col("vec_id") < 100), idx, centroids, 64)
    batch = str(tmp_path / "batch")
    emb.filter(F.col("vec_id") >= 100).select("vec_id", "embedding").write.parquet(batch)

    class _A:
        index_dir, dim, id_col, vec_col = idx, 64, "vec_id", "embedding"

    _A.batch = batch
    assert cmd_drift(_A, spark) == 0
    out = capsys.readouterr().out
    assert "in distribution" in out and "batch_mean_sim" in out


def test_cli_history(spark, tmp_path, capsys):
    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_history
    from stock_crypto_data_pipeline_public_spark.operators import manifest as MF

    path = str(tmp_path / "t")
    for n in (3, 4, 5):
        MF.commit_generation(path, lambda g, n=n: spark.range(n).write.parquet(g))

    class _A:
        pass

    _A.path = path
    assert cmd_history(_A) == 0
    out = capsys.readouterr().out
    assert "3 commits, 2 retained" in out
    _A.path = str(tmp_path / "nope")
    assert cmd_history(_A) == 1


def test_cli_media_features(spark, sf_dir, tmp_path, capsys):
    """media-features decodes a parquet media table through the real
    codecs and writes the narrow feature table."""
    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_media_features
    from stock_crypto_data_pipeline_public_spark.operators import multimodal as M
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(12)
    media_dir = str(tmp_path / "media")
    out_dir = str(tmp_path / "features")
    M.synthesize_jpeg(docs).write.parquet(media_dir)

    rc = cmd_media_features(_A(path=media_dir, out=out_dir, fake=False), spark)
    assert rc == 0
    assert "wrote 12 feature rows" in capsys.readouterr().out
    feats = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, r in feats.items():
        assert r.width == 8 * (2 + doc_id % 6)
        assert r.height == 8 * (2 + (len(src[doc_id] or "") % 6))


def test_cli_shuffle_manifest_build_and_grow(spark, sf_dir, tmp_path, capsys):
    """shuffle-manifest builds a shard-partitioned manifest, then grows it
    append-only: existing coordinates unchanged, replay a no-op."""
    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_shuffle_manifest
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    old_dir = str(tmp_path / "docs_old")
    new_dir = str(tmp_path / "docs_new")
    docs.filter("doc_id % 3 != 0").select("doc_id").write.parquet(old_dir)
    docs.select("doc_id").write.parquet(new_dir)  # includes already-manifested

    m1 = str(tmp_path / "m1")
    rc = cmd_shuffle_manifest(
        _A(docs=old_dir, out=m1, manifest=None, id_col="doc_id",
           seed="shuffle:42:", shards=4),
        spark,
    )
    assert rc == 0 and "across 4 shards" in capsys.readouterr().out
    base = {r.doc_id: (r.shard, r.pos) for r in spark.read.parquet(m1).collect()}

    m2 = str(tmp_path / "m2")
    rc = cmd_shuffle_manifest(
        _A(docs=new_dir, out=m2, manifest=m1, id_col="doc_id",
           seed="shuffle:42:", shards=4),
        spark,
    )
    assert rc == 0
    grown = {r.doc_id: (r.shard, r.pos) for r in spark.read.parquet(m2).collect()}
    assert len(grown) == docs.count()
    for doc_id, coord in base.items():
        assert grown[doc_id] == coord
    # shard partitioning is physical: directory-per-shard layout
    import os

    assert any(d.startswith("shard=") for d in os.listdir(m2))


def test_cli_delete(spark, tmp_path, capsys):
    """`delete` removes predicate-TRUE rows atomically and reports counts;
    an empty predicate is refused before touching the table."""
    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_delete

    path = str(tmp_path / "t")
    (
        spark.range(40)
        .select(F.col("id"), (F.col("id") % 4).alias("k"))
        .write.parquet(path)
    )
    rc = cmd_delete(_A(path=path, where="k = 3"), spark)
    assert rc == 0
    assert "deleted 10 of 40 rows" in capsys.readouterr().out
    assert spark.read.parquet(path).count() == 30

    rc = cmd_delete(_A(path=path, where="   "), spark)
    assert rc == 2
    assert spark.read.parquet(path).count() == 30


def test_cli_lifecycle_smoke(spark, tmp_path, capsys):
    """The ops one-shot: every manifest-protocol step chained, each
    asserted reader-visible, final content checked exactly."""
    from stock_crypto_data_pipeline_public_spark.__main__ import cmd_lifecycle
    from stock_crypto_data_pipeline_public_spark.operators import manifest as MF

    path = str(tmp_path / "lifecycle_tbl")
    assert cmd_lifecycle(_A(path=path), spark) == 0
    out = capsys.readouterr().out
    for step in ("write", "merge", "compact", "zorder", "delete", "vacuum"):
        assert f"[{step:8s}] ok" in out, out
    assert "all 6 steps" in out
    # table kept when --path given: one retained generation, 99 rows
    assert MF.read_table(spark, path).count() == 99
    assert sum(e["retained"] for e in MF.history(path)) == 1

    # a corrupted live generation must flip the exit code (exit 1, not crash)
    import shutil

    live = MF.resolve_table(path)
    shutil.rmtree(live)
    spark.range(3).selectExpr("id AS k", "cast(0 as double) AS v",
                              "CAST(1 AS BIGINT) AS ver").write.parquet(live)
    path2 = str(tmp_path / "fresh")
    assert cmd_lifecycle(_A(path=path2), spark) == 0  # fresh path still green


def test_cli_psi_drift_alert(spark, tmp_path):
    """`psi` (operators/drift.py): identical slices exit 0 with psi ~0;
    a hard shift exits 2 at the default 0.2 threshold; single-table mode
    requires --where slices."""
    import json

    from stock_crypto_data_pipeline_public_spark.__main__ import main

    base = str(tmp_path / "vals")
    spark.range(2000).selectExpr(
        "id", "CAST(id % 100 AS DOUBLE) AS v", "id % 2 AS half"
    ).write.parquet(base)

    # identical distributions on both halves (id%100 independent of id%2)
    rc = main([
        "--cpus", "4", "psi", "--a", base, "--col", "v",
        "--edges", "10,25,50,75",
        "--where-a", "half = 0", "--where-b", "half = 1",
    ])
    assert rc == 0

    # shifted comparison table: everything lands in the top bin
    shifted = str(tmp_path / "shifted")
    spark.range(2000).selectExpr("CAST(90 AS DOUBLE) AS v").write.parquet(shifted)
    rc = main([
        "--cpus", "4", "psi", "--a", base, "--b", shifted,
        "--col", "v", "--edges", "10,25,50,75",
    ])
    assert rc == 2

    # single table without slices is a usage error
    rc = main(["--cpus", "4", "psi", "--a", base, "--col", "v", "--edges", "10"])
    assert rc == 1
