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
