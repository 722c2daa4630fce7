"""scratch.py — ephemeral scratch placement (r11 optimization round)."""

import os

from stock_crypto_data_pipeline_public_spark.scratch import mkscratch, scratch_base


def test_env_override_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", str(tmp_path))
    assert scratch_base() == str(tmp_path)
    d = mkscratch("unit_")
    try:
        assert d.startswith(str(tmp_path))
        assert os.path.isdir(d)
    finally:
        os.rmdir(d)


def test_default_is_usable_dir(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_DIR", raising=False)
    base = scratch_base()
    assert os.path.isdir(base) and os.access(base, os.W_OK)
    d = mkscratch("unit_")
    try:
        assert os.path.isdir(d) and d.startswith(base)
    finally:
        os.rmdir(d)
