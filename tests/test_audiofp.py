"""Contract tests for operators/audiofp.py: the Haitsma-Kalker-style
band-energy-sign fingerprint is gain-invariant, the 8 synthesis groups get
8 distinct fingerprints matching the closed form, and malformed inputs
raise rather than fabricate."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from stock_crypto_data_pipeline_public_spark.operators import audiofp as AFP


def _wav(pcm: np.ndarray, sr: int = 8192, nch: int = 1, width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _fp_numpy(b: bytes) -> int:
    """Driver-side twin of the mapInPandas kernel."""
    with wave.open(io.BytesIO(b)) as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    frames = pcm[: AFP.AFP_FRAMES * AFP.AFP_FRAME_LEN].astype(np.float64)
    frames = frames.reshape(AFP.AFP_FRAMES, AFP.AFP_FRAME_LEN)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    bits = spec[:, 2:8].sum(axis=1) > spec[:, 10:16].sum(axis=1)
    return int((bits << np.arange(AFP.AFP_FRAMES)).sum())


def _tone_clip(group: int, amp: float) -> bytes:
    i = np.arange(AFP.AFP_FRAME_LEN)
    frames = []
    for f in range(AFP.AFP_FRAMES):
        b = AFP.BIN_LOW if AFP.pattern_bit(group, f) else AFP.BIN_HIGH
        frames.append(
            np.rint(amp * np.sin(2 * np.pi * b * i / AFP.AFP_FRAME_LEN)).astype("<i2")
        )
    return _wav(np.concatenate(frames))


def test_group_fingerprints_are_distinct_and_match_closed_form():
    fps = [AFP.group_fingerprint(g) for g in range(AFP.N_GROUPS)]
    assert len(set(fps)) == AFP.N_GROUPS
    assert fps[0] == 0b00001111  # frames 0-3 low-band for group 0
    for g in range(AFP.N_GROUPS):
        assert _fp_numpy(_tone_clip(g, 4000)) == fps[g]


def test_fingerprint_is_gain_invariant_but_bytes_are_not():
    a = _tone_clip(3, 4000)
    b = _tone_clip(3, 6000)
    assert a != b
    assert _fp_numpy(a) == _fp_numpy(b) == AFP.group_fingerprint(3)


def test_short_and_stereo_clips_raise(spark):
    import pandas as pd

    short = _wav(np.zeros(100, dtype="<i2"))
    stereo = _wav(np.zeros(2048, dtype="<i2"), nch=2)
    for bad, msg in ((short, "too short"), (stereo, "mono PCM-16")):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "media": [bad]})
        )
        with pytest.raises(Exception, match=msg):
            AFP.audio_fingerprint(df).collect()


def test_spark_pipeline_matches_numpy_twin(spark, sf_dir):
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(24)
    rows = AFP.audio_fingerprint(AFP.synthesize_afp_wav(docs)).collect()
    assert rows
    for r in rows:
        assert r.fingerprint == AFP.group_fingerprint(r.doc_id % AFP.N_GROUPS)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
