"""audio_spectral_peak: FFT physics on planted tones, downmix, quarantine
rows, and the m6 query's synthesis contract."""

from __future__ import annotations

import numpy as np

from etl_hiscox_spark.operators.multimodal import audio_spectral_peak, encode_wav


def _tone(n, tone_bin, amp=1000.0):
    t = np.arange(n, dtype=np.float64)
    return np.round(amp * np.sin(2.0 * np.pi * tone_bin * t / n)).astype(np.int16)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "path string, content binary")
    return {r["path"]: r for r in audio_spectral_peak(df).collect()}


def test_planted_tone_bin_and_magnitude(spark):
    n, b = 256, 17
    out = _run(spark, [("t", bytearray(encode_wav(_tone(n, b), 8000)))])["t"]
    assert out["n_samples"] == n
    assert out["peak_bin"] == b
    assert abs(out["peak_freq_hz"] - b * 8000.0 / n) < 1e-12
    # pure tone of amplitude A concentrates |rfft| ~= A*n/2 at its bin
    assert abs(out["peak_mag"] - 1000.0 * n / 2) / (1000.0 * n / 2) < 0.01


def test_stereo_downmix_same_bin(spark):
    n, b = 128, 9
    mono = _tone(n, b)
    stereo = np.stack([mono, mono], axis=1)
    out = _run(spark, [("s", bytearray(encode_wav(stereo, 8000)))])["s"]
    assert out["peak_bin"] == b


def test_dc_offset_excluded(spark):
    # constant clip: all energy in bin 0, which is excluded -> argmax falls
    # on some tiny-noise bin but NEVER reports bin 0
    clip = np.full(64, 500, dtype=np.int16)
    out = _run(spark, [("dc", bytearray(encode_wav(clip, 8000)))])["dc"]
    assert out["peak_bin"] >= 1


def test_quarantine_rows_null(spark):
    out = _run(
        spark,
        [
            ("bad", bytearray(b"not a wav at all")),
            ("short", bytearray(encode_wav(np.array([1, 2], dtype=np.int16), 8000))),
            ("ok", bytearray(encode_wav(_tone(64, 5), 8000))),
        ],
    )
    assert out["bad"]["peak_bin"] is None
    assert out["short"]["peak_bin"] is None
    assert out["ok"]["peak_bin"] == 5


def test_m6_query_matches_synthesis(spark, sf_dir):
    from etl_hiscox_spark.queries.llm import m6_audio_spectral_peak

    rows = m6_audio_spectral_peak(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:20]:
        i = int(r["path"])
        n, b = 128 + 64 * (i % 3), 3 + i % 50
        assert r["n_samples"] == n
        assert r["peak_bin"] == b
        assert abs(r["peak_freq_hz"] - round(b * 8000.0 / n, 6)) < 1e-9


def test_band_fingerprint_ordering_and_invariance(spark):
    """Fingerprint bits follow planted band-energy order; amplitude
    scaling (volume change) leaves the fingerprint unchanged; garbage and
    too-short clips quarantine."""
    import numpy as np

    from etl_hiscox_spark.operators.multimodal import (
        audio_band_fingerprint,
        encode_wav,
    )

    bands = [(4, 11), (11, 18), (18, 25), (25, 32)]
    n = 128
    t = np.arange(n, dtype=np.float64)

    def clip(amps, scale=1.0):
        v = np.zeros(n)
        for b, (lo, _hi) in enumerate(bands):
            v += scale * amps[b] * np.sin(2.0 * np.pi * (lo + 2) * t / n)
        return bytearray(encode_wav(np.round(v).astype(np.int16), 8000))

    amps = [1500, 400, 900, 1200]  # expected bits: 1>0? yes; 0>2? no; 2>3? no -> '100'
    rows = [
        ("a", clip(amps)),
        ("half", clip(amps, scale=0.5)),  # volume change
        ("bad", bytearray(b"not audio")),
        ("short", bytearray(encode_wav(np.zeros(16, dtype=np.int16), 8000))),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r for r in audio_band_fingerprint(df, bands).collect()}
    assert out["a"]["fingerprint"] == "100"
    assert out["half"]["fingerprint"] == "100"  # ordinal bits survive volume
    assert out["bad"]["fingerprint"] is None
    assert out["short"]["fingerprint"] is None


def test_band_fingerprint_rejects_degenerate_plan(spark):
    import pytest

    from etl_hiscox_spark.operators.multimodal import audio_band_fingerprint

    df = spark.createDataFrame([("x", bytearray(b""))], "path string, content binary")
    with pytest.raises(ValueError, match="at least two bands"):
        audio_band_fingerprint(df, [(0, 4)])
