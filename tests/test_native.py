"""Native (C++) audio runtime parity vs the Python/scipy implementations."""

import io
import wave

import numpy as np
import pytest

from pocket_tts_tpu import audio as pyaudio
from pocket_tts_tpu import native

if not native.available():
    pytest.skip("native library unavailable (no compiler?)", allow_module_level=True)


def test_pcm_parity():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=10000) * 0.7).astype(np.float32)
    x[:3] = [2.0, -2.0, 0.0]
    assert native.pcm_i16_le_bytes(x) == pyaudio.pcm_i16_le_bytes(x)


@pytest.mark.parametrize("from_rate,to_rate", [(44100, 24000), (16000, 24000),
                                               (48000, 24000), (22050, 24000)])
def test_resample_matches_scipy(from_rate, to_rate):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, from_rate)).astype(np.float32) * 0.5
    ref = pyaudio.resample(x, from_rate, to_rate)
    got = native.resample(x, from_rate, to_rate)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5


def test_resample_identity():
    x = np.random.default_rng(2).normal(size=(1, 1000)).astype(np.float32)
    got = native.resample(x, 24000, 24000)
    np.testing.assert_array_equal(got, x)


def test_normalize_peak_parity():
    x = np.array([0.5, -2.0, 1.2], np.float32)
    np.testing.assert_allclose(native.normalize_peak(x),
                               pyaudio.normalize_peak(x), atol=1e-7)
    quiet = np.array([0.1, -0.2], np.float32)
    np.testing.assert_array_equal(native.normalize_peak(quiet), quiet)


def test_wav_encode_parses():
    sr = 24000
    x = np.sin(np.linspace(0, 50, sr)).astype(np.float32) * 0.5
    data = native.wav_bytes(x, sr)
    with wave.open(io.BytesIO(data), "rb") as f:
        assert f.getframerate() == sr
        assert f.getnchannels() == 1
        assert f.getnframes() == sr
    back, sr2 = pyaudio.read_wav(data)
    assert sr2 == sr
    assert np.abs(back[0] - x).max() < 1e-3


def test_wav_encode_matches_python():
    x = np.random.default_rng(3).normal(size=4321).astype(np.float32) * 0.5
    assert native.wav_bytes(x, 24000) == pyaudio.wav_bytes(x, 24000)


def test_input_preprocessing_parity_native():
    """The golden-asset input check again, through the native resampler."""
    from pathlib import Path

    assets = Path("/root/reference/assets")
    if not assets.exists():
        pytest.skip("reference assets unavailable")
    from safetensors import safe_open

    wav, sr = pyaudio.read_wav(assets / "ref.wav")
    res = native.resample(wav, sr, 24000)
    x = res[None]
    pad = (-x.shape[-1]) % 1920
    x = np.pad(x, ((0, 0), (0, 0), (0, pad)))
    with safe_open(str(assets / "ref_mimi_input.safetensors"),
                   framework="numpy") as f:
        ref = f.get_tensor("mimi_input").astype(np.float32)
    if x.shape == ref.shape:
        assert np.abs(x - ref).max() < 1e-3


def test_pcm_nan_is_zero():
    """NaN samples must convert to 0 on BOTH paths (numpy defines it; the
    C++ cast was UB — review finding r4) so native and fallback WAV bytes
    never diverge."""
    import numpy as np

    from pocket_tts_tpu import audio, native

    x = np.array([float("nan"), 0.25, float("-nan"), -0.25], np.float32)
    py = np.clip(x, -1.0, 1.0)
    py_vals = (np.where(np.isnan(py), 0.0, py) * 32767.0).astype("<i2")
    got = np.frombuffer(audio.pcm_i16_le_bytes(x), "<i2")
    assert got[0] == 0 and got[2] == 0
    np.testing.assert_array_equal(got, py_vals)
    if native.available():
        nat = np.frombuffer(native.pcm_i16_le_bytes(x), "<i2")
        np.testing.assert_array_equal(nat, got)
