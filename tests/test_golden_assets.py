"""Parity against the reference repo's golden assets
(crates/pocket-tts/tests/parity_tests.rs).

The input-preprocessing check needs no model weights.  The rest require the
released checkpoint, which is gated + undownloadable in this environment; those
tests skip unless the checkpoint is reachable (set POCKET_TTS_WEIGHTS), and
encode exactly the reference's tolerances so they activate unmodified once
weights are present.
"""

import os
from pathlib import Path

import numpy as np
import pytest

ASSETS = Path("/root/reference/assets")

if not ASSETS.exists():
    pytest.skip("reference assets unavailable", allow_module_level=True)

# Synthetic-checkpoint mode (tests/test_weights_gate.py): a fake "released"
# checkpoint proves the whole gated path RUNS — loading, conversion, every
# model stage — but only the true released weights can satisfy the reference
# tolerances, so those final comparisons xfail instead of failing the run.
SYNTHETIC = os.environ.get("POCKET_TTS_SYNTHETIC_CHECKPOINT") == "1"


def _tolerance(cond: bool, what: str) -> None:
    """Assert a golden-asset tolerance; under a synthetic checkpoint a miss
    is an expected failure (the path executed — the VALUES need real weights).
    Shape/sanity asserts stay unconditional: they must hold for any weights."""
    if SYNTHETIC and not cond:
        pytest.xfail(f"{what}: requires the released checkpoint "
                     f"(synthetic-checkpoint run exercised the full path)")
    assert cond, what


def _load(name: str) -> dict:
    from safetensors import safe_open

    out = {}
    with safe_open(str(ASSETS / name), framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k).astype(np.float32)
    return out


def test_input_preprocessing_parity():
    """WAV read + polyphase resample + frame padding vs ref_mimi_input
    (parity_tests.rs:378-433, tolerance 0.3; scipy matches the oracle's
    resampler exactly so we demand far tighter)."""
    from pocket_tts_tpu import audio as audio_io

    wav, sr = audio_io.read_wav(ASSETS / "ref.wav")
    wav = audio_io.convert_audio(wav, sr, 24000, 1)
    x = wav[None]  # [1, 1, T]
    t = x.shape[-1]
    pad = (-t) % 1920
    x = np.pad(x, ((0, 0), (0, 0), (0, pad)))

    ref = _load("ref_mimi_input.safetensors")["mimi_input"]
    assert x.shape == ref.shape, (x.shape, ref.shape)
    assert np.abs(x - ref).max() < 1e-3


@pytest.fixture(scope="module")
def real_model():
    from pocket_tts_tpu.tts import TTSModel

    model = TTSModel.load(temp=0.0)
    if not model.has_real_weights:
        pytest.skip("released checkpoint not reachable (set POCKET_TTS_WEIGHTS)")
    return model


def test_voice_conditioning_parity(real_model):
    """ref.wav -> Mimi encoder -> speaker projection vs ref_voice_conditioning
    (parity_tests.rs:60-142, tolerance 2e-2)."""
    from pocket_tts_tpu import audio as audio_io

    wav, sr = audio_io.read_wav(ASSETS / "ref.wav")
    wav = audio_io.convert_audio(wav, sr, 24000, 1)
    cond, n_frames = real_model.engine.encode_voice(wav)
    ref = _load("ref_voice_conditioning.safetensors")["voice_conditioning"]
    cond = np.asarray(cond, np.float32)[:, :n_frames]
    assert cond.shape == ref.shape, (cond.shape, ref.shape)
    _tolerance(np.abs(cond - ref).max() < 2e-2, "voice conditioning <= 2e-2")


def test_decoder_stage_parity(real_model):
    """Per-stage decoder parity from a recorded FlowLM latent
    (parity_tests.rs:520-612: upsample/transformer <=0.05, audio <=0.1)."""
    import jax.numpy as jnp

    from pocket_tts_tpu.models import flow_lm, mimi

    refs = _load("ref_decoder_intermediates.safetensors")
    params = real_model.params
    plans = mimi.MimiPlans(real_model.config.mimi)

    latent = jnp.asarray(refs["latent_from_flowlm"])  # [1, 1, 32]
    denorm = flow_lm.denormalize(params["flow_lm"], latent)
    assert np.asarray(denorm).shape == refs["denormalized"].shape
    _tolerance(np.abs(np.asarray(denorm) - refs["denormalized"]).max() < 1e-3,
               "denormalize <= 1e-3")

    q = mimi.quantize(params["mimi"], denorm.transpose(0, 2, 1))
    _tolerance(np.abs(np.asarray(q) - refs["quantized"]).max() < 1e-2,
               "quantize <= 1e-2")

    state = mimi.init_decode_state(plans, 1)
    audio, _ = mimi.decode_step(params["mimi"], plans, state, denorm.transpose(0, 2, 1))
    assert np.isfinite(np.asarray(audio)).all()
    _tolerance(np.abs(np.asarray(audio) - refs["final_audio"]).max() < 0.1,
               "decoded audio <= 0.1")


def test_e2e_generation_sanity(real_model):
    """temp=0 generation bounds vs ref_output.wav
    (parity_tests.rs:436-518: length ratio 0.2-5.0x, amplitude bounds)."""
    from pocket_tts_tpu import audio as audio_io

    ref, _ = audio_io.read_wav(ASSETS / "ref_output.wav")
    wav = real_model.generate("Hello, world!")
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0
    ratio = wav.size / ref.shape[-1]
    _tolerance(0.2 < ratio < 5.0, f"length ratio {ratio:.2f} in (0.2, 5.0)")
    _tolerance(np.abs(wav).max() > 0.01, "audible amplitude")
