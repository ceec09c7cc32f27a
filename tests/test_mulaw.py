"""G.711 mu-law transport: codec exactness and end-to-end engine parity.

The wire format must be audibly transparent-ish (G.711, ~37 dB SNR) and
EXACTLY bounded: decode(encode(x)) within half a companding step of x for
every int16 value, and the mulaw engine's float audio within the worst-case
step of the int16 engine's.
"""

import dataclasses

import numpy as np
import pytest

import jax

from pocket_tts_tpu import weights
from pocket_tts_tpu.config import load_variant  # noqa: F401  (parity w/ other tests)
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.ops import mulaw
from pocket_tts_tpu.runtime.engine import Engine, GenParams
from pocket_tts_tpu.tts import TTSModel
from tests.test_tts import CFG

# worst-case mu-law quantization: half the largest step (e=7 -> 1<<10),
# relative to int16 full scale
_WORST = (1 << 10) / 32767.0


def test_roundtrip_exhaustive():
    x = np.arange(-32768, 32768, dtype=np.int16)
    u = mulaw.encode_np(x)
    y = mulaw.decode(u).astype(np.int32)
    xi = np.clip(x.astype(np.int32), -32635, 32635)
    mag = np.abs(xi) + 132
    e = sum((mag >= (1 << k)).astype(np.int32) for k in range(8, 15))
    step = 1 << (e + 3)
    assert (np.abs(y - xi) <= step // 2).all()


def test_jnp_encode_matches_numpy():
    x = np.arange(-32768, 32768, dtype=np.int16)
    got = np.asarray(jax.jit(mulaw.encode)(x))
    np.testing.assert_array_equal(got, mulaw.encode_np(x))


def test_speech_band_snr():
    t = np.arange(24000)
    s = (0.3 * 32767 * np.sin(2 * np.pi * 440 * t / 24000)).astype(np.int16)
    r = mulaw.decode(mulaw.encode_np(s)).astype(np.float64)
    snr = 10 * np.log10((s.astype(np.float64) ** 2).sum()
                        / ((r - s) ** 2).sum() + 1e-12)
    assert snr > 33.0, snr


@pytest.fixture(scope="module")
def params():
    return weights.random_params(CFG, MimiPlans(CFG.mimi), seed=3)


def test_engine_mulaw_matches_int16_within_step(params):
    cfg_m = dataclasses.replace(CFG, runtime=dataclasses.replace(
        CFG.runtime, transport_format="mulaw"))
    key = jax.random.PRNGKey(0)
    toks = np.array([[3, 1, 4, 1, 5]], np.int32)
    gen = GenParams(temp=0.0)

    outs = {}
    for name, cfg in (("int16", CFG), ("mulaw", cfg_m)):
        eng = Engine(cfg, params, batch_size=1)
        st = eng.prefill_tokens(eng.new_state(1), toks, toks.shape[1])
        st, _, audio, _ = eng.decode_frames(st, key, 2, gen)
        assert np.asarray(audio).dtype == (np.uint8 if name == "mulaw"
                                           else np.int16)
        outs[name] = eng.wire_to_float(np.asarray(audio)[0])
    assert np.abs(outs["mulaw"] - outs["int16"]).max() <= _WORST


def test_tts_model_mulaw_generate(params):
    model16 = TTSModel(CFG, params, gen=GenParams(temp=0.0),
                       has_real_weights=False)
    cfg_m = dataclasses.replace(CFG, runtime=dataclasses.replace(
        CFG.runtime, transport_format="mulaw"))
    model8 = TTSModel(cfg_m, params, gen=GenParams(temp=0.0),
                      has_real_weights=False)
    text = "Wire format check."
    a = model16.generate(text)
    b = model8.generate(text)
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= _WORST
    # streaming path too
    c = np.concatenate(list(model8.generate_stream(text)))
    assert np.abs(c - a[: c.size]).max() <= _WORST


def test_transport_format_validated():
    with pytest.raises(ValueError, match="transport_format"):
        dataclasses.replace(CFG.runtime, transport_format="opus")


def test_batcher_mulaw_stream(params):
    from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

    cfg_m = dataclasses.replace(CFG, runtime=dataclasses.replace(
        CFG.runtime, transport_format="mulaw"))
    model8 = TTSModel(cfg_m, params, gen=GenParams(temp=0.0),
                      has_real_weights=False)
    model16 = TTSModel(CFG, params, gen=GenParams(temp=0.0),
                       has_real_weights=False)
    text = "Batched wire format check."
    b = ContinuousBatcher(model8, batch_size=2, chunk_frames=4)
    b.start()
    try:
        got = np.concatenate(list(b.stream(text)))
    finally:
        b.stop()
    ref = model16.generate_with_pauses(text)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= _WORST
