"""Stage (pipeline) parallelism: AR scan and Mimi codec on separate devices.

The fused single-device decode program and the staged two-device split must
produce identical audio — same ops in the same order, chained by one
device-to-device latent transfer (engine.enable_staged_codec).  Runs on the
CPU mesh (conftest forces 8 virtual devices).
"""

import numpy as np
import pytest

import jax

from pocket_tts_tpu import weights
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.runtime.engine import Engine, GenParams
from pocket_tts_tpu.tts import TTSModel
from tests.test_tts import CFG

TEXT = ("The first sentence sets the voice in motion and keeps a steady "
        "measured pace through every single word of this opening line. "
        "The second sentence should carry that same voice onward without "
        "resetting the established prosody at the segment boundary here.")


@pytest.fixture(scope="module")
def params():
    return weights.random_params(CFG, MimiPlans(CFG.mimi), seed=3)


def _model(params, staged: bool) -> TTSModel:
    m = TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)
    if staged:
        m.engine.enable_staged_codec(jax.devices()[1])
    return m


def test_staged_codec_equals_fused(params):
    fused = _model(params, staged=False)
    staged = _model(params, staged=True)
    want = fused.generate(TEXT)
    got = staged.generate(TEXT)
    assert got.shape == want.shape
    # 1 int16 LSB (1/32767): the non-staged model takes the fused-SEGMENT
    # program (while_loop), the staged one the chunked split — last-ulp
    # float fusion differences flip an occasional PCM rounding
    np.testing.assert_allclose(got, want, atol=4e-5)
    # repeat: decode donation must never invalidate the live voice snapshot
    got2 = staged.generate(TEXT)
    np.testing.assert_allclose(got2, want, atol=4e-5)


def test_staged_codec_streaming_and_voice(params):
    """Streaming (ramp schedule) + a cloned voice through the staged split."""
    fused = _model(params, staged=False)
    staged = _model(params, staged=True)
    rng = np.random.default_rng(7)
    wav = (rng.normal(size=2 * fused.sample_rate) * 0.1).astype(np.float32)
    vs_f = fused.get_voice_state_from_audio(wav)
    vs_s = staged.get_voice_state_from_audio(wav)
    want = np.concatenate(list(fused.generate_stream("Hello there.", vs_f)))
    got = np.concatenate(list(staged.generate_stream("Hello there.", vs_s)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_staged_codec_rejects_batched_engine(params):
    eng = Engine(CFG, params, batch_size=4)
    with pytest.raises(ValueError, match="batch_size=1"):
        eng.enable_staged_codec(jax.devices()[1])


def test_staged_outputs_live_on_codec_device(params):
    """The audio buffer must come off the codec device (proving the split
    actually places the codec stage there, not just that numerics agree)."""
    staged = _model(params, staged=True)
    vs = staged.get_voice_state()
    eng = staged.engine
    st = eng.reset_for_segment(vs.as_dict())
    key = jax.random.PRNGKey(0)
    st, key, audio, is_eos = eng.decode_frames(st, key, 2, staged.gen)
    dev = jax.devices()[1]
    assert list(audio.devices()) == [dev]
    assert list(jax.tree.leaves(st["mimi"])[0].devices()) == [dev]
    assert list(st["kc"].devices()) == [jax.devices()[0]]


def test_stage_codec_env_enables_tts_not_batcher(params, monkeypatch):
    """POCKET_TTS_STAGE_CODEC=1 opts the single-stream TTSModel into the
    staged split, but must NOT capture a ContinuousBatcher's engine (even at
    batch_size=1): the batcher's slot admission never routes state through
    reset_for_segment's per-device placement, so a staged engine there would
    mix devices inside one decode call and crash the loop."""
    from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

    monkeypatch.setenv("POCKET_TTS_STAGE_CODEC", "1")
    m = TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)
    assert m.engine._codec_device is not None
    b = ContinuousBatcher(m, batch_size=1, chunk_frames=4)
    assert b.engine._codec_device is None
    # and the batcher still works end-to-end under the env var
    b.start()
    try:
        out = b.generate("Short check.")
        assert out.size > 0 and np.isfinite(out).all()
    finally:
        b.stop()
