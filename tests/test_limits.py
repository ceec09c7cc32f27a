"""Resource-bound guards: long voice prompts and generation budgets stay within
the engine's static allocations (the reference's tests/memory_usage.rs analogue
— here the bound is structural: every buffer is preallocated)."""

import logging

import numpy as np
import pytest

from pocket_tts_tpu import weights
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.runtime.engine import GenParams
from pocket_tts_tpu.tts import TTSModel
from tests.test_tts import CFG


@pytest.fixture(scope="module")
def model():
    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    return TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)


def test_overlong_voice_prompt_truncates(model, caplog):
    """Prompts beyond the largest encode bucket stream chunked (no 30 s-style
    cut); only the FlowLM cache budget truncates, with a warning.  Cap here:
    max_seq 512 - (64-token text bucket + 64 generation frames) = 384 frames."""
    import dataclasses

    from pocket_tts_tpu.runtime.engine import GenParams as GP
    from pocket_tts_tpu.tts import TTSModel as TM

    cfg = dataclasses.replace(
        CFG, runtime=dataclasses.replace(CFG.runtime, max_seq=384,
                                         voice_prompt_chunk_frames=32))
    m2 = TM(cfg, model.params, gen=GP(temp=0.0), has_real_weights=False)
    cap = 384 - (max(cfg.runtime.text_buckets) + 192)  # 128 frames
    wav = np.random.default_rng(0).normal(
        size=(cap + 20) * m2.frame_size).astype(np.float32) * 0.1
    with caplog.at_level(logging.WARNING):
        vs = m2.get_voice_state_from_audio(wav)
    assert vs.length == cap
    assert any("truncating" in r.message for r in caplog.records)


def test_compress_overflow_sink_plus_recency(model, caplog):
    """overflow="compress" (VERDICT r4 #9): an over-budget prompt keeps the
    first budget/4 frames (speaker-identity onset / attention sink) plus the
    most recent 3*budget/4 frames, instead of losing the entire recent half
    to head truncation.  Verified against a direct prefill of the manually
    spliced waveform-equivalent conditioning."""
    import dataclasses

    import jax

    from pocket_tts_tpu.runtime.engine import GenParams as GP
    from pocket_tts_tpu.tts import TTSModel as TM

    cfg = dataclasses.replace(
        CFG, runtime=dataclasses.replace(CFG.runtime, max_seq=384,
                                         voice_prompt_chunk_frames=32))
    m2 = TM(cfg, model.params, gen=GP(temp=0.0), has_real_weights=False)
    budget = 384 - (max(cfg.runtime.text_buckets) + 192)  # 128 frames
    over = budget + 40
    wav = np.random.default_rng(1).normal(
        size=over * m2.frame_size).astype(np.float32) * 0.1
    with caplog.at_level(logging.INFO):
        vs = m2.get_voice_state_from_audio(wav, overflow="compress")
    assert vs.length == budget
    assert "sink" in caplog.text
    # reference: encode the whole prompt uncapped and prefill the same
    # frame selection directly
    cond, n_frames = m2.engine.encode_voice(wav, cap=False)
    assert n_frames == over  # cap=False really encoded everything
    full = np.asarray(jax.device_get(cond), np.float32)
    sink = budget // 4
    sel = np.concatenate(
        [full[:, :sink], full[:, n_frames - (budget - sink): n_frames]],
        axis=1)
    direct = m2._prefill_voice(sel, budget)
    a = m2.generate("Compressed voice speaks.", vs)
    b = m2.generate("Compressed voice speaks.", direct)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # and the STATE differs from plain head-truncation (the old behavior) —
    # audio divergence can't be the assert with random weights: swapping
    # which statistically-identical random frames condition the cache moves
    # the output by only ~3e-5 (real speech frames are not exchangeable)
    trunc = m2.get_voice_state_from_audio(wav)  # default overflow
    kc_c = np.asarray(jax.device_get(vs.kc))
    kc_t = np.asarray(jax.device_get(trunc.kc))
    assert np.abs(kc_c - kc_t).max() > 1e-3


def test_compress_overflow_noop_under_budget(model, monkeypatch):
    """Under the budget, compress == truncate == plain (same state); the
    POCKET_TTS_VOICE_OVERFLOW env knob sets the process default."""
    import jax

    wav = np.random.default_rng(2).normal(
        size=20 * model.frame_size).astype(np.float32) * 0.1
    v1 = model.get_voice_state_from_audio(wav, overflow="compress")
    v2 = model.get_voice_state_from_audio(wav)
    assert v1.length == v2.length == 20
    np.testing.assert_array_equal(np.asarray(jax.device_get(v1.kc)),
                                  np.asarray(jax.device_get(v2.kc)))
    with pytest.raises(ValueError, match="overflow"):
        model.get_voice_state_from_audio(wav, overflow="middle-out")
    monkeypatch.setenv("POCKET_TTS_VOICE_OVERFLOW", "sideways")
    with pytest.raises(ValueError, match="overflow"):
        model.get_voice_state_from_audio(wav)  # env default is validated too
    monkeypatch.setenv("POCKET_TTS_VOICE_OVERFLOW", "compress")
    v3 = model.get_voice_state_from_audio(wav)  # valid env default applies
    assert v3.length == 20


def test_generation_respects_cache_budget(model):
    """max_seq bounds generation: a long text with a long voice prompt cannot
    overrun the KV cache (frames get clipped, not corrupted)."""
    wav = np.random.default_rng(1).normal(size=24000 * 2).astype(np.float32) * 0.1
    vs = model.get_voice_state_from_audio(wav)
    text = "word " * 200  # frame budget far beyond max_seq
    wav_out = model.generate(text, vs)
    frames = wav_out.size // model.frame_size
    assert frames <= CFG.runtime.max_seq
    assert np.isfinite(wav_out).all()


def test_text_over_bucket_raises_cleanly(model):
    """A single segment cannot exceed the largest text bucket; the chunker
    keeps segments <=50 tokens so this only triggers on direct engine misuse."""
    from pocket_tts_tpu import text as text_mod

    too_long = np.zeros((1, CFG.runtime.text_buckets[-1] + 1), np.int32)
    with pytest.raises(ValueError, match="exceeds largest bucket"):
        model.engine.prefill_tokens(model.engine.new_state(), too_long, 10)
    # while the public path stays within budget
    chunks = text_mod.split_into_best_sentences(model.tokenizer, "word " * 300)
    for c in chunks:
        assert model.tokenizer.count_tokens(c) <= 64


def test_overlong_prompt_clips_to_most_recent(caplog):
    """Conditioning longer than the cache budget must clip to its most
    recent frames (with a warning) instead of silently writing past the
    cache and generating nothing."""
    import logging

    import jax
    import numpy as np

    from pocket_tts_tpu import weights
    from pocket_tts_tpu.models.mimi import MimiPlans
    from pocket_tts_tpu.runtime.engine import GenParams
    from pocket_tts_tpu.tts import TTSModel
    from tests.test_tts import CFG

    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    model = TTSModel(CFG, params, gen=GenParams(temp=0.0),
                     has_real_weights=False)
    d = CFG.flow_lm.transformer.d_model
    n = CFG.runtime.max_seq + 40
    prompt = (np.random.default_rng(0).normal(size=(1, n, d)) * 0.05
              ).astype(np.float32)
    with caplog.at_level(logging.WARNING):
        vs = model.get_voice_state_from_prompt(prompt)
    assert "most recent" in caplog.text
    room = CFG.runtime.max_seq - model.engine.prompt_reserve
    assert vs.length == room
    assert int(np.asarray(jax.device_get(vs.pos))[0]) == room
    wav = model.generate("Overlong prompt still speaks.", vs)
    assert wav.size > 0 and np.isfinite(wav).all()
    # clipping keeps the TAIL: equals a direct prefill of the last `room`
    direct = model.get_voice_state_from_prompt(prompt[:, -room:])
    a = model.generate("Tail equality.", vs)
    b = model.generate("Tail equality.", direct)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_max_seq_load_override():
    """load_with_params(max_seq=...) enlarges the FlowLM cache and re-derives
    the window buckets (longer voice prompts than the default ~71 s bound)."""
    import pytest as _pytest

    from pocket_tts_tpu.tts import TTSModel

    model = TTSModel.load_with_params(max_seq=1536)
    rcfg = model.engine._rcfg
    assert rcfg.max_seq == 1536
    assert rcfg.window_buckets == tuple(range(256, 1536, 256))
    with _pytest.raises(ValueError, match="max_seq"):
        TTSModel.load_with_params(max_seq=100)
