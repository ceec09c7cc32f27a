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
