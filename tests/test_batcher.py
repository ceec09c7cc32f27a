"""Continuous batcher: batched output must equal single-stream output at temp=0;
concurrent requests, pauses, per-request params, segment-parallel reassembly."""

import threading

import numpy as np
import pytest

from pocket_tts_tpu import weights
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.runtime.batcher import ContinuousBatcher
from pocket_tts_tpu.runtime.engine import GenParams
from pocket_tts_tpu.tts import TTSModel
from tests.test_tts import CFG


@pytest.fixture(scope="module")
def model():
    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    return TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)


@pytest.fixture(scope="module")
def batcher(model):
    b = ContinuousBatcher(model, batch_size=3, chunk_frames=4)
    b.start()
    yield b
    b.stop()


def test_batched_equals_single_stream(model, batcher):
    text = "Hello there, this is a batching test."
    single = model.generate_with_pauses(text)
    batched = batcher.generate(text)
    assert batched.shape == single.shape
    np.testing.assert_allclose(batched, single, atol=1e-4)


def test_concurrent_requests(model, batcher):
    texts = ["First request speaking now.", "Second one talking too.",
             "Third request in the batch.", "Fourth arrives later."]
    singles = [model.generate_with_pauses(t) for t in texts]
    results = [None] * len(texts)

    def run(i):
        results[i] = batcher.generate(texts[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(texts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, (got, want) in enumerate(zip(results, singles)):
        assert got is not None, i
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"req {i}")


def test_pause_handling(batcher, model):
    out = batcher.generate("Hello there everyone. [pause:300ms] Goodbye now.")
    n_silence = int(0.3 * model.sample_rate)
    a = batcher.generate("Hello there everyone.")
    b = batcher.generate("Goodbye now.")
    assert out.size == a.size + n_silence + b.size


def test_multisegment_request_ordered(batcher, model):
    """A long text splits into segments that run in parallel slots; output must
    still be the ordered concatenation (== the serial single-stream result)."""
    sent = "This sentence has exactly enough words to be a decent chunk of text. "
    text = sent * 3  # > 50 tokens => multiple segments
    single = model.generate_with_pauses(text)
    batched = batcher.generate(text)
    assert batched.shape == single.shape
    np.testing.assert_allclose(batched, single, atol=1e-4)


def test_voice_state_respected(batcher, model):
    rng = np.random.default_rng(7)
    vs = model.get_voice_state_from_audio(
        rng.normal(size=24000).astype(np.float32) * 0.1)
    single = model.generate_with_pauses("Voice in the batcher.", vs)
    batched = batcher.generate("Voice in the batcher.", vs)
    np.testing.assert_allclose(batched, single, atol=1e-4)


def test_empty_text(batcher):
    with pytest.raises(ValueError):
        batcher.generate("   ")
