"""Continuous batcher: batched output must equal single-stream output at temp=0;
concurrent requests, pauses, per-request params, segment-parallel reassembly."""

import threading

import jax

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


def test_mixed_lsd_and_clamp_concurrent(model, batcher):
    """Per-request lsd_decode_steps / noise_clamp ride the batch as per-slot
    data (masked Euler steps, data-driven truncation): concurrent requests with
    DIFFERENT knobs must each match their own single-stream result — no
    single-flight fallback, no cross-contamination between slots."""
    text = "Mixed knob requests share one batch."
    gens = [GenParams(temp=0.0, lsd_decode_steps=1),
            GenParams(temp=0.0, lsd_decode_steps=2),
            GenParams(temp=0.0, lsd_decode_steps=3, noise_clamp=0.5)]
    singles = [model.with_params(lsd_decode_steps=g.lsd_decode_steps,
                                 noise_clamp=g.noise_clamp)
               .generate_with_pauses(text) for g in gens]
    # lsd must actually change the audio, or this test proves nothing
    assert not np.allclose(singles[0], singles[1], atol=1e-4)
    results = [None] * len(gens)

    def run(i):
        results[i] = batcher.generate(text, gen=gens[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(gens))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, (got, want) in enumerate(zip(results, singles)):
        assert got is not None, i
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"req {i}")


def test_window_bucket_crossing():
    """Regression: the batcher's attention window must cover the DISPATCHED
    frontier (frames_done lags one chunk behind in the pipeline).  A voice
    prompt pushes base_pos near the 256 window bucket so the generation
    crosses it mid-segment; a stale window clamps KV writes onto the bucket
    edge and corrupts all later audio."""
    import dataclasses

    from pocket_tts_tpu.config import RuntimeConfig

    cfg = dataclasses.replace(
        CFG, runtime=RuntimeConfig(
            max_seq=512, text_buckets=(16, 32, 64),
            prompt_buckets=(256,), decode_chunks=(2, 4, 8),
            encode_seconds_buckets=(1.0, 2.0), window_buckets=(256,),
            compute_dtype="float32"))
    plans = MimiPlans(cfg.mimi)
    params = weights.random_params(cfg, plans, seed=3)
    # eos_threshold=inf: random weights EOS immediately otherwise, and the
    # crossing needs ~16+ generated frames
    model = TTSModel(cfg, params, gen=GenParams(temp=0.0, eos_threshold=float("inf")),
                     has_real_weights=False)
    # 230-frame conditioning prompt -> base_pos ~= 244, right under the 256 bucket
    rng = np.random.default_rng(11)
    prompt = rng.normal(size=(1, 230, cfg.flow_lm.transformer.d_model)) * 0.05
    vs = model.get_voice_state_from_prompt(prompt.astype(np.float32))
    assert 200 < vs.length + 20 < 256

    b = ContinuousBatcher(model, batch_size=2, chunk_frames=4)

    # White-box invariant: every dispatch's window must cover the true device
    # frontier (max pos in the state) + chunk.  The frontier is checked against
    # the actual per-slot cursor, so a stale frames_done-based window fails
    # deterministically regardless of how mild the audio-level damage is.
    orig = b.engine.decode_frames
    violations = []

    def spy(state, key, n_frames, gen, **kw):
        window = kw.get("window", 0)
        if window:
            pos = np.asarray(jax.device_get(state["pos"]))
            if int(pos.max()) + n_frames > window:
                violations.append((int(pos.max()), n_frames, window))
        return orig(state, key, n_frames, gen, **kw)

    b.engine.decode_frames = spy
    b.start()
    try:
        text = "This sentence needs to run long enough to cross the boundary now."
        single = model.generate_with_pauses(text, vs)
        batched = b.generate(text, vs)
        assert batched.shape == single.shape
        assert not violations, violations
        # audio-level sanity: batched lanes accumulate small batch-dependent
        # f32 drift (exact equality only holds at B=1)
        corr = np.corrcoef(batched, single)[0, 1]
        assert corr > 0.98, corr
    finally:
        b.stop()


def test_stats_counters(batcher):
    """Observability snapshot: after the module's earlier generations the
    counters must be live and the loop healthy."""
    batcher.generate("One more for the counters.")
    s = batcher.stats()
    assert s["requests_completed"] >= 1
    assert s["requests_submitted"] >= s["requests_completed"]
    assert s["frames_decoded"] > 0 and s["dispatches"] > 0
    assert s["active_requests"] == 0 and not s["dead"]


def test_zero_noise_clamp_batched_matches_single(model, batcher):
    """noise_clamp=0.0 is a HARD zero-clamp (deterministic zero noise), not
    'unclamped'.  Regression: the batched path encoded None as 0.0, so a
    request with an explicit 0 rode the batch as unclamped full-Gaussian
    noise while the single-flight path produced zero noise — same API input,
    two different outputs depending on routing."""
    text = "Zero clamp means zero noise."
    want = model.with_params(temp=0.7, noise_clamp=0.0).generate_with_pauses(text)
    # sanity: clamp 0 == no noise at all == the temp=0 output
    base = model.generate_with_pauses(text)
    np.testing.assert_allclose(want, base, atol=1e-5)
    got = batcher.generate(text, gen=GenParams(temp=0.7, noise_clamp=0.0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_decode_frames_rejects_zero_lsd(model):
    """lsd_vec entries < 1 would negative-index the time-embedding tables and
    emit raw noise as that slot's latent; the engine must fail loudly."""
    eng = model.engine
    state = eng.new_state(1)
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="lsd_vec"):
        eng.decode_frames(state, key, 2, model.gen,
                          lsd_vec=np.zeros((1,), np.int32))
