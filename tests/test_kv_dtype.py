"""fp8 KV cache (RuntimeConfig.kv_dtype): storage-dtype plumbing + quality.

The FlowLM dense cache may be stored at 8 bits (float8_e4m3fn) to halve
decode-attention HBM reads — the largest while-body block by trace
(docs/performance.md).  These tests pin:

* the knob reaches the engine state (cache leaves really are fp8);
* attention over an fp8 cache stays within fp8's representational error of
  the full-precision result (unit level);
* end-to-end audio stays close to the full-precision trajectory at temp=0
  (the AR feedback loop amplifies per-step error, so this is the bound that
  matters for serving).

Reference parity note: the reference has no KV-cache quantization (its int8
path is weight-only and simulated, crates/pocket-tts/src/quantize.rs:1-10);
this is a TPU-native extension, default OFF.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pocket_tts_tpu import weights
from pocket_tts_tpu.config import RuntimeConfig
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.ops.attention import cache_write, causal_cache_attention
from pocket_tts_tpu.runtime.engine import GenParams
from pocket_tts_tpu.tts import TTSModel
from tests.test_tts import CFG

TEXT = "Hello there, this is a float eight cache test with some length."


def _model(kv_dtype=None):
    cfg = CFG
    if kv_dtype is not None:
        cfg = dataclasses.replace(
            CFG, runtime=dataclasses.replace(CFG.runtime, kv_dtype=kv_dtype))
    plans = MimiPlans(cfg.mimi)
    params = weights.random_params(cfg, plans, seed=3)
    return TTSModel(cfg, params, gen=GenParams(temp=0.0),
                    has_real_weights=False)


def test_kv_dtype_reaches_state():
    m = _model("float8_e4m3")
    st = m.engine.new_state()
    assert st["kc"].dtype == jnp.float8_e4m3fn
    assert st["vc"].dtype == jnp.float8_e4m3fn
    # default stays at the compute dtype (f32 on CPU)
    m0 = _model()
    assert m0.engine.new_state()["kc"].dtype == m0.engine.dtype


def test_kv_dtype_validated():
    with pytest.raises(ValueError, match="kv_dtype"):
        RuntimeConfig(kv_dtype="int8")


def test_sdpa_fp8_cache_error_bounded():
    """Attention over an fp8-stored cache ~= attention over the f32 cache.

    e4m3 carries a 3-bit mantissa (relative step 2^-3 at worst, 2^-4 RMS);
    softmax averaging shrinks it further.  Bound the output at 5% of its own
    scale — loose enough for any backend's rounding, tight enough to catch a
    probs-cast-to-fp8 regression (which produces ~40% error)."""
    key = jax.random.PRNGKey(0)
    b, t, h, d, s = 2, 1, 4, 32, 64
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d), jnp.float32)
    k_new = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v_new = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    pos = jnp.full((b,), s - 1, jnp.int32)

    def run(dtype):
        kc = cache_write(jnp.zeros((b, s, h, d), dtype), k_new,
                         jnp.zeros((b,), jnp.int32))
        vc = cache_write(jnp.zeros((b, s, h, d), dtype), v_new,
                         jnp.zeros((b,), jnp.int32))
        return np.asarray(causal_cache_attention(q, kc, vc, pos))

    ref = run(jnp.float32)
    got = run(jnp.float8_e4m3fn)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 0.05, f"fp8 cache attention error {err:.3f}"


def test_kv_fp8_batched_equals_single_stream():
    """The serving path must hold under fp8 too: slot admission casts the
    voice snapshot to the cache dtype, per-slot cursors index an fp8 buffer,
    and the batched decode program compiles with the narrow cache.  At temp=0
    a batched request must reproduce the single-stream fp8 output exactly
    (same program order at B=1 lane granularity — mirrors
    test_batcher.test_batched_equals_single_stream)."""
    from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

    m = _model("float8_e4m3")
    single = m.generate_with_pauses(TEXT)
    b = ContinuousBatcher(m, batch_size=2, chunk_frames=4)
    b.start()
    try:
        batched = b.generate(TEXT)
    finally:
        b.stop()
    assert batched.shape == single.shape
    np.testing.assert_allclose(batched, single, atol=1e-4)


def test_kv_fp8_composes_with_int8_weights():
    """int8 weights + fp8 KV (the max-bandwidth-savings combo, bench key
    int8_fp8_x): quantize_model rebuilds its engine from model.config, so the
    kv_dtype must survive the clone, and the combined quantization error must
    still track the full-precision trajectory."""
    import jax.numpy as jnp

    from pocket_tts_tpu.runtime.quantize import quantize_model

    base = _model()
    combo = quantize_model(_model("float8_e4m3"))
    assert combo.engine.new_state()["kc"].dtype == jnp.float8_e4m3fn
    a0 = np.asarray(base.generate(TEXT))
    ac = np.asarray(combo.generate(TEXT))
    assert abs(len(a0) - len(ac)) <= 2 * 1920
    n = min(len(a0), len(ac))
    corr = np.corrcoef(a0[:n], ac[:n])[0, 1]
    assert corr > 0.97, f"int8+fp8 audio corr {corr}"
    assert np.isfinite(ac).all() and ac.std() > 0


@pytest.mark.slow
def test_kv_fp8_flagship_drift_bounded():
    """Production-dims quality envelope (slow, ~3 min CPU: two flagship
    engines).  Measured at head: latent corr 0.989, audio corr 0.99998,
    max 20 LSB over 32 AR frames — the AR loop amplifies fp8 rounding well
    beyond the small-config numbers, so this is the bound that gates any
    change to the quantized write/read path."""
    from pocket_tts_tpu.config import load_variant
    from pocket_tts_tpu.runtime.engine import Engine

    cfg = load_variant("b6369a24")
    rt = dataclasses.replace(
        cfg.runtime, max_seq=1024, text_buckets=(8,), prompt_buckets=(64,),
        decode_chunks=(8,), compute_dtype="float32")
    cfg0 = dataclasses.replace(cfg, runtime=rt)
    cfg8 = dataclasses.replace(
        cfg, runtime=dataclasses.replace(rt, kv_dtype="float8_e4m3"))
    plans = MimiPlans(cfg0.mimi)
    params = weights.random_params(cfg0, plans, seed=11)
    toks = np.array([[11, 402, 1777, 9, 3055, 42]], np.int32)
    gen = GenParams(temp=0.0)

    def run(cfg):
        e = Engine(cfg, params, batch_size=1)
        st = e.prefill_tokens(e.new_state(1), toks, toks.shape[1])
        lat, aud = [], []
        k = jax.random.PRNGKey(0)
        for _ in range(4):
            st, k, pcm, _ = e.decode_frames(st, k, 8, gen)
            lat.append(np.asarray(jax.device_get(st["latent"])))
            aud.append(np.asarray(jax.device_get(pcm)))
        return np.stack(lat, 1)[0], np.concatenate(aud, -1)[0]

    l0, a0 = run(cfg0)
    l8, a8 = run(cfg8)
    corr = np.corrcoef(l0.ravel(), l8.ravel())[0, 1]
    assert corr > 0.9, f"flagship fp8 latent corr {corr}"
    acorr = np.corrcoef(a0.astype(np.float32), a8.astype(np.float32))[0, 1]
    assert acorr > 0.999, f"flagship fp8 audio corr {acorr}"
    lsb = np.abs(a0.astype(np.int32) - a8.astype(np.int32)).max()
    assert lsb <= 80, f"flagship fp8 audio drift {lsb} LSB"  # 4x measured 20


def test_kv_fp8_audio_close_to_full_precision():
    a0 = np.asarray(_model().generate(TEXT))
    a8 = np.asarray(_model("float8_e4m3").generate(TEXT))
    # fp8 shifts the AR trajectory slightly; EOS may move by a frame
    assert abs(len(a0) - len(a8)) <= 2 * 1920
    n = min(len(a0), len(a8))
    corr = np.corrcoef(a0[:n], a8[:n])[0, 1]
    assert corr > 0.99, f"fp8 KV audio corr {corr}"
    assert np.isfinite(a8).all() and a8.std() > 0
