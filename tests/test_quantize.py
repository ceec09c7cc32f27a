"""int8 weight-only quantization: policy, SNR, and end-to-end fidelity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pocket_tts_tpu.ops.qtensor import (
    QTensor, mat, quantization_snr_db, quantize_array, quantize_tree,
    should_quantize, STACKED_WEIGHTS,
)


class TestQTensor:
    def test_roundtrip_snr(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (256, 128))
        qt = quantize_array(w)
        assert qt.q.dtype == jnp.int8
        assert qt.scale.shape == (256,)
        assert quantization_snr_db(w, qt) > 30.0  # reference aims for high-SNR int8

    def test_stacked_channel_axes(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 32))
        qt = quantize_array(w, channel_axes=2)
        assert qt.scale.shape == (4, 64)
        err = np.abs(np.asarray(qt.dequant() - w))
        assert err.max() < np.abs(w).max() / 100

    def test_mat_passthrough(self):
        w = jnp.ones((4, 4))
        assert mat(w) is w
        qt = quantize_array(w)
        assert mat(qt).shape == (4, 4)

    def test_skip_policy(self):
        big = jnp.ones((64, 64))
        # LayerScale vectors must never quantize (caught live on TPU where the
        # full-size model exceeds MIN_SIZE)
        assert not should_quantize("mimi/dec_tf/layers/ls1", jnp.ones((2, 512)))
        assert should_quantize("tf/ff1", big)
        assert not should_quantize("flow_lm/text_embed", big)
        assert not should_quantize("tf/out_proj", big)
        assert not should_quantize("out_eos_w", big)
        assert not should_quantize("tiny", jnp.ones((4, 4)))

    def test_quantize_tree_is_pytree(self):
        tree = {"ff1": jnp.ones((8, 16, 32)), "out_proj": jnp.ones((8, 32, 32)),
                "norm_w": jnp.ones((8, 32))}
        q = quantize_tree(tree, stacked_names=STACKED_WEIGHTS)
        assert isinstance(q["ff1"], QTensor)
        assert not isinstance(q["out_proj"], QTensor)  # skip-list
        assert not isinstance(q["norm_w"], QTensor)
        # flows through jit
        out = jax.jit(lambda t: mat(t["ff1"]).sum())(q)
        assert np.isfinite(float(out))


class TestQuantizedModel:
    def test_e2e_close_to_f32(self):
        from tests.test_tts import CFG
        from pocket_tts_tpu import weights
        from pocket_tts_tpu.models.mimi import MimiPlans
        from pocket_tts_tpu.runtime.engine import GenParams
        from pocket_tts_tpu.runtime.quantize import quantize_model
        from pocket_tts_tpu.tts import TTSModel

        plans = MimiPlans(CFG.mimi)
        params = weights.random_params(CFG, plans, seed=3)
        model = TTSModel(CFG, params, gen=GenParams(temp=0.0),
                         has_real_weights=False)
        qmodel = quantize_model(model)
        assert qmodel.is_quantized

        a = model.generate("Testing the quantized model now.")
        b = qmodel.generate("Testing the quantized model now.")
        assert np.isfinite(b).all()
        # int8 weights perturb the AR trajectory; demand same order of magnitude
        # and decent early-sample agreement rather than bitwise equality.
        n = min(a.size, b.size, 1920)
        assert np.abs(a[:n] - b[:n]).max() < 0.5 * max(np.abs(a).max(), 1e-3)


def test_snr_report():
    from tests.test_tts import CFG
    from pocket_tts_tpu import weights
    from pocket_tts_tpu.models.mimi import MimiPlans
    from pocket_tts_tpu.runtime.quantize import quantize_params, snr_report

    params = weights.random_params(CFG, MimiPlans(CFG.mimi), seed=3)
    qparams = quantize_params(params)
    snrs = snr_report(params, qparams)
    assert len(snrs) > 5  # backbone ff1/ff2/in_proj, flow mlps, seanet convs...
    assert any("ff1" in k for k in snrs)
    # symmetric per-channel int8 on well-scaled weights: high SNR everywhere
    assert min(snrs.values()) > 25.0, snrs


def test_quantized_model_batched():
    """int8 weights must flow through the continuous batcher (QTensor pytrees
    in the resident batched decode program) and match the quantized
    single-stream output at temp=0."""
    from tests.test_tts import CFG
    from pocket_tts_tpu import weights
    from pocket_tts_tpu.models.mimi import MimiPlans
    from pocket_tts_tpu.runtime.batcher import ContinuousBatcher
    from pocket_tts_tpu.runtime.engine import GenParams
    from pocket_tts_tpu.runtime.quantize import quantize_model
    from pocket_tts_tpu.tts import TTSModel

    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    model = TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)
    qmodel = quantize_model(model)
    single = qmodel.generate_with_pauses("Quantized batching test.")
    b = ContinuousBatcher(qmodel, batch_size=2, chunk_frames=4)
    b.start()
    try:
        batched = b.generate("Quantized batching test.")
    finally:
        b.stop()
    assert batched.shape == single.shape
    np.testing.assert_allclose(batched, single, atol=1e-4)


def test_int8_checkpoint_roundtrip(tmp_path):
    """save_quantized -> load_quantized must reproduce the exact pytree
    (int8 values and scales bit-exact, plain leaves f32-exact), the artifact
    must be substantially smaller than f32, and a model loaded from it must
    generate the same audio as the in-memory quantized model at temp=0."""
    import os

    from tests.test_tts import CFG
    from pocket_tts_tpu import weights
    from pocket_tts_tpu.models.mimi import MimiPlans
    from pocket_tts_tpu.runtime.engine import GenParams
    from pocket_tts_tpu.runtime.quantize import (
        load_quantized, quantize_model, quantize_params, save_quantized)
    from pocket_tts_tpu.tts import TTSModel

    params = weights.random_params(CFG, MimiPlans(CFG.mimi), seed=3)
    qparams = quantize_params(params)
    path = tmp_path / "model.int8.safetensors"
    save_quantized(qparams, path)

    loaded = load_quantized(path)
    flat_a = jax.tree_util.tree_leaves(
        qparams, is_leaf=lambda x: isinstance(x, QTensor))
    flat_b = jax.tree_util.tree_leaves(
        loaded, is_leaf=lambda x: isinstance(x, QTensor))
    assert len(flat_a) == len(flat_b)
    n_q = 0
    for a, b in zip(flat_a, flat_b):
        if isinstance(a, QTensor):
            assert isinstance(b, QTensor)
            np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
            np.testing.assert_array_equal(np.asarray(a.scale),
                                          np.asarray(b.scale))
            n_q += 1
        else:
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b))
    assert n_q > 5

    f32_bytes = sum(x.size * 4 for x in jax.tree_util.tree_leaves(params))
    # each quantized leaf drops from 4 bytes/elem to 1 (+small scale vector)
    saved = sum(a.q.size * 3 for a in flat_a if isinstance(a, QTensor))
    assert os.path.getsize(path) < f32_bytes - 0.9 * saved

    model = TTSModel(CFG, params, gen=GenParams(temp=0.0),
                     has_real_weights=False)
    qmodel = quantize_model(model)
    loaded_model = TTSModel(CFG, loaded, gen=GenParams(temp=0.0),
                            has_real_weights=True)
    a = qmodel.generate("Checkpoint roundtrip speech.")
    b = loaded_model.generate("Checkpoint roundtrip speech.")
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_load_quantized_rejects_plain_safetensors(tmp_path):
    from safetensors.numpy import save_file

    from pocket_tts_tpu.runtime.quantize import load_quantized

    p = tmp_path / "plain.safetensors"
    save_file({"w": np.zeros((4, 4), np.float32)}, str(p))
    with pytest.raises(ValueError, match="int8 checkpoint"):
        load_quantized(p)


@pytest.fixture(scope="module")
def model():
    from tests.test_tts import CFG
    from pocket_tts_tpu import weights
    from pocket_tts_tpu.models.mimi import MimiPlans
    from pocket_tts_tpu.runtime.engine import GenParams
    from pocket_tts_tpu.tts import TTSModel

    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    return TTSModel(CFG, params, gen=GenParams(temp=0.0),
                    has_real_weights=False)


class TestInt4:
    """Experimental int4 weight-only path (bits=4): half the HBM bytes of
    int8; disk artifact stores int8 values + bits metadata."""

    def test_quantize_generate_finite(self, model):
        import jax.numpy as jnp

        from pocket_tts_tpu.ops.qtensor import QTensor
        from pocket_tts_tpu.runtime.quantize import quantize_model, snr_report

        q4 = quantize_model(model, bits=4)
        leaves = [leaf for leaf in jax.tree.leaves(
            q4.params, is_leaf=lambda x: isinstance(x, QTensor))
            if isinstance(leaf, QTensor)]
        # nibble-packed storage: uint8, last dim halved, logical shape
        # intact (odd-last-dim conv kernels stay int8 at int4 levels)
        packed = [l for l in leaves if l.packed]
        assert packed and all(l.q.dtype == jnp.uint8 for l in packed)
        for l in packed:
            assert l.shape[-1] == l.q.shape[-1] * 2
        snrs = snr_report(model.params, q4.params)
        assert min(snrs.values()) > 15, min(snrs.values())  # ~25 dB expected
        wav = q4.generate("Int four experiment speaking.")
        assert wav.size > 0 and np.isfinite(wav).all()

    def test_pack_round_trip_exact(self):
        """Nibble packing must be lossless vs the unpacked int4 values."""
        from pocket_tts_tpu.ops.qtensor import quantize_array

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
        qt = quantize_array(w, bits=4)
        # recompute the reference levels without packing
        scale = np.maximum(np.abs(np.asarray(w)).max(axis=1), 1e-12) / 7.0
        ref = np.clip(np.round(np.asarray(w) / scale[:, None]), -7, 7)
        np.testing.assert_array_equal(
            np.asarray(qt.dequant()), ref * scale[:, None])

    def test_artifact_round_trip(self, model, tmp_path):
        import jax.numpy as jnp

        from pocket_tts_tpu.ops.qtensor import QTensor
        from pocket_tts_tpu.runtime.quantize import (
            load_quantized, quantize_model, save_quantized)

        q4 = quantize_model(model, bits=4)
        p = tmp_path / "model.int4.safetensors"
        save_quantized(q4.params, p)
        loaded = load_quantized(p)
        flat_a = jax.tree.leaves(q4.params,
                                 is_leaf=lambda x: isinstance(x, QTensor))
        flat_b = jax.tree.leaves(loaded,
                                 is_leaf=lambda x: isinstance(x, QTensor))
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            if isinstance(a, QTensor):
                assert b.packed == a.packed and b.q.dtype == a.q.dtype
                np.testing.assert_array_equal(np.asarray(a.q),
                                              np.asarray(b.q))
