"""Fine-tuning subsystem tests (CPU, small config): loss correctness/masking,
optimization progress, latent-target preimage, e2e finetune() smoke, artifact
round-trip, and dp x tp sharded-step equivalence on the virtual mesh.

The reference is inference-only — this subsystem is a TPU-native extension
(see training/loss.py for how the objective matches the sampler's
flow_mlp.lsd_decode semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pocket_tts_tpu import weights
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.runtime.engine import GenParams
from pocket_tts_tpu.training import (
    encode_latent_targets,
    flow_matching_loss,
    latent_preimage_matrix,
    make_batch,
    make_optimizer,
    make_train_step,
)
from pocket_tts_tpu.training.trainer import (
    apply_finetuned,
    finetune,
    load_finetuned_params,
    save_finetuned_params,
    shard_batch,
)
from pocket_tts_tpu.tts import TTSModel

from .test_tts import CFG


@pytest.fixture(scope="module")
def model():
    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=11)
    return TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)


def synthetic_batch(seed=0, b=4, tt=6, tf=6, ldim=None):
    """Training batch with random latent targets (no Mimi encode needed)."""
    ldim = ldim or CFG.mimi.quantizer.dimension
    rng = np.random.default_rng(seed)
    return {
        "tokens": rng.integers(1, 50, size=(b, tt)).astype(np.int32),
        "token_valid": np.array([tt, tt - 2, tt, tt - 1][:b], np.int32),
        "latents": rng.normal(size=(b, tf, ldim)).astype(np.float32),
        "latent_valid": np.array([tf, tf - 2, tf - 1, tf][:b], np.int32),
    }


def to_device(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def copy_tree(t):
    return jax.tree.map(jnp.array, t)


def test_loss_finite_and_masked(model):
    batch = synthetic_batch()
    key = jax.random.PRNGKey(0)
    loss, metrics = jax.jit(
        lambda p, b, k: flow_matching_loss(p, CFG, b, k)
    )(model.params["flow_lm"], to_device(batch), key)
    assert np.isfinite(float(loss))
    assert float(metrics["flow_mse"]) > 0 and float(metrics["eos_bce"]) > 0

    # garbage in padded latent rows and padded token ids must not move the loss
    poisoned = {k: np.array(v) for k, v in batch.items()}
    for i, fv in enumerate(poisoned["latent_valid"]):
        poisoned["latents"][i, fv:] = 1e3
    for i, tv in enumerate(poisoned["token_valid"]):
        poisoned["tokens"][i, tv:] = 77
    loss2, _ = jax.jit(
        lambda p, b, k: flow_matching_loss(p, CFG, b, k)
    )(model.params["flow_lm"], to_device(poisoned), key)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_training_reduces_loss(model):
    opt = make_optimizer(2e-3, clip_norm=1.0)
    step = make_train_step(CFG, opt)
    params = copy_tree(model.params["flow_lm"])
    opt_state = jax.jit(opt.init)(params)
    batch = to_device(synthetic_batch())
    key = jax.random.PRNGKey(7)
    first = None
    for i in range(60):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.fold_in(key, i))
        if first is None:
            first = jax.device_get(metrics)
    last = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(last["loss"]) and np.isfinite(float(first["grad_norm"]))
    assert last["loss"] < float(first["loss"]) * 0.8
    assert last["eos_bce"] < float(first["eos_bce"])


def test_consistency_term_trains(model):
    opt = make_optimizer(1e-3)
    step = make_train_step(CFG, opt, consistency_weight=0.5)
    params = copy_tree(model.params["flow_lm"])
    opt_state = jax.jit(opt.init)(params)
    batch = to_device(synthetic_batch(seed=3))
    _, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1))
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(m["consistency"]) and m["consistency"] > 0
    assert np.isfinite(m["grad_norm"]) and m["grad_norm"] > 0


def test_latent_preimage_roundtrip(model):
    """Latents in the decode projection's span recover exactly — the preimage
    inverts the DummyQuantizer output_proj on its image."""
    w = np.asarray(model.params["mimi"]["quantizer_w"], np.float32)[:, :, 0]
    pinv = latent_preimage_matrix(model.params)
    z32 = np.random.default_rng(5).normal(size=(3, w.shape[1])).astype(np.float32)
    z512 = z32 @ w.T
    back = z512 @ pinv.T
    np.testing.assert_allclose(back, z32, atol=1e-4)


def test_make_batch_and_encode_targets(model):
    sr = model.sample_rate
    rng = np.random.default_rng(9)
    wav_a = rng.normal(size=(2 * 1920,)).astype(np.float32) * 0.1
    wav_b = rng.normal(size=(3 * 1920 + 500,)).astype(np.float32) * 0.1
    latents, valid = encode_latent_targets(model, [wav_a, wav_b])
    assert latents.shape[0] == 2 and latents.shape[2] == CFG.mimi.quantizer.dimension
    assert list(valid) == [2, 4]  # partial frame rounds up
    assert np.isfinite(latents).all()

    batch = make_batch(model, [("hello there", wav_a), ("general kenobi", wav_b)],
                       voice_wav=wav_a)
    assert batch["tokens"].shape[0] == 2
    assert batch["voice_latents"].shape[0] == 2
    assert batch["voice_latents"].shape[2] == CFG.mimi.seanet.dimension
    assert (batch["token_valid"] > 0).all()
    _ = sr


def test_finetune_e2e_and_artifact_roundtrip(model, tmp_path):
    rng = np.random.default_rng(2)
    pairs = [("one sentence", rng.normal(size=(2 * 1920,)).astype(np.float32) * 0.1),
             ("another line", rng.normal(size=(2 * 1920,)).astype(np.float32) * 0.1)]
    tuned = finetune(model, pairs, steps=3, batch_size=2, lr=1e-3, log_every=0)
    # params moved and the tuned model still synthesizes
    before = np.asarray(model.params["flow_lm"]["input_w"])
    after = np.asarray(tuned.params["flow_lm"]["input_w"])
    assert not np.allclose(before, after)
    audio = tuned.generate("hi")
    assert audio.size > 0 and np.isfinite(audio).all()

    path = tmp_path / "tuned.safetensors"
    save_finetuned_params(tuned.params["flow_lm"], path)
    loaded = load_finetuned_params(path)
    np.testing.assert_allclose(
        np.asarray(loaded["input_w"]), after, rtol=1e-6)
    restored = apply_finetuned(model, path)
    audio2 = restored.generate("hi")
    assert audio2.size > 0 and np.isfinite(audio2).all()

    with pytest.raises(ValueError):
        save_finetuned_params(tuned.params["flow_lm"], path)  # overwrite ok
        bad = tmp_path / "bad.safetensors"
        from safetensors.numpy import save_file
        save_file({"x": np.zeros((1,), np.float32)}, str(bad))
        load_finetuned_params(bad)


class TestLoRA:
    """LoRA adapters (training/lora.py): exact no-op at init, factor-only
    training, tiny-artifact round-trip, and the --finetuned format dispatch."""

    def test_init_is_exact_noop(self, model):
        from pocket_tts_tpu.training import init_lora, merge_lora

        base = model.params["flow_lm"]
        lora = init_lora(base, rank=2, seed=1)
        merged = merge_lora(base, lora, alpha=2.0, rank=2)
        for (pa, a), (pb, b) in zip(_flat(base), _flat(merged)):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # identical loss through the merge (b factors start at zero)
        batch, key = to_device(synthetic_batch()), jax.random.PRNGKey(0)
        l0, _ = jax.jit(lambda p, b, k: flow_matching_loss(p, CFG, b, k))(
            base, batch, key)
        l1, _ = jax.jit(
            lambda p, lo, b, k: flow_matching_loss(
                merge_lora(p, lo, alpha=2.0, rank=2), CFG, b, k)
        )(base, lora, batch, key)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    def test_training_moves_targets_only(self, model):
        from pocket_tts_tpu.training import (
            init_lora, make_lora_train_step, merge_lora)
        from pocket_tts_tpu.training.lora import LORA_DEFAULT_TARGETS

        opt = make_optimizer(2e-3)
        step = make_lora_train_step(CFG, opt, alpha=4.0, rank=4)
        base = copy_tree(model.params["flow_lm"])
        base_snapshot = copy_tree(base)
        lora = init_lora(base, rank=4, seed=2)
        opt_state = jax.jit(opt.init)(lora)
        batch = to_device(synthetic_batch())
        key = jax.random.PRNGKey(5)
        first = None
        for i in range(40):
            lora, opt_state, metrics = step(lora, opt_state, base, batch,
                                            jax.random.fold_in(key, i))
            if first is None:
                first = float(jax.device_get(metrics)["loss"])
        last = float(jax.device_get(metrics)["loss"])
        assert np.isfinite(last) and last < first * 0.9
        # the frozen base never moved (non-donated input)
        for (_, a), (_, b) in zip(_flat(base_snapshot), _flat(base)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # merged differs from base exactly on the target set
        merged = merge_lora(base, lora, alpha=4.0, rank=4)
        for (path, a), (_, b) in zip(_flat(base), _flat(merged)):
            same = np.allclose(np.asarray(a), np.asarray(b))
            assert same != (path in LORA_DEFAULT_TARGETS), path

    def test_finetune_lora_artifact_and_dispatch(self, model, tmp_path):
        from pocket_tts_tpu.training import (
            apply_adapted, load_lora_params, save_lora_params)

        rng = np.random.default_rng(6)
        pairs = [("lora one", rng.normal(size=(2 * 1920,)).astype(np.float32) * 0.1),
                 ("lora two", rng.normal(size=(2 * 1920,)).astype(np.float32) * 0.1)]
        tuned = finetune(model, pairs, steps=3, batch_size=2, lr=2e-3,
                         log_every=0, lora_rank=2)
        factors, rank, alpha = tuned._lora
        assert rank == 2 and alpha == 2.0
        audio = tuned.generate("hi")
        assert audio.size > 0 and np.isfinite(audio).all()

        # the adapter artifact is FAR smaller than the full checkpoint
        lpath, fpath = tmp_path / "v.lora.safetensors", tmp_path / "v.full.safetensors"
        save_lora_params(factors, lpath, rank=rank, alpha=alpha)
        save_finetuned_params(tuned.params["flow_lm"], fpath)
        assert lpath.stat().st_size < fpath.stat().st_size / 2

        loaded, r2, a2 = load_lora_params(lpath)
        assert (r2, a2) == (rank, alpha)
        np.testing.assert_allclose(
            np.asarray(loaded["tf/ff1"]["a"]),
            np.asarray(factors["tf/ff1"]["a"]), rtol=1e-6)

        # apply_adapted dispatches on format metadata for BOTH kinds and
        # reproduces the tuned params exactly
        via_lora = apply_adapted(model, lpath)
        for (pa, a), (_, b) in zip(_flat(tuned.params["flow_lm"]),
                                   _flat(via_lora.params["flow_lm"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=pa)
        via_full = apply_adapted(model, fpath)
        assert via_full.generate("hi").size > 0

        from safetensors.numpy import save_file
        bad = tmp_path / "bad.safetensors"
        save_file({"x": np.zeros((1,), np.float32)}, str(bad))
        with pytest.raises(ValueError, match="unknown checkpoint format"):
            apply_adapted(model, bad)

    def test_init_validation(self, model):
        from pocket_tts_tpu.training import init_lora

        with pytest.raises(ValueError, match="rank"):
            init_lora(model.params["flow_lm"], rank=0)
        with pytest.raises(ValueError, match="not in params"):
            init_lora(model.params["flow_lm"], rank=2, targets=("tf/nope",))


    def test_sharded_lora_step_matches_single_device(self, model):
        """LoRA step over the dp x tp mesh == unsharded: base tp-sharded,
        factors replicated, batch dp-sharded; GSPMD reduces factor grads."""
        from pocket_tts_tpu.parallel.mesh import make_mesh, shard_params
        from pocket_tts_tpu.training import init_lora, make_lora_train_step

        opt = make_optimizer(1e-3)
        step = make_lora_train_step(CFG, opt, alpha=2.0, rank=2)
        batch_np = synthetic_batch(seed=8, b=4)
        key = jax.random.PRNGKey(9)
        base = model.params["flow_lm"]

        l_ref = init_lora(base, rank=2, seed=3)
        s_ref = jax.jit(opt.init)(l_ref)
        l_ref, _, m_ref = step(l_ref, s_ref, base, to_device(batch_np), key)

        mesh = make_mesh(8, tp=2)
        b_sh = shard_params(copy_tree(base), mesh)
        l_sh = init_lora(base, rank=2, seed=3)
        s_sh = jax.jit(opt.init)(l_sh)
        l_sh, _, m_sh = step(l_sh, s_sh, b_sh, shard_batch(batch_np, mesh), key)

        np.testing.assert_allclose(float(m_ref["loss"]), float(m_sh["loss"]),
                                   rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(l_ref)),
                        jax.tree_util.tree_leaves(jax.device_get(l_sh))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)


def _flat(tree):
    from pocket_tts_tpu.runtime.quantize import _flatten_paths

    return _flatten_paths(tree)


def test_sharded_train_step_matches_single_device(model):
    """dp x tp sharded step == unsharded step (GSPMD inserts the grad
    reductions; jax.random is sharding-invariant by (key, shape))."""
    from pocket_tts_tpu.parallel.mesh import make_mesh, shard_params

    opt = make_optimizer(1e-3)
    step = make_train_step(CFG, opt)
    batch_np = synthetic_batch(seed=4, b=4)
    key = jax.random.PRNGKey(3)

    p_ref = copy_tree(model.params["flow_lm"])
    s_ref = jax.jit(opt.init)(p_ref)
    p_ref, _, m_ref = step(p_ref, s_ref, to_device(batch_np), key)

    mesh = make_mesh(8, tp=2)  # dp=4 x tp=2 over the virtual CPU devices
    p_sh = shard_params(copy_tree(model.params["flow_lm"]), mesh)
    s_sh = jax.jit(opt.init)(p_sh)
    p_sh, _, m_sh = step(p_sh, s_sh, shard_batch(batch_np, mesh), key)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_sh["loss"]),
                               rtol=2e-4)
    flat_ref = jax.tree_util.tree_leaves(jax.device_get(p_ref))
    flat_sh = jax.tree_util.tree_leaves(jax.device_get(p_sh))
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
