"""Multi-device sharding on the 8-virtual-device CPU mesh (conftest forces
XLA_FLAGS host device count 8): the dp x tp generation step must compile,
execute, and produce per-slot-correct audio."""

import numpy as np
import pytest

import jax

if len(jax.devices()) < 8:
    pytest.skip("needs 8 virtual devices", allow_module_level=True)


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_mesh_shapes():
    from pocket_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] in (2, 4, 8)


def test_param_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from pocket_tts_tpu.parallel.mesh import param_sharding_rules

    assert param_sharding_rules(("flow_lm", "tf", "ff1"), None) == P(None, "tp", None)
    assert param_sharding_rules(("flow_lm", "tf", "ff2"), None) == P(None, None, "tp")
    assert param_sharding_rules(("flow_lm", "tf", "in_proj"), None) == \
        P(None, None, "tp", None)
    assert param_sharding_rules(("flow_lm", "tf", "out_proj"), None) == \
        P(None, None, "tp")
    assert param_sharding_rules(("flow_lm", "tf", "norm1_w"), None) == P()


def _run_generation(cfg, mesh=None, batch=4):
    """Prefill + one decode chunk; returns (audio int16 [B, T], latent [B, D])."""
    import __graft_entry__ as ge
    from pocket_tts_tpu.runtime.engine import Engine, GenParams

    engine = Engine(cfg, ge._build(cfg)[1], batch_size=batch, mesh=mesh)
    tokens = np.tile(np.arange(1, 7, dtype=np.int32)[None], (batch, 1))
    key = jax.random.PRNGKey(0)

    def run():
        state = engine.new_state(batch)
        if mesh is not None:
            from pocket_tts_tpu.parallel.mesh import shard_params, shard_state

            engine.params = shard_params(engine.params, mesh)
            state = shard_state(state, mesh)
        st = engine.prefill_tokens(state, tokens, 6)
        st, _, audio, _ = engine.decode_frames(st, key, 2, GenParams(temp=0.5))
        return jax.device_get((audio, st["latent"]))

    if mesh is None:
        return run()
    with mesh:
        return run()


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_sharded_equals_single_device(tp):
    """A wrong-but-finite collective layout must not pass: sharded generation
    (dp x tp over 8 CPU devices) must numerically match single-device."""
    import __graft_entry__ as ge
    from pocket_tts_tpu.parallel.mesh import make_mesh

    cfg = ge.tiny_config(heads=8)
    ref_audio, ref_latent = _run_generation(cfg, mesh=None)
    mesh = make_mesh(8, tp=tp)
    sh_audio, sh_latent = _run_generation(cfg, mesh=mesh)
    # audio ships as int16 PCM; collective reduction reordering may move a
    # rounded sample by 1 LSB
    assert np.abs(sh_audio.astype(np.int32)
                  - ref_audio.astype(np.int32)).max() <= 1
    np.testing.assert_allclose(sh_latent, ref_latent, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("tp", [2, 8])
@pytest.mark.slow
def test_flagship_dims_sharded_equals_single_device(tp):
    """The REAL b6369a24 dims (d_model 1024, 16 heads, FFN 4096, Mimi 512)
    compiled and executed over the virtual mesh must match single-device
    numerics — the tiny config exercises topology, this exercises the
    production shapes (VERDICT r2 #3).  tp=4 is covered by the dryrun."""
    from pocket_tts_tpu.config import load_variant
    from pocket_tts_tpu.parallel.mesh import make_mesh

    cfg = load_variant("b6369a24")
    ref_audio, ref_latent = _run_generation(cfg, mesh=None, batch=2)
    sh_audio, sh_latent = _run_generation(cfg, mesh=make_mesh(8, tp=tp), batch=2)
    assert np.abs(sh_audio.astype(np.int32)
                  - ref_audio.astype(np.int32)).max() <= 1
    np.testing.assert_allclose(sh_latent, ref_latent, atol=2e-4, rtol=1e-3)


def test_dp_sharded_batched_admission():
    """The serving tier's admission path over the dp axis (VERDICT r3 #3):
    the FUSED admit_prefill_slot program (voice install via
    dynamic_update_slice into the dp-sharded batch + B=1 lane slice-out text
    prefill + write-back) -> decode must match the identical single-device
    program slot for slot.  Two admitted "requests" with different voice
    snapshots AND different text occupy slots 0-1; slots 2-3 stay idle, as in
    the ContinuousBatcher (which admits exclusively through this program)."""
    import __graft_entry__ as ge
    from pocket_tts_tpu.parallel.mesh import make_mesh, shard_params, shard_state
    from pocket_tts_tpu.runtime.engine import Engine, GenParams

    cfg = ge.tiny_config(heads=8)
    B = 4
    key = jax.random.PRNGKey(7)
    params = ge._build(cfg)[1]

    # voice snapshots with DIFFERENT prompts, built once on a single device
    # and reused by both runs (they are immutable inputs to admission)
    ve = Engine(cfg, params, batch_size=1)

    def make_voice(toks):
        st = ve.prefill_tokens(ve.new_state(1), toks, toks.shape[1])
        return {"kc": jax.device_get(st["kc"]), "vc": jax.device_get(st["vc"]),
                "pos": jax.device_get(st["pos"])}

    vs_a = make_voice(np.arange(1, 7, dtype=np.int32)[None])
    vs_b = make_voice(np.arange(3, 11, dtype=np.int32)[None])

    text = np.zeros((B, 6), np.int32)
    text[0] = np.arange(10, 16)
    text[1, :4] = np.arange(20, 24)

    def run(mesh):
        engine = Engine(cfg, params, batch_size=B, mesh=mesh)

        def go():
            state = engine.new_state(B)
            if mesh is not None:
                engine.params = shard_params(engine.params, mesh)
                state = shard_state(state, mesh)
            # the FUSED admission program — the one the ContinuousBatcher
            # actually dispatches (admit_prefill_slot: voice install + B=1
            # lane prefill in one program, review finding r4) — must compile
            # and match under the dp-sharded batch axis
            state = engine.admit_prefill_slot(
                state, 0, vs_a, engine.pad_token_row(text[0:1, :6]), 6)
            state = engine.admit_prefill_slot(
                state, 1, vs_b, engine.pad_token_row(text[1:2, :4]), 4)
            state, _, audio, _ = engine.decode_frames(
                state, key, 2, GenParams(temp=0.5))
            return np.asarray(jax.device_get(audio))

        if mesh is None:
            return go()
        with mesh:
            return go()

    ref = run(None)
    sh = run(make_mesh(8))  # dp=2 x tp=4
    assert sh.shape == ref.shape
    # int16 PCM; collective reduction reordering may move a sample by 1 LSB
    assert np.abs(sh.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    # the two admitted requests must actually differ (different prompts)
    assert np.abs(ref[0].astype(np.int32) - ref[1].astype(np.int32)).max() > 1


def test_flagship_sharding_manifest():
    """Guard against silent de-sharding: at flagship dims every transformer
    matmul group must be ACTUALLY distributed for all supported tp (a config
    change that stops a dim dividing tp would otherwise quietly replicate,
    with zero numerical signal — mesh._fit_spec drops such axes by design)."""
    import __graft_entry__ as ge
    from pocket_tts_tpu.config import load_variant
    from pocket_tts_tpu.parallel.mesh import (
        make_mesh, shard_params, sharding_manifest)

    cfg = load_variant("b6369a24")
    params = ge._build(cfg)[1]
    expected = [
        "flow_lm/tf/in_proj", "flow_lm/tf/out_proj",
        "flow_lm/tf/ff1", "flow_lm/tf/ff2",
        "mimi/enc_tf/layers/in_proj", "mimi/enc_tf/layers/out_proj",
        "mimi/enc_tf/layers/ff1", "mimi/enc_tf/layers/ff2",
        "mimi/dec_tf/layers/in_proj", "mimi/dec_tf/layers/out_proj",
        "mimi/dec_tf/layers/ff1", "mimi/dec_tf/layers/ff2",
    ]
    for tp in (2, 4, 8):
        mesh = make_mesh(8, tp=tp)
        man = sharding_manifest(shard_params(params, mesh))
        sharded = {k for k, v in man.items() if v["sharded"]}
        missing = [k for k in expected if k not in sharded]
        assert not missing, f"tp={tp}: silently de-sharded: {missing}"


def test_quantized_params_shard_under_tp():
    """QTensor is a pytree node: without is_leaf handling, shard_params
    recursed into (q, scale), the path gained a /0 index, every name rule
    missed, and int8 TP weights replicated silently (review finding r4)."""
    import __graft_entry__ as ge
    from pocket_tts_tpu.ops.qtensor import QTensor
    from pocket_tts_tpu.parallel.mesh import make_mesh, shard_params
    from pocket_tts_tpu.runtime.quantize import quantize_params

    cfg = ge.tiny_config(heads=8)
    params = quantize_params(ge._build(cfg)[1])
    mesh = make_mesh(8, tp=4)
    placed = shard_params(params, mesh)

    qt = placed["flow_lm"]["tf"]["in_proj"]
    assert isinstance(qt, QTensor)

    def axes(leaf):
        spec = leaf.sharding.spec
        return {ax for a in spec for ax in (a if isinstance(a, tuple) else (a,))
                if ax is not None}

    assert "tp" in axes(qt.q), qt.q.sharding
    # the per-channel scale covers q's leading axes incl. the sharded one
    assert "tp" in axes(qt.scale), qt.scale.sharding
    # ff2 is row-parallel (contraction axis sharded): its scale covers only
    # the leading output axes and stays replicated — but must still PLACE
    ff2 = placed["flow_lm"]["tf"]["ff2"]
    assert "tp" in axes(ff2.q)

    # numerics: quantized sharded generation must match quantized single-device
    from pocket_tts_tpu.runtime.engine import Engine, GenParams

    def run(mesh_):
        eng = Engine(cfg, params, batch_size=2, mesh=mesh_)
        toks = np.tile(np.arange(1, 7, dtype=np.int32)[None], (2, 1))

        def go():
            st = eng.new_state(2)
            if mesh_ is not None:
                from pocket_tts_tpu.parallel.mesh import shard_state

                eng.params = shard_params(eng.params, mesh_)
                st = shard_state(st, mesh_)
            st = eng.prefill_tokens(st, toks, 6)
            _, _, audio, _ = eng.decode_frames(
                st, jax.random.PRNGKey(0), 2, GenParams(temp=0.5))
            return np.asarray(jax.device_get(audio))

        if mesh_ is None:
            return go()
        with mesh_:
            return go()

    ref = run(None)
    sh = run(mesh)
    assert np.abs(sh.astype(np.int32) - ref.astype(np.int32)).max() <= 1
