"""Full-pipeline oracle parity: text prefill -> AR latents -> denormalize ->
quantizer -> Mimi decode -> audio, my scanned engine vs a hand-stepped oracle
loop with matched random weights at temp=0.  This covers the seams the
per-module parity tests can't: bos handling, emb_std/emb_mean denorm, the
latent handoff layout, and the engine's chunked scan vs framewise oracle."""

import numpy as np
import pytest

from tests import oracle

if not oracle.install_shims():
    pytest.skip("oracle unavailable", allow_module_level=True)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pocket_tts_tpu import weights  # noqa: E402
from pocket_tts_tpu.models.mimi import MimiPlans  # noqa: E402
from pocket_tts_tpu.runtime.engine import Engine, GenParams  # noqa: E402
from tests.test_flow_lm_parity import CFG as FLOW_CFG  # noqa: E402
from tests.test_mimi_parity import SMALL_CFG, _build_oracle_mimi  # noqa: E402


def _cfg():
    import dataclasses

    from pocket_tts_tpu.config import MimiConfig, RuntimeConfig

    mimi_cfg = dataclasses.replace(
        SMALL_CFG,
        quantizer=dataclasses.replace(SMALL_CFG.quantizer, dimension=16),
    )
    return dataclasses.replace(
        FLOW_CFG,
        mimi=mimi_cfg,
        runtime=RuntimeConfig(max_seq=128, text_buckets=(8,),
                              prompt_buckets=(8,), decode_chunks=(2, 4),
                              compute_dtype="float32"),
    )


def test_engine_matches_oracle_full_pipeline():
    from tests.test_flow_lm_parity import _build_oracle

    cfg = _cfg()
    flow_oracle, flow_params = _build_oracle()
    mimi_oracle = _build_oracle_mimi(cfg.mimi)
    sd = {f"mimi.{k}": v for k, v in oracle.torch_state_dict_to_numpy(mimi_oracle).items()}
    plans = MimiPlans(cfg.mimi)
    params = {"flow_lm": flow_params, "mimi": weights.convert_mimi(sd, plans)}

    tokens = torch.tensor([[5, 17, 42, 7]])
    n_frames = 6

    # ---- oracle loop: prefill text, framewise generate + decode ----
    from pocket_tts.modules.stateful_module import increment_steps, init_states

    with torch.no_grad():
        st = init_states(flow_oracle, 1, 1000)
        mimi_st = init_states(mimi_oracle, 1, 1000)

        def run_tf(x_emb):
            y = flow_oracle.transformer(x_emb, st)
            y = flow_oracle.out_norm(y)
            increment_steps(flow_oracle, st, x_emb.shape[1])
            return y

        run_tf(flow_oracle.conditioner.embed(tokens))
        latent = flow_oracle.bos_emb[None, None, :].clone()
        audio_chunks = []
        from functools import partial

        from pocket_tts.models.flow_lm import lsd_decode

        for _ in range(n_frames):
            h = run_tf(flow_oracle.input_linear(latent))[:, -1]
            nxt = lsd_decode(partial(flow_oracle.flow_net, h),
                             torch.zeros(1, 16), 1)
            denorm = nxt[:, None, :] * flow_oracle.emb_std + flow_oracle.emb_mean
            q = mimi_oracle.quantizer(denorm.transpose(-1, -2))
            frame = mimi_oracle.decode_from_latent(q, mimi_st)
            increment_steps(mimi_oracle, mimi_st, 16)
            audio_chunks.append(frame.numpy())
            latent = nxt[:, None, :]
        ref_audio = np.concatenate(audio_chunks, -1)[0, 0]

    # ---- my engine: prefill + chunked scan decode (2 + 4 frames) ----
    engine = Engine(cfg, params, batch_size=1)
    state = engine.new_state()
    state = engine.prefill_tokens(state, np.asarray(tokens.numpy(), np.int32), 4)
    key = jax.random.PRNGKey(0)
    gen = GenParams(temp=0.0)  # noise == 0 -> deterministic
    got = []
    for k in (2, 4):
        state, key, audio, _ = engine.decode_frames(state, key, k, gen)
        got.append(np.asarray(jax.device_get(audio))[0].astype(np.float32) / 32767.0)
    got_audio = np.concatenate(got)

    assert got_audio.shape == ref_audio.shape
    # int16 transport quantizes to ~3e-5; allow that plus f32 drift
    assert np.abs(got_audio - ref_audio).max() < 5e-4
