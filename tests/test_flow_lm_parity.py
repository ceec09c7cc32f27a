"""FlowLM end-to-end step parity: text prefill + audio-conditioning prefill +
autoregressive frames at temp=0 against the oracle (matched random weights, small
dims).  temp=0 removes the RNG so latent trajectories must match exactly."""

import numpy as np
import pytest

from tests import oracle

if not oracle.install_shims():
    pytest.skip("oracle unavailable", allow_module_level=True)

import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pocket_tts_tpu import weights  # noqa: E402
from pocket_tts_tpu.config import (  # noqa: E402
    Config, FlowConfig, FlowLMConfig, LookupTableConfig, MimiConfig,
    MimiTransformerConfig, QuantizerConfig, TransformerConfig,
)
from pocket_tts_tpu.models import flow_lm, flow_mlp, transformer  # noqa: E402
from pocket_tts_tpu.ops.rope import rope_table  # noqa: E402

from tests.parity_configs import FLOW_CFG as CFG  # noqa: E402


def maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _build_oracle():
    from pocket_tts.conditioners.base import BaseConditioner
    from pocket_tts.models.flow_lm import FlowLMModel
    from pocket_tts.modules.mimi_transformer import StreamingTransformer
    from pocket_tts.modules.mlp import SimpleMLPAdaLN

    class LUT(BaseConditioner):
        def __init__(self, n_bins, dim, output_dim):
            super().__init__(dim=dim, output_dim=output_dim)
            self.embed = torch.nn.Embedding(n_bins + 1, dim)

        def _get_condition(self, inputs):
            return self.embed(inputs[0])

    tcfg = CFG.flow_lm.transformer
    torch.manual_seed(60)
    m = FlowLMModel(
        conditioner=LUT(CFG.flow_lm.lookup_table.n_bins, 64, 64),
        flow_net=SimpleMLPAdaLN(16, 48, 16, 64, 2, num_time_conds=2),
        transformer=StreamingTransformer(
            d_model=tcfg.d_model, num_heads=tcfg.num_heads,
            num_layers=tcfg.num_layers, dim_feedforward=tcfg.dim_feedforward,
            kind="flow_lm"),
        dim=64, ldim=16, dtype=torch.float32,
    )
    m.speaker_proj_weight = torch.nn.Parameter(torch.zeros(64, 32))
    oracle.seed_torch_module(m, 61)
    sd = {f"flow_lm.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
    sd["flow_lm.conditioner.embed.weight"] = sd.pop("flow_lm.conditioner.embed.weight")
    sd["flow_lm.speaker_proj_weight"] = sd.pop("flow_lm.speaker_proj_weight")
    return m, weights.convert_flow_lm(sd, CFG)


def _oracle_generate(m, tokens, conditioning, n_frames):
    """Replicates tts_model._run_flow_lm_and_increment_step semantics at temp=0."""
    from pocket_tts.modules.stateful_module import increment_steps, init_states

    st = init_states(m, 1, 1000)
    outs = []

    def run(text_emb, latents):
        # mirror FlowLMModel.forward/backbone with temp=0 noise
        seq = latents
        seq = torch.where(torch.isnan(seq), m.bos_emb, seq) if seq.numel() else seq
        x = m.input_linear(seq) if seq.numel() else seq.new_zeros(1, 0, 64)
        full = torch.cat([text_emb, x], dim=1)
        y = m.transformer(full, st)
        y = m.out_norm(y)
        increment_steps(m, st, full.shape[1])
        return y

    if conditioning is not None:
        run(conditioning, torch.empty(1, 0, 16))
    if tokens is not None:
        run(m.conditioner.embed(tokens), torch.empty(1, 0, 16))

    latent = torch.full((1, 1, 16), float("nan"))
    eos_logits = []
    for _ in range(n_frames):
        y = run(torch.empty(1, 0, 64), latent)
        h = y[:, -1]
        eos_logits.append(float(m.out_eos(h)[0, 0]))
        noise = torch.zeros(1, 16)
        from functools import partial
        from pocket_tts.models.flow_lm import lsd_decode

        nxt = lsd_decode(partial(m.flow_net, h), noise, 2)
        outs.append(nxt.detach().numpy())
        latent = nxt[:, None, :]
    return np.concatenate(outs, 0), np.asarray(eos_logits)


def test_flow_lm_trajectory_temp0():
    m, p = _build_oracle()
    tcfg = CFG.flow_lm.transformer
    tokens = torch.tensor([[5, 17, 42, 7]])
    conditioning = torch.randn(1, 6, 64) * 0.1

    n_frames = 5
    with torch.no_grad():
        ref_latents, ref_eos = _oracle_generate(m, tokens, conditioning, n_frames)

    kc, vc = transformer.init_cache(tcfg.num_layers, 1, 64, tcfg.num_heads, tcfg.head_dim)
    pos = jnp.zeros((1,), jnp.int32)
    # audio conditioning prefill
    kc, vc, pos = flow_lm.prefill(p, CFG, kc, vc, pos,
                                  jnp.asarray(conditioning.numpy()),
                                  jnp.asarray([6], jnp.int32))
    # text prefill
    emb = flow_lm.embed_text(p, jnp.asarray(tokens.numpy()))
    kc, vc, pos = flow_lm.prefill(p, CFG, kc, vc, pos, emb, jnp.asarray([4], jnp.int32))

    table = flow_mlp.time_embedding_table(p["flow"], 2)
    latent = jnp.broadcast_to(p["bos_emb"], (1, 16))
    noise = jnp.zeros((1, 16))
    got_latents, got_eos = [], []
    for _ in range(n_frames):
        latent, eos_logit, kc, vc, pos = flow_lm.step(
            p, CFG, kc, vc, pos, latent, noise, table,
            lsd_decode_steps=2, eos_threshold=-4.0,
        )
        got_latents.append(np.asarray(latent))
        got_eos.append(float(eos_logit[0]))

    assert maxdiff(np.concatenate(got_latents, 0), ref_latents) < 5e-4
    assert maxdiff(np.asarray(got_eos), ref_eos) < 5e-4
