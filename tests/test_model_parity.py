"""Parity of the transformer stacks, flow MLP, SEANet and Mimi against the
PyTorch oracle with matched random weights (see tests/test_ops_parity.py for the
methodology)."""

import numpy as np
import pytest

from tests import oracle

if not oracle.install_shims():
    pytest.skip("oracle unavailable", allow_module_level=True)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pocket_tts_tpu import weights  # noqa: E402
from pocket_tts_tpu.config import Config, MimiTransformerConfig  # noqa: E402
from pocket_tts_tpu.models import flow_mlp, mimi, seanet, transformer  # noqa: E402
from pocket_tts_tpu.ops.rope import rope_table  # noqa: E402


def maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def oracle_states(module, batch=1, seq=64):
    from pocket_tts.modules.stateful_module import init_states

    return init_states(module, batch, sequence_length=seq)


class TestFlowMLP:
    def _build(self):
        from pocket_tts.modules.mlp import SimpleMLPAdaLN

        torch.manual_seed(10)
        m = SimpleMLPAdaLN(
            in_channels=32, model_channels=64, out_channels=32,
            cond_channels=48, num_res_blocks=3, num_time_conds=2,
        )
        oracle.seed_torch_module(m, seed=11)
        sd = {f"x.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
        p = weights.convert_flow_mlp(sd, "x", depth=3)
        return m, p

    def test_forward(self):
        m, p = self._build()
        torch.manual_seed(12)
        c = torch.randn(2, 48)
        x = torch.randn(2, 32)
        s = torch.full((2, 1), 0.25)
        t = torch.full((2, 1), 0.75)
        ref = m(c, s, t, x).detach().numpy()

        # assemble y = mean of time embeds + cond embed, then run the block chain
        e_s = flow_mlp._timestep_embedding(p["time_embed_0"], jnp.asarray([0.25]))
        e_t = flow_mlp._timestep_embedding(p["time_embed_1"], jnp.asarray([0.75]))
        y = (e_s + e_t) / 2 + flow_mlp.embed_condition(p, jnp.asarray(c.numpy()))
        got = flow_mlp.flow_step(p, y, jnp.asarray(x.numpy()))
        assert maxdiff(got, ref) < 5e-5

    def test_lsd_decode(self):
        from pocket_tts.models.flow_lm import lsd_decode as torch_lsd
        from functools import partial

        m, p = self._build()
        torch.manual_seed(13)
        c = torch.randn(2, 48)
        noise = torch.randn(2, 32)
        for n_steps in (1, 4):
            ref = torch_lsd(partial(m, c), noise.clone(), n_steps).detach().numpy()
            table = flow_mlp.time_embedding_table(p, n_steps)
            cond = flow_mlp.embed_condition(p, jnp.asarray(c.numpy()))
            got = flow_mlp.lsd_decode(p, cond, table, jnp.asarray(noise.numpy()), n_steps)
            assert maxdiff(got, ref) < 1e-4, n_steps


def _convert_tf(m, n_layers, layer_scale):
    sd = {f"x.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
    return weights.convert_transformer(sd, "x", n_layers, layer_scale)


class TestFlowLMTransformer:
    """kind='flow_lm': unbounded causal, NaN-grown cache in the oracle, dense
    cache + cursor here."""

    def _build(self, d_model=64, heads=4, layers=3, ff=128):
        from pocket_tts.modules.mimi_transformer import StreamingTransformer

        torch.manual_seed(20)
        m = StreamingTransformer(
            d_model=d_model, num_heads=heads, num_layers=layers,
            dim_feedforward=ff, kind="flow_lm",
        )
        oracle.seed_torch_module(m, seed=21)
        return m, _convert_tf(m, layers, layer_scale=False)

    def test_prefill_then_steps(self):
        m, p = self._build()
        heads, d_model = 4, 64
        torch.manual_seed(22)
        prefill = torch.randn(1, 9, d_model)
        steps = [torch.randn(1, 1, d_model) for _ in range(4)]

        from pocket_tts.modules.stateful_module import increment_steps

        st = oracle_states(m, batch=1, seq=32)
        refs = [m(prefill, st).detach().numpy()]
        increment_steps(m, st, 9)
        for s in steps:
            refs.append(m(s, st).detach().numpy())
            increment_steps(m, st, 1)

        kc, vc = transformer.init_cache(3, 1, 32, heads, d_model // heads)
        pos = jnp.zeros((1,), jnp.int32)
        gots = []
        for x in [prefill] + steps:
            t = x.shape[1]
            positions = pos[:, None] + jnp.arange(t)[None, :]
            cos, sin = rope_table(positions, d_model // heads, 10000.0)
            cos, sin = cos[:, :, None, :], sin[:, :, None, :]
            y, kc, vc = transformer.cache_forward(
                p, heads, kc, vc, pos, jnp.asarray(x.numpy()), cos, sin
            )
            gots.append(np.asarray(y))
            pos = pos + t
        for ref, got in zip(refs, gots):
            assert maxdiff(got, ref) < 1e-4


class TestMimiTransformer:
    CFG = MimiTransformerConfig(d_model=64, num_heads=4, num_layers=2,
                                layer_scale=0.01, context=20, dim_feedforward=128)

    def _build(self):
        from pocket_tts.modules.mimi_transformer import StreamingTransformer

        torch.manual_seed(30)
        m = StreamingTransformer(
            d_model=64, num_heads=4, num_layers=2, layer_scale=0.01,
            dim_feedforward=128, context=20, kind="mimi",
        )
        oracle.seed_torch_module(m, seed=31)
        return m, _convert_tf(m, 2, layer_scale=True)

    def test_streaming_ring(self):
        cfg = self.CFG
        m, p = self._build()
        torch.manual_seed(32)
        chunks = [torch.randn(1, 4, 64) for _ in range(12)]  # 48 steps > context+ring wrap

        from pocket_tts.modules.stateful_module import increment_steps

        st = oracle_states(m, batch=1, seq=1000)
        refs = []
        for c in chunks:
            refs.append(m(c, st).detach().numpy())
            increment_steps(m, st, 4)

        kc, vc = transformer.init_tail(2, 1, cfg.context, 4, 16)
        pos = jnp.zeros((1,), jnp.int32)
        gots = []
        for c in chunks:
            t = c.shape[1]
            positions = pos[:, None] + jnp.arange(t)[None, :]
            cos, sin = rope_table(positions, 16, 10000.0)
            cos, sin = cos[:, :, None, :], sin[:, :, None, :]
            y, kc, vc = transformer.tail_forward(
                p, 4, cfg.context, kc, vc, pos, jnp.asarray(c.numpy()), cos, sin
            )
            gots.append(np.asarray(y))
            pos = pos + t
        for i, (ref, got) in enumerate(zip(refs, gots)):
            assert maxdiff(got, ref) < 1e-4, i

    def test_batch_banded(self):
        cfg = self.CFG
        m, p = self._build()
        torch.manual_seed(33)
        x = torch.randn(1, 64, 64)  # oracle batch path only broadcasts at B=1
        ref = m(x, None).detach().numpy()  # model_state=None: from_kv + window bias

        cos, sin = rope_table(jnp.arange(64), 16, 10000.0)
        got = transformer.batch_forward(p, 4, cfg.context, jnp.asarray(x.numpy()),
                                        cos, sin, block=16)
        assert maxdiff(got, ref) < 1e-4

    def test_batch_banded_unblocked_vs_blocked(self):
        cfg = self.CFG
        _, p = self._build()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64)),
                        dtype=jnp.float32)
        cos, sin = rope_table(jnp.arange(64), 16, 10000.0)
        a = transformer.batch_forward(p, 4, cfg.context, x, cos, sin, block=64)
        b = transformer.batch_forward(p, 4, cfg.context, x, cos, sin, block=16)
        assert maxdiff(a, b) < 1e-5


class TestRingStraddle:
    """Mixed-width ring writes whose cumulative cursor is unaligned to the
    current width must wrap at the ring end (review finding: a DUS there
    silently clamps).  Oracle = the reference's scatter-based ring cache."""

    def test_mixed_width_ring_matches_oracle(self):
        from pocket_tts.modules.mimi_transformer import StreamingTransformer
        from pocket_tts.modules.stateful_module import increment_steps, init_states

        torch.manual_seed(90)
        m = StreamingTransformer(d_model=64, num_heads=4, num_layers=2,
                                 layer_scale=1.0, dim_feedforward=128,
                                 context=20, kind="mimi")
        oracle.seed_torch_module(m, 91)
        p = _convert_tf(m, 2, layer_scale=True)

        cap = 24  # writes of width 2/4/8 with cursor 0,2,6,14 -> 14+8 straddles
        widths = [2, 4, 8, 8, 4, 2, 8, 8]
        torch.manual_seed(92)
        chunks = [torch.randn(1, w, 64) for w in widths]

        st = oracle_states(m, batch=1, seq=cap)  # oracle ring capacity == cap
        refs = []
        for c in chunks:
            refs.append(m(c, st).detach().numpy())
            increment_steps(m, st, c.shape[1])

        kc, vc = transformer.init_tail(2, 1, 20, 4, 16)
        pos = jnp.zeros((1,), jnp.int32)
        for c, ref in zip(chunks, refs):
            t = c.shape[1]
            positions = pos[:, None] + jnp.arange(t)[None, :]
            from pocket_tts_tpu.ops.rope import rope_table

            cos, sin = rope_table(positions, 16, 10000.0)
            cos, sin = cos[:, :, None, :], sin[:, :, None, :]
            y, kc, vc = transformer.tail_forward(
                p, 4, 20, kc, vc, pos, jnp.asarray(c.numpy()), cos, sin)
            # 3e-4: the tail buffer feeds keys to attention in chronological
            # order while the oracle's ring uses slot order — f32 softmax/sum
            # reassociation, not a semantic difference
            assert maxdiff(y, ref) < 3e-4, f"pos={int(pos[0])} width={t}"
            pos = pos + t
