"""Numerical parity of core ops against the vendored PyTorch oracle.

Strategy (no released weights are downloadable in this environment): instantiate
the oracle modules with seeded random weights, export their state_dicts through
our checkpoint remap, run both sides on identical inputs, and assert max-abs-diff
tolerances — the same methodology as the reference's golden-asset parity tests
(crates/pocket-tts/tests/parity_tests.rs), minus the gated checkpoint.
"""

import numpy as np
import pytest

from tests import oracle

if not oracle.install_shims():
    pytest.skip("oracle unavailable", allow_module_level=True)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pocket_tts_tpu.ops import attention, conv, norms, rope  # noqa: E402

RTOL = 0
ATOL = 2e-5


def maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


class TestNorms:
    def test_rms_norm_torchvar(self):
        from pocket_tts.modules.mlp import RMSNorm

        torch.manual_seed(0)
        m = RMSNorm(64, eps=1e-5)
        with torch.no_grad():
            m.alpha.copy_(torch.randn(64))
        x = torch.randn(3, 5, 64)
        ref = m(x).detach().numpy()
        got = norms.rms_norm_torchvar(
            jnp.asarray(x.numpy()), jnp.asarray(m.alpha.detach().numpy()), eps=1e-5
        )
        assert maxdiff(got, ref) < ATOL

    def test_layer_norm_affine(self):
        from pocket_tts.modules.mlp import LayerNorm

        torch.manual_seed(1)
        m = LayerNorm(32, eps=1e-6)
        with torch.no_grad():
            m.weight.copy_(torch.randn(32))
            m.bias.copy_(torch.randn(32))
        x = torch.randn(2, 7, 32)
        ref = m(x).detach().numpy()
        got = norms.layer_norm(
            jnp.asarray(x.numpy()),
            jnp.asarray(m.weight.detach().numpy()),
            jnp.asarray(m.bias.detach().numpy()),
            eps=1e-6,
        )
        assert maxdiff(got, ref) < ATOL

    def test_layer_norm_no_affine(self):
        x = torch.randn(4, 16)
        ref = torch.nn.functional.layer_norm(x, (16,), eps=1e-6).numpy()
        got = norms.layer_norm(jnp.asarray(x.numpy()), eps=1e-6)
        assert maxdiff(got, ref) < ATOL


class TestRope:
    @pytest.mark.parametrize("offset", [0, 7, 123])
    def test_apply_rope(self, offset):
        from pocket_tts.modules.rope import apply_rope as torch_rope

        torch.manual_seed(2)
        b, t, h, d = 2, 5, 4, 16
        q = torch.randn(b, t, h, d)
        k = torch.randn(b, t, h, d)
        qr, kr = torch_rope(q, k, offset=offset, max_period=10000)

        positions = jnp.arange(t) + offset
        cos, sin = rope.rope_table(positions, d, 10000.0)
        got_q = rope.apply_rope(jnp.asarray(q.numpy()), cos, sin)
        got_k = rope.apply_rope(jnp.asarray(k.numpy()), cos, sin)
        # cos/sin ULP differences between libms dominate here; 1e-4 is still
        # 200x tighter than the reference parity bar (2e-2).
        assert maxdiff(got_q, qr.numpy()) < 1e-4
        assert maxdiff(got_k, kr.numpy()) < 1e-4


def _oracle_state(module, batch=1, seq=64):
    from pocket_tts.modules.stateful_module import init_states

    return init_states(module, batch, sequence_length=seq)


class TestConv:
    @pytest.mark.parametrize(
        "cin,cout,k,stride,dilation,groups,bias,pad_mode",
        [
            (4, 8, 7, 1, 1, 1, True, "constant"),
            (4, 8, 3, 1, 2, 1, True, "constant"),
            (6, 6, 8, 4, 1, 1, True, "constant"),
            (8, 8, 32, 16, 1, 1, False, "replicate"),
            (4, 4, 1, 1, 1, 1, True, "constant"),
        ],
    )
    def test_streaming_conv(self, cin, cout, k, stride, dilation, groups, bias, pad_mode):
        from pocket_tts.modules.conv import StreamingConv1d

        torch.manual_seed(3)
        m = StreamingConv1d(cin, cout, k, stride=stride, dilation=dilation,
                            groups=groups, bias=bias, pad_mode=pad_mode)
        spec = conv.ConvSpec(cin, cout, k, stride=stride, dilation=dilation,
                             groups=groups, bias=bias, pad_mode=pad_mode)
        w = jnp.asarray(m.conv.weight.detach().numpy())
        b = jnp.asarray(m.conv.bias.detach().numpy()) if bias else None

        chunk = 2 * stride
        x = torch.randn(2, cin, 6 * chunk)

        # batch mode (model_state=None)
        ref_batch = m(x, None).detach().numpy()
        got_batch = conv.batch_conv1d(spec, w, b, jnp.asarray(x.numpy()))
        assert maxdiff(got_batch, ref_batch) < ATOL

        # streaming in chunks
        st_t = _oracle_state(m, batch=2)
        st_j = conv.conv_init_state(spec, 2)
        refs, gots = [], []
        for i in range(6):
            xc = x[..., i * chunk : (i + 1) * chunk]
            refs.append(m(xc, st_t).detach().numpy())
            y, st_j = conv.streaming_conv1d(spec, w, b, st_j, jnp.asarray(xc.numpy()))
            gots.append(np.asarray(y))
        assert maxdiff(np.concatenate(gots, -1), np.concatenate(refs, -1)) < ATOL
        # streaming == batch
        assert maxdiff(np.concatenate(gots, -1), ref_batch) < ATOL

    @pytest.mark.parametrize(
        "cin,cout,k,stride,groups,bias",
        [
            (6, 4, 12, 6, 1, True),
            (8, 8, 32, 16, 8, False),
            (4, 2, 8, 4, 2, True),
        ],
    )
    def test_streaming_conv_transpose(self, cin, cout, k, stride, groups, bias):
        from pocket_tts.modules.conv import StreamingConvTranspose1d

        torch.manual_seed(4)
        m = StreamingConvTranspose1d(cin, cout, k, stride=stride, groups=groups, bias=bias)
        spec = conv.ConvTrSpec(cin, cout, k, stride=stride, groups=groups, bias=bias)
        w = jnp.asarray(m.convtr.weight.detach().numpy())
        b = jnp.asarray(m.convtr.bias.detach().numpy()) if bias else None

        x = torch.randn(2, cin, 12)
        st_t = _oracle_state(m, batch=2)
        st_j = conv.convtr_init_state(spec, 2)
        refs, gots = [], []
        for i in range(6):
            xc = x[..., i * 2 : (i + 1) * 2]
            refs.append(m(xc, st_t).detach().numpy())
            y, st_j = conv.streaming_conv_transpose1d(spec, w, b, st_j,
                                                      jnp.asarray(xc.numpy()))
            gots.append(np.asarray(y))
        ref = np.concatenate(refs, -1)
        got = np.concatenate(gots, -1)
        assert maxdiff(got, ref) < ATOL

        got_batch = conv.batch_conv_transpose1d(spec, w, b, jnp.asarray(x.numpy()))
        assert maxdiff(got_batch, ref) < 1e-4


class TestPrefillWrite:
    """Drop-mode prefill writes (review finding: bucket-wide garbage from
    batched admission must never clamp backward over a busy slot's live KV)."""

    def test_valid_prefix_written_rest_dropped(self):
        from pocket_tts_tpu.ops.attention import prefill_write

        cache = jnp.full((2, 8, 1, 2), -1.0)
        new = jnp.ones((2, 4, 1, 2)) * jnp.arange(1, 5)[None, :, None, None]
        start = jnp.asarray([2, 6], jnp.int32)
        t_valid = jnp.asarray([3, 0], jnp.int32)
        out = np.asarray(prefill_write(cache, new, start, t_valid))[:, :, 0, 0]
        # slot 0: positions 2..4 written with 1,2,3; rest untouched
        assert list(out[0]) == [-1, -1, 1, 2, 3, -1, -1, -1]
        # slot 1 (t_valid 0, start near the end): NOTHING written — the old
        # DUS would have clamped the 4-wide block back over positions 4..7
        assert list(out[1]) == [-1] * 8

    def test_write_near_capacity_no_backward_clamp(self):
        from pocket_tts_tpu.ops.attention import prefill_write

        cache = jnp.zeros((1, 8, 1, 1))
        new = jnp.ones((1, 6, 1, 1))
        # start 6 with 2 valid: only 6,7 written; positions 8..11 dropped
        out = np.asarray(prefill_write(cache, new, jnp.asarray([6]),
                                       jnp.asarray([2])))[0, :, 0, 0]
        assert list(out) == [0, 0, 0, 0, 0, 0, 1, 1]
