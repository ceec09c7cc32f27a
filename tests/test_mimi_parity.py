"""SEANet and full-Mimi parity against the PyTorch oracle (matched random
weights, reduced channel counts for CPU test speed — the layer *structure*
follows the b6369a24 config: ratios (6,5,4), stride-16 resampling)."""

import numpy as np
import pytest

from tests import oracle

if not oracle.install_shims():
    pytest.skip("oracle unavailable", allow_module_level=True)

import torch  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from pocket_tts_tpu import weights  # noqa: E402
from pocket_tts_tpu.config import MimiConfig, MimiTransformerConfig, QuantizerConfig, SEANetConfig  # noqa: E402
from pocket_tts_tpu.models import mimi, seanet  # noqa: E402

from tests.parity_configs import SMALL_MIMI as SMALL_CFG  # noqa: E402
from tests.parity_configs import SMALL_SEANET  # noqa: E402


def maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _seanet_kwargs(cfg: SEANetConfig) -> dict:
    return dict(
        channels=cfg.channels, dimension=cfg.dimension, n_filters=cfg.n_filters,
        n_residual_layers=cfg.n_residual_layers, ratios=list(cfg.ratios),
        kernel_size=cfg.kernel_size, last_kernel_size=cfg.last_kernel_size,
        residual_kernel_size=cfg.residual_kernel_size, dilation_base=cfg.dilation_base,
        pad_mode=cfg.pad_mode, compress=cfg.compress,
    )


class TestSEANet:
    def test_encoder_batch(self):
        from pocket_tts.modules.seanet import SEANetEncoder

        torch.manual_seed(40)
        m = SEANetEncoder(**_seanet_kwargs(SMALL_SEANET))
        oracle.seed_torch_module(m, 41)
        plan = seanet.encoder_plan(SMALL_SEANET)
        sd = {f"e.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
        p = weights.convert_seanet(sd, "e", plan)

        x = torch.randn(1, 1, 1920 * 2)
        ref = m(x, None).detach().numpy()
        got = seanet.batch_forward(plan, p, jnp.asarray(x.numpy()))
        assert got.shape == ref.shape  # [1, 32, 32] @ 200 Hz
        assert maxdiff(got, ref) < 1e-4

    def test_decoder_streaming_matches_oracle_and_batch(self):
        from pocket_tts.modules.seanet import SEANetDecoder
        from pocket_tts.modules.stateful_module import increment_steps, init_states

        torch.manual_seed(42)
        m = SEANetDecoder(**_seanet_kwargs(SMALL_SEANET))
        oracle.seed_torch_module(m, 43)
        plan = seanet.decoder_plan(SMALL_SEANET)
        sd = {f"d.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
        p = weights.convert_seanet(sd, "d", plan)

        frames = [torch.randn(1, 32, 16) for _ in range(3)]  # 16 @200 Hz per frame
        st_t = init_states(m, 1, 100)
        refs = []
        for f in frames:
            refs.append(m(f, st_t).detach().numpy())
            increment_steps(m, st_t, 16)
        ref = np.concatenate(refs, -1)

        st = seanet.init_state(plan, 1)
        gots = []
        for f in frames:
            y, st = seanet.streaming_forward(plan, p, st, jnp.asarray(f.numpy()))
            gots.append(np.asarray(y))
        got = np.concatenate(gots, -1)
        assert got.shape == ref.shape  # 3 * 1920 samples
        assert maxdiff(got, ref) < 1e-4

        x_all = jnp.asarray(torch.cat(frames, -1).numpy())
        got_batch = seanet.batch_forward(plan, p, x_all)
        assert maxdiff(got_batch, got) < 1e-4


def _build_oracle_mimi(cfg: MimiConfig):
    from pocket_tts.models.mimi import MimiModel
    from pocket_tts.modules.dummy_quantizer import DummyQuantizer
    from pocket_tts.modules.mimi_transformer import ProjectedTransformer
    from pocket_tts.modules.seanet import SEANetDecoder, SEANetEncoder

    tcfg = cfg.transformer
    tf_kwargs = dict(
        input_dimension=tcfg.input_dimension, output_dimensions=tuple(tcfg.output_dimensions),
        d_model=tcfg.d_model, num_heads=tcfg.num_heads, num_layers=tcfg.num_layers,
        layer_scale=tcfg.layer_scale, context=tcfg.context, max_period=tcfg.max_period,
        dim_feedforward=tcfg.dim_feedforward,
    )
    torch.manual_seed(50)
    m = MimiModel(
        encoder=SEANetEncoder(**_seanet_kwargs(cfg.seanet)),
        decoder=SEANetDecoder(**_seanet_kwargs(cfg.seanet)),
        quantizer=DummyQuantizer(cfg.quantizer.dimension, cfg.quantizer.output_dimension),
        frame_rate=cfg.frame_rate,
        encoder_frame_rate=cfg.sample_rate / cfg.seanet.hop_length,
        sample_rate=cfg.sample_rate,
        channels=cfg.channels,
        encoder_transformer=ProjectedTransformer(**tf_kwargs),
        decoder_transformer=ProjectedTransformer(**tf_kwargs),
    )
    oracle.seed_torch_module(m, 51)
    return m


class TestMimi:
    def test_encode_to_latent(self):
        m = _build_oracle_mimi(SMALL_CFG)
        plans = mimi.MimiPlans(SMALL_CFG)
        sd = {f"mimi.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
        p = weights.convert_mimi(sd, plans)

        torch.manual_seed(52)
        audio = torch.randn(1, 1, 1920 * 4 - 100)  # non-multiple: exercises padding
        ref = m.encode_to_latent(audio).detach().numpy()
        got = mimi.encode_to_latent(p, plans, jnp.asarray(audio.numpy()), block=16)
        assert got.shape == ref.shape  # [1, 32, 4] latents @ 12.5 Hz
        assert maxdiff(got, ref) < 2e-4

    def test_encode_streaming_chunked_matches_oracle(self):
        """Long voice prompts encode in fixed-size chunks with carried
        conv/ring-KV state (mimi.encode_step); the chain must equal the
        oracle's whole-sequence encode — the reference's chunked encode with
        carried model_state (tts_model.rs:530-545) has the same invariant."""
        m = _build_oracle_mimi(SMALL_CFG)
        plans = mimi.MimiPlans(SMALL_CFG)
        sd = {f"mimi.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
        p = weights.convert_mimi(sd, plans)

        torch.manual_seed(54)
        audio = torch.randn(1, 1, 1920 * 7 - 50)  # 7 frames, non-multiple tail
        ref = m.encode_to_latent(audio).detach().numpy()  # [1, 32, 7]

        chunk_frames = 2
        samples = chunk_frames * 1920
        x = audio.numpy()
        pad = (-x.shape[-1]) % samples
        x = np.pad(x, ((0, 0), (0, 0), (0, pad)))
        # ring: chunk write (16*2) + context (250) -> 512
        st = mimi.init_encode_state(plans, 1)
        lats = []
        for start in range(0, x.shape[-1], samples):
            lat, st = mimi.encode_step(p, plans, st,
                                       jnp.asarray(x[..., start:start + samples]))
            lats.append(np.asarray(lat))
        got = np.concatenate(lats, -1)[..., : ref.shape[-1]]
        assert got.shape == ref.shape
        assert maxdiff(got, ref) < 2e-4

    def test_decode_streaming_and_batch(self):
        from pocket_tts.modules.stateful_module import increment_steps, init_states

        m = _build_oracle_mimi(SMALL_CFG)
        plans = mimi.MimiPlans(SMALL_CFG)
        sd = {f"mimi.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
        p = weights.convert_mimi(sd, plans)

        torch.manual_seed(53)
        n_frames = 20  # > ring wrap at context 250? small model: exercises state carry
        latents = [torch.randn(1, SMALL_CFG.quantizer.dimension, 1) for _ in range(n_frames)]

        st_t = init_states(m, 1, 1000)
        refs = []
        for lat in latents:
            q = m.quantizer(lat)
            refs.append(m.decode_from_latent(q, st_t).detach().numpy())
            increment_steps(m, st_t, 16)
        ref = np.concatenate(refs, -1)

        st = mimi.init_decode_state(plans, 1)
        gots = []
        for lat in latents:
            y, st = mimi.decode_step(p, plans, st, jnp.asarray(lat.numpy()))
            gots.append(np.asarray(y))
        got = np.concatenate(gots, -1)
        assert got.shape == ref.shape
        assert maxdiff(got, ref) < 2e-4

        all_lat = jnp.asarray(torch.cat(latents, -1).numpy())
        got_batch = mimi.decode_batch(p, plans, all_lat, block=64)
        assert maxdiff(got_batch, got) < 2e-4


def test_decode_mixed_chunk_ring_wrap():
    """Regression: grouped decode with MIXED chunk widths leaves the ring
    cursor unaligned, so writes can straddle the ring end — they must wrap,
    not clamp.  Framewise decode is the ground truth; divergence previously
    began exactly at the first straddling chunk."""
    import dataclasses

    import jax.numpy as jnp

    # layer_scale=1.0: at the default 0.01 the attention update is attenuated
    # ~100x and ring corruption hides below test tolerance
    cfg = dataclasses.replace(
        SMALL_CFG, transformer=dataclasses.replace(SMALL_CFG.transformer,
                                                   layer_scale=1.0))
    m = _build_oracle_mimi(cfg)
    plans = mimi.MimiPlans(cfg)
    sd = {f"mimi.{k}": v for k, v in oracle.torch_state_dict_to_numpy(m).items()}
    p = weights.convert_mimi(sd, plans)

    torch.manual_seed(77)
    n_frames = 40  # 640 steps @200 Hz: several ring wraps
    latents = [torch.randn(1, cfg.quantizer.dimension, 1)
               for _ in range(n_frames)]

    st = mimi.init_decode_state(plans, 1)
    per_frame = []
    for lat in latents:
        y, st = mimi.decode_step(p, plans, st, jnp.asarray(lat.numpy()))
        per_frame.append(np.asarray(y))
    ref = np.concatenate(per_frame, -1)

    st = mimi.init_decode_state(plans, 1)
    got = []
    i = 0
    for k in (2, 4, 8, 8, 8, 8, 2):  # mixed widths -> unaligned cursor
        lat = jnp.asarray(torch.cat(latents[i:i + k], -1).numpy())
        y, st = mimi.decode_step(p, plans, st, lat)
        got.append(np.asarray(y))
        i += k
    got = np.concatenate(got, -1)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-4
