"""Mimi codec: SEANet enc/dec + windowed transformers + frame-rate resampling.

Composition from python-reference/pocket_tts/models/mimi.py:15-112.  The
"quantizer" is a single 1x1 conv projection 32->512 (DummyQuantizer) — there is
no real RVQ in this model.

Encode (voice cloning, batch): pad to frame multiple -> SEANet encoder (24 kHz ->
200 Hz x512) -> windowed encoder transformer -> stride-16 downsample -> 12.5 Hz
latents.  Decode (streaming, inside the frame scan): 1x1 quantizer proj ->
depthwise transposed-conv upsample x16 -> windowed decoder transformer (ring KV)
-> SEANet decoder -> 1920 samples per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import MimiConfig
from pocket_tts_tpu.models import seanet, transformer
from pocket_tts_tpu.ops.conv import (
    ConvSpec,
    ConvTrSpec,
    batch_conv1d,
    batch_conv_transpose1d,
    convtr_init_state,
    pad_for_frame,
    streaming_conv_transpose1d,
)
from pocket_tts_tpu.ops.rope import rope_table


def specs(cfg: MimiConfig):
    stride = cfg.resample_stride
    dim = cfg.seanet.dimension
    return {
        "quantizer": ConvSpec(cfg.quantizer.dimension, cfg.quantizer.output_dimension,
                              1, bias=False),
        # reference: python-reference/pocket_tts/modules/resample.py
        "downsample": ConvSpec(dim, dim, 2 * stride, stride=stride, bias=False,
                               pad_mode="replicate"),
        "upsample": ConvTrSpec(dim, dim, 2 * stride, stride=stride,
                               groups=dim, bias=False),
    }


class MimiPlans:
    """Static layer plans derived from config (hashable per config)."""

    def __init__(self, cfg: MimiConfig):
        self.cfg = cfg
        self.encoder = seanet.encoder_plan(cfg.seanet)
        self.decoder = seanet.decoder_plan(cfg.seanet)
        self.specs = specs(cfg)


def init_params(key: jax.Array, plans: MimiPlans) -> dict:
    cfg = plans.cfg
    tcfg = cfg.transformer
    ks = jax.random.split(key, 8)
    sp = plans.specs
    return {
        "encoder": seanet.init_params(ks[0], plans.encoder),
        "decoder": seanet.init_params(ks[1], plans.decoder),
        "enc_tf": {"layers": transformer.init_params(
            ks[2], tcfg.num_layers, tcfg.d_model, tcfg.dim_feedforward, tcfg.layer_scale)},
        "dec_tf": {"layers": transformer.init_params(
            ks[3], tcfg.num_layers, tcfg.d_model, tcfg.dim_feedforward, tcfg.layer_scale)},
        "quantizer_w": seanet._init_conv(ks[4], sp["quantizer"])["w"],
        "downsample_w": seanet._init_conv(ks[5], sp["downsample"])["w"],
        "upsample_w": seanet._init_conv(ks[6], sp["upsample"], transposed=True)["w"],
    }


def encode_to_latent(
    params: dict, plans: MimiPlans, audio: jnp.ndarray, block: int = 256
) -> jnp.ndarray:
    """[B, 1, T] 24 kHz waveform -> [B, 32?] no — [B, dim=512, T/1920] latents.

    Batch-mode (model_state=None) semantics of mimi.py:88-111.  Output latent is
    the *unprojected* 512-dim embedding; the 32-dim bottleneck only exists on the
    decode side of this model family.
    """
    cfg = plans.cfg
    tcfg = cfg.transformer
    x = pad_for_frame(audio, cfg.frame_size)
    emb = seanet.batch_forward(plans.encoder, params["encoder"], x)  # [B, 512, T200]
    t200 = emb.shape[-1]
    pos = jnp.arange(t200)
    cos, sin = rope_table(pos, tcfg.head_dim, tcfg.max_period)
    emb = transformer.projected_batch_forward(
        params["enc_tf"], tcfg, emb, cos, sin, block=block
    )
    sp = plans.specs["downsample"]
    return batch_conv1d(sp, params["downsample_w"], None, emb)


def init_encode_state(plans: MimiPlans, batch: int, dtype=jnp.float32) -> dict:
    """Streaming-encode state: SEANet encoder conv tails, encoder-transformer
    KV tails (last context-1 positions — ops.tail_attention), and the
    stride-16 downsample conv tail.  Lets arbitrarily long voice prompts
    encode in fixed-size chunks with EXACT batch-encode semantics (reference:
    chunked encode_to_latent with carried model_state,
    crates/pocket-tts/src/tts_model.rs:530-545)."""
    cfg = plans.cfg
    tcfg = cfg.transformer
    kc, vc = transformer.init_tail(
        tcfg.num_layers, batch, tcfg.context, tcfg.num_heads, tcfg.head_dim, dtype
    )
    from pocket_tts_tpu.ops.conv import conv_init_state

    return {
        "enc": seanet.init_state(plans.encoder, batch, dtype),
        "kc": kc,
        "vc": vc,
        "pos": jnp.zeros((batch,), jnp.int32),
        "down": conv_init_state(plans.specs["downsample"], batch, dtype),
    }


def encode_step(
    params: dict, plans: MimiPlans, state: dict, audio: jnp.ndarray
) -> tuple[jnp.ndarray, dict]:
    """Streaming encode of one chunk: [B, 1, C*frame_size] -> [B, 512, C].

    Chunk length must be a multiple of ``frame_size`` (keeps every strided
    conv's phase aligned across chunk boundaries).  Chaining encode_step over
    chunks from a fresh init_encode_state equals encode_to_latent on the whole
    waveform (same ops; the banded batch attention and the windowed ring
    attention share the window rule)."""
    from pocket_tts_tpu.ops.conv import streaming_conv1d

    cfg = plans.cfg
    tcfg = cfg.transformer
    x, enc_state = seanet.streaming_forward(plans.encoder, params["encoder"],
                                            state["enc"], audio)
    t200 = x.shape[-1]
    positions = state["pos"][:, None] + jnp.arange(t200, dtype=jnp.int32)[None, :]
    cos, sin = rope_table(positions, tcfg.head_dim, tcfg.max_period)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    x, kc, vc = transformer.projected_tail_forward(
        params["enc_tf"], tcfg, state["kc"], state["vc"], state["pos"], x, cos, sin
    )
    sp = plans.specs["downsample"]
    lat, down_state = streaming_conv1d(sp, params["downsample_w"], None,
                                       state["down"], x)
    new_state = {"enc": enc_state, "kc": kc, "vc": vc,
                 "pos": state["pos"] + t200, "down": down_state}
    return lat, new_state


def quantize(params: dict, latent_bct: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv 32 -> 512 (DummyQuantizer.output_proj)."""
    from pocket_tts_tpu.ops.qtensor import mat

    w = mat(params["quantizer_w"])[:, :, 0]
    return jnp.einsum("bct,dc->bdt", latent_bct.astype(w.dtype), w)


def init_decode_state(plans: MimiPlans, batch: int, dtype=jnp.float32) -> dict:
    """Decoder streaming state.  kc/vc are KV *tails* (last context-1
    positions, ops.tail_attention) — O(context) memory and attention cost per
    chunk of ANY width, where the previous ring buffer cost O(capacity) in
    both (measured 2x per-frame slowdown when the ring grew 4096 -> 8192)."""
    cfg = plans.cfg
    tcfg = cfg.transformer
    kc, vc = transformer.init_tail(
        tcfg.num_layers, batch, tcfg.context, tcfg.num_heads, tcfg.head_dim, dtype
    )
    return {
        "up": convtr_init_state(plans.specs["upsample"], batch, dtype),
        "kc": kc,
        "vc": vc,
        "pos": jnp.zeros((batch,), jnp.int32),
        "dec": seanet.init_state(plans.decoder, batch, dtype),
    }


def decode_step(
    params: dict, plans: MimiPlans, state: dict, latent_bct: jnp.ndarray
) -> tuple[jnp.ndarray, dict]:
    """Streaming decode of T' latent frames (usually 1) -> audio [B, 1, T'*1920].

    Input is the denormalized 32-dim latent as [B, 32, T'] (quantizer applied
    inside).  Mirrors the per-frame worker in tts_model.py:264-299.
    """
    cfg = plans.cfg
    tcfg = cfg.transformer
    x = quantize(params, latent_bct)
    x, up_state = streaming_conv_transpose1d(
        plans.specs["upsample"], params["upsample_w"], None, state["up"], x
    )
    t200 = x.shape[-1]
    positions = state["pos"][:, None] + jnp.arange(t200, dtype=jnp.int32)[None, :]
    cos, sin = rope_table(positions, tcfg.head_dim, tcfg.max_period)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    x, kc, vc = transformer.projected_tail_forward(
        params["dec_tf"], tcfg, state["kc"], state["vc"], state["pos"], x, cos, sin
    )
    audio, dec_state = seanet.streaming_forward(plans.decoder, params["decoder"],
                                                state["dec"], x)
    new_state = {"up": up_state, "kc": kc, "vc": vc,
                 "pos": state["pos"] + t200, "dec": dec_state}
    return audio, new_state


def decode_batch(params: dict, plans: MimiPlans, latent_bct: jnp.ndarray,
                 block: int = 256) -> jnp.ndarray:
    """Whole-utterance decode with fresh-state streaming semantics (for tests and
    offline synthesis): equivalent to scanning decode_step over frames."""
    cfg = plans.cfg
    tcfg = cfg.transformer
    x = quantize(params, latent_bct)
    x = batch_conv_transpose1d(plans.specs["upsample"], params["upsample_w"], None, x)
    t200 = x.shape[-1]
    pos = jnp.arange(t200)
    cos, sin = rope_table(pos, tcfg.head_dim, tcfg.max_period)
    x = transformer.projected_batch_forward(params["dec_tf"], tcfg, x, cos, sin,
                                            block=block)
    return seanet.batch_forward(plans.decoder, params["decoder"], x)
