"""Flow-matching fine-tune objective for the FlowLM.

The reference ships inference only; this trains the same architecture the
inference path runs (models/flow_lm.py, models/flow_mlp.py), so a fine-tuned
param tree drops straight into the engine.

Objective (three terms, per-frame masked):

* **Flow matching** — the sampler (flow_mlp.lsd_decode) Euler-integrates
  ``x <- x + f(x_s; s, t) * (t - s)`` from a standard-normal prior at s=0 to
  the data latent at s=1, conditioning the net on (TE_s(s) + TE_t(t))/2 plus
  the backbone output.  The matching loss trains f at the zero-width limit
  t = s on the rectified-flow interpolant ``x_s = (1-s)·eps + s·x1`` with
  target velocity ``x1 - eps`` (Liu et al., rectified flow; the s_i = i/N,
  t_i = (i+1)/N schedule in flow_mlp.time_embedding_table is the sampler's
  discretization of exactly this field).
* **LSD self-consistency** (opt-in, ``consistency_weight``) — trains the
  two-time head to predict *average* velocity over a finite jump [s, t] by
  bootstrapping from two stop-gradient half-jumps through the midpoint
  (Lagrangian Self Distillation, arXiv 2505.18825 — the property that makes
  1-2 step LSD decoding work at inference).
* **EOS** — binary cross-entropy on the stop logit: 0 while frames remain,
  1 at the position after the final frame (flow_lm.py:124 semantics: the
  logit is read *before* a frame is generated).

Teacher forcing runs the backbone once over the packed sequence
``[conditioning, BOS latent, latents…]`` — the full-sequence formulation of
the streaming prefill+step path (transformer.batch_forward with context=None
is the same causal attention the dense KV cache computes incrementally), so
training and inference share every parameterized op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import Config
from pocket_tts_tpu.models import flow_mlp, transformer
from pocket_tts_tpu.models.flow_lm import embed_text, speaker_project
from pocket_tts_tpu.models.flow_mlp import _timestep_embedding, flow_step
from pocket_tts_tpu.ops.norms import layer_norm
from pocket_tts_tpu.ops.qtensor import mat
from pocket_tts_tpu.ops.rope import rope_table


def _two_time_embedding(flow_params: dict, s: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(TE_s(s) + TE_t(t)) / 2 for arbitrary [..]-shaped times — the dynamic-
    time counterpart of flow_mlp.time_embedding_table (which tabulates the
    static inference schedule)."""
    e_s = _timestep_embedding(flow_params["time_embed_0"], s)
    e_t = _timestep_embedding(flow_params["time_embed_1"], t)
    return (e_s + e_t) / 2.0


def _pack_cond_and_latents(
    params: dict,
    cond_emb: jnp.ndarray,   # [B, Tc, D] conditioning embeddings (right-padded)
    cond_valid: jnp.ndarray,  # [B] int32 valid conditioning positions
    latents: jnp.ndarray,    # [B, Tf, ldim] normalized target latents (right-padded)
) -> jnp.ndarray:
    """Per-example packed input [B, Tc+Tf+1, D]: conditioning, then the BOS
    latent, then latents[0..Tf-1], with all padding at the tail.

    Right-padding must sit *between* segments for no example (padded keys
    before a valid query would leak into causal attention), so each row is
    re-packed with a gather: position j reads cond[j] while j < cond_valid,
    then latent-input j - cond_valid.  Tail junk (beyond cond_valid + Tf + 1)
    is never attended by a loss-bearing query and is masked out of the loss.
    """
    b, tc, d = cond_emb.shape
    tf = latents.shape[1]
    w_in = mat(params["input_w"])
    bos = jnp.broadcast_to(params["bos_emb"].astype(jnp.float32)[None, None, :],
                           (b, 1, latents.shape[2]))
    lat_in = jnp.concatenate([bos, latents.astype(jnp.float32)], axis=1)
    x_lat = jnp.einsum("btl,dl->btd", lat_in.astype(w_in.dtype), w_in)
    src = jnp.concatenate([cond_emb.astype(x_lat.dtype), x_lat], axis=1)  # [B, Tc+Tf+1, D]
    s_len = tc + tf + 1
    j = jnp.arange(s_len, dtype=jnp.int32)[None, :]
    cv = cond_valid.astype(jnp.int32)[:, None]
    idx = jnp.where(j < cv, j, jnp.clip(tc + j - cv, 0, s_len - 1))
    return jnp.take_along_axis(src, idx[:, :, None], axis=1)


def teacher_forced_conditioning(
    params: dict,
    cfg: Config,
    cond_emb: jnp.ndarray,
    cond_valid: jnp.ndarray,
    latents: jnp.ndarray,
) -> jnp.ndarray:
    """One causal pass over the packed sequence; returns the backbone outputs
    at the frame positions, [B, Tf+1, D] f32 (post out_norm — the ``h`` the
    streaming step computes per frame, flow_lm.step).  Index i < Tf conditions
    frame i; index Tf is the stop position (its input is the final latent)."""
    tcfg = cfg.flow_lm.transformer
    x = _pack_cond_and_latents(params, cond_emb, cond_valid, latents)
    b, s_len, _ = x.shape
    tf = latents.shape[1]
    positions = jnp.broadcast_to(jnp.arange(s_len, dtype=jnp.int32)[None, :], (b, s_len))
    cos, sin = rope_table(positions, tcfg.head_dim, tcfg.max_period)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    y = transformer.batch_forward(params["tf"], tcfg.num_heads, None, x, cos, sin)
    h = layer_norm(y, params["out_norm_w"], params["out_norm_b"], eps=1e-5)
    frame_idx = cond_valid.astype(jnp.int32)[:, None] + jnp.arange(tf + 1, dtype=jnp.int32)[None, :]
    h_frames = jnp.take_along_axis(h, frame_idx[:, :, None], axis=1)
    return h_frames.astype(jnp.float32)


def build_conditioning(
    params: dict,
    tokens: jnp.ndarray,       # [B, Tt] int32 (right-padded with any id)
    token_valid: jnp.ndarray,  # [B]
    voice_latents: jnp.ndarray | None = None,  # [B, Tv, 512] Mimi encoder latents
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Conditioning embeddings the way inference builds them: optional
    speaker-projected voice frames (tts.get_voice_state), then text-token
    embeddings.  Voice frames must share one length across the batch (the
    common fine-tune setup: one voice prompt); text right-pads per example."""
    text = embed_text(params, tokens.astype(jnp.int32))
    if voice_latents is None:
        return text, token_valid.astype(jnp.int32)
    voice = speaker_project(params, voice_latents.astype(jnp.float32))
    cond = jnp.concatenate([voice.astype(text.dtype), text], axis=1)
    return cond, voice.shape[1] + token_valid.astype(jnp.int32)


def flow_matching_loss(
    params: dict,
    cfg: Config,
    batch: dict,
    key: jax.Array,
    *,
    eos_weight: float = 1.0,
    consistency_weight: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Total loss + metrics for one batch.

    ``batch``: tokens [B,Tt] i32, token_valid [B] i32, latents [B,Tf,ldim] f32
    (normalized — see data.encode_latent_targets), latent_valid [B] i32,
    optional voice_latents [B,Tv,512].
    """
    latents = batch["latents"].astype(jnp.float32)
    b, tf, ldim = latents.shape
    fv = batch["latent_valid"].astype(jnp.int32)

    cond_emb, cond_valid = build_conditioning(
        params, batch["tokens"], batch["token_valid"], batch.get("voice_latents"))
    h_frames = teacher_forced_conditioning(params, cfg, cond_emb, cond_valid, latents)

    # --- EOS: logit at index i stops generation of frame i ---------------
    eos_logits = h_frames @ params["out_eos_w"][0] + params["out_eos_b"][0]  # [B, Tf+1]
    i = jnp.arange(tf + 1, dtype=jnp.int32)[None, :]
    eos_target = (i == fv[:, None]).astype(jnp.float32)
    eos_mask = (i <= fv[:, None]).astype(jnp.float32)
    bce = jnp.maximum(eos_logits, 0) - eos_logits * eos_target + jnp.log1p(
        jnp.exp(-jnp.abs(eos_logits)))
    eos_loss = jnp.sum(bce * eos_mask) / jnp.maximum(jnp.sum(eos_mask), 1.0)

    # --- flow matching at t = s ------------------------------------------
    flow = params["flow"]
    cond_flow = flow_mlp.embed_condition(flow, h_frames[:, :tf])  # [B, Tf, dim]
    frame_mask = (jnp.arange(tf, dtype=jnp.int32)[None, :] < fv[:, None]).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(frame_mask), 1.0)

    k_eps, k_s, k_cons = jax.random.split(key, 3)
    eps = jax.random.normal(k_eps, latents.shape, jnp.float32)
    s = jax.random.uniform(k_s, (b, tf), jnp.float32)
    x_s = (1.0 - s[..., None]) * eps + s[..., None] * latents
    v_target = latents - eps
    y = _two_time_embedding(flow, s, s) + cond_flow
    v = flow_step(flow, y, x_s)
    flow_loss = jnp.sum(
        jnp.mean(jnp.square(v.astype(jnp.float32) - v_target), axis=-1) * frame_mask
    ) / denom

    metrics = {"flow_mse": flow_loss, "eos_bce": eos_loss}
    total = flow_loss + eos_weight * eos_loss

    # --- LSD self-consistency over a finite jump (opt-in) ----------------
    if consistency_weight > 0.0:
        k_e2, k_s2, k_u2 = jax.random.split(k_cons, 3)
        eps2 = jax.random.normal(k_e2, latents.shape, jnp.float32)
        s2 = jax.random.uniform(k_s2, (b, tf), jnp.float32)
        t2 = s2 + (1.0 - s2) * jax.random.uniform(k_u2, (b, tf), jnp.float32)
        m = (s2 + t2) / 2.0
        x_s2 = (1.0 - s2[..., None]) * eps2 + s2[..., None] * latents
        # teacher: two stop-gradient half-jumps through the midpoint
        v1 = flow_step(flow, _two_time_embedding(flow, s2, m) + cond_flow, x_s2)
        x_m = x_s2 + (m - s2)[..., None] * v1.astype(jnp.float32)
        v2 = flow_step(flow, _two_time_embedding(flow, m, t2) + cond_flow, x_m)
        v_teach = jax.lax.stop_gradient((v1.astype(jnp.float32) + v2.astype(jnp.float32)) / 2.0)
        v_stu = flow_step(flow, _two_time_embedding(flow, s2, t2) + cond_flow, x_s2)
        cons = jnp.sum(
            jnp.mean(jnp.square(v_stu.astype(jnp.float32) - v_teach), axis=-1) * frame_mask
        ) / denom
        metrics["consistency"] = cons
        total = total + consistency_weight * cons

    metrics["loss"] = total
    return total, metrics
