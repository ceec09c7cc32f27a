"""FlowLM: causal autoregressive backbone + flow head.

Pipeline per frame (reference: python-reference/pocket_tts/models/flow_lm.py:91-134):
input_linear(latent 32->1024) -> 6-layer causal transformer (dense KV cache) ->
LayerNorm -> last frame -> EOS logit vs threshold -> Gaussian noise (std=sqrt(temp),
optional truncation) -> LSD Euler flow decode back to a 32-dim latent.

TPU shaping: everything is a pure function over (params, cache, pos); the BOS
sentinel is an explicit first-input latent (= ``bos_emb``) instead of the
reference's NaN convention (flow_lm.py:116) — NaN sentinels don't survive
compiler-optimized arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import Config
from pocket_tts_tpu.models import flow_mlp, transformer
from pocket_tts_tpu.ops.norms import layer_norm
from pocket_tts_tpu.ops.qtensor import mat
from pocket_tts_tpu.ops.rope import rope_table


def sample_noise(
    key: jax.Array,
    shape: tuple[int, ...],
    temp,
    noise_clamp,
    clamped: bool = False,
) -> jnp.ndarray:
    """Gaussian noise with std=sqrt(temp); when ``clamped``, truncated to
    ±noise_clamp (absolute units, matching torch trunc_normal_(std=std, a=-c,
    b=c); reference: crates/pocket-tts/src/models/flow_lm.rs:39-65).

    ``temp`` may be a per-batch [B] vector (continuous batching); ``clamped``
    is static because truncation changes the compiled program — EXCEPT in
    ``clamped="vec"`` mode, where ``noise_clamp`` is a per-slot [B] vector
    (< 0 means unclamped; 0 is a hard zero-clamp, matching the scalar path's
    noise_clamp=0.0) and the choice is data: both samplers draw from the same
    key and each slot selects its own.  One compiled program serves
    mixed-clamp batches.
    """
    temp = jnp.asarray(temp, jnp.float32)
    std = jnp.sqrt(temp)
    if temp.ndim == 1:
        std = std[:, None]
    if clamped == "vec":
        clamp = jnp.asarray(noise_clamp, jnp.float32)[:, None]
        bound = jnp.where(clamp > 0, clamp, 1.0) / jnp.maximum(std, 1e-12)
        free = jax.random.normal(key, shape, jnp.float32)
        trunc = jax.random.truncated_normal(key, -bound, bound, shape, jnp.float32)
        noise = jnp.where(clamp > 0, trunc, free) * std
        # erfinv's u -> +-1 edge can yield inf at ~2^-24/sample; the truncation
        # bound IS the absolute clamp, so clipping is semantically free.
        # clamp == 0 rows clip the free draw to exactly zero (the degenerate
        # truncated_normal(-0, 0) is never selected)
        hi = jnp.maximum(clamp, 0.0)
        return jnp.where(clamp >= 0, jnp.clip(noise, -hi, hi), noise)
    if not clamped:
        return jax.random.normal(key, shape, jnp.float32) * std
    clamp = jnp.asarray(noise_clamp, jnp.float32)
    bound = clamp / jnp.maximum(std, 1e-12)
    noise = jax.random.truncated_normal(key, -bound, bound, shape, jnp.float32) * std
    # same erfinv u -> +-1 edge-case insurance as the vec branch
    return jnp.clip(noise, -clamp, clamp)


def embed_text(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token-LUT embedding (python-reference/pocket_tts/conditioners/text.py:59-61)."""
    return params["text_embed"][tokens]


def prefill(
    params: dict,
    cfg: Config,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,
    embeddings: jnp.ndarray,  # [B, T, d_model] text embeddings or audio conditioning
    t_valid: jnp.ndarray,  # [B] number of real positions (right-padded buckets)
    lora: dict | None = None,  # per-slot adapter bank (transformer.cache_forward)
    lora_w=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Feed conditioning embeddings through the backbone, filling the KV cache.

    Returns (k_cache, v_cache, new_pos).  Outputs are discarded — prompting only
    warms the cache (reference: tts_model.py:489-494, tts_model.rs:580-599).
    Padded tail positions write garbage beyond ``pos + t_valid`` which is never
    attended (mask is ``key_idx <= query_pos``) and later overwritten.
    """
    tcfg = cfg.flow_lm.transformer
    t = embeddings.shape[1]
    positions = pos[:, None] + jnp.arange(t, dtype=pos.dtype)[None, :]
    cos, sin = rope_table(positions, tcfg.head_dim, tcfg.max_period)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    _, k_cache, v_cache = transformer.cache_forward(
        params["tf"], tcfg.num_heads, k_cache, v_cache, pos, embeddings, cos, sin,
        t_valid=t_valid, lora=lora, lora_w=lora_w,
    )
    return k_cache, v_cache, pos + t_valid.astype(pos.dtype)


def step(
    params: dict,
    cfg: Config,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,  # [B]
    latent: jnp.ndarray,  # [B, ldim] previous latent (bos_emb on the first step)
    noise: jnp.ndarray,  # [B, ldim] pre-sampled Gaussian
    t_emb_table: jnp.ndarray,  # [num_steps, flow_dim] ([num_steps, B, flow_dim] with lsd_vec)
    lsd_decode_steps: int,
    eos_threshold: float,
    use_pallas: bool = False,
    lsd_vec: jnp.ndarray | None = None,  # [B] per-slot step counts (batched serving)
    lora: dict | None = None,  # per-slot adapter bank (transformer.cache_forward)
    lora_w=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One autoregressive frame.  Returns (next_latent, eos_logit, kc, vc, pos)."""
    tcfg = cfg.flow_lm.transformer
    w_in = mat(params["input_w"])
    x = jnp.einsum("bi,di->bd", latent.astype(w_in.dtype), w_in)[:, None, :]  # [B,1,D]
    positions = pos[:, None]
    cos, sin = rope_table(positions, tcfg.head_dim, tcfg.max_period)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    y, k_cache, v_cache = transformer.cache_forward(
        params["tf"], tcfg.num_heads, k_cache, v_cache, pos, x, cos, sin,
        lora=lora, lora_w=lora_w,
    )
    h = layer_norm(y[:, -1], params["out_norm_w"], params["out_norm_b"], eps=1e-5)
    h = h.astype(jnp.float32)
    eos_logit = h @ params["out_eos_w"][0] + params["out_eos_b"][0]
    # eos decision: logit > threshold (flow_lm.py:124)

    cond_emb = flow_mlp.embed_condition(params["flow"], h)
    if lsd_vec is not None:
        next_latent = flow_mlp.lsd_decode_masked(
            params["flow"], cond_emb, t_emb_table, noise, lsd_vec,
            lsd_decode_steps, use_pallas=use_pallas,
        )
    else:
        next_latent = flow_mlp.lsd_decode(
            params["flow"], cond_emb, t_emb_table, noise, lsd_decode_steps,
            use_pallas=use_pallas,
        )
    _ = eos_threshold  # thresholding is done by the caller on the logit
    return next_latent, eos_logit, k_cache, v_cache, pos + 1


def denormalize(params: dict, latent: jnp.ndarray) -> jnp.ndarray:
    """latent * emb_std + emb_mean before the Mimi decoder (tts_model.py:274)."""
    return latent * params["emb_std"] + params["emb_mean"]


def speaker_project(params: dict, mimi_latent: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 32->512 latents] @ speaker_proj -> [B, T, 1024] conditioning
    (tts_model.py:258-262; weight [1024, 512])."""
    return jnp.einsum("btl,dl->btd", mimi_latent, params["speaker_proj"])


def init_params(key: jax.Array, cfg: Config) -> dict:
    tcfg = cfg.flow_lm.transformer
    ldim = cfg.mimi.quantizer.dimension
    d = tcfg.d_model
    ks = jax.random.split(key, 8)

    def lin(k, shape):
        bound = 1.0 / jnp.sqrt(jnp.float32(shape[-1]))
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return {
        "tf": transformer.init_params(
            ks[0], tcfg.num_layers, d, tcfg.dim_feedforward, layer_scale=None
        ),
        "flow": flow_mlp.init_params(ks[1], cfg.flow_lm.flow, ldim, d),
        "input_w": lin(ks[2], (d, ldim)),
        "out_norm_w": jnp.ones((d,)), "out_norm_b": jnp.zeros((d,)),
        "out_eos_w": lin(ks[3], (1, d)), "out_eos_b": jnp.zeros((1,)),
        "bos_emb": jax.random.normal(ks[4], (ldim,), jnp.float32),
        "emb_std": jnp.ones((ldim,)), "emb_mean": jnp.zeros((ldim,)),
        "text_embed": jax.random.normal(ks[5], (cfg.flow_lm.lookup_table.n_bins + 1,
                                                cfg.flow_lm.lookup_table.dim)),
        "speaker_proj": lin(ks[6], (d, cfg.mimi.transformer.d_model)),
    }
