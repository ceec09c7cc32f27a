"""Streaming transformer, stacked-layer formulation.

One parameter pytree holds all layers stacked on a leading axis and the forward
passes ``lax.scan`` over layers — one compiled layer body instead of L unrolled
copies (compile-time win; the layers are architecturally identical).

Covers both reference transformers
(python-reference/pocket_tts/modules/mimi_transformer.py:134-236):
pre-LN self-attention + GELU FFN with no-bias linears and optional LayerScale.
Three execution modes:

* ``cache_forward``  — unbounded causal over a dense KV cache (FlowLM backbone).
* ``tail_forward``   — sliding-window over carried KV tails (Mimi enc/dec, streaming).
* ``batch_forward``  — whole-sequence banded attention, no cache (Mimi batch encode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pocket_tts_tpu.config import MimiTransformerConfig, TransformerConfig
from pocket_tts_tpu.ops.attention import (
    banded_attention,
    cache_write,
    causal_cache_attention,
    prefill_write,
    tail_attention,
)
from pocket_tts_tpu.ops.norms import layer_norm
from pocket_tts_tpu.ops.qtensor import mat
from pocket_tts_tpu.ops.rope import apply_rope


def init_params(
    key: jax.Array,
    n_layers: int,
    d_model: int,
    d_ff: int,
    layer_scale: float | None = None,
    dtype=jnp.float32,
) -> dict:
    """Random init (torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)))."""
    ks = jax.random.split(key, 4)

    def lin(k, shape):
        bound = 1.0 / jnp.sqrt(jnp.float32(shape[-1]))
        return jax.random.uniform(k, (n_layers, *shape), dtype, -bound, bound)

    p = {
        # [L, 3, E, E]: explicit qkv axis; dim 2 is head-major (tp-shardable)
        "in_proj": lin(ks[0], (3, d_model, d_model)),
        "out_proj": lin(ks[1], (d_model, d_model)),
        "ff1": lin(ks[2], (d_ff, d_model)),
        "ff2": lin(ks[3], (d_model, d_ff)),
        "norm1_w": jnp.ones((n_layers, d_model), dtype),
        "norm1_b": jnp.zeros((n_layers, d_model), dtype),
        "norm2_w": jnp.ones((n_layers, d_model), dtype),
        "norm2_b": jnp.zeros((n_layers, d_model), dtype),
    }
    if layer_scale is not None:
        p["ls1"] = jnp.full((n_layers, d_model), layer_scale, dtype)
        p["ls2"] = jnp.full((n_layers, d_model), layer_scale, dtype)
    return p


def _lora_pair(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
               w: jnp.ndarray, sub: str) -> jnp.ndarray:
    """Per-slot mixed low-rank delta: ``sum_n w[:, n] * (x @ A_n^T) @ B_n^T``.

    ``x`` [B, T, in] activations; ``a`` [N, (3,) r, in] / ``b`` [N, (3,) out, r]
    stacked adapter factors for ONE layer; ``w`` [B, N] per-slot mixing weights
    (one-hot x alpha/rank; an all-zero row = that slot runs the base model).
    ``sub`` carries the optional qkv axis through the einsum ("k" for in_proj,
    "" otherwise).  Rank-r contractions are tiny next to the base matmuls —
    the cost of multi-adapter batched serving is the [N, ...] factor reads
    (~2 MB/adapter/frame), not FLOPs.  Computed in f32 like the offline
    merge (training/lora.py merge_lora) so per-slot audio tracks the merged
    single-stream model."""
    u = jnp.einsum(f"bti,n{sub}ri->btn{sub}r", x.astype(jnp.float32),
                   a.astype(jnp.float32))
    u = u * w.reshape(w.shape[0], 1, w.shape[1], *([1] * (u.ndim - 3)))
    return jnp.einsum(f"btn{sub}r,n{sub}or->bt{sub}o", u,
                      b.astype(jnp.float32))


def _qkv(p_layer: dict, x: jnp.ndarray, n_heads: int, cos, sin,
         lora: dict | None = None, lora_w=None):
    b, t, e = x.shape
    d = e // n_heads
    xn = layer_norm(x, p_layer["norm1_w"], p_layer["norm1_b"], eps=1e-5)
    w = mat(p_layer["in_proj"])  # [3, E, E]
    proj = jnp.einsum("bte,kpe->btkp", xn.astype(w.dtype), w)
    if lora is not None and "in_proj" in lora:
        delta = _lora_pair(xn, lora["in_proj"]["a"], lora["in_proj"]["b"],
                           lora_w, "k")
        proj = proj + delta.astype(proj.dtype)
    proj = proj.reshape(b, t, 3, n_heads, d)
    q, k, v = proj[:, :, 0], proj[:, :, 1], proj[:, :, 2]
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return q, k, v


def _post_attn(p_layer: dict, x: jnp.ndarray, attn: jnp.ndarray,
               lora: dict | None = None, lora_w=None):
    b, t = x.shape[:2]
    attn_flat = attn.reshape(b, t, -1)
    wo = mat(p_layer["out_proj"])
    update = jnp.einsum("btf,ef->bte", attn_flat.astype(wo.dtype), wo)
    if lora is not None and "out_proj" in lora:
        update = update + _lora_pair(
            attn_flat, lora["out_proj"]["a"], lora["out_proj"]["b"], lora_w,
            "").astype(update.dtype)
    if "ls1" in p_layer:
        update = update * p_layer["ls1"].astype(update.dtype)
    x = x + update
    xn = layer_norm(x, p_layer["norm2_w"], p_layer["norm2_b"], eps=1e-5)
    w1, w2 = mat(p_layer["ff1"]), mat(p_layer["ff2"])
    h = jnp.einsum("bte,fe->btf", xn.astype(w1.dtype), w1)
    if lora is not None and "ff1" in lora:
        h = h + _lora_pair(xn, lora["ff1"]["a"], lora["ff1"]["b"], lora_w,
                           "").astype(h.dtype)
    h = jax.nn.gelu(h, approximate=False)
    update = jnp.einsum("btf,ef->bte", h, w2.astype(h.dtype))
    if lora is not None and "ff2" in lora:
        update = update + _lora_pair(
            h, lora["ff2"]["a"], lora["ff2"]["b"], lora_w, "").astype(
            update.dtype)
    if "ls2" in p_layer:
        update = update * p_layer["ls2"].astype(update.dtype)
    return x + update


def cache_forward(
    params: dict,
    n_heads: int,
    k_cache,  # stacked [L, B, S, H, D] OR tuple of per-layer [B, S, H, D]
    v_cache,
    pos: jnp.ndarray,  # [B] int32, shared across layers
    x: jnp.ndarray,  # [B, T, E]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    t_valid: jnp.ndarray | None = None,  # per-slot valid widths (prefill only)
    lora: dict | None = None,  # {target: {"a": [L,N,...], "b": [L,N,...]}}
    lora_w=None,  # [B, N] per-slot adapter mixing weights (see _lora_pair)
):
    """Dense-cache causal transformer step; returns (y, k_cache, v_cache).

    Two cache forms:
    * stacked array — used at jit boundaries and in prefill (the scan's
      per-layer slicing is amortized over the prefill's T tokens);
    * tuple of per-layer arrays — used inside the frame-decode scan, where
      scanning a stacked cache as xs costs ~0.12 ms/frame of slice/restack
      (profiled); separate carries update in place with plain DUS.

    ``lora``/``lora_w``: optional per-slot multi-adapter serving — every
    leaf of ``lora`` carries a leading layer axis followed by an adapter
    axis ([L, N, ...]); each batch slot mixes its own adapter's low-rank
    delta into the four backbone matmuls (runtime.engine.set_adapter_bank).
    """
    if t_valid is not None:
        def write(cache, new):
            return prefill_write(cache, new, pos, t_valid)
    else:
        def write(cache, new):
            return cache_write(cache, new, pos)

    if isinstance(k_cache, (tuple, list)):
        kcs, vcs = [], []
        for i in range(len(k_cache)):
            p_layer = jax.tree.map(lambda a: a[i], params)
            lo = (None if lora is None
                  else jax.tree.map(lambda a: a[i], lora))
            q, k, v = _qkv(p_layer, x, n_heads, cos, sin, lo, lora_w)
            kc = write(k_cache[i], k)
            vc = write(v_cache[i], v)
            attn = causal_cache_attention(q, kc, vc, pos)
            x = _post_attn(p_layer, x, attn, lo, lora_w)
            kcs.append(kc)
            vcs.append(vc)
        return x, tuple(kcs), tuple(vcs)

    def layer(x, xs):
        if lora is None:
            p_layer, kc, vc = xs
            lo = None
        else:
            p_layer, lo, kc, vc = xs
        q, k, v = _qkv(p_layer, x, n_heads, cos, sin, lo, lora_w)
        kc = write(kc, k)
        vc = write(vc, v)
        attn = causal_cache_attention(q, kc, vc, pos)
        return _post_attn(p_layer, x, attn, lo, lora_w), (kc, vc)

    xs = ((params, k_cache, v_cache) if lora is None
          else (params, lora, k_cache, v_cache))
    y, caches = lax.scan(layer, x, xs, unroll=True)
    k_cache, v_cache = caches
    return y, k_cache, v_cache


def tail_forward(
    params: dict,
    n_heads: int,
    context: int,
    k_tail: jnp.ndarray,  # [L, B, context-1, H, D]
    v_tail: jnp.ndarray,
    pos: jnp.ndarray,  # [B]
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    block: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sliding-window streaming step over carried KV tails (ops.tail_attention):
    replaces ring_forward for the Mimi transformers — O(context) state and
    attention cost, independent of how much history was processed."""

    def layer(x, xs):
        p_layer, kt, vt = xs
        q, k, v = _qkv(p_layer, x, n_heads, cos, sin)
        attn, kt, vt = tail_attention(q, k, v, kt, vt, pos, context, block=block)
        return _post_attn(p_layer, x, attn), (kt, vt)

    y, (k_tail, v_tail) = lax.scan(layer, x, (params, k_tail, v_tail),
                                   unroll=True)
    return y, k_tail, v_tail


def init_tail(
    n_layers: int, batch: int, context: int, n_heads: int, head_dim: int,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    shape = (n_layers, batch, context - 1, n_heads, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def batch_forward(
    params: dict,
    n_heads: int,
    context: int | None,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    block: int = 256,
) -> jnp.ndarray:
    """Whole-sequence forward from position 0 (model_state=None semantics)."""

    def layer(x, p_layer):
        q, k, v = _qkv(p_layer, x, n_heads, cos, sin)
        attn = banded_attention(q, k, v, context, block=block)
        return _post_attn(p_layer, x, attn), None

    y, _ = lax.scan(layer, x, params)
    return y


def init_cache(
    n_layers: int, batch: int, capacity: int, n_heads: int, head_dim: int, dtype=jnp.float32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    shape = (n_layers, batch, capacity, n_heads, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


# --------------------------------------------------------------------------
# ProjectedTransformer (Mimi): optional in/out projections around the core,
# operating on [B, C, T] (python-reference/.../mimi_transformer.py:239-285).
# --------------------------------------------------------------------------


def projected_batch_forward(
    p: dict, cfg: MimiTransformerConfig, x_bct: jnp.ndarray, cos, sin, block: int = 256
) -> jnp.ndarray:
    x = x_bct.transpose(0, 2, 1)
    if "input_proj" in p:
        w_in = mat(p["input_proj"])
        x = jnp.einsum("btc,dc->btd", x.astype(w_in.dtype), w_in)
    y = batch_forward(p["layers"], cfg.num_heads, cfg.context, x, cos, sin, block=block)
    if "output_proj" in p:
        y = jnp.einsum("btd,cd->btc", y, mat(p["output_proj"]))
    return y.transpose(0, 2, 1)


def projected_tail_forward(
    p: dict, cfg: MimiTransformerConfig, k_tail, v_tail, pos, x_bct, cos, sin
):
    x = x_bct.transpose(0, 2, 1)
    if "input_proj" in p:
        w_in = mat(p["input_proj"])
        x = jnp.einsum("btc,dc->btd", x.astype(w_in.dtype), w_in)
    y, k_tail, v_tail = tail_forward(
        p["layers"], cfg.num_heads, cfg.context, k_tail, v_tail, pos, x, cos, sin
    )
    if "output_proj" in p:
        y = jnp.einsum("btd,cd->btc", y, mat(p["output_proj"]))
    return y.transpose(0, 2, 1), k_tail, v_tail
