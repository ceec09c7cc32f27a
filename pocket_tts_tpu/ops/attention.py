"""Attention primitives over static-shape KV caches.

The reference has two cache disciplines (crates/pocket-tts/src/modules/attention.rs):
a growing contiguous buffer for the FlowLM and a ring buffer for the windowed Mimi
transformer.  On TPU both become *fixed-capacity* buffers addressed by an integer
cursor, with validity expressed as masks — no dynamic shapes, no host control flow:

* FlowLM: cache ``[B, H, S, D]``, cursor ``pos``; new KV written at ``pos..pos+T``;
  key slot ``j`` is visible to query at absolute position ``p`` iff ``j <= p``.
* Mimi: sliding window as a carried KV *tail* of the last ``context - 1``
  positions (``tail_attention``) — replaces the reference's ring buffer
  (python-reference/pocket_tts/modules/mimi_transformer.py:29-62): same window
  semantics, O(context) cost instead of O(capacity), no wraparound.

Softmax runs in float32.  Masked logits use a large negative constant; fully-masked
(padded) query rows produce uniform garbage that callers never read.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


def _sdpa(q, k, v, mask):
    """q [B,T,H,D], k/v [B,S,H,D] or [B,H,S,D]=False; mask [B,1,T,S] or [1,1,T,S] bool."""
    d = q.shape[-1]
    # K/V may be stored narrower than the compute dtype (fp8 KV cache,
    # RuntimeConfig.kv_dtype): widen to q's dtype so the matmuls run at
    # compute precision and — crucially — probs are NEVER cast down to the
    # storage dtype.  The convert fuses into the dot's operand read, so HBM
    # traffic stays at the storage width (same mechanism as int8 weights,
    # ops/qtensor.py).
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(mask, logits, _NEG)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def cache_write(cache: jnp.ndarray, new: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Write ``new`` [B, T, H, D] into ``cache`` [B, S, H, D] at per-batch offsets
    ``start`` [B] (int32).  vmapped dynamic_update_slice — per-slot cursors for
    continuous batching."""

    def one(c, n, s):
        return lax.dynamic_update_slice(c, n, (s, 0, 0))

    return jax.vmap(one)(cache, new.astype(cache.dtype), start)


def prefill_write(cache: jnp.ndarray, new: jnp.ndarray, start: jnp.ndarray,
                  t_valid: jnp.ndarray) -> jnp.ndarray:
    """Prefill write of ``new`` [B,T,H,D] at per-batch ``start`` with only the
    first ``t_valid[b]`` positions written; the rest are DROPPED (out-of-bounds
    scatter indices).  Decode writes use cache_write (always fully valid); the
    batcher's admission prefill must not write ANY garbage — a busy slot with
    pos > S - T would otherwise have its bucket-wide garbage block clamped
    BACKWARD over live KV entries (review finding)."""
    b, t = new.shape[:2]
    s_cap = cache.shape[1]
    offs = jnp.arange(t, dtype=jnp.int32)[None, :]
    idx = start[:, None].astype(jnp.int32) + offs
    idx = jnp.where(offs < t_valid[:, None].astype(jnp.int32), idx, s_cap)

    def one(c, n, i):
        return c.at[i].set(n, mode="drop")

    return jax.vmap(one)(cache, new.astype(cache.dtype), idx)


def causal_cache_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,
) -> jnp.ndarray:
    """Causal attention of ``q`` [B,T,H,D] (absolute positions ``pos + i``) against
    the full cache [B,S,H,D] (new keys already written at ``pos..``).

    Right-padded prefill rows need no masking here: padded queries compute
    garbage the caller discards, and prefill_write keeps their keys OUT of
    the cache, so no real query ever attends to them.
    """
    b, t, h, d = q.shape
    s = k_cache.shape[1]
    q_pos = pos[:, None] + jnp.arange(t, dtype=pos.dtype)[None, :]  # [B,T]
    key_idx = jnp.arange(s, dtype=pos.dtype)[None, None, :]  # [1,1,S]
    mask = key_idx <= q_pos[:, :, None]  # [B,T,S]
    return _sdpa(q, k_cache, v_cache, mask[:, None, :, :])


def tail_attention(
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    k_tail: jnp.ndarray,
    v_tail: jnp.ndarray,
    pos: jnp.ndarray,
    context: int,
    block: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sliding-window attention with a carried KV *tail* — the streaming-conv
    ``prev`` pattern applied to attention.

    Instead of a ring buffer (whose masked attention and scatter writes cost
    O(capacity) per chunk — measured 2x slowdown going 4096 -> 8192 on TPU),
    the streaming state is just the last ``P = context - 1`` KV positions:
    concat([tail, new]) is a contiguous, chronologically ordered buffer, the
    window mask is STATIC (delta = P + i - j, cursor-independent), and cost is
    O(T * (T + context)) regardless of how much history was processed.

    q/k_new/v_new: [B, T, H, D] at absolute positions ``pos + i``;
    k_tail/v_tail: [B, P, H, D] holding positions ``pos - P .. pos - 1``
    (slots with negative absolute position are masked invalid).
    Returns (out, new_k_tail, new_v_tail).
    """
    b, t, h, d = q.shape
    p = k_tail.shape[1]
    assert p == context - 1, (p, context)
    k = jnp.concatenate([k_tail, k_new.astype(k_tail.dtype)], axis=1)
    v = jnp.concatenate([v_tail, v_new.astype(v_tail.dtype)], axis=1)
    new_k_tail, new_v_tail = k[:, -p:], v[:, -p:]

    if t <= block:
        i = jnp.arange(t)
        j = jnp.arange(p + t)
        delta = (p + i)[:, None] - j[None, :]  # query abs - key abs
        band = (delta >= 0) & (delta < context)  # [T, S]
        valid = (pos[:, None] - p + j[None, :]) >= 0  # [B, S]
        mask = band[None, :, :] & valid[:, None, :]
        return _sdpa(q, k, v, mask[:, None]), new_k_tail, new_v_tail

    t_real = t
    if t % block:  # pad queries+keys; padded keys never enter the band of real rows
        pad = block - t % block
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        t = q.shape[1]
    span = p + block  # keys for query block qi: concat[qi : qi + P + block)
    n_blocks = t // block
    ii = jnp.arange(block)
    jj = jnp.arange(span)
    band = ((p + ii)[:, None] - jj[None, :] >= 0) \
        & ((p + ii)[:, None] - jj[None, :] < context)

    def body(carry, i):
        qs = i * block
        qb = lax.dynamic_slice_in_dim(q, qs, block, axis=1)
        kb = lax.dynamic_slice_in_dim(k, qs, span, axis=1)
        vb = lax.dynamic_slice_in_dim(v, qs, span, axis=1)
        valid = (pos[:, None] - p + qs + jj[None, :]) >= 0  # [B, span]
        mask = band[None, :, :] & valid[:, None, :]
        ob = _sdpa(qb, kb, vb, mask[:, None])
        return carry, ob

    _, blocks = lax.scan(body, None, jnp.arange(n_blocks))
    out = blocks.transpose(1, 0, 2, 3, 4).reshape(b, t, h, d)
    return out[:, :t_real], new_k_tail, new_v_tail


def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    context: int | None,
    block: int = 256,
) -> jnp.ndarray:
    """Whole-sequence causal attention with optional sliding window, blocked over
    queries so the materialized score tile is ``[B, H, block, block + context]``
    instead of O(T²).  Used for the Mimi encoder over long voice prompts (the
    TPU analogue of the reference's tiled prefill sdpa,
    crates/pocket-tts/src/modules/sdpa.rs:36-126).

    q/k/v: [B, T, H, D] with T a multiple of ``block`` (caller pads).
    """
    b, t, h, d = q.shape
    if context is None or t <= block:
        idx = jnp.arange(t)
        mask = idx[None, None, :, None] >= idx[None, None, None, :]
        if context is not None:
            mask &= (idx[None, None, :, None] - idx[None, None, None, :]) < context
        return _sdpa(q, k, v, mask)

    t_real = t
    if t % block:  # pad to a block multiple; padded keys are masked causally
        pad = block - t % block
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        t = q.shape[1]
    # keys needed by query block starting at qs: [qs - ctx_pad, qs + block)
    ctx_pad = ((context + block - 1) // block) * block
    k_pad = jnp.pad(k, ((0, 0), (ctx_pad, 0), (0, 0), (0, 0)))
    v_pad = jnp.pad(v, ((0, 0), (ctx_pad, 0), (0, 0), (0, 0)))
    span = ctx_pad + block
    n_blocks = t // block

    def body(carry, i):
        qs = i * block
        qb = lax.dynamic_slice_in_dim(q, qs, block, axis=1)
        kb = lax.dynamic_slice_in_dim(k_pad, qs, span, axis=1)
        vb = lax.dynamic_slice_in_dim(v_pad, qs, span, axis=1)
        q_pos = qs + jnp.arange(block)
        k_pos = qs - ctx_pad + jnp.arange(span)
        delta = q_pos[:, None] - k_pos[None, :]
        mask = (delta >= 0) & (k_pos[None, :] >= 0)
        mask &= delta < context
        ob = _sdpa(qb, kb, vb, mask[None, None])
        return carry, ob

    _, blocks = lax.scan(body, None, jnp.arange(n_blocks))
    # blocks: [n_blocks, B, block, H, D] -> [B, T, H, D]
    out = blocks.transpose(1, 0, 2, 3, 4).reshape(b, t, h, d)
    return out[:, :t_real]
