"""Rotary positional embedding, interleaved-pair convention.

Pairs are interleaved along the feature axis: ``(x[2i], x[2i+1])`` forms the complex
pair rotated by ``exp(i * pos * freq_i)`` with ``freq_i = max_period**(-2i/D)``.
Rotation is computed in float32.  Reference semantics:
python-reference/pocket_tts/modules/rope.py:7-58.

The table (cos, sin) depends only on positions, so we precompute it once per call
site and share it across all layers (the reference recomputes per layer).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def rope_table(
    positions: jnp.ndarray, head_dim: int, max_period: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer ``positions`` (any shape), each ``[..., D/2]``."""
    half = head_dim // 2
    ds = jnp.arange(half, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2.0 / head_dim))
    args = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(args), jnp.sin(args)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` of shape [B, T, H, D] with tables of shape [T, D/2] (or
    broadcastable, e.g. [B, T, 1, D/2])."""
    dtype = x.dtype
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    if cos.ndim == 2:  # [T, D/2] -> broadcast over batch and heads
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    yr = xr * cos - xi * sin
    yi = xr * sin + xi * cos
    y = jnp.stack([yr, yi], axis=-1).reshape(shape)
    return y.astype(dtype)
