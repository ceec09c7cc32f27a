"""Normalization primitives.

All norms compute statistics in float32 regardless of the compute dtype (XLA fuses
the cast chains), matching the reference numerics which run fully in float32.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm_torchvar(x: jnp.ndarray, alpha: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with PyTorch ``x.var()`` semantics.

    NOT standard RMSNorm: the variance is mean-subtracted AND Bessel-corrected
    (unbiased, divides by N-1), but the *output* is ``x * alpha * rsqrt(eps + var)``
    with un-centered ``x``.  Reference: python-reference/pocket_tts/modules/mlp.py:20-25
    and the explicit parity note in crates/pocket-tts/src/modules/mlp.rs:18-27.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = x.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / (n - 1)
    y = xf * (alpha.astype(jnp.float32) * lax.rsqrt(eps + var))
    return y.astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Standard LayerNorm (biased variance).

    Reference: python-reference/pocket_tts/modules/mlp.py:39-55 (eps=1e-6 in the
    flow net) and torch ``nn.LayerNorm`` (eps=1e-5 in the transformers).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
