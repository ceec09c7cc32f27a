"""1-D convolutions: batch and streaming forms.

Weight layouts follow the checkpoint (torch) convention so the safetensors remap is
an identity:  Conv1d ``[out, in/groups, K]``, ConvTranspose1d ``[in, out/groups, K]``.

Streaming semantics replicate the reference exactly
(python-reference/pocket_tts/modules/conv.py):

* ``StreamingConv1d`` keeps the last ``K_eff - S`` input frames as ``prev`` state and
  prepends them before convolving with VALID padding.  ``replicate`` pad mode fills
  the very first ``prev`` with the first input frame (conv.py:101-106).
* ``StreamingConvTranspose1d`` computes the full transposed conv, adds the carried
  ``partial`` tail into the first ``K - S`` output samples, and carries the last
  ``K - S`` samples (bias removed) as the next partial (conv.py:149-161).

Batch (stateless) mode equals streaming from a fresh zero state over the whole
sequence, which is what the reference does for ``model_state=None``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from pocket_tts_tpu.ops.qtensor import mat

_DN = ("NCH", "OIH", "NCH")


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """Static description of one conv layer (shapes/strides are compile-time)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    pad_mode: str = "constant"  # "constant" | "replicate"

    @property
    def effective_kernel(self) -> int:
        return (self.kernel_size - 1) * self.dilation + 1

    @property
    def state_len(self) -> int:
        return self.effective_kernel - self.stride


@dataclasses.dataclass(frozen=True)
class ConvTrSpec:
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    bias: bool = True

    @property
    def state_len(self) -> int:
        return self.kernel_size - self.stride


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """VALID conv over [B, C, T] with torch-layout weight [out, in/groups, K]."""
    w = mat(w)
    y = lax.conv_general_dilated(
        x.astype(w.dtype),  # compute in the weight dtype (bf16 on TPU)
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    *,
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Transposed conv over [B, C, T], torch-layout weight [in, out/groups, K].

    Implemented as a zero-stuffed (lhs-dilated) regular convolution with the
    flipped, in/out-swapped kernel — a single XLA conv that maps onto the MXU,
    output length ``(T-1)*stride + K`` (torch semantics, padding=0).
    """
    w = mat(w)
    in_ch, out_per_group, k = w.shape
    # [in, out/g, K] -> [(g, in/g), out/g, K] -> [(g, out/g), in/g, K], flipped.
    wg = w.reshape(groups, in_ch // groups, out_per_group, k)
    wg = jnp.flip(wg.transpose(0, 2, 1, 3), axis=-1)
    rhs = wg.reshape(groups * out_per_group, in_ch // groups, k)
    y = lax.conv_general_dilated(
        x.astype(rhs.dtype),
        rhs,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


# ---------------------------------------------------------------------------
# Streaming forms.  State is a dict of arrays (a pytree leaf-dict) so it threads
# through jit/scan untouched.
# ---------------------------------------------------------------------------


def conv_init_state(spec: ConvSpec, batch: int, dtype=jnp.float32) -> dict:
    st = {"prev": jnp.zeros((batch, spec.in_channels, spec.state_len), dtype)}
    if spec.pad_mode == "replicate":
        st["first"] = jnp.ones((batch,), jnp.bool_)
    return st


def streaming_conv1d(
    spec: ConvSpec, w: jnp.ndarray, b: jnp.ndarray | None, state: dict, x: jnp.ndarray
) -> tuple[jnp.ndarray, dict]:
    x = x.astype(w.dtype)  # keep streaming state in the compute dtype
    p = spec.state_len
    if p == 0:
        return conv1d(x, w, b, stride=spec.stride, dilation=spec.dilation,
                      groups=spec.groups), state
    prev = state["prev"].astype(x.dtype)
    if spec.pad_mode == "replicate":
        init = jnp.broadcast_to(x[..., :1], prev.shape)
        prev = jnp.where(state["first"][:, None, None], init, prev)
    xc = jnp.concatenate([prev, x], axis=-1)
    y = conv1d(xc, w, b, stride=spec.stride, dilation=spec.dilation, groups=spec.groups)
    new_state = {"prev": xc[..., -p:]}
    if spec.pad_mode == "replicate":
        new_state["first"] = jnp.zeros_like(state["first"])
    return y, new_state


def batch_conv1d(
    spec: ConvSpec, w: jnp.ndarray, b: jnp.ndarray | None, x: jnp.ndarray
) -> jnp.ndarray:
    """model_state=None semantics: left pad with zeros (or first frame)."""
    x = x.astype(w.dtype)
    p = spec.state_len
    if p > 0:
        if spec.pad_mode == "replicate":
            pad = jnp.broadcast_to(x[..., :1], (*x.shape[:-1], p))
        else:
            pad = jnp.zeros((*x.shape[:-1], p), x.dtype)
        x = jnp.concatenate([pad, x], axis=-1)
    return conv1d(x, w, b, stride=spec.stride, dilation=spec.dilation, groups=spec.groups)


def convtr_init_state(spec: ConvTrSpec, batch: int, dtype=jnp.float32) -> dict:
    return {"partial": jnp.zeros((batch, spec.out_channels, spec.state_len), dtype)}


def streaming_conv_transpose1d(
    spec: ConvTrSpec, w: jnp.ndarray, b: jnp.ndarray | None, state: dict, x: jnp.ndarray
) -> tuple[jnp.ndarray, dict]:
    y = conv_transpose1d(x.astype(w.dtype), w, b, stride=spec.stride, groups=spec.groups)
    pt = spec.state_len
    if pt == 0:
        return y, state
    partial = state["partial"].astype(y.dtype)
    head = y[..., :pt] + partial
    y = jnp.concatenate([head, y[..., pt:]], axis=-1)
    tail = y[..., -pt:]
    if b is not None:
        tail = tail - b.astype(tail.dtype)[None, :, None]
    return y[..., :-pt], {"partial": tail}


def batch_conv_transpose1d(
    spec: ConvTrSpec, w: jnp.ndarray, b: jnp.ndarray | None, x: jnp.ndarray
) -> jnp.ndarray:
    """Whole-sequence transposed conv with the streaming edge behavior (zero
    initial partial, trailing ``K - S`` samples dropped)."""
    y = conv_transpose1d(x, w, b, stride=spec.stride, groups=spec.groups)
    pt = spec.state_len
    return y[..., :-pt] if pt > 0 else y


def pad_for_frame(x: jnp.ndarray, frame_size: int) -> jnp.ndarray:
    """Right-pad [B, C, T] with zeros to a multiple of ``frame_size``
    (reference: pad_for_conv1d, python-reference/pocket_tts/modules/conv.py:11-33
    with kernel == stride == frame_size)."""
    t = x.shape[-1]
    extra = (-t) % frame_size
    if extra:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, extra)))
    return x
