"""Weight-only int8 quantization.

The reference only *simulates* int8 (values rounded to 256 levels but stored as
f32 — crates/pocket-tts/src/quantize.rs:1-10 admits this, and the quantized
loader actually loads fp32, tts_model.rs:175-179).  Here the int8 path is real:
weights are stored as int8 + per-output-channel scale, and the dequantize
(convert + scale multiply) fuses into the consuming matmul/conv weight read —
halving weight HBM traffic vs bf16 and quartering it vs f32.

``QTensor`` is a pytree node, so quantized weights flow through jit/scan/donation
like plain arrays; every weight-consuming op calls ``mat()`` which is the
identity for ordinary arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QTensor:
    """Quantized values + per-channel (axis 0 of the non-stacked weight) scales.

    Two storage layouts, distinguished by ``q.dtype``:
      * int8 — one value per byte;
      * uint8 — PACKED int4, two values per byte along the last axis (stored
        offset-by-8 in each nibble).  jnp.int4 exists but its host<->device
        transfer path is broken on some backends (recursive-jit on the axon
        plugin), so 4-bit storage uses explicit nibble packing — same HBM
        halving, no exotic dtype; the unpack fuses into the consuming
        matmul's weight read.

    ``scale``'s dtype is the dequantization target, so the engine's dtype policy
    (bf16 backbone / f32 flow net) applies by casting scales only.
    """

    def __init__(self, q: jnp.ndarray, scale: jnp.ndarray):
        self.q = q
        self.scale = scale

    @property
    def packed(self) -> bool:
        return self.q.dtype == jnp.uint8

    @property
    def shape(self):
        # logical (unpacked) shape
        if self.packed:
            return (*self.q.shape[:-1], self.q.shape[-1] * 2)
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        return self.scale.dtype

    def dequant(self) -> jnp.ndarray:
        scale = self.scale
        while scale.ndim < self.q.ndim:
            scale = scale[..., None]
        if self.packed:
            # split-half layout: nibble k holds element k, nibble k<<4 holds
            # element k + d/2 — unpacking is a CONCAT of two slices (fusion-
            # friendly), not an interleave (which cost a separate shuffle
            # kernel per weight read and made int4 slower than int8)
            lo = jnp.bitwise_and(self.q, 0xF).astype(jnp.int8) - 8
            hi = jnp.right_shift(self.q, 4).astype(jnp.int8) - 8
            vals = jnp.concatenate([lo, hi], axis=-1)
            return vals.astype(self.scale.dtype) * scale
        return self.q.astype(self.scale.dtype) * scale

    def astype(self, dtype) -> "QTensor":
        return QTensor(self.q, self.scale.astype(dtype))

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        kind = "int4-packed" if self.packed else "int8"
        return f"QTensor({kind} {self.shape}, scale {self.scale.shape})"


def mat(w):
    """Resolve a weight operand: dequantize QTensors, pass arrays through."""
    return w.dequant() if isinstance(w, QTensor) else w


def quantize_array(w: jnp.ndarray, channel_axes: int = 1,
                   bits: int = 8) -> QTensor:
    """Symmetric per-channel int quantization: scales over the leading
    ``channel_axes`` dims (1 for [out, in], 2 for stacked [L, out, in]).

    ``bits``: 8 (int8, ~48 dB SNR) or 4 (int4, ~25 dB — halves weight HBM
    traffic again; quality should be listening-validated on real weights)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qmax = (1 << (bits - 1)) - 1
    reduce_axes = tuple(range(channel_axes, w.ndim))
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes)
    scale = jnp.maximum(absmax, 1e-12) / qmax
    s = scale
    while s.ndim < w.ndim:
        s = s[..., None]
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -qmax, qmax)
    if bits == 4 and w.shape[-1] % 2 == 0:
        vals = (q.astype(jnp.int8) + 8).astype(jnp.uint8)  # nibbles 1..15
        half = w.shape[-1] // 2
        packed = jnp.bitwise_or(vals[..., :half],
                                jnp.left_shift(vals[..., half:], 4))
        return QTensor(packed, scale.astype(w.dtype))
    # odd last dims (conv kernels) cannot nibble-pack: they store int8 at the
    # int4 quantization levels — tiny tensors, negligible HBM difference
    return QTensor(q.astype(jnp.int8), scale.astype(w.dtype))


def quantization_snr_db(w: jnp.ndarray, qt: QTensor) -> float:
    """Signal-to-noise ratio of the round trip (reference: quantize.rs:157-171)."""
    w = jnp.asarray(w, jnp.float32)
    err = w - qt.dequant().astype(jnp.float32)
    sig = jnp.sum(jnp.square(w))
    noise = jnp.maximum(jnp.sum(jnp.square(err)), 1e-30)
    return float(10.0 * jnp.log10(sig / noise))


# Quantization policy (reference skip-list, crates/pocket-tts/src/quantize.rs:27-42):
# embeddings, LUTs, attention out_proj, and the EOS head stay full precision;
# tensors smaller than min_size aren't worth it.
SKIP_SUBSTRINGS = ("embed", "lut", "out_proj", "out_eos", "speaker_proj",
                   "norm", "alpha", "scale", "bos", "emb_", "ls1", "ls2",
                   "ln_w", "ln_b")
MIN_SIZE = 1024


def should_quantize(name: str, leaf) -> bool:
    if not hasattr(leaf, "size") or leaf.size < MIN_SIZE:
        return False
    if leaf.ndim < 2 or leaf.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    lname = name.lower()
    # biases are 1-D in torch but 2-D once layer-stacked ([L, dim]) — never
    # quantize them (zero-init biases gave -inf SNR and they are tiny anyway)
    last = lname.rsplit("/", 1)[-1]
    if last.endswith("_b") or last in ("b", "b1", "b2", "bias"):
        return False
    return not any(s in lname for s in SKIP_SUBSTRINGS)


def quantize_tree(params: dict, *, stacked_names: tuple[str, ...] = (),
                  bits: int = 8) -> dict:
    """Quantize eligible leaves of a param pytree.

    ``stacked_names``: leaf names whose weights carry a leading layer axis
    ([L, out, in] — scales get 2 channel axes)."""

    def visit(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if not should_quantize(name, leaf):
            return leaf
        last = name.rsplit("/", 1)[-1]
        # stacked transformer / flow-block weights carry leading layer (and,
        # for in_proj, qkv) axes: per-output-channel = all dims but the last
        axes = leaf.ndim - 1 if last in stacked_names else 1
        return quantize_array(leaf, channel_axes=axes, bits=bits)

    return jax.tree_util.tree_map_with_path(visit, params)


STACKED_WEIGHTS = ("in_proj", "ff1", "ff2", "mlp1_w", "mlp2_w", "ada_w")
