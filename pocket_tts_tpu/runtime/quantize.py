"""Model-level int8 quantization entry point (the ``--quantized`` CLI path).

Unlike the reference's placeholder that silently loads fp32
(crates/pocket-tts/src/tts_model.rs:122-179), this produces a model whose
eligible weights are genuinely int8 in HBM (see ops/qtensor.py for the policy).
"""

from __future__ import annotations

import logging

import jax

from pocket_tts_tpu.ops.qtensor import STACKED_WEIGHTS, QTensor, quantize_tree
from pocket_tts_tpu.runtime.engine import Engine
from pocket_tts_tpu.tts import TTSModel

logger = logging.getLogger(__name__)


def quantize_params(params: dict, bits: int = 8) -> dict:
    return jax.jit(
        lambda p: quantize_tree(p, stacked_names=STACKED_WEIGHTS, bits=bits)
    )(params)


def snr_report(params: dict, qparams: dict) -> dict[str, float]:
    """Per-tensor round-trip SNR (dB) for every quantized leaf — the
    reference's quantization quality metric (quantize.rs:157-171).  Computed in
    ONE jitted program (eager ops are per-op remote compiles on this backend)."""
    import jax.numpy as jnp

    flat, _ = jax.tree_util.tree_flatten_with_path(
        qparams, is_leaf=lambda x: isinstance(x, QTensor))
    names = [jax.tree_util.keystr(p) for p, leaf in flat
             if isinstance(leaf, QTensor)]

    def compute(p, q):
        flat_f, _ = jax.tree_util.tree_flatten_with_path(p)
        by_path = {jax.tree_util.keystr(kp): leaf for kp, leaf in flat_f}
        fq, _ = jax.tree_util.tree_flatten_with_path(
            q, is_leaf=lambda x: isinstance(x, QTensor))
        out = []
        for kp, leaf in fq:
            if not isinstance(leaf, QTensor):
                continue
            w = by_path[jax.tree_util.keystr(kp)].astype(jnp.float32)
            err = w - leaf.dequant().astype(jnp.float32)
            sig = jnp.sum(jnp.square(w))
            noise = jnp.maximum(jnp.sum(jnp.square(err)), 1e-30)
            out.append(10.0 * jnp.log10(sig / noise))
        return jnp.stack(out)

    vals = jax.jit(compute)(params, qparams)
    return dict(zip(names, [float(v) for v in jax.device_get(vals)]))


def _flatten_paths(params: dict) -> list[tuple[str, object]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, QTensor))
    out = []
    for path, leaf in flat:
        parts = []
        for k in path:
            parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
        out.append(("/".join(parts), leaf))
    return out


def _unflatten_paths(items: dict[str, object]) -> dict:
    """Rebuild the nested params tree from path/leaf pairs; integer path
    segments become list indices (the SEANet param lists)."""
    root: dict = {}
    for path, leaf in items.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            # index gaps are parameterless layers (SEANet ELU entries hold {}
            # and vanish from the flattened path list); both plan kinds end
            # with a conv, so the max index bounds the list
            top = max(int(k) for k in node)
            return [node.get(str(i), {}) for i in range(top + 1)]
        return node

    return listify(root)


def save_quantized(params: dict, path) -> None:
    """Persist a quantized param tree as safetensors: QTensor leaves store
    ``<path>.q`` + ``<path>.scale``; plain leaves store as-is.

    int4 leaves are nibble-packed uint8 (see ops/qtensor.QTensor), which
    safetensors stores natively — the artifact really is half the int8 size
    for those tensors; a ``bits`` metadata field records the narrowest width.

    The reference's quantized checkpoint path is a placeholder that loads
    fp32 (tts_model.rs:122-179); this is the real artifact, loadable straight
    into serving via :func:`load_quantized`."""
    import numpy as np
    from safetensors.numpy import save_file

    bits = 8
    tensors = {}
    for name, leaf in _flatten_paths(params):
        if isinstance(leaf, QTensor):
            if leaf.packed:
                bits = 4
            tensors[name + ".q"] = np.asarray(leaf.q)
            tensors[name + ".scale"] = np.asarray(leaf.scale, np.float32)
        else:
            tensors[name] = np.asarray(leaf, np.float32)
    save_file(tensors, str(path),
              metadata={"format": "pocket-tts-tpu-int8", "bits": str(bits)})


def load_quantized(path) -> dict:
    """Load a :func:`save_quantized` artifact back into a params pytree."""
    import jax.numpy as jnp
    from safetensors import safe_open

    items: dict[str, object] = {}
    qparts: dict[str, dict] = {}
    with safe_open(str(path), framework="numpy") as f:
        meta = f.metadata() or {}
        if meta.get("format") != "pocket-tts-tpu-int8":
            raise ValueError(f"{path} is not a pocket-tts-tpu int8 checkpoint")
        for key in f.keys():
            t = f.get_tensor(key)
            if key.endswith(".q") or key.endswith(".scale"):
                base, kind = key.rsplit(".", 1)
                qparts.setdefault(base, {})[kind] = t
            else:
                items[key] = jnp.asarray(t)
    for base, parts in qparts.items():
        # dtype selects the layout: int8 plain, uint8 nibble-packed int4
        items[base] = QTensor(jnp.asarray(parts["q"]),
                              jnp.asarray(parts["scale"]))
    return _unflatten_paths(items)


def quantize_model(model: TTSModel, bits: int = 8) -> TTSModel:
    """Return a clone of ``model`` running on int8 (or, experimentally, int4)
    weights.  int4 halves weight HBM traffic again at ~25 dB round-trip SNR —
    validate by ear on real weights before serving with it."""
    qparams = quantize_params(model.params, bits=bits)
    n_q = sum(isinstance(leaf, QTensor)
              for leaf in jax.tree.leaves(
                  qparams, is_leaf=lambda x: isinstance(x, QTensor)))
    logger.info("quantized %d weight tensors to int%d", n_q, bits)

    clone = object.__new__(TTSModel)
    clone.__dict__.update(model.__dict__)
    clone.params = qparams
    clone.engine = Engine(model.config, qparams, batch_size=model.engine.batch)
    # re-apply stage parallelism: the source model's POCKET_TTS_STAGE_CODEC
    # opt-in lives on its engine, and the fresh engine must not silently
    # drop it for --quantized runs
    if getattr(model.engine, "_codec_device", None) is not None:
        clone.engine.enable_staged_codec(model.engine._codec_device)
    clone.is_quantized = True
    return clone
