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


def quantize_params(params: dict) -> dict:
    return jax.jit(
        lambda p: quantize_tree(p, stacked_names=STACKED_WEIGHTS)
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


def quantize_model(model: TTSModel) -> TTSModel:
    """Return a clone of ``model`` running on int8 weights."""
    qparams = quantize_params(model.params)
    n_q = sum(isinstance(leaf, QTensor)
              for leaf in jax.tree.leaves(
                  qparams, is_leaf=lambda x: isinstance(x, QTensor)))
    logger.info("quantized %d weight tensors to int8", n_q)

    clone = object.__new__(TTSModel)
    clone.__dict__.update(model.__dict__)
    clone.params = qparams
    clone.engine = Engine(model.config, qparams, batch_size=model.engine.batch)
    clone.is_quantized = True
    return clone
