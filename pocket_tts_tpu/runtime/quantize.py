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
