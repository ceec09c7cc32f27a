"""Fine-tune driver: optax optimizer, jitted/donated train step, mesh sharding.

The train step updates only the FlowLM subtree (backbone, flow head, text
embeddings, EOS head) — the Mimi codec stays frozen as the vocoder (it only
appears in data prep, training/data.py).  Everything is pure-functional:
``train_step(params, opt_state, batch, key) -> (params, opt_state, metrics)``
under one jit with params/opt_state donated, so a TPU step is a single
dispatch.

Multi-chip: shard params with parallel.mesh.shard_params (tensor parallelism)
and the batch with :func:`shard_batch` (data parallelism over the ``dp`` axis);
GSPMD inserts the gradient reductions — no hand-written collectives, per the
repo's sharding design (parallel/mesh.py).
"""

from __future__ import annotations

import logging
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pocket_tts_tpu.config import Config
from pocket_tts_tpu.training.data import make_batch
from pocket_tts_tpu.training.loss import flow_matching_loss

logger = logging.getLogger(__name__)


def make_optimizer(
    lr: float = 1e-4,
    *,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
    warmup_steps: int = 0,
    total_steps: int | None = None,
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping; optional linear warmup into cosine decay
    when ``total_steps`` is given (constant lr otherwise)."""
    if total_steps is not None:
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(1, warmup_steps),
            decay_steps=max(total_steps, warmup_steps + 1))
    elif warmup_steps:
        sched = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        sched = lr
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def make_train_step(
    cfg: Config,
    optimizer: optax.GradientTransformation,
    *,
    eos_weight: float = 1.0,
    consistency_weight: float = 0.0,
):
    """One fused update step over the FlowLM param subtree.

    Donates params and opt_state (in-place HBM update; pass fresh pytrees or
    re-bind the returned ones).  Sharded inputs (params via mesh.shard_params,
    batch via shard_batch) make the same compiled step run dp x tp multi-chip.
    """

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params: dict, opt_state, batch: dict, key: jax.Array):
        (loss, metrics), grads = jax.value_and_grad(
            flow_matching_loss, has_aux=True)(
                params, cfg, batch, key,
                eos_weight=eos_weight, consistency_weight=consistency_weight)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        del loss
        return params, opt_state, metrics

    return train_step


def shard_batch(batch: dict, mesh) -> dict:
    """Place every batch array with its leading (batch) axis split over the
    mesh's ``dp`` axis — the data-parallel half of the dp x tp layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(leaf):
        arr = jnp.asarray(leaf)
        spec = P("dp", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}


def _slice_batch(batch: dict, idx: np.ndarray) -> dict:
    return {k: np.asarray(v)[idx] for k, v in batch.items()}


def finetune(
    model,
    pairs: list,
    *,
    steps: int = 200,
    batch_size: int | None = None,
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
    warmup_steps: int = 0,
    eos_weight: float = 1.0,
    consistency_weight: float = 0.0,
    voice_wav: np.ndarray | None = None,
    max_tokens: int | None = None,
    seed: int = 0,
    log_every: int = 25,
    mesh=None,
    lora_rank: int = 0,
    lora_alpha: float | None = None,
    lora_targets: tuple[str, ...] | None = None,
):
    """Fine-tune ``model`` on (text, waveform) pairs; returns a new TTSModel.

    All examples are padded to ONE global shape and minibatches are row
    slices of it (constant shapes -> exactly one compiled train step; a
    ragged last minibatch would recompile, so sampling wraps around).

    ``lora_rank > 0`` switches to LoRA (training/lora.py): only rank-r
    factors over ``lora_targets`` train (base frozen); the returned model has
    the adapter merged in, and ``._lora = (factors, rank, alpha)`` is attached
    for :func:`save_lora_params` (~2 MB artifacts at flagship dims).
    """
    from pocket_tts_tpu.runtime.engine import Engine
    from pocket_tts_tpu.tts import TTSModel

    full = make_batch(model, pairs, voice_wav=voice_wav, max_tokens=max_tokens)
    n = len(pairs)
    bsz = min(batch_size or n, n)

    optimizer = make_optimizer(lr, weight_decay=weight_decay,
                               clip_norm=clip_norm, warmup_steps=warmup_steps,
                               total_steps=steps)
    use_lora = lora_rank > 0
    if use_lora:
        from pocket_tts_tpu.training.lora import (
            LORA_DEFAULT_TARGETS, init_lora, make_lora_train_step, merge_lora)

        alpha = float(lora_alpha if lora_alpha is not None else lora_rank)
        targets = tuple(lora_targets or LORA_DEFAULT_TARGETS)
        train_step = make_lora_train_step(
            model.config, optimizer, alpha=alpha, rank=lora_rank,
            eos_weight=eos_weight, consistency_weight=consistency_weight)
    else:
        train_step = make_train_step(model.config, optimizer,
                                     eos_weight=eos_weight,
                                     consistency_weight=consistency_weight)

    # jnp.array COPIES (jnp.asarray would alias): the train step donates its
    # params input, and donating aliased buffers would delete the live
    # model.params out from under the caller.  LoRA keeps the base frozen
    # (non-donated jit argument), so aliasing it is safe — only the small
    # factor tree is fresh/donated.
    if use_lora:
        base = jax.tree.map(jnp.asarray, model.params["flow_lm"])
        if mesh is not None:
            from pocket_tts_tpu.parallel.mesh import shard_params
            base = shard_params(base, mesh)
        params = init_lora(base, lora_rank, targets=targets, seed=seed)
    else:
        params = jax.tree.map(lambda a: jnp.array(a, jnp.float32)
                              if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                              else jnp.array(a), model.params["flow_lm"])
        if mesh is not None:
            from pocket_tts_tpu.parallel.mesh import shard_params
            params = shard_params(params, mesh)
    opt_state = jax.jit(optimizer.init)(params)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    order = rng.permutation(n)
    cursor = 0
    t0 = time.time()
    last = {}
    for step in range(steps):
        if cursor + bsz > n:
            order = rng.permutation(n)
            cursor = 0
        idx = order[cursor:cursor + bsz]
        cursor += bsz
        mb = _slice_batch(full, idx)
        mb = shard_batch(mb, mesh) if mesh is not None else {
            k: jnp.asarray(v) for k, v in mb.items()}
        if use_lora:
            params, opt_state, metrics = train_step(
                params, opt_state, base, mb, jax.random.fold_in(key, step))
        else:
            params, opt_state, metrics = train_step(
                params, opt_state, mb, jax.random.fold_in(key, step))
        if log_every and (step % log_every == 0 or step == steps - 1):
            last = {k: float(v) for k, v in jax.device_get(metrics).items()}
            logger.info("step %d/%d loss %.4f (flow %.4f eos %.4f) grad %.3f [%.1fs]",
                        step + 1, steps, last["loss"], last["flow_mse"],
                        last["eos_bce"], last["grad_norm"], time.time() - t0)

    new_params = dict(model.params)
    if use_lora:
        tuned = jax.jit(lambda b, lo: merge_lora(b, lo, alpha=alpha,
                                                 rank=lora_rank))(base, params)
    else:
        tuned = params
    new_params["flow_lm"] = jax.tree.map(
        lambda a: jax.device_get(a) if mesh is not None else a, tuned)
    new_params["flow_lm"] = jax.tree.map(jnp.asarray, new_params["flow_lm"])

    clone = object.__new__(TTSModel)
    clone.__dict__.update(model.__dict__)
    clone.params = new_params
    clone.engine = Engine(model.config, new_params,
                          batch_size=model.engine.batch)
    if getattr(model.engine, "_codec_device", None) is not None:
        clone.engine.enable_staged_codec(model.engine._codec_device)
    clone._finetune_metrics = last
    if use_lora:
        clone._lora = (jax.tree.map(jax.device_get, params), lora_rank, alpha)
    return clone


# --------------------------------------------------------------------------
# Fine-tuned checkpoint artifacts (safetensors of the FlowLM subtree).
# --------------------------------------------------------------------------

FINETUNED_FORMAT = "pocket-tts-tpu-finetuned"


def save_finetuned_params(params: dict, path) -> None:
    """Persist a trained FlowLM subtree (pass ``model.params['flow_lm']``)."""
    from safetensors.numpy import save_file

    from pocket_tts_tpu.runtime.quantize import _flatten_paths

    tensors = {name: np.asarray(jax.device_get(leaf), np.float32)
               for name, leaf in _flatten_paths(params)}
    save_file(tensors, str(path), metadata={"format": FINETUNED_FORMAT})


def load_finetuned_params(path) -> dict:
    """Load a :func:`save_finetuned_params` artifact back into a pytree."""
    from safetensors import safe_open

    from pocket_tts_tpu.runtime.quantize import _unflatten_paths

    items = {}
    with safe_open(str(path), framework="numpy") as f:
        meta = f.metadata() or {}
        if meta.get("format") != FINETUNED_FORMAT:
            raise ValueError(f"{path} is not a {FINETUNED_FORMAT} checkpoint")
        for k in f.keys():
            items[k] = jnp.asarray(f.get_tensor(k))
    return _unflatten_paths(items)


def apply_adapted(model, path):
    """Load either artifact kind by sniffing its safetensors ``format``
    metadata: a full fine-tuned FlowLM (:func:`save_finetuned_params`) or a
    LoRA adapter (lora.save_lora_params) — the ``--finetuned`` CLI flag and
    server loaders accept both through this one entry point."""
    from safetensors import safe_open

    with safe_open(str(path), framework="numpy") as f:
        fmt = (f.metadata() or {}).get("format")
    if fmt == FINETUNED_FORMAT:
        return apply_finetuned(model, path)
    from pocket_tts_tpu.training.lora import LORA_FORMAT, apply_lora

    if fmt == LORA_FORMAT:
        return apply_lora(model, path)
    raise ValueError(f"{path}: unknown checkpoint format {fmt!r} (expected "
                     f"{FINETUNED_FORMAT} or {LORA_FORMAT})")


def apply_finetuned(model, path):
    """Return a clone of ``model`` running a saved fine-tuned FlowLM."""
    from pocket_tts_tpu.runtime.engine import Engine
    from pocket_tts_tpu.tts import TTSModel

    new_params = dict(model.params)
    new_params["flow_lm"] = load_finetuned_params(path)
    clone = object.__new__(TTSModel)
    clone.__dict__.update(model.__dict__)
    clone.params = new_params
    clone.engine = Engine(model.config, new_params,
                          batch_size=model.engine.batch)
    if getattr(model.engine, "_codec_device", None) is not None:
        clone.engine.enable_staged_codec(model.engine._codec_device)
    return clone
