"""LoRA adapters for the fine-tuning subsystem (TPU-native extension; the
reference is inference-only, so there is no counterpart to cite).

Low-Rank Adaptation (Hu et al., arXiv 2106.09685): instead of updating a
weight ``W [out, in]`` directly, train a rank-r delta ``B @ A`` (``A [r, in]``
init ~N(0, 1/r), ``B [out, r]`` init 0 — the adapter starts as an exact
no-op) and serve ``W + (alpha/r) * B @ A``.  Two production wins over full
fine-tuning here:

* **Artifact size** — the flagship backbone is ~150 MB; a rank-8 adapter over
  its attention + FFN matrices is ~2 MB, so per-speaker voices become cheap
  to store and ship.
* **Optimizer memory / step cost** — AdamW state covers only the factors, and
  the donated train step updates ~1% of the parameters per step.

TPU mapping: this repo stacks transformer layers along a leading axis
(``tf/ff1 [L, hidden, d]``, ``tf/in_proj [L, 3, d, d]`` — models/transformer.py
scans over it), so the factors carry the same leading axes as batch dims and
one einsum (``...or,...ri->...oi``) materializes every layer's delta in a
single MXU-friendly contraction — no per-layer Python loop, and the merged
tree is identical in structure to the base, so the inference engine and the
int8 quantizer run on it unchanged.

The train step takes the FROZEN base params as a jit *argument* (never a
closure — 90 MB of constants would inline into the HLO and the axon tunnel
rejects the body, see CLAUDE.md) and donates only the factors + optimizer
state.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Backbone attention + FFN matrices: the standard LoRA target set, and ~95%
# of the FlowLM's trainable bytes.  Paths are _flatten_paths keys into
# params["flow_lm"]; selection is by exact match.
LORA_DEFAULT_TARGETS = ("tf/in_proj", "tf/out_proj", "tf/ff1", "tf/ff2")

LORA_FORMAT = "pocket-tts-tpu-lora"


def _flatten(params: dict):
    from pocket_tts_tpu.runtime.quantize import _flatten_paths

    return _flatten_paths(params)


def init_lora(
    params: dict,
    rank: int,
    *,
    targets: tuple[str, ...] = LORA_DEFAULT_TARGETS,
    seed: int = 0,
) -> dict:
    """Factor tree ``{path: {"a": [*lead, r, in], "b": [*lead, out, r]}}``
    over ``params`` (a FlowLM subtree).  ``b`` starts at zero so the merged
    model is bitwise the base model before the first step."""
    if rank < 1:
        raise ValueError(f"LoRA rank must be >= 1, got {rank}")
    available = dict(_flatten(params))
    missing = [t for t in targets if t not in available]
    if missing:
        raise ValueError(f"LoRA targets not in params: {missing}; "
                         f"known paths include {sorted(available)[:8]}...")
    rng = np.random.default_rng(seed)
    lora: dict = {}
    for path in targets:
        w = np.asarray(available[path])
        if w.ndim < 2:
            raise ValueError(f"LoRA target {path} is not a matrix: {w.shape}")
        *lead, out, inn = w.shape
        a = rng.normal(0.0, 1.0 / rank, size=(*lead, rank, inn))
        lora[path] = {"a": jnp.asarray(a, jnp.float32),
                      "b": jnp.zeros((*lead, out, rank), jnp.float32)}
    return lora


def lora_delta(factors: dict, scale: float) -> jnp.ndarray:
    """``scale * B @ A`` with leading layer axes as batch dims."""
    return scale * jnp.einsum("...or,...ri->...oi",
                              factors["b"].astype(jnp.float32),
                              factors["a"].astype(jnp.float32))


def merge_lora(params: dict, lora: dict, *, alpha: float, rank: int) -> dict:
    """Base + deltas, same tree structure/dtypes as ``params`` (jit-safe;
    untargeted leaves pass through by reference)."""
    scale = alpha / rank
    flat = dict(_flatten(params))
    merged = {path: (flat[path].astype(jnp.float32)
                     + lora_delta(f, scale)).astype(flat[path].dtype)
              for path, f in lora.items()}

    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, list):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(node)]
        return merged.get(prefix[:-1], node)

    return rebuild(params)


def make_lora_train_step(cfg, optimizer, *, alpha: float, rank: int,
                         eos_weight: float = 1.0,
                         consistency_weight: float = 0.0):
    """Fused LoRA update: gradients flow through the merge into the factors
    only; the base tree is a frozen input (non-donated — it is the caller's
    live model params)."""
    from functools import partial

    from pocket_tts_tpu.training.loss import flow_matching_loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(lora: dict, opt_state, base: dict, batch: dict,
                   key: jax.Array):
        def loss_fn(lo):
            merged = merge_lora(base, lo, alpha=alpha, rank=rank)
            return flow_matching_loss(
                merged, cfg, batch, key,
                eos_weight=eos_weight, consistency_weight=consistency_weight)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora)
        import optax

        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        del loss
        return lora, opt_state, metrics

    return train_step


# --------------------------------------------------------------------------
# Adapter artifacts: ~2 MB per voice at flagship dims instead of ~300 MB.
# --------------------------------------------------------------------------

def save_lora_params(lora: dict, path, *, rank: int, alpha: float) -> None:
    """Persist a factor tree from :func:`init_lora` / the trainer."""
    from safetensors.numpy import save_file

    tensors = {}
    for tpath, f in lora.items():
        tensors[f"{tpath}/a"] = np.asarray(jax.device_get(f["a"]), np.float32)
        tensors[f"{tpath}/b"] = np.asarray(jax.device_get(f["b"]), np.float32)
    save_file(tensors, str(path),
              metadata={"format": LORA_FORMAT, "rank": str(rank),
                        "alpha": repr(float(alpha))})


def load_lora_params(path) -> tuple[dict, int, float]:
    """Returns ``(factor tree, rank, alpha)`` from a saved adapter."""
    from safetensors import safe_open

    lora: dict = {}
    with safe_open(str(path), framework="numpy") as f:
        meta = f.metadata() or {}
        if meta.get("format") != LORA_FORMAT:
            raise ValueError(f"{path} is not a {LORA_FORMAT} adapter")
        rank, alpha = int(meta["rank"]), float(meta["alpha"])
        for k in f.keys():
            tpath, leaf = k.rsplit("/", 1)
            lora.setdefault(tpath, {})[leaf] = jnp.asarray(f.get_tensor(k))
    for tpath, fac in lora.items():
        if set(fac) != {"a", "b"}:
            raise ValueError(f"{path}: target {tpath} missing a/b factors")
    return lora, rank, alpha


# --------------------------------------------------------------------------
# Adapter bank: N adapters stacked for per-slot batched serving.
# --------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class AdapterBank:
    """N LoRA adapters stacked along an adapter axis for PER-SLOT batched
    serving (VERDICT r4 #5): ``stacks[target] = {"a": [L, N, (3,) r, in],
    "b": [L, N, (3,) out, r]}`` rides the batched decode programs as a jit
    argument, and each slot selects its adapter with a one-hot x alpha/rank
    row of ``row()`` — so concurrent requests with DIFFERENT fine-tuned
    voices share one decode loop instead of serializing through per-adapter
    merged engines (server/app.py previously bypassed the batcher for any
    ``adapter`` request).

    Layout: leading layer axis first (the backbone layer scan consumes the
    stacks as scan xs — transformer.cache_forward), adapter axis second.
    Ranks may differ per adapter; factors are zero-padded to the bank's max
    rank (zero rows of A with zero columns of B contribute nothing).  Only
    backbone targets (``tf/...``, the LORA_DEFAULT_TARGETS set) are
    bankable: other subtrees never ride the per-layer scan.
    """

    names: tuple[str, ...]
    stacks: dict          # {tf-key: {"a": [L,N,...,r,in], "b": [L,N,...,out,r]}}
    scales: np.ndarray    # [N] alpha/rank per adapter

    # The ONLY targets the batched per-slot delta path applies
    # (transformer._qkv/_post_attn read exactly these keys).  Bankability
    # must be judged against this set, not a tf/ prefix: a tf/norm1_w
    # adapter would stack fine and then be SILENTLY dropped at serving
    # time, making audio depend on server occupancy.
    SUPPORTED_TARGETS = frozenset(LORA_DEFAULT_TARGETS)

    @property
    def n(self) -> int:
        return len(self.names)

    def row(self, name: str | None) -> np.ndarray:
        """Per-slot mixing row [N]: one-hot x (alpha/rank); zeros = base."""
        w = np.zeros((self.n,), np.float32)
        if name is not None:
            try:
                i = self.names.index(name)
            except ValueError:
                raise KeyError(f"adapter {name!r} not in bank "
                               f"{self.names}") from None
            w[i] = self.scales[i]
        return w


def bankable_lora_targets(keys) -> bool:
    """True when every factor key (``<target>/a`` / ``<target>/b`` as stored
    by save_lora_params) names a target the batched delta path applies —
    the single definition of "bankable" shared by build_adapter_bank and
    the server's startup gate."""
    return all(k.rsplit("/", 1)[0] in AdapterBank.SUPPORTED_TARGETS
               for k in keys)


def build_adapter_bank(adapters: dict[str, str]) -> AdapterBank:
    """Load LoRA artifacts and stack them into an :class:`AdapterBank`.

    ``adapters``: name -> path of ``LORA_FORMAT`` artifacts.  Raises
    ValueError for non-LoRA artifacts or targets outside the backbone
    (those adapters must keep the merged single-stream path)."""
    if not adapters:
        raise ValueError("adapter bank needs at least one adapter")
    loaded = {}
    for name, path in adapters.items():
        lora, rank, alpha = load_lora_params(path)
        bad = sorted(set(lora) - AdapterBank.SUPPORTED_TARGETS)
        if bad:
            raise ValueError(
                f"adapter {name!r}: targets {bad} are outside the batched "
                f"delta path ({sorted(AdapterBank.SUPPORTED_TARGETS)}); such "
                f"adapters must keep the merged single-stream path")
        loaded[name] = (lora, rank, alpha)
    names = tuple(loaded)
    r_max = max(rank for _, rank, _ in loaded.values())
    targets = sorted({t for lora, _, _ in loaded.values() for t in lora})
    stacks: dict = {}
    for tpath in targets:
        key = tpath[len("tf/"):]
        a_parts, b_parts = [], []
        for name in names:
            lora, rank, _ = loaded[name]
            fac = lora.get(tpath)
            if fac is None:
                # adapter doesn't touch this target: identity (zero delta).
                # Shapes come from any adapter that does.
                ref = next(l[tpath] for l, _, _ in loaded.values()
                           if tpath in l)
                a = np.zeros_like(np.asarray(ref["a"]))
                b = np.zeros_like(np.asarray(ref["b"]))
            else:
                a, b = np.asarray(fac["a"]), np.asarray(fac["b"])
            if a.shape[-2] < r_max:  # zero-pad rank: delta unchanged
                pad = r_max - a.shape[-2]
                a = np.concatenate(
                    [a, np.zeros((*a.shape[:-2], pad, a.shape[-1]), a.dtype)],
                    axis=-2)
                b = np.concatenate(
                    [b, np.zeros((*b.shape[:-1], pad), b.dtype)], axis=-1)
            a_parts.append(a)
            b_parts.append(b)
        stacks[key] = {"a": jnp.asarray(np.stack(a_parts, axis=1), jnp.float32),
                       "b": jnp.asarray(np.stack(b_parts, axis=1), jnp.float32)}
    scales = np.asarray([alpha / rank for _, rank, alpha in loaded.values()],
                        np.float32)
    return AdapterBank(names=names, stacks=stacks, scales=scales)


def apply_lora(model, path):
    """Clone ``model`` with the adapter merged into its FlowLM — inference
    runs the ordinary dense path (zero adapter overhead per step)."""
    from pocket_tts_tpu.runtime.engine import Engine
    from pocket_tts_tpu.tts import TTSModel

    lora, rank, alpha = load_lora_params(path)
    new_params = dict(model.params)
    new_params["flow_lm"] = jax.jit(
        lambda base, lo: merge_lora(base, lo, alpha=alpha, rank=rank)
    )(model.params["flow_lm"], lora)
    clone = object.__new__(TTSModel)
    clone.__dict__.update(model.__dict__)
    clone.params = new_params
    clone.engine = Engine(model.config, new_params,
                          batch_size=model.engine.batch)
    if getattr(model.engine, "_codec_device", None) is not None:
        clone.engine.enable_staged_codec(model.engine._codec_device)
    return clone
