"""Device mesh + sharding rules.

The reference is strictly single-process/single-device (SURVEY.md §2.6) — scaling
out is new capability, designed the JAX way: pick a mesh, annotate weight/activation
shardings, let GSPMD insert the collectives (psum over the FFN contraction is the
tensor-parallel all-reduce; the batch axis is data parallelism over concurrent
streams of the serving batcher).

Axes:
  dp — data parallel over the serving batch (requests are independent).
  tp — tensor parallel over FFN hidden units (Megatron-style: ff1 column-split,
       ff2 row-split -> one all-reduce per layer) and over attention heads for
       the KV caches.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if tp is None:
        # prefer tp that divides both the FFN hidden (4096) and head count (16)
        tp = 1
        for cand in (4, 2, 8):
            if n % cand == 0 and cand <= n:
                tp = cand
                break
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _path_name(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_sharding_rules(path: tuple, leaf) -> P:
    """PartitionSpec per parameter leaf (path = key path entries).

    Megatron pattern per transformer layer, two all-reduces total:
      in_proj [L, 3, E, E] column-parallel on dim 2 (head-major: E = H*D with
      heads leading, so contiguous tp blocks are whole heads — matches the
      head-sharded KV caches in :func:`state_sharding_rules`);
      out_proj [L, E, E] row-parallel on the contraction dim -> psum;
      ff1 [L, F, E] column-parallel, ff2 [L, E, F] row-parallel -> psum.
    """
    name = _path_name(path)
    if name.endswith("in_proj"):
        return P(None, None, "tp", None)
    if name.endswith("out_proj"):
        return P(None, None, "tp")
    if name.endswith("ff1"):
        return P(None, "tp", None)
    if name.endswith("ff2"):
        return P(None, None, "tp")
    # Everything else (norms, convs, embeddings, heads) is small: replicate.
    return P()


def shard_params(params: dict, mesh: Mesh) -> dict:
    from pocket_tts_tpu.ops.qtensor import QTensor

    def put(path, leaf):
        if isinstance(leaf, QTensor):
            # QTensor is a pytree node: without is_leaf the map would recurse
            # into (q, scale) children, the path would gain a trailing /0 or
            # /1 index, and every endswith name rule would silently miss —
            # int8 TP weights were fully replicated with no signal.  The q
            # array takes the named rule; the per-channel scale covers q's
            # LEADING axes, so its spec is the rule truncated to its rank.
            # (Packed int4 halves q's last axis — never a sharded axis here.)
            spec = _fit_spec(param_sharding_rules(path, leaf), leaf.q.shape,
                             mesh)
            q = jax.device_put(leaf.q, NamedSharding(mesh, spec))
            s_spec = _fit_spec(P(*spec[: leaf.scale.ndim]), leaf.scale.shape,
                               mesh)
            scale = jax.device_put(leaf.scale, NamedSharding(mesh, s_spec))
            return QTensor(q, scale)
        spec = _fit_spec(param_sharding_rules(path, leaf), leaf.shape, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        put, params, is_leaf=lambda x: isinstance(x, QTensor))


def state_sharding_rules(path: tuple) -> P:
    """Generation state: batch-sharded over dp; KV caches additionally sharded
    over heads on tp ([L, B, S, H, D])."""
    name = _path_name(path)
    if name.endswith("kc") or name.endswith("vc"):
        return P(None, "dp", None, "tp", None)
    if name.endswith("pos"):
        return P("dp")
    if name.endswith("latent"):
        return P("dp", None)
    # mimi conv states: [B, C, T]
    return P("dp")


def _fit_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Trim a spec to the array rank and drop axes that don't divide the dim
    (e.g. the Mimi decoder has fewer heads than tp)."""
    out = []
    for i, axis in enumerate(spec[: len(shape)]):
        if axis is not None and shape[i] % mesh.shape[axis] != 0:
            axis = None
        out.append(axis)
    return P(*out)


def shard_state(state: dict, mesh: Mesh) -> dict:
    def put(path, leaf):
        spec = _fit_spec(state_sharding_rules(path), leaf.shape, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)


def sharding_manifest(tree) -> dict[str, dict]:
    """name -> {shape, spec, sharded} for every leaf of a placed pytree.

    ``sharded`` is True only when the leaf is ACTUALLY distributed (its spec
    names a mesh axis of size > 1).  _fit_spec silently drops axes that don't
    divide a dim — correct, but a config change could quietly de-shard the FFN
    with no numerical signal; this manifest is what tests assert against and
    what the dryrun prints."""
    out = {}

    def visit(path, leaf):
        name = _path_name(path)
        sh = getattr(leaf, "sharding", None)
        spec = getattr(sh, "spec", None)
        mesh = getattr(sh, "mesh", None)
        dist = False
        if spec is not None and mesh is not None:
            for axis in spec:
                for ax in (axis if isinstance(axis, tuple) else (axis,)):
                    if ax is not None and dict(mesh.shape).get(ax, 1) > 1:
                        dist = True
        out[name] = {"shape": tuple(leaf.shape),
                     "itemsize": getattr(getattr(leaf, "dtype", None),
                                         "itemsize", 4),
                     "spec": str(spec) if spec is not None else None,
                     "sharded": dist}

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


def format_shard_report(tree, min_bytes: int = 1 << 20) -> str:
    """Sharded leaves + replicated leaves above ``min_bytes`` (the ones a
    silent de-shard would matter for), one line each."""
    man = sharding_manifest(tree)
    lines = []
    for name, info in sorted(man.items()):
        nbytes = int(np.prod(info["shape"])) * info.get("itemsize", 4)
        if info["sharded"]:
            lines.append(f"  sharded    {name} {info['shape']} {info['spec']}")
        elif nbytes >= min_bytes:
            lines.append(f"  REPLICATED {name} {info['shape']} ({nbytes >> 20} MiB)")
    return "\n".join(lines) or "  (nothing sharded)"
