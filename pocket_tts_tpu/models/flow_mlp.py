"""Conditional flow network (SimpleMLPAdaLN) + LSD Euler integrator.

Architecture from python-reference/pocket_tts/modules/mlp.py:58-215 and the LSD
decode loop from python-reference/pocket_tts/models/flow_lm.py:19-40
(Lagrangian Self Distillation, arXiv 2505.18825).

TPU shaping: the six ResBlocks are stacked and scanned; the two timestep
embedders depend only on the (static) LSD step schedule, so their sum is
precomputed once as a ``[num_steps, dim]`` table — inside the per-frame decode
loop only the cond projection and the block chain run (the same hot-path split
the reference makes in crates/pocket-tts/src/modules/mlp.rs:296-383).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from pocket_tts_tpu.config import FlowConfig
from pocket_tts_tpu.ops.norms import layer_norm, rms_norm_torchvar
from pocket_tts_tpu.ops.qtensor import mat


def _timestep_embedding(p_te: dict, t: jnp.ndarray, freq_size: int = 256) -> jnp.ndarray:
    """p_te: one TimestepEmbedder's params; t: [...]-shaped scalar times."""
    half = freq_size // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = emb @ mat(p_te["w1"]).T + p_te["b1"]
    h = jax.nn.silu(h)
    h = h @ mat(p_te["w2"]).T + p_te["b2"]
    return rms_norm_torchvar(h, p_te["alpha"], eps=1e-5)


def time_embedding_table(params: dict, num_steps: int) -> jnp.ndarray:
    """[num_steps, dim] table of (TE_s(s_i) + TE_t(t_i)) / 2 for the LSD schedule
    s_i = i/N, t_i = (i+1)/N."""
    steps = jnp.arange(num_steps, dtype=jnp.float32)
    s = steps / num_steps
    t = (steps + 1) / num_steps
    e_s = _timestep_embedding(params["time_embed_0"], s)
    e_t = _timestep_embedding(params["time_embed_1"], t)
    return (e_s + e_t) / 2.0


def time_embedding_tables(params: dict, max_steps: int) -> jnp.ndarray:
    """[max_steps, max_steps, dim]: row L-1 is the L-step LSD schedule's
    embedding table, zero-padded beyond L.  Indexed per batch slot by the
    continuous batcher so requests with different ``lsd_decode_steps`` share
    one compiled decode program (padded rows are dt=0 no-op steps in
    :func:`lsd_decode_masked`, so their embedding values never matter)."""
    rows = []
    for n in range(1, max_steps + 1):
        tab = time_embedding_table(params, n)
        rows.append(jnp.pad(tab, ((0, max_steps - n), (0, 0))))
    return jnp.stack(rows)


def embed_condition(params: dict, cond: jnp.ndarray) -> jnp.ndarray:
    """cond_embed: [.., cond_dim] -> [.., dim]."""
    return cond @ mat(params["cond_w"]).T + params["cond_b"]


def flow_step(params: dict, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """One flow evaluation v = f(y, x): x [B, ldim], y [B, dim] (time + cond)."""
    h = x @ mat(params["in_w"]).T + params["in_b"]

    def block(h, bp):
        mod = jax.nn.silu(y) @ mat(bp["ada_w"]).T + bp["ada_b"]
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        z = layer_norm(h, bp["ln_w"], bp["ln_b"], eps=1e-6)
        z = z * (1 + scale) + shift
        z = z @ mat(bp["mlp1_w"]).T + bp["mlp1_b"]
        z = jax.nn.silu(z)
        z = z @ mat(bp["mlp2_w"]).T + bp["mlp2_b"]
        return h + gate * z, None

    h, _ = lax.scan(block, h, params["blocks"], unroll=True)

    mod = jax.nn.silu(y) @ mat(params["final_ada_w"]).T + params["final_ada_b"]
    shift, scale = jnp.split(mod, 2, axis=-1)
    z = layer_norm(h, None, None, eps=1e-6)
    z = z * (1 + scale) + shift
    return z @ mat(params["final_w"]).T + params["final_b"]


def lsd_decode(
    params: dict,
    cond_emb: jnp.ndarray,
    t_emb_table: jnp.ndarray,
    noise: jnp.ndarray,
    num_steps: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Euler-integrate the flow from ``noise`` (python lsd_decode semantics).

    cond_emb: [B, dim] (already cond_embed-projected); t_emb_table: [N, dim].
    ``use_pallas`` switches the block chain to the fused TPU kernel
    (ops/pallas/flow_kernel.py) — numerically identical at f32.
    """
    if use_pallas:
        from pocket_tts_tpu.ops.pallas.flow_kernel import flow_step_pallas as step_fn
    else:
        step_fn = flow_step
    x = noise.astype(jnp.float32)
    for i in range(num_steps):
        y = t_emb_table[i] + cond_emb
        v = step_fn(params, y, x)
        x = x + v.astype(jnp.float32) / num_steps
    return x


def lsd_decode_masked(
    params: dict,
    cond_emb: jnp.ndarray,
    t_emb_sb: jnp.ndarray,  # [max_steps, B, dim] per-slot time embeddings
    noise: jnp.ndarray,
    steps_vec: jnp.ndarray,  # [B] int32 per-slot step counts (1..max_steps)
    max_steps: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Per-slot LSD step counts in ONE compiled program (mixed
    ``lsd_decode_steps`` under continuous batching): every slot runs
    ``max_steps`` flow evaluations, but slot s integrates with dt = 1/steps[s]
    for its first steps[s] iterations and dt = 0 afterwards — identical to
    :func:`lsd_decode` at steps[s], at the cost of the batch-max step count."""
    if use_pallas:
        from pocket_tts_tpu.ops.pallas.flow_kernel import flow_step_pallas as step_fn
    else:
        step_fn = flow_step
    x = noise.astype(jnp.float32)
    inv = 1.0 / steps_vec.astype(jnp.float32)
    for i in range(max_steps):
        y = t_emb_sb[i] + cond_emb
        v = step_fn(params, y, x)
        dt = jnp.where(i < steps_vec, inv, 0.0)[:, None]
        x = x + v.astype(jnp.float32) * dt
    return x


def init_params(key: jax.Array, cfg: FlowConfig, ldim: int, cond_dim: int) -> dict:
    dim = cfg.dim
    ks = iter(jax.random.split(key, 32))

    def lin(shape):
        bound = 1.0 / math.sqrt(shape[-1])
        return jax.random.uniform(next(ks), shape, jnp.float32, -bound, bound)

    def te():
        return {
            "w1": lin((dim, 256)), "b1": lin((dim, 256))[:, 0] * 0.0,
            "w2": lin((dim, dim)), "b2": lin((dim, dim))[:, 0] * 0.0,
            "alpha": jnp.ones((dim,), jnp.float32),
        }

    blocks = {
        "ln_w": jnp.ones((cfg.depth, dim)), "ln_b": jnp.zeros((cfg.depth, dim)),
        "mlp1_w": lin((cfg.depth, dim, dim)), "mlp1_b": jnp.zeros((cfg.depth, dim)),
        "mlp2_w": lin((cfg.depth, dim, dim)), "mlp2_b": jnp.zeros((cfg.depth, dim)),
        "ada_w": lin((cfg.depth, 3 * dim, dim)), "ada_b": jnp.zeros((cfg.depth, 3 * dim)),
    }
    return {
        "time_embed_0": te(),
        "time_embed_1": te(),
        "cond_w": lin((dim, cond_dim)), "cond_b": jnp.zeros((dim,)),
        "in_w": lin((dim, ldim)), "in_b": jnp.zeros((dim,)),
        "blocks": blocks,
        "final_ada_w": lin((2 * dim, dim)), "final_ada_b": jnp.zeros((2 * dim,)),
        "final_w": lin((ldim, dim)), "final_b": jnp.zeros((ldim,)),
    }
