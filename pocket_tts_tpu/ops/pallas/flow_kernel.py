"""Pallas TPU kernel: fused SimpleMLPAdaLN flow evaluation.

One flow evaluation is six sequential AdaLN ResBlocks + a final layer — ~80
small XLA ops whose scheduling overhead (~0.6 ms/frame) dwarfs their math
(~40 us of HBM traffic).  This kernel runs the whole chain as ONE program:
the grid iterates over blocks, Pallas double-buffers each block's weights
HBM->VMEM while the previous block computes, and the hidden state lives in a
VMEM scratch across grid steps (TPU grid iterations are sequential).

Matches ops-level semantics of models/flow_mlp.flow_step exactly (LayerNorm in
f32, SiLU, modulate, residual); parity-tested against it in
tests/test_pallas.py, including on CPU via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm_f32(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y


def _kernel(sy_ref, h0_ref,
            ada_w_ref, ada_b_ref, ln_w_ref, ln_b_ref,
            mlp1_w_ref, mlp1_b_ref, mlp2_w_ref, mlp2_b_ref,
            out_ref, h_scratch):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)

    h = h_scratch[:]
    sy = sy_ref[:]

    # mod = silu(y) @ ada_w.T + ada_b   -> [B, 3*dim]
    mod = jax.lax.dot_general(
        sy, ada_w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + ada_b_ref[0].astype(jnp.float32)
    dim = h.shape[-1]
    shift = mod[:, :dim]
    scale = mod[:, dim:2 * dim]
    gate = mod[:, 2 * dim:]

    z = _layer_norm_f32(h, ln_w_ref[0], ln_b_ref[0], 1e-6)
    z = z * (1.0 + scale) + shift
    z = jax.lax.dot_general(
        z.astype(mlp1_w_ref.dtype), mlp1_w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + mlp1_b_ref[0].astype(jnp.float32)
    z = z * jax.nn.sigmoid(z)  # SiLU
    z = jax.lax.dot_general(
        z.astype(mlp2_w_ref.dtype), mlp2_w_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + mlp2_b_ref[0].astype(jnp.float32)

    h = h + gate * z
    h_scratch[:] = h

    @pl.when(i == n - 1)
    def _():
        out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("interpret",))
def flow_blocks(sy: jnp.ndarray, h0: jnp.ndarray, blocks: dict,
                *, interpret: bool = False) -> jnp.ndarray:
    """Run the stacked ResBlock chain.

    sy: silu(y) [B, dim] (precomputed — y is shared across blocks),
    h0: input_proj output [B, dim]; blocks: stacked params [depth, ...].
    Returns h after all blocks, f32.
    """
    depth, three_dim, dim = blocks["ada_w"].shape
    b = sy.shape[0]

    def per_block(name, row_shape):
        return pl.BlockSpec((1, *row_shape), lambda i: (i, *(0,) * len(row_shape)),
                            memory_space=pltpu.VMEM)

    # biases as [depth, 1, D]: TPU block shapes need the trailing two dims to
    # match the array (or be tile-aligned), which a [depth, D] slice isn't.
    def bias3(name):
        arr = blocks[name]
        return arr.reshape(depth, 1, arr.shape[-1])

    return pl.pallas_call(
        _kernel,
        grid=(depth,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sy
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
            per_block("ada_w", (three_dim, dim)),
            per_block("ada_b", (1, three_dim)),
            per_block("ln_w", (1, dim)),
            per_block("ln_b", (1, dim)),
            per_block("mlp1_w", (dim, dim)),
            per_block("mlp1_b", (1, dim)),
            per_block("mlp2_w", (dim, dim)),
            per_block("mlp2_b", (1, dim)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, dim), jnp.float32)],
        interpret=interpret,
    )(
        sy.astype(jnp.float32), h0,
        blocks["ada_w"], bias3("ada_b"), bias3("ln_w"), bias3("ln_b"),
        blocks["mlp1_w"], bias3("mlp1_b"), blocks["mlp2_w"], bias3("mlp2_b"),
    )


def flow_step_pallas(params: dict, y: jnp.ndarray, x: jnp.ndarray,
                     *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for models/flow_mlp.flow_step using the fused kernel
    for the block chain (input/final projections stay in XLA — they're two
    matmuls that fuse fine)."""
    from pocket_tts_tpu.ops.qtensor import mat

    h0 = x @ mat(params["in_w"]).T + params["in_b"]
    sy = jax.nn.silu(y)
    blocks = params["blocks"]
    if any(hasattr(blocks[k], "dequant") for k in blocks):
        blocks = {k: (blocks[k].dequant() if hasattr(blocks[k], "dequant")
                      else blocks[k]) for k in blocks}
    h = flow_blocks(sy, h0.astype(jnp.float32), blocks, interpret=interpret)

    mod = sy @ mat(params["final_ada_w"]).T + params["final_ada_b"]
    shift, scale = jnp.split(mod, 2, axis=-1)
    z = _layer_norm_f32(h, None, None, 1e-6)
    z = z * (1 + scale) + shift
    return z @ mat(params["final_w"]).T + params["final_b"]
