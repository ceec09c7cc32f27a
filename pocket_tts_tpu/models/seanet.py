"""SEANet convolutional encoder/decoder.

Structure generated from config (python-reference/pocket_tts/modules/seanet.py):
encoder = init conv, then per ratio [resblocks, ELU, strided conv(k=2r, s=r)], then
ELU + final conv; decoder mirrors it with transposed-conv upsampling.  Residual
blocks are [ELU, conv(k, dilated), ELU, conv(1x1)] with an identity skip.

Everything exists in two forms sharing one layer walk: ``batch`` (whole sequence,
stateless — used by the encoder) and ``streaming`` (state-threaded — used by the
decoder inside the per-frame scan).

Layer plans carry the torch ModuleList index of each layer so the safetensors
remap is mechanical.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import SEANetConfig
from pocket_tts_tpu.ops.conv import (
    ConvSpec,
    ConvTrSpec,
    batch_conv1d,
    batch_conv_transpose1d,
    conv_init_state,
    convtr_init_state,
    streaming_conv1d,
    streaming_conv_transpose1d,
)


@dataclasses.dataclass(frozen=True)
class Layer:
    kind: Literal["conv", "convtr", "res", "elu"]
    index: int  # torch ModuleList index
    spec: ConvSpec | ConvTrSpec | None = None
    # residual block sub-convs (kind == "res")
    res_specs: tuple[ConvSpec, ...] = ()


def encoder_plan(cfg: SEANetConfig) -> list[Layer]:
    ratios = list(reversed(cfg.ratios))
    layers: list[Layer] = []
    idx = 0

    def conv(spec):
        nonlocal idx
        layers.append(Layer("conv", idx, spec))
        idx += 1

    def elu():
        nonlocal idx
        layers.append(Layer("elu", idx))
        idx += 1

    def res(dim):
        nonlocal idx
        hidden = dim // cfg.compress
        for j in range(cfg.n_residual_layers):
            specs = (
                ConvSpec(dim, hidden, cfg.residual_kernel_size,
                         dilation=cfg.dilation_base**j, pad_mode=cfg.pad_mode),
                ConvSpec(hidden, dim, 1, pad_mode=cfg.pad_mode),
            )
            layers.append(Layer("res", idx, res_specs=specs))
            idx += 1

    mult = 1
    conv(ConvSpec(cfg.channels, mult * cfg.n_filters, cfg.kernel_size, pad_mode=cfg.pad_mode))
    for ratio in ratios:
        res(mult * cfg.n_filters)
        elu()
        conv(ConvSpec(mult * cfg.n_filters, mult * cfg.n_filters * 2,
                      kernel_size=ratio * 2, stride=ratio, pad_mode=cfg.pad_mode))
        mult *= 2
    elu()
    conv(ConvSpec(mult * cfg.n_filters, cfg.dimension, cfg.last_kernel_size,
                  pad_mode=cfg.pad_mode))
    return layers


def decoder_plan(cfg: SEANetConfig) -> list[Layer]:
    layers: list[Layer] = []
    idx = 0

    def add(kind, spec=None, res_specs=()):
        nonlocal idx
        layers.append(Layer(kind, idx, spec, res_specs))
        idx += 1

    mult = int(2 ** len(cfg.ratios))
    add("conv", ConvSpec(cfg.dimension, mult * cfg.n_filters, cfg.kernel_size,
                         pad_mode=cfg.pad_mode))
    for ratio in cfg.ratios:
        add("elu")
        add("convtr", ConvTrSpec(mult * cfg.n_filters, mult * cfg.n_filters // 2,
                                 kernel_size=ratio * 2, stride=ratio))
        dim = mult * cfg.n_filters // 2
        hidden = dim // cfg.compress
        for j in range(cfg.n_residual_layers):
            add("res", res_specs=(
                ConvSpec(dim, hidden, cfg.residual_kernel_size,
                         dilation=cfg.dilation_base**j, pad_mode=cfg.pad_mode),
                ConvSpec(hidden, dim, 1, pad_mode=cfg.pad_mode),
            ))
        mult //= 2
    add("elu")
    add("conv", ConvSpec(cfg.n_filters, cfg.channels, cfg.last_kernel_size,
                         pad_mode=cfg.pad_mode))
    return layers


def _init_conv(key, spec: ConvSpec | ConvTrSpec, transposed=False) -> dict:
    if transposed:
        fan_in = spec.out_channels // spec.groups * spec.kernel_size
        shape = (spec.in_channels, spec.out_channels // spec.groups, spec.kernel_size)
    else:
        fan_in = spec.in_channels // spec.groups * spec.kernel_size
        shape = (spec.out_channels, spec.in_channels // spec.groups, spec.kernel_size)
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.uniform(k1, shape, jnp.float32, -bound, bound)}
    if spec.bias:
        out = spec.out_channels
        p["b"] = jax.random.uniform(k2, (out,), jnp.float32, -bound, bound)
    return p


def init_params(key: jax.Array, plan: list[Layer]) -> list:
    params = []
    keys = jax.random.split(key, len(plan))
    for layer, k in zip(plan, keys):
        if layer.kind == "conv":
            params.append(_init_conv(k, layer.spec))
        elif layer.kind == "convtr":
            params.append(_init_conv(k, layer.spec, transposed=True))
        elif layer.kind == "res":
            k0, k1 = jax.random.split(k)
            params.append({"conv0": _init_conv(k0, layer.res_specs[0]),
                           "conv1": _init_conv(k1, layer.res_specs[1])})
        else:
            params.append({})
    return params


def init_state(plan: list[Layer], batch: int, dtype=jnp.float32) -> list:
    states = []
    for layer in plan:
        if layer.kind == "conv":
            states.append(conv_init_state(layer.spec, batch, dtype))
        elif layer.kind == "convtr":
            states.append(convtr_init_state(layer.spec, batch, dtype))
        elif layer.kind == "res":
            states.append({
                "conv0": conv_init_state(layer.res_specs[0], batch, dtype),
                "conv1": conv_init_state(layer.res_specs[1], batch, dtype),
            })
        else:
            states.append({})
    return states


def batch_forward(plan: list[Layer], params: list, x: jnp.ndarray) -> jnp.ndarray:
    for layer, p in zip(plan, params):
        if layer.kind == "conv":
            x = batch_conv1d(layer.spec, p["w"], p.get("b"), x)
        elif layer.kind == "convtr":
            x = batch_conv_transpose1d(layer.spec, p["w"], p.get("b"), x)
        elif layer.kind == "res":
            v = jax.nn.elu(x)
            v = batch_conv1d(layer.res_specs[0], p["conv0"]["w"], p["conv0"].get("b"), v)
            v = jax.nn.elu(v)
            v = batch_conv1d(layer.res_specs[1], p["conv1"]["w"], p["conv1"].get("b"), v)
            x = x + v
        else:
            x = jax.nn.elu(x)
    return x


def streaming_forward(
    plan: list[Layer], params: list, states: list, x: jnp.ndarray
) -> tuple[jnp.ndarray, list]:
    new_states = []
    for layer, p, st in zip(plan, params, states):
        if layer.kind == "conv":
            x, st = streaming_conv1d(layer.spec, p["w"], p.get("b"), st, x)
        elif layer.kind == "convtr":
            x, st = streaming_conv_transpose1d(layer.spec, p["w"], p.get("b"), st, x)
        elif layer.kind == "res":
            v = jax.nn.elu(x)
            v, s0 = streaming_conv1d(layer.res_specs[0], p["conv0"]["w"],
                                     p["conv0"].get("b"), st["conv0"], v)
            v = jax.nn.elu(v)
            v, s1 = streaming_conv1d(layer.res_specs[1], p["conv1"]["w"],
                                     p["conv1"].get("b"), st["conv1"], v)
            x = x + v
            st = {"conv0": s0, "conv1": s1}
        else:
            x = jax.nn.elu(x)
        new_states.append(st)
    return x, new_states
