"""Pallas kernel parity (interpret mode on CPU) vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import FlowConfig
from pocket_tts_tpu.models import flow_mlp
from pocket_tts_tpu.ops.pallas.flow_kernel import flow_step_pallas


@pytest.mark.parametrize("batch", [1, 4])
def test_flow_kernel_matches_xla(batch):
    cfg = FlowConfig(dim=64, depth=3)
    params = flow_mlp.init_params(jax.random.PRNGKey(0), cfg, ldim=16, cond_dim=32)
    y = jax.random.normal(jax.random.PRNGKey(1), (batch, 64))
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, 16))

    ref = flow_mlp.flow_step(params, y, x)
    got = flow_step_pallas(params, y, x, interpret=True)
    assert got.shape == ref.shape
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-5
