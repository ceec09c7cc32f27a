"""Test env: force JAX onto CPU with 8 virtual devices (sharding tests run on a
virtual mesh; real-TPU execution is exercised by bench.py / the driver).

Note: on this machine the TPU plugin ("axon") ignores the JAX_PLATFORMS env var,
so we must set the platform through jax.config before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
