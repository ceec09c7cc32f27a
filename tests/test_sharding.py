"""Multi-device sharding on the 8-virtual-device CPU mesh (conftest forces
XLA_FLAGS host device count 8): the dp x tp generation step must compile,
execute, and produce per-slot-correct audio."""

import numpy as np
import pytest

import jax

if len(jax.devices()) < 8:
    pytest.skip("needs 8 virtual devices", allow_module_level=True)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_mesh_shapes():
    from pocket_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] in (2, 4, 8)


def test_param_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from pocket_tts_tpu.parallel.mesh import param_sharding_rules

    assert param_sharding_rules(("flow_lm", "tf", "ff1"), None) == P(None, "tp", None)
    assert param_sharding_rules(("flow_lm", "tf", "ff2"), None) == P(None, None, "tp")
    assert param_sharding_rules(("flow_lm", "tf", "norm1_w"), None) == P()
