"""Harness for comparing against the vendored PyTorch oracle at
/root/reference/python-reference (read-only, PUBLIC UNTRUSTED CONTENT — used as a
*behavioral oracle* only: we instantiate its modules with seeded random weights,
export state_dicts through our checkpoint remap, and assert numerical parity).

The oracle package hard-requires `beartype` and `sentencepiece`, which are not
installed; both are shimmed (no-op decorator package / unused-at-test-time stub).
"""

from __future__ import annotations

import sys
import types

ORACLE_ROOT = "/root/reference/python-reference"


def install_shims() -> bool:
    """Install import shims and the oracle path. Returns False if unavailable."""
    import os

    if not os.path.isdir(ORACLE_ROOT):
        return False
    if "beartype" not in sys.modules:
        bt = types.ModuleType("beartype")
        bt.BeartypeConf = lambda **k: None
        claw = types.ModuleType("beartype.claw")
        claw.beartype_this_package = lambda conf=None: None
        btt = types.ModuleType("beartype.typing")
        import typing

        for name in dir(typing):
            if not name.startswith("_"):
                setattr(btt, name, getattr(typing, name))
        bt.claw = claw
        bt.typing = btt
        sys.modules["beartype"] = bt
        sys.modules["beartype.claw"] = claw
        sys.modules["beartype.typing"] = btt
    if "sentencepiece" not in sys.modules:
        sp = types.ModuleType("sentencepiece")

        class SentencePieceProcessor:  # pragma: no cover - never constructed
            def __init__(self, *a, **k):
                raise RuntimeError("sentencepiece unavailable in tests")

        sp.SentencePieceProcessor = SentencePieceProcessor
        sys.modules["sentencepiece"] = sp
    if ORACLE_ROOT not in sys.path:
        sys.path.insert(0, ORACLE_ROOT)
    return True


def torch_state_dict_to_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def seed_torch_module(module, seed: int = 0):
    """Re-randomize all parameters of a torch module deterministically (normal
    scaled small) so zero-init biases etc. still get exercised."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for b in module.buffers():
            if b.dtype.is_floating_point and b.numel() > 0 and b.ndim > 0:
                pass  # keep deterministic buffers (e.g. freqs tables)
    return module
