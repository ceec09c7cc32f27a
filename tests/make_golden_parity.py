"""Generate tests/golden/parity_small.npz — frozen oracle outputs for
test_frozen_parity.py.

Run where the reference oracle checkout is available (it is NOT in CI):

    python -m tests.make_golden_parity

Freezes, for the small configs in tests/parity_configs.py:
  * the oracle's torch state dicts (exercises our weight converters in CI),
  * Mimi: encode_to_latent output + streaming frame-wise decode output,
  * FlowLM: temp=0 latent/EOS trajectory after text + conditioning prefill.
"""

from __future__ import annotations

import numpy as np

from tests import oracle

assert oracle.install_shims(), "oracle checkout required to regenerate fixtures"

import torch  # noqa: E402

from tests.parity_configs import FLOW_CFG, SMALL_MIMI  # noqa: E402
from tests.test_flow_lm_parity import _build_oracle, _oracle_generate  # noqa: E402
from tests.test_mimi_parity import _build_oracle_mimi  # noqa: E402


def main() -> None:
    out: dict[str, np.ndarray] = {}

    # ---- Mimi ------------------------------------------------------------
    m = _build_oracle_mimi(SMALL_MIMI)
    for k, v in oracle.torch_state_dict_to_numpy(m).items():
        out[f"mimi_sd.{k}"] = v

    torch.manual_seed(52)
    audio = torch.randn(1, 1, 1920 * 4 - 100)  # non-multiple: exercises padding
    out["mimi_audio"] = audio.numpy()
    with torch.no_grad():
        out["mimi_ref_latent"] = m.encode_to_latent(audio).detach().numpy()

    from pocket_tts.modules.stateful_module import increment_steps, init_states

    torch.manual_seed(53)
    n_frames = 20
    latents = torch.randn(1, SMALL_MIMI.quantizer.dimension, n_frames)
    out["mimi_dec_latents"] = latents.numpy()
    st = init_states(m, 1, 1000)
    refs = []
    with torch.no_grad():
        for i in range(n_frames):
            q = m.quantizer(latents[..., i : i + 1])
            refs.append(m.decode_from_latent(q, st).detach().numpy())
            increment_steps(m, st, 16)
    out["mimi_ref_audio"] = np.concatenate(refs, -1)

    # ---- FlowLM ----------------------------------------------------------
    m2, _ = _build_oracle()
    sd = {f"flow_lm.{k}": v
          for k, v in oracle.torch_state_dict_to_numpy(m2).items()}
    for k, v in sd.items():
        out[f"flow_sd.{k}"] = v

    torch.manual_seed(62)
    tokens = torch.tensor([[5, 17, 42, 7]])
    conditioning = torch.randn(1, 6, 64) * 0.1
    out["flow_tokens"] = tokens.numpy()
    out["flow_cond"] = conditioning.numpy()
    with torch.no_grad():
        ref_latents, ref_eos = _oracle_generate(m2, tokens, conditioning, 5)
    out["flow_ref_latents"] = ref_latents
    out["flow_ref_eos"] = ref_eos
    _ = FLOW_CFG  # shapes documented via parity_configs

    path = "tests/golden/parity_small.npz"
    np.savez_compressed(path, **out)
    import os

    print(f"wrote {path} ({os.path.getsize(path)/1024:.0f} KiB, "
          f"{len(out)} arrays)")


if __name__ == "__main__":
    main()
