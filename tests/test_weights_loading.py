"""Checkpoint loading end-to-end: a combined safetensors written from the
oracle's state_dict must load through the real file path (env var -> safetensors
-> key remap -> param pytree) and drive generation.  Also covers the split
flow-lm/mimi key remaps and config YAML loading."""

import numpy as np
import pytest

from tests import oracle

if not oracle.install_shims():
    pytest.skip("oracle unavailable", allow_module_level=True)

import torch  # noqa: E402

from pocket_tts_tpu import weights  # noqa: E402
from pocket_tts_tpu.models.mimi import MimiPlans  # noqa: E402


def test_variant_yaml_loads_expected_dims():
    """The shipped b6369a24 YAML must parse to the published architecture
    (reference: config.rs:126-168 test expectations)."""
    from pocket_tts_tpu.config import load_variant

    cfg = load_variant("b6369a24")
    t = cfg.flow_lm.transformer
    assert (t.d_model, t.num_heads, t.num_layers, t.dim_feedforward) == \
        (1024, 16, 6, 4096)
    assert cfg.flow_lm.flow.dim == 512 and cfg.flow_lm.flow.depth == 6
    assert cfg.flow_lm.lookup_table.n_bins == 4000
    assert cfg.mimi.sample_rate == 24000 and cfg.mimi.frame_rate == 12.5
    assert cfg.mimi.frame_size == 1920
    assert cfg.mimi.seanet.ratios == (6, 5, 4)
    assert cfg.mimi.resample_stride == 16
    assert cfg.mimi.transformer.context == 250
    assert cfg.mimi.quantizer.dimension == 32


def _combined_state_dict():
    """Build an oracle-derived combined checkpoint (full key surface of
    tts_<variant>.safetensors) at the small test dims."""
    from tests.test_flow_lm_parity import _build_oracle
    from tests.test_mimi_parity import SMALL_CFG, _build_oracle_mimi
    import dataclasses

    from tests.test_flow_lm_parity import CFG as FLOW_CFG

    mimi_cfg = dataclasses.replace(
        SMALL_CFG, quantizer=dataclasses.replace(SMALL_CFG.quantizer, dimension=16))
    cfg = dataclasses.replace(FLOW_CFG, mimi=mimi_cfg)
    flow_oracle, _ = _build_oracle()
    mimi_oracle = _build_oracle_mimi(cfg.mimi)
    sd = {}
    for k, v in flow_oracle.state_dict().items():
        sd[f"flow_lm.{k}"] = v.detach().numpy()
    for k, v in mimi_oracle.state_dict().items():
        sd[f"mimi.{k}"] = v.detach().numpy()
    return cfg, sd


def test_combined_checkpoint_file_roundtrip(tmp_path, monkeypatch):
    """POCKET_TTS_WEIGHTS -> load_safetensors -> convert -> generate."""
    from safetensors.numpy import save_file

    from pocket_tts_tpu.runtime.engine import GenParams
    from pocket_tts_tpu.tts import TTSModel

    cfg, sd = _combined_state_dict()
    path = tmp_path / "tts_test.safetensors"
    save_file(sd, str(path))

    monkeypatch.setenv("POCKET_TTS_WEIGHTS", str(path))
    plans = MimiPlans(cfg.mimi)
    params, real = weights.load_params(cfg, plans)
    assert real, "checkpoint file must be recognized as real weights"
    assert params["flow_lm"]["tf"]["in_proj"].shape[0] == 2  # stacked layers

    model = TTSModel(cfg, params, gen=GenParams(temp=0.0), has_real_weights=real)
    wav = model.generate("Loading from a checkpoint file.")
    assert wav.size > 0 and np.isfinite(wav).all()


def test_export_state_dict_inverts_convert():
    """export_state_dict is the exact inverse of convert_tts_state_dict:
    every exported tensor must be byte-identical to the oracle state_dict it
    was loaded from (the subset convert reads), and re-converting the export
    must reproduce the params pytree exactly."""
    import jax

    cfg, sd = _combined_state_dict()
    plans = MimiPlans(cfg.mimi)
    params = weights.convert_tts_state_dict(sd, cfg, plans)
    exported = weights.export_state_dict(params, plans)
    for k, v in exported.items():
        assert k in sd, f"exported key {k} not in the oracle state_dict"
        np.testing.assert_array_equal(v, np.asarray(sd[k], np.float32),
                                      err_msg=k)
    re_params = weights.convert_tts_state_dict(exported, cfg, plans)
    jax.tree.map(np.testing.assert_array_equal, params, re_params)


def test_save_checkpoint_loads_as_real(tmp_path, monkeypatch):
    """A save_checkpoint artifact must round-trip through the REAL loading
    path (POCKET_TTS_WEIGHTS -> load_params) and be flagged as real weights —
    the mechanism the synthetic-checkpoint gate test relies on."""
    import jax

    cfg, sd = _combined_state_dict()
    plans = MimiPlans(cfg.mimi)
    params = weights.convert_tts_state_dict(sd, cfg, plans)
    path = tmp_path / "tts_exported.safetensors"
    weights.save_checkpoint(params, plans, path)
    monkeypatch.setenv("POCKET_TTS_WEIGHTS", str(path))
    loaded, real = weights.load_params(cfg, plans)
    assert real
    jax.tree.map(np.testing.assert_array_equal, params, loaded)


def test_bf16_checkpoint_upcasts(tmp_path, monkeypatch):
    """The released checkpoint stores bf16; loading must upcast to f32
    (reference: tts_model.rs:190)."""
    from safetensors.numpy import save_file
    import jax.numpy as jnp

    cfg, sd = _combined_state_dict()
    import ml_dtypes

    sd16 = {k: v.astype(ml_dtypes.bfloat16) for k, v in sd.items()}
    path = tmp_path / "tts_bf16.safetensors"
    save_file(sd16, str(path))
    loaded = weights.load_safetensors(path)
    assert all(v.dtype == np.float32 for v in loaded.values())


def test_split_checkpoint_remaps():
    """Split-file key remaps (python-reference weights_loading.py:6-35)."""
    sd_flow = {
        "transformer.layers.0.self_attn.in_proj.weight": np.zeros((6, 2)),
        "flow.w_s_t.something": np.zeros(2),  # skipped
        "condition_provider.conditioners.transcript_in_segment.learnt_padding":
            np.zeros(2),  # skipped
        "condition_provider.conditioners.transcript_in_segment.embed.weight":
            np.zeros((5, 2)),
        "condition_provider.conditioners.speaker_wavs.output_proj.weight":
            np.zeros((4, 2)),
    }
    out = weights.remap_split_flow_lm(sd_flow)
    assert "flow_lm.transformer.layers.0.self_attn.in_proj.weight" in out
    assert "flow_lm.conditioner.embed.weight" in out
    assert "flow_lm.speaker_proj_weight" in out
    assert not any("w_s_t" in k or "learnt_padding" in k for k in out)

    sd_mimi = {
        "model.encoder.model.0.conv.weight": np.zeros((2, 1, 3)),
        "model.quantizer.vq.codebook": np.zeros(2),  # skipped
        "model.quantizer.logvar_proj.weight": np.zeros(2),  # skipped
        "model.quantizer.output_proj.weight": np.zeros((2, 1, 1)),
    }
    out = weights.remap_split_mimi(sd_mimi)
    assert "mimi.encoder.model.0.conv.weight" in out
    assert "mimi.quantizer.output_proj.weight" in out
    assert not any("vq" in k or "logvar" in k for k in out)


def test_load_safetensors_bytes_matches_file(tmp_path):
    """In-memory loader (tts.load_from_bytes path) must equal the file loader,
    including the bf16 -> f32 upcast of the released checkpoint."""
    from safetensors.numpy import save_file
    import ml_dtypes

    _, sd = _combined_state_dict()
    sd16 = {k: v.astype(ml_dtypes.bfloat16) for k, v in sd.items()}
    path = tmp_path / "tts_bf16.safetensors"
    save_file(sd16, str(path))
    via_file = weights.load_safetensors(path)
    via_bytes = weights.load_safetensors_bytes(path.read_bytes())
    assert set(via_file) == set(via_bytes)
    for k in via_file:
        assert via_bytes[k].dtype == np.float32
        np.testing.assert_array_equal(via_file[k], via_bytes[k])


def test_load_from_bytes_never_touches_filesystem(tmp_path, monkeypatch):
    """TTSModel.load_from_bytes is a true in-memory loader: constructing from
    bytes must not create a temp file (VERDICT r2 #6)."""
    import tempfile

    from safetensors.numpy import save as st_save

    from pocket_tts_tpu.tts import TTSModel

    cfg, sd = _combined_state_dict()
    data = st_save(sd)

    def boom(*a, **k):
        raise AssertionError("load_from_bytes wrote a temp file")

    monkeypatch.setattr(tempfile, "NamedTemporaryFile", boom)
    monkeypatch.setattr(tempfile, "mkstemp", boom)
    params = weights.convert_tts_state_dict(
        weights.load_safetensors_bytes(data), cfg, MimiPlans(cfg.mimi))
    # full-path check on the model loader with the small config injected
    import pocket_tts_tpu.tts as tts_mod

    monkeypatch.setattr(tts_mod, "load_variant", lambda v: cfg)
    model = TTSModel.load_from_bytes(data, temp=0.0)
    assert model.has_real_weights
    got = model.params["flow_lm"]["input_w"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(params["flow_lm"]["input_w"]))


def test_runtime_config_validates_segment_dispatch():
    import dataclasses

    import pytest as _pytest

    from pocket_tts_tpu.config import RuntimeConfig

    with _pytest.raises(ValueError, match="segment_dispatch"):
        RuntimeConfig(segment_dispatch="fused")
    with _pytest.raises(ValueError, match="compute_dtype"):
        RuntimeConfig(compute_dtype="fp32")
    # valid values construct fine, including via dataclasses.replace
    rc = RuntimeConfig(segment_dispatch="chunked")
    assert dataclasses.replace(rc, segment_dispatch="auto").segment_dispatch == "auto"


def test_explicit_weights_failure_is_loud(tmp_path, monkeypatch):
    """POCKET_TTS_WEIGHTS the user explicitly configured must fail LOUDLY:
    a missing file raises FileNotFoundError and a corrupt/incompatible one
    RuntimeError — silently serving random-init garbage with the real error
    at DEBUG was the worst failure mode (review finding r4)."""
    import pytest

    cfg, _ = _combined_state_dict()
    plans = MimiPlans(cfg.mimi)

    monkeypatch.setenv("POCKET_TTS_WEIGHTS", str(tmp_path / "nope.safetensors"))
    with pytest.raises(FileNotFoundError, match="POCKET_TTS_WEIGHTS"):
        weights.load_params(cfg, plans)

    bad = tmp_path / "corrupt.safetensors"
    bad.write_bytes(b"\x00" * 64)
    monkeypatch.setenv("POCKET_TTS_WEIGHTS", str(bad))
    with pytest.raises(RuntimeError, match="POCKET_TTS_WEIGHTS"):
        weights.load_params(cfg, plans)


def test_split_pair_loads_end_to_end(tmp_path, monkeypatch):
    """A split flow-lm + mimi checkpoint PAIR (os.pathsep-joined in
    POCKET_TTS_WEIGHTS) must load through the auto-detected remaps and match
    the combined checkpoint exactly — the advertised oracle
    weights_loading.py flow, previously dead code (review finding r4)."""
    import os

    import jax
    from safetensors.numpy import save_file

    cfg, sd = _combined_state_dict()
    plans = MimiPlans(cfg.mimi)

    # invert the remaps: split flow-lm files carry bare oracle keys (with the
    # conditioner names un-collapsed), split mimi files a "model." prefix
    inv_flow = {
        "conditioner.embed.weight":
            "condition_provider.conditioners.transcript_in_segment.embed.weight",
        "speaker_proj_weight":
            "condition_provider.conditioners.speaker_wavs.output_proj.weight",
    }
    flow_sd, mimi_sd = {}, {}
    for k, v in sd.items():
        if k.startswith("flow_lm."):
            bare = k.removeprefix("flow_lm.")
            flow_sd[inv_flow.get(bare, bare)] = v
        else:
            mimi_sd["model." + k.removeprefix("mimi.")] = v
    fp = tmp_path / "flow.safetensors"
    mp = tmp_path / "mimi.safetensors"
    save_file(flow_sd, str(fp))
    save_file(mimi_sd, str(mp))

    monkeypatch.setenv("POCKET_TTS_WEIGHTS", f"{fp}{os.pathsep}{mp}")
    params_split, real = weights.load_params(cfg, plans)
    assert real

    combined = tmp_path / "combined.safetensors"
    save_file(sd, str(combined))
    monkeypatch.setenv("POCKET_TTS_WEIGHTS", str(combined))
    params_comb, _ = weights.load_params(cfg, plans)

    flat_s = jax.tree_util.tree_leaves(params_split)
    flat_c = jax.tree_util.tree_leaves(params_comb)
    assert len(flat_s) == len(flat_c)
    for a, b in zip(flat_s, flat_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
