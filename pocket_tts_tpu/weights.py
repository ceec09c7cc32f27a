"""Checkpoint loading: safetensors -> parameter pytree.

Handles the released combined checkpoint (``tts_<variant>.safetensors`` whose keys
are the oracle ``TTSModel.state_dict()`` names) and the split flow-lm/mimi files
with their key remaps (reference: python-reference/pocket_tts/utils/weights_loading.py:6-35).
``hf://owner/repo/file@rev`` URIs resolve through the local HF cache; with no
network and no cache we fall back to deterministic random init so shape/perf work
proceeds without the gated weights (reference: crates/pocket-tts/src/weights.rs:19-77).
"""

from __future__ import annotations

import logging
import os
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.config import Config
from pocket_tts_tpu.models import flow_lm as flow_lm_mod
from pocket_tts_tpu.models import mimi as mimi_mod
from pocket_tts_tpu.models.mimi import MimiPlans

logger = logging.getLogger(__name__)

_HF_RE = re.compile(r"^hf://(?P<repo>[^/]+/[^/]+)/(?P<file>.+?)(@(?P<rev>[^@]+))?$")


def resolve_uri(uri: str | Path, *, local_only: bool | None = None) -> Path:
    """Resolve ``hf://owner/repo/file@rev`` or a local path to a file on disk.

    ``local_only=True`` restricts to the HF cache (no network); default checks
    cache first and only goes online if POCKET_TTS_ONLINE=1 (this machine has no
    egress — 5 retries against huggingface.co cost ~40 s per file otherwise).
    """
    if isinstance(uri, Path) or not str(uri).startswith("hf://"):
        return Path(uri)
    m = _HF_RE.match(str(uri))
    if not m:
        raise ValueError(f"Bad hf:// URI: {uri}")
    from huggingface_hub import hf_hub_download

    kwargs = dict(revision=m["rev"], token=os.environ.get("HF_TOKEN"))
    if local_only is None:
        local_only = os.environ.get("POCKET_TTS_ONLINE", "0") != "1"
    try:
        return Path(hf_hub_download(m["repo"], m["file"], local_files_only=True, **kwargs))
    except Exception:
        if local_only:
            raise
    return Path(hf_hub_download(m["repo"], m["file"], **kwargs))


def load_safetensors(path: str | Path) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(str(path), framework="numpy") as f:
        for key in f.keys():
            t = f.get_tensor(key)
            if t.dtype != np.float32:  # released checkpoint is bf16
                t = t.astype(np.float32)
            out[key] = t
    return out


_ST_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def load_safetensors_bytes(data: bytes) -> dict[str, np.ndarray]:
    """In-memory variant of load_safetensors (same bf16 -> f32 cast).

    Parses the safetensors layout directly (8-byte LE header length + JSON
    header + packed data) because ``safetensors.numpy.load`` rejects BF16 —
    the dtype the released checkpoint actually uses."""
    import json
    import struct

    (header_len,) = struct.unpack_from("<Q", data, 0)
    header = json.loads(data[8:8 + header_len])
    base = 8 + header_len
    out = {}
    for key, meta in header.items():
        if key == "__metadata__":
            continue
        start, end = meta["data_offsets"]
        raw = data[base + start:base + end]
        shape = meta["shape"]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, np.uint16).astype(np.uint32) << 16
            t = u16.view(np.float32).reshape(shape)
        else:
            t = np.frombuffer(raw, _ST_DTYPES[meta["dtype"]]).reshape(shape)
            if t.dtype != np.float32:
                t = t.astype(np.float32)
        out[key] = t
    return out


def _stack(sd: dict, prefix: str, n_layers: int, suffix: str) -> jnp.ndarray:
    return jnp.stack(
        [jnp.asarray(sd[f"{prefix}.layers.{i}.{suffix}"]) for i in range(n_layers)]
    )


def convert_transformer(sd: dict, prefix: str, n_layers: int, layer_scale: bool) -> dict:
    # in_proj [L, 3E, E] -> [L, 3, E, E] (pure view: torch rows are qkv-major).
    # The explicit qkv axis makes dim 2 head-major (E = H*D, heads leading), so
    # tensor-parallel sharding over heads is a plain dim-2 partition
    # (parallel/mesh.py) instead of a strided re-layout.
    in_proj = _stack(sd, prefix, n_layers, "self_attn.in_proj.weight")
    L, three_e, e = in_proj.shape
    p = {
        "in_proj": in_proj.reshape(L, 3, three_e // 3, e),
        "out_proj": _stack(sd, prefix, n_layers, "self_attn.out_proj.weight"),
        "norm1_w": _stack(sd, prefix, n_layers, "norm1.weight"),
        "norm1_b": _stack(sd, prefix, n_layers, "norm1.bias"),
        "norm2_w": _stack(sd, prefix, n_layers, "norm2.weight"),
        "norm2_b": _stack(sd, prefix, n_layers, "norm2.bias"),
        "ff1": _stack(sd, prefix, n_layers, "linear1.weight"),
        "ff2": _stack(sd, prefix, n_layers, "linear2.weight"),
    }
    if layer_scale:
        p["ls1"] = _stack(sd, prefix, n_layers, "layer_scale_1.scale")
        p["ls2"] = _stack(sd, prefix, n_layers, "layer_scale_2.scale")
    return p


def _te(sd: dict, prefix: str) -> dict:
    return {
        "w1": jnp.asarray(sd[f"{prefix}.mlp.0.weight"]),
        "b1": jnp.asarray(sd[f"{prefix}.mlp.0.bias"]),
        "w2": jnp.asarray(sd[f"{prefix}.mlp.2.weight"]),
        "b2": jnp.asarray(sd[f"{prefix}.mlp.2.bias"]),
        "alpha": jnp.asarray(sd[f"{prefix}.mlp.3.alpha"]),
    }


def convert_flow_mlp(sd: dict, prefix: str, depth: int) -> dict:
    def bstack(suffix):
        return jnp.stack(
            [jnp.asarray(sd[f"{prefix}.res_blocks.{i}.{suffix}"]) for i in range(depth)]
        )

    return {
        "time_embed_0": _te(sd, f"{prefix}.time_embed.0"),
        "time_embed_1": _te(sd, f"{prefix}.time_embed.1"),
        "cond_w": jnp.asarray(sd[f"{prefix}.cond_embed.weight"]),
        "cond_b": jnp.asarray(sd[f"{prefix}.cond_embed.bias"]),
        "in_w": jnp.asarray(sd[f"{prefix}.input_proj.weight"]),
        "in_b": jnp.asarray(sd[f"{prefix}.input_proj.bias"]),
        "blocks": {
            "ln_w": bstack("in_ln.weight"),
            "ln_b": bstack("in_ln.bias"),
            "mlp1_w": bstack("mlp.0.weight"),
            "mlp1_b": bstack("mlp.0.bias"),
            "mlp2_w": bstack("mlp.2.weight"),
            "mlp2_b": bstack("mlp.2.bias"),
            "ada_w": bstack("adaLN_modulation.1.weight"),
            "ada_b": bstack("adaLN_modulation.1.bias"),
        },
        "final_ada_w": jnp.asarray(sd[f"{prefix}.final_layer.adaLN_modulation.1.weight"]),
        "final_ada_b": jnp.asarray(sd[f"{prefix}.final_layer.adaLN_modulation.1.bias"]),
        "final_w": jnp.asarray(sd[f"{prefix}.final_layer.linear.weight"]),
        "final_b": jnp.asarray(sd[f"{prefix}.final_layer.linear.bias"]),
    }


def convert_flow_lm(sd: dict, cfg: Config, prefix: str = "flow_lm") -> dict:
    tcfg = cfg.flow_lm.transformer
    return {
        "tf": convert_transformer(sd, f"{prefix}.transformer", tcfg.num_layers,
                                  layer_scale=False),
        "flow": convert_flow_mlp(sd, f"{prefix}.flow_net", cfg.flow_lm.flow.depth),
        "input_w": jnp.asarray(sd[f"{prefix}.input_linear.weight"]),
        "out_norm_w": jnp.asarray(sd[f"{prefix}.out_norm.weight"]),
        "out_norm_b": jnp.asarray(sd[f"{prefix}.out_norm.bias"]),
        "out_eos_w": jnp.asarray(sd[f"{prefix}.out_eos.weight"]),
        "out_eos_b": jnp.asarray(sd[f"{prefix}.out_eos.bias"]),
        "bos_emb": jnp.asarray(sd[f"{prefix}.bos_emb"]),
        "emb_std": jnp.asarray(sd[f"{prefix}.emb_std"]),
        "emb_mean": jnp.asarray(sd[f"{prefix}.emb_mean"]),
        "text_embed": jnp.asarray(sd[f"{prefix}.conditioner.embed.weight"]),
        "speaker_proj": jnp.asarray(sd[f"{prefix}.speaker_proj_weight"]),
    }


def convert_seanet(sd: dict, prefix: str, plan) -> list:
    params = []
    for layer in plan:
        base = f"{prefix}.model.{layer.index}"
        if layer.kind == "conv":
            p = {"w": jnp.asarray(sd[f"{base}.conv.weight"])}
            if f"{base}.conv.bias" in sd:
                p["b"] = jnp.asarray(sd[f"{base}.conv.bias"])
        elif layer.kind == "convtr":
            p = {"w": jnp.asarray(sd[f"{base}.convtr.weight"])}
            if f"{base}.convtr.bias" in sd:
                p["b"] = jnp.asarray(sd[f"{base}.convtr.bias"])
        elif layer.kind == "res":
            p = {}
            for name, tidx in (("conv0", 1), ("conv1", 3)):
                sub = {"w": jnp.asarray(sd[f"{base}.block.{tidx}.conv.weight"])}
                if f"{base}.block.{tidx}.conv.bias" in sd:
                    sub["b"] = jnp.asarray(sd[f"{base}.block.{tidx}.conv.bias"])
                p[name] = sub
        else:
            p = {}
        params.append(p)
    return params


def convert_mimi(sd: dict, plans: MimiPlans, prefix: str = "mimi") -> dict:
    tcfg = plans.cfg.transformer
    return {
        "encoder": convert_seanet(sd, f"{prefix}.encoder", plans.encoder),
        "decoder": convert_seanet(sd, f"{prefix}.decoder", plans.decoder),
        "enc_tf": {"layers": convert_transformer(
            sd, f"{prefix}.encoder_transformer.transformer", tcfg.num_layers, True)},
        "dec_tf": {"layers": convert_transformer(
            sd, f"{prefix}.decoder_transformer.transformer", tcfg.num_layers, True)},
        "quantizer_w": jnp.asarray(sd[f"{prefix}.quantizer.output_proj.weight"]),
        "downsample_w": jnp.asarray(sd[f"{prefix}.downsample.conv.conv.weight"]),
        "upsample_w": jnp.asarray(sd[f"{prefix}.upsample.convtr.convtr.weight"]),
    }


def convert_tts_state_dict(sd: dict, cfg: Config, plans: MimiPlans) -> dict:
    return {"flow_lm": convert_flow_lm(sd, cfg), "mimi": convert_mimi(sd, plans)}


def remap_split_flow_lm(sd: dict) -> dict:
    """Key remap for the standalone flow-lm checkpoint
    (python-reference/pocket_tts/utils/weights_loading.py:6-24), producing
    ``flow_lm.``-prefixed combined keys."""
    out = {}
    for key, value in sd.items():
        if key.startswith("flow.w_s_t.") or key in (
            "condition_provider.conditioners.transcript_in_segment.learnt_padding",
            "condition_provider.conditioners.speaker_wavs.learnt_padding",
        ):
            continue
        new = key
        if key == "condition_provider.conditioners.transcript_in_segment.embed.weight":
            new = "conditioner.embed.weight"
        if key == "condition_provider.conditioners.speaker_wavs.output_proj.weight":
            new = "speaker_proj_weight"
        out[f"flow_lm.{new}"] = value
    return out


def remap_split_mimi(sd: dict) -> dict:
    """python-reference/pocket_tts/utils/weights_loading.py:27-35."""
    out = {}
    for key, value in sd.items():
        if key.startswith("model.quantizer.vq.") or key == "model.quantizer.logvar_proj.weight":
            continue
        out["mimi." + key.removeprefix("model.")] = value
    return out


def export_transformer(p: dict, prefix: str, layer_scale: bool) -> dict:
    """Inverse of convert_transformer: stacked [L, ...] leaves -> per-layer
    torch state_dict keys (in_proj's qkv axis folds back to [3E, E] rows)."""
    out = {}
    n_layers, _, _, e = p["in_proj"].shape
    suffixes = {"out_proj": "self_attn.out_proj.weight",
                "norm1_w": "norm1.weight", "norm1_b": "norm1.bias",
                "norm2_w": "norm2.weight", "norm2_b": "norm2.bias",
                "ff1": "linear1.weight", "ff2": "linear2.weight"}
    if layer_scale:
        suffixes |= {"ls1": "layer_scale_1.scale", "ls2": "layer_scale_2.scale"}
    for i in range(n_layers):
        out[f"{prefix}.layers.{i}.self_attn.in_proj.weight"] = \
            np.asarray(p["in_proj"][i]).reshape(-1, e)
        for name, suffix in suffixes.items():
            out[f"{prefix}.layers.{i}.{suffix}"] = np.asarray(p[name][i])
    return out


def _export_te(p: dict, prefix: str) -> dict:
    return {f"{prefix}.mlp.0.weight": np.asarray(p["w1"]),
            f"{prefix}.mlp.0.bias": np.asarray(p["b1"]),
            f"{prefix}.mlp.2.weight": np.asarray(p["w2"]),
            f"{prefix}.mlp.2.bias": np.asarray(p["b2"]),
            f"{prefix}.mlp.3.alpha": np.asarray(p["alpha"])}


def export_flow_mlp(p: dict, prefix: str) -> dict:
    out = {**_export_te(p["time_embed_0"], f"{prefix}.time_embed.0"),
           **_export_te(p["time_embed_1"], f"{prefix}.time_embed.1"),
           f"{prefix}.cond_embed.weight": np.asarray(p["cond_w"]),
           f"{prefix}.cond_embed.bias": np.asarray(p["cond_b"]),
           f"{prefix}.input_proj.weight": np.asarray(p["in_w"]),
           f"{prefix}.input_proj.bias": np.asarray(p["in_b"]),
           f"{prefix}.final_layer.adaLN_modulation.1.weight":
               np.asarray(p["final_ada_w"]),
           f"{prefix}.final_layer.adaLN_modulation.1.bias":
               np.asarray(p["final_ada_b"]),
           f"{prefix}.final_layer.linear.weight": np.asarray(p["final_w"]),
           f"{prefix}.final_layer.linear.bias": np.asarray(p["final_b"])}
    blocks = p["blocks"]
    suffixes = {"ln_w": "in_ln.weight", "ln_b": "in_ln.bias",
                "mlp1_w": "mlp.0.weight", "mlp1_b": "mlp.0.bias",
                "mlp2_w": "mlp.2.weight", "mlp2_b": "mlp.2.bias",
                "ada_w": "adaLN_modulation.1.weight",
                "ada_b": "adaLN_modulation.1.bias"}
    for i in range(blocks["ln_w"].shape[0]):
        for name, suffix in suffixes.items():
            out[f"{prefix}.res_blocks.{i}.{suffix}"] = np.asarray(blocks[name][i])
    return out


def export_seanet(params: list, prefix: str, plan) -> dict:
    out = {}
    for p, layer in zip(params, plan):
        base = f"{prefix}.model.{layer.index}"
        if layer.kind == "conv":
            out[f"{base}.conv.weight"] = np.asarray(p["w"])
            if "b" in p:
                out[f"{base}.conv.bias"] = np.asarray(p["b"])
        elif layer.kind == "convtr":
            out[f"{base}.convtr.weight"] = np.asarray(p["w"])
            if "b" in p:
                out[f"{base}.convtr.bias"] = np.asarray(p["b"])
        elif layer.kind == "res":
            for name, tidx in (("conv0", 1), ("conv1", 3)):
                out[f"{base}.block.{tidx}.conv.weight"] = np.asarray(p[name]["w"])
                if "b" in p[name]:
                    out[f"{base}.block.{tidx}.conv.bias"] = \
                        np.asarray(p[name]["b"])
    return out


def export_state_dict(params: dict, plans: MimiPlans) -> dict[str, np.ndarray]:
    """params pytree -> the released combined-checkpoint key layout (the exact
    inverse of convert_tts_state_dict, round-trip tested).  Lets fine-tuned /
    modified weights ship as a checkpoint the REFERENCE implementation (and
    load_params here) can read — interop both ways, not just import."""
    fl, prefix = params["flow_lm"], "flow_lm"
    out = export_transformer(fl["tf"], f"{prefix}.transformer", False)
    out |= export_flow_mlp(fl["flow"], f"{prefix}.flow_net")
    out |= {f"{prefix}.input_linear.weight": np.asarray(fl["input_w"]),
            f"{prefix}.out_norm.weight": np.asarray(fl["out_norm_w"]),
            f"{prefix}.out_norm.bias": np.asarray(fl["out_norm_b"]),
            f"{prefix}.out_eos.weight": np.asarray(fl["out_eos_w"]),
            f"{prefix}.out_eos.bias": np.asarray(fl["out_eos_b"]),
            f"{prefix}.bos_emb": np.asarray(fl["bos_emb"]),
            f"{prefix}.emb_std": np.asarray(fl["emb_std"]),
            f"{prefix}.emb_mean": np.asarray(fl["emb_mean"]),
            f"{prefix}.conditioner.embed.weight": np.asarray(fl["text_embed"]),
            f"{prefix}.speaker_proj_weight": np.asarray(fl["speaker_proj"])}
    mm, mprefix = params["mimi"], "mimi"
    out |= export_seanet(mm["encoder"], f"{mprefix}.encoder", plans.encoder)
    out |= export_seanet(mm["decoder"], f"{mprefix}.decoder", plans.decoder)
    out |= export_transformer(mm["enc_tf"]["layers"],
                              f"{mprefix}.encoder_transformer.transformer", True)
    out |= export_transformer(mm["dec_tf"]["layers"],
                              f"{mprefix}.decoder_transformer.transformer", True)
    out |= {f"{mprefix}.quantizer.output_proj.weight":
                np.asarray(mm["quantizer_w"]),
            f"{mprefix}.downsample.conv.conv.weight":
                np.asarray(mm["downsample_w"]),
            f"{mprefix}.upsample.convtr.convtr.weight":
                np.asarray(mm["upsample_w"])}
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def save_checkpoint(params: dict, plans: MimiPlans, path: str | Path) -> None:
    """Write ``params`` as a reference-format combined safetensors checkpoint
    (readable by load_params and by the reference implementation)."""
    from safetensors.numpy import save_file

    save_file(export_state_dict(params, plans), str(path))


def random_params(cfg: Config, plans: MimiPlans, seed: int = 0) -> dict:
    # One jitted program: eager per-leaf random ops are pathologically slow on
    # remote-compile backends (seconds per op through the axon tunnel).
    def init(key):
        k1, k2 = jax.random.split(key)
        return {
            "flow_lm": flow_lm_mod.init_params(k1, cfg),
            "mimi": mimi_mod.init_params(k2, plans),
        }

    return jax.jit(init)(jax.random.PRNGKey(seed))


def load_state_dict_any(path_spec: str | Path) -> dict:
    """Load a combined checkpoint, or an os.pathsep-separated LIST of split
    flow-lm/mimi files (their key layouts are auto-detected and remapped to
    the combined names, then merged — the oracle's weights_loading.py flow).
    """
    spec = str(path_spec)
    parts = spec.split(os.pathsep) if os.pathsep in spec else [path_spec]
    merged: dict = {}
    for part in parts:
        path = resolve_uri(part)
        if not path.exists():
            raise FileNotFoundError(f"checkpoint {part} does not exist")
        sd = load_safetensors(path)
        if any(k.startswith("model.") for k in sd):
            sd = remap_split_mimi(sd)
        elif not any(k.startswith(("flow_lm.", "mimi.")) for k in sd):
            sd = remap_split_flow_lm(sd)
        merged.update(sd)
    return merged


def load_params(cfg: Config, plans: MimiPlans, *, allow_random: bool = True,
                variant: str = "b6369a24") -> tuple[dict, bool]:
    """Load the combined checkpoint if reachable, else deterministic random init.

    Returns (params, is_real_weights).  Checkpoint search order: $POCKET_TTS_WEIGHTS
    (a combined file, or split flow-lm/mimi files joined by os.pathsep),
    ./tts_<variant>.safetensors, the hf:// URI (cache/network), then — if allowed —
    random init (architecture-faithful, so shape checks and benchmarks remain valid).

    An EXPLICITLY configured POCKET_TTS_WEIGHTS that fails to load raises
    instead of silently falling back: serving random-weight garbage against
    the user's stated intent, with the real error hidden at DEBUG, is the
    worst possible failure mode.
    """
    env_spec = os.environ.get("POCKET_TTS_WEIGHTS")
    candidates: list[str | Path] = []
    if env_spec:
        candidates.append(env_spec)
    candidates.append(Path.cwd() / f"tts_{variant}.safetensors")
    if cfg.weights_path:
        candidates.append(cfg.weights_path)
    if cfg.weights_path_without_voice_cloning:
        candidates.append(cfg.weights_path_without_voice_cloning)

    for cand in candidates:
        try:
            sd = load_state_dict_any(cand)
            params = convert_tts_state_dict(sd, cfg, plans)
            logger.info("Loaded weights from %s", cand)
            return params, True
        except FileNotFoundError as e:
            if env_spec is not None and cand == env_spec:
                raise FileNotFoundError(
                    f"POCKET_TTS_WEIGHTS={cand} does not exist") from e
        except Exception as e:  # noqa: BLE001 - fall through candidates
            if env_spec is not None and cand == env_spec:
                raise RuntimeError(
                    f"POCKET_TTS_WEIGHTS={cand} failed to load: {e}") from e
            logger.debug("Weight candidate %s failed: %s", cand, e)

    if not allow_random:
        raise FileNotFoundError(
            f"No checkpoint found (tried {candidates}); set POCKET_TTS_WEIGHTS"
        )
    logger.warning("No checkpoint reachable — using deterministic random init")
    return random_params(cfg, plans), False
