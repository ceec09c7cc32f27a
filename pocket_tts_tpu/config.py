"""Model / runtime configuration.

Mirrors the reference YAML schema (reference: crates/pocket-tts/src/config.rs:7-115,
python-reference/pocket_tts/utils/config.py) as plain dataclasses so a reference
variant YAML (e.g. ``b6369a24``) loads unchanged.  On top of the model schema we add
a TPU runtime section (static shape budgets, compute dtype, decode chunk schedule)
that has no reference equivalent — the reference is dynamically shaped on CPU, the
TPU build compiles fixed-shape programs.
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Any

import yaml

# Generation defaults (reference: crates/pocket-tts/src/config.rs:118-124,
# python-reference/pocket_tts/default_parameters.py).
DEFAULT_VARIANT = "b6369a24"
DEFAULT_TEMPERATURE = 0.7
DEFAULT_LSD_DECODE_STEPS = 1
DEFAULT_NOISE_CLAMP: float | None = None
DEFAULT_EOS_THRESHOLD = -4.0
DEFAULT_AUDIO_PROMPT = "alba"

_CONFIG_DIR = Path(__file__).parent / "assets"


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    dim: int = 512
    depth: int = 6


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    d_model: int = 1024
    num_heads: int = 16
    num_layers: int = 6
    hidden_scale: int = 4
    max_period: float = 10000.0

    @property
    def dim_feedforward(self) -> int:
        return int(self.d_model * self.hidden_scale)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


@dataclasses.dataclass(frozen=True)
class LookupTableConfig:
    dim: int = 1024
    n_bins: int = 4000
    tokenizer: str = "sentencepiece"
    tokenizer_path: str = ""


@dataclasses.dataclass(frozen=True)
class FlowLMConfig:
    dtype: str = "float32"
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)
    transformer: TransformerConfig = dataclasses.field(default_factory=TransformerConfig)
    lookup_table: LookupTableConfig = dataclasses.field(default_factory=LookupTableConfig)
    weights_path: str | None = None


@dataclasses.dataclass(frozen=True)
class SEANetConfig:
    dimension: int = 512
    channels: int = 1
    n_filters: int = 64
    n_residual_layers: int = 1
    ratios: tuple[int, ...] = (6, 5, 4)
    kernel_size: int = 7
    residual_kernel_size: int = 3
    last_kernel_size: int = 3
    dilation_base: int = 2
    pad_mode: str = "constant"
    compress: int = 2

    @property
    def hop_length(self) -> int:
        return int(math.prod(self.ratios))


@dataclasses.dataclass(frozen=True)
class MimiTransformerConfig:
    d_model: int = 512
    input_dimension: int = 512
    output_dimensions: tuple[int, ...] = (512,)
    num_heads: int = 8
    num_layers: int = 2
    layer_scale: float = 0.01
    context: int = 250
    max_period: float = 10000.0
    dim_feedforward: int = 2048

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


@dataclasses.dataclass(frozen=True)
class QuantizerConfig:
    dimension: int = 32
    output_dimension: int = 512


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    dtype: str = "float32"
    sample_rate: int = 24000
    channels: int = 1
    frame_rate: float = 12.5
    seanet: SEANetConfig = dataclasses.field(default_factory=SEANetConfig)
    transformer: MimiTransformerConfig = dataclasses.field(
        default_factory=MimiTransformerConfig
    )
    quantizer: QuantizerConfig = dataclasses.field(default_factory=QuantizerConfig)
    weights_path: str | None = None

    @property
    def frame_size(self) -> int:
        # samples of audio per 12.5 Hz latent frame (1920 @ 24 kHz).
        return int(self.sample_rate / self.frame_rate)

    @property
    def encoder_frame_rate(self) -> float:
        return self.sample_rate / self.seanet.hop_length

    @property
    def resample_stride(self) -> int:
        # 200 Hz encoder rate -> 12.5 Hz latent rate.
        stride = self.encoder_frame_rate / self.frame_rate
        assert stride == int(stride)
        return int(stride)


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """TPU runtime knobs — no reference equivalent (the reference runs dynamic
    shapes on CPU; XLA wants one compiled program per shape)."""

    # Compute dtype for matmuls/convs: "auto" (bfloat16 on accelerators,
    # float32 on CPU), "bfloat16", or "float32".  Norms, softmax and the flow
    # integrator always accumulate in float32.
    compute_dtype: str = "auto"
    # FlowLM KV-cache capacity: voice-prompt frames + text tokens + latent frames.
    max_seq: int = 1024
    # Static bucket sizes for text prefill (token counts).
    text_buckets: tuple[int, ...] = (8, 16, 32, 64)
    # Static bucket sizes for voice-prompt conditioning prefill (12.5 Hz frames).
    prompt_buckets: tuple[int, ...] = (64, 128, 256, 512)
    # Decode chunk schedule: frames generated per device dispatch.  Warm-up with
    # small chunks for low first-audio latency, then amortize dispatch: on the
    # tunneled backend every result fetch costs a ~30 ms round trip and every
    # dispatch ~10 ms fixed device work, so the steady-state chunk is large
    # (256 frames = 20 s audio per fetch; the AR scan itself runs at ~0.28
    # ms/frame, within ~20% of the weight-streaming bound).
    decode_chunks: tuple[int, ...] = (2, 16, 64, 256)
    # How many decode chunks are dispatched ahead of the host reading results —
    # hides the device->host sync round-trip (~25 ms on tunneled backends).
    pipeline_depth: int = 3
    # Query block for banded (windowed) batch attention in the Mimi encoder.
    encoder_block: int = 256
    # Audio-sample bucket sizes for the Mimi encoder (voice cloning), seconds.
    encode_seconds_buckets: tuple[float, ...] = (2.5, 5.0, 10.0, 20.0, 30.0)
    # Fused Pallas kernels ("auto" = on TPU backends only).
    use_pallas: str = "auto"
    # Static attention-window buckets for decode: the scan attends over the
    # smallest bucket covering max(pos)+K instead of the whole max_seq cache.
    window_buckets: tuple[int, ...] = (256, 512, 768)
    # Whole-utterance (low_latency=False) segments can decode in ONE dispatch:
    # lax.while_loop AR with the on-device eos_step + frames_after_eos stop
    # rule, plus cond-guarded 64-frame codec groups — zero AR overshoot after
    # EOS vs up to pipeline_depth x chunk frames on the chunked path.
    # "auto" = fused when B=1, EOS stop possible on device, budget fits a
    # bucket, and staged codec is off; "chunked" forces the chunk schedule.
    segment_dispatch: str = "auto"
    # Fused-segment capacity buckets (frames, multiples of the 64-frame codec
    # group).  The 50-token text cap bounds budgets at (words+2)*13 <= ~704.
    segment_buckets: tuple[int, ...] = (128, 256, 448, 704)
    # Chunk size (12.5 Hz frames) for the streaming voice-prompt encoder used
    # when a prompt exceeds the largest encode bucket.  The reference adapts
    # 120/180/240 to the prompt length to bound CPU memory
    # (tts_model.rs:562-577 + the voice_prompt_chunk_frames override at :40);
    # here the size is fixed because each size is a compiled program — one
    # variant serves any prompt length with carried streaming state.
    voice_prompt_chunk_frames: int = 240
    # Device->host audio wire format.  "int16" = exact PCM (default).
    # "mulaw" = G.711 8-bit companding (ops/mulaw.py): HALF the fetch bytes
    # on a transport whose cost is ~30 ms + ~31 ms/MB, at ~37 dB SNR —
    # opt-in for throughput-bound tunneled deployments.
    transport_format: str = "int16"
    # Storage dtype of the FlowLM dense KV cache ("auto" = compute dtype).
    # "float8_e4m3" halves decode-attention HBM reads — the single largest
    # block of the AR while-body (35% by trace, docs/performance.md) — by
    # storing K/V at 8 bits; the convert back to the compute dtype fuses
    # into the attention matmuls' operand reads exactly like the int8
    # weight path (ops/qtensor.py).  Opt-in: quantizes the whole attention
    # history (prefill included), so audio drifts from the full-precision
    # trajectory — evaluate quality before production use.
    kv_dtype: str = "auto"

    def __post_init__(self):
        # a typo like "fused"/"Auto" would otherwise silently degrade to the
        # chunked path (tts._SegmentRun only recognizes "auto")
        if self.segment_dispatch not in ("auto", "chunked"):
            raise ValueError(
                f"runtime.segment_dispatch must be 'auto' or 'chunked', "
                f"got {self.segment_dispatch!r}")
        if self.compute_dtype not in ("auto", "bfloat16", "float32"):
            raise ValueError(
                f"runtime.compute_dtype must be 'auto', 'bfloat16' or "
                f"'float32', got {self.compute_dtype!r}")
        if self.transport_format not in ("int16", "mulaw"):
            raise ValueError(
                f"runtime.transport_format must be 'int16' or 'mulaw', "
                f"got {self.transport_format!r}")
        if self.kv_dtype not in ("auto", "bfloat16", "float32",
                                 "float8_e4m3", "float8_e5m2"):
            raise ValueError(
                f"runtime.kv_dtype must be 'auto', 'bfloat16', 'float32', "
                f"'float8_e4m3' or 'float8_e5m2', got {self.kv_dtype!r}")


@dataclasses.dataclass(frozen=True)
class Config:
    flow_lm: FlowLMConfig = dataclasses.field(default_factory=FlowLMConfig)
    mimi: MimiConfig = dataclasses.field(default_factory=MimiConfig)
    weights_path: str | None = None
    weights_path_without_voice_cloning: str | None = None
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)


_NESTED = {
    "flow": FlowConfig,
    "transformer": None,  # context-dependent
    "lookup_table": LookupTableConfig,
    "seanet": SEANetConfig,
    "quantizer": QuantizerConfig,
    "flow_lm": FlowLMConfig,
    "mimi": MimiConfig,
    "runtime": RuntimeConfig,
}


def _from_dict(cls, data: dict[str, Any]):
    kwargs = {}
    field_types = {f.name: f.type for f in dataclasses.fields(cls)}
    for name, value in data.items():
        if name not in field_types:
            continue  # tolerate unknown keys (e.g. comments-as-keys)
        if name == "transformer":
            sub = TransformerConfig if cls is FlowLMConfig else MimiTransformerConfig
            value = _from_dict(sub, value)
        elif name in _NESTED and _NESTED[name] is not None and isinstance(value, dict):
            value = _from_dict(_NESTED[name], value)
        elif name in ("ratios", "output_dimensions", "text_buckets", "prompt_buckets",
                      "decode_chunks", "encode_seconds_buckets") and isinstance(value, list):
            value = tuple(value)
        kwargs[name] = value
    return cls(**kwargs)


def load_config(path: str | Path) -> Config:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path) as f:
        data = yaml.safe_load(f)
    return _from_dict(Config, data)


def find_config_path(variant: str) -> Path:
    """Locate a variant YAML.

    Search order mirrors the reference's multi-location discovery
    (crates/pocket-tts/src/tts_model.rs:1141-1191): package assets, then cwd.
    """
    candidates = [
        _CONFIG_DIR / f"{variant}.yaml",
        Path.cwd() / f"{variant}.yaml",
        Path.cwd() / "config" / f"{variant}.yaml",
    ]
    for c in candidates:
        if c.exists():
            return c
    raise FileNotFoundError(
        f"No config found for variant {variant!r}; searched {[str(c) for c in candidates]}"
    )


def load_variant(variant: str = DEFAULT_VARIANT) -> Config:
    return load_config(find_config_path(variant))
