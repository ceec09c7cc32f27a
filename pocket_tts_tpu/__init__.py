"""pocket-tts-tpu: TPU-native streaming text-to-speech inference framework.

A ground-up JAX/XLA/Pallas rebuild of the Kyutai Pocket TTS stack (reference:
ykevinc/pocket-tts): FlowLM autoregressive transformer with LSD flow-matching
decode + Mimi/SEANet streaming codec, voice cloning, pause handling, CLI and an
OpenAI-compatible HTTP server — compiled as static-shape scanned programs
instead of the reference's per-frame host loop.
"""

from pocket_tts_tpu.config import (  # noqa: F401
    DEFAULT_EOS_THRESHOLD,
    DEFAULT_LSD_DECODE_STEPS,
    DEFAULT_NOISE_CLAMP,
    DEFAULT_TEMPERATURE,
    DEFAULT_VARIANT,
    Config,
    load_config,
    load_variant,
)
from pocket_tts_tpu.tts import TTSModel, VoiceState  # noqa: F401

__version__ = "0.1.0"
