"""Dump a variant's resolved configuration (reference: examples/check_config.rs)."""

import dataclasses
import json
import sys

from pocket_tts_tpu.config import find_config_path, load_variant

variant = sys.argv[1] if len(sys.argv) > 1 else "b6369a24"
cfg = load_variant(variant)
print(f"config file: {find_config_path(variant)}")
print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))
print(f"frame_size={cfg.mimi.frame_size} samples "
      f"({1000 / cfg.mimi.frame_rate:.0f} ms) @ {cfg.mimi.sample_rate} Hz; "
      f"FlowLM d_model={cfg.flow_lm.transformer.d_model}, "
      f"{cfg.flow_lm.transformer.num_layers} layers, "
      f"{cfg.flow_lm.transformer.num_heads} heads")
