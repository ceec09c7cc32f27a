"""Traced decode while-body ms/frame, per precision variant (round 5).

The while-body duration is the weather-independent device gauge bench.py
emits for the bf16 headline (bench.device_ms_per_frame).  This probe runs
the SAME measurement across the precision variants so the quantized stacks
get a device-side number too — VERDICT r4 #2 set the bar at <=0.25 ms/frame,
bf16 was refuted with a ~0.29 bandwidth floor, int8 measured 0.270; the
int8+fp8 combo (every large HBM stream narrowed) was never traced.

Usage (real TPU):  python bench/whilebody_probe.py [variant ...]
Variants: bf16 int8 fp8 int8_fp8 (default: all four, bf16 first and last
to bracket weather drift — the traced number should NOT drift, so a drift
bracket also validates the gauge itself).
"""

import sys
import time

sys.path.insert(0, ".")


def while_body_ms_per_frame(model, n_chunks: int = 4) -> float:
    import glob
    import gzip
    import json
    import os

    import jax
    import numpy as np

    from pocket_tts_tpu.runtime.engine import GenParams

    eng = model.engine
    chunk = max(eng._rcfg.decode_chunks)
    gen = GenParams(temp=0.7)
    key = jax.random.PRNGKey(0)
    state = eng.prefill_tokens(eng.new_state(1),
                               np.arange(1, 9, dtype=np.int32)[None], 8)
    for _ in range(2):
        state, key, audio, _ = eng.decode_frames(state, key, chunk, gen)
    _ = jax.device_get(audio)

    trace_dir = "/tmp/pocket_whilebody_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_chunks):
        state, key, audio, _ = eng.decode_frames(state, key, chunk, gen)
    _ = jax.device_get(audio)
    jax.profiler.stop_trace()

    path = max(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    while_us = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        if (e.get("name", "").startswith("while.")
                and "engine.py" in (e.get("args") or {}).get("source", "")):
            while_us += e["dur"]
    return while_us / 1000.0 / (n_chunks * chunk)


def build(variant: str):
    from pocket_tts_tpu import TTSModel
    from pocket_tts_tpu.runtime.quantize import quantize_model

    kv = {"fp8": "float8_e4m3", "int8_fp8": "float8_e4m3"}.get(variant)
    model = TTSModel.load(eos_threshold=float("inf"),
                          **({"kv_dtype": kv} if kv else {}))
    if variant.startswith("int8"):
        model = quantize_model(model)
    return model


def main():
    variants = sys.argv[1:] or ["bf16", "int8", "fp8", "int8_fp8", "bf16"]
    results = {}
    for v in variants:
        t0 = time.time()
        model = build(v)
        ms = while_body_ms_per_frame(model)
        results.setdefault(v, []).append(ms)
        print(f"{v:10s}  while-body {ms:.3f} ms/frame  "
              f"(leg wall {time.time()-t0:.0f}s)", file=sys.stderr)
        del model
    print({k: [round(x, 3) for x in v] for k, v in results.items()})


if __name__ == "__main__":
    main()
