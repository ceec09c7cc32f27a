"""Trace-level attribution of the steady-state decode chunk (VERDICT r4).

Captures a jax.profiler trace around N steady-state decode chunks on the real
TPU and prints a per-frame device-time breakdown by fusion (top events carry
`source` file:line args on this backend), separating:

  * device compute (sum of device-lane event durations / frames)
  * the 0.28 ms/frame wall vs ~0.23 ms/frame weight-streaming bound gap

Usage (real TPU):  python bench/profile_decode.py [n_chunks]
Output: a table on stderr + the trace dir for manual Perfetto inspection.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, ".")


def summarize(trace_dir: str, frames: int):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", trace_dir, file=sys.stderr)
        return
    # newest capture wins: the profiler writes a fresh timestamped subdir per
    # run under the same trace_dir, and path LENGTH is unrelated to recency
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # device lanes: pid whose thread names mention TPU / device
    by_name = {}
    total = 0.0
    for e in events:
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        src = args.get("source", "")
        key = f"{name} [{src}]" if src else name
        by_name[key] = by_name.get(key, 0.0) + e["dur"]
        total += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
    print(f"\ntop events over {frames} frames "
          f"(us total, us/frame):", file=sys.stderr)
    for name, dur in top:
        print(f"  {dur:10.0f}  {dur/frames:8.2f}  {name[:110]}", file=sys.stderr)
    print(f"  sum of ALL event durations: {total/frames:.2f} us/frame "
          f"(overlapping lanes double-count)", file=sys.stderr)
    print("trace:", path, file=sys.stderr)


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import numpy as np
    from pocket_tts_tpu import TTSModel
    from pocket_tts_tpu.runtime.engine import GenParams

    model = TTSModel.load(eos_threshold=float("inf"))
    eng = model.engine
    chunk = max(eng._rcfg.decode_chunks)
    gen = GenParams(temp=0.7)
    key = jax.random.PRNGKey(0)
    state = eng.prefill_tokens(eng.new_state(1),
                               np.arange(1, 9, dtype=np.int32)[None], 8)
    # warm (compile + donation steady state)
    for _ in range(3):
        state, key, audio, _ = eng.decode_frames(state, key, chunk, gen)
    _ = jax.device_get(audio)

    trace_dir = "/tmp/pocket_decode_trace"
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_chunks):
        state, key, audio, _ = eng.decode_frames(state, key, chunk, gen)
    got = jax.device_get(audio)  # fetch = the only reliable wait on axon
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    frames = n_chunks * chunk
    print(f"wall: {wall*1000:.1f} ms for {frames} frames "
          f"({wall/frames*1000:.3f} ms/frame), audio std "
          f"{np.asarray(got).std():.1f}", file=sys.stderr)
    summarize(trace_dir, frames)


if __name__ == "__main__":
    main()
