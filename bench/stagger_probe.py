"""A/B probe for batched streaming first-chunk latency at B=16.

Alternates passes between policy variants (to average out transport weather):
  A = current policy (pressure chunk 16 while admissions wait)
  B = pressure tier neutralized (press == serve chunk, round-3 policy)

Usage (real TPU): python bench/stagger_probe.py [passes_per_variant]
"""

import os
import random
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root, for pocket_tts_tpu
sys.path.insert(0, _HERE)  # bench/ itself: root bench.py shadows the package name

from stagger_common import p50_p90, print_summary, staggered_pass


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pocket_tts_tpu import TTSModel
    from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

    model = TTSModel.load(eos_threshold=float("inf"))
    NB = 16
    b = ContinuousBatcher(model, batch_size=NB, chunk_frames=64, depth=2,
                          warm_chunk=8)
    press = b.press_chunk
    t0 = time.time()
    b.warmup()
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)
    b.start()
    rng = random.Random(0)
    staggered_pass(b, NB, rng)  # warm e2e glue
    results = {"A": [], "B": []}
    for i in range(2 * n):
        variant = "A" if i % 2 == 0 else "B"
        b.press_chunk = press if variant == "A" else b.serve_chunk
        lat, wall = staggered_pass(b, NB, rng)
        p50, p90 = p50_p90(lat)
        results[variant].append((p50, p90))
        print(f"{variant}: p50 {p50:.0f} ms  p90 {p90:.0f} ms  "
              f"max {lat[-1]:.0f} ms  wall {wall:.1f}s", file=sys.stderr)
    for v, runs in results.items():
        print_summary(v, runs, sys.stderr)


if __name__ == "__main__":
    main()
