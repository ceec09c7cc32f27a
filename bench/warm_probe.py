"""A/B probe: warm chunk 4 vs 8 at B=16 under the depth-0 pre-first-audio
policy (the pre-depth-0 measurement that picked 8 is invalidated: each extra
warm chunk then cost a fetch-behind-dispatch ride; now it doesn't).

Usage (real TPU): python bench/warm_probe.py [passes_per_variant]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pocket_tts_tpu import TTSModel
    from pocket_tts_tpu.runtime.batcher import ContinuousBatcher

    model = TTSModel.load(eos_threshold=float("inf"))
    NB = 16
    batchers = {}
    for wc in (8, 4):
        b = ContinuousBatcher(model, batch_size=NB, chunk_frames=64, depth=2,
                              warm_chunk=wc)
        t0 = time.time()
        b.warmup()
        print(f"warmup wc={wc}: {time.time()-t0:.1f}s", file=sys.stderr)
        b.start()
        batchers[wc] = b

    rng = random.Random(0)
    results = {8: [], 4: []}
    for b in batchers.values():
        staggered_pass(b, NB, rng)  # e2e glue warm
    for i in range(2 * n):
        wc = 8 if i % 2 == 0 else 4
        lat, wall = staggered_pass(batchers[wc], NB, rng)
        p50, p90 = p50_p90(lat)
        results[wc].append((p50, p90))
        print(f"warm {wc}: p50 {p50:.0f} ms  p90 {p90:.0f} ms  "
              f"max {lat[-1]:.0f} ms  wall {wall:.1f}s", file=sys.stderr)
    for wc, runs in results.items():
        print_summary(f"warm {wc}", runs, sys.stderr)


if __name__ == "__main__":
    main()
