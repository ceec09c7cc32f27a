"""A/B probe for batched streaming first-chunk latency at B=16.

Alternates passes between policy variants (to average out transport weather):
  A = current policy (pressure chunk 16 while admissions wait)
  B = pressure tier neutralized (press == serve chunk, round-3 policy)

Usage (real TPU): python bench/stagger_probe.py [passes_per_variant]
"""

import random
import sys
import threading
import time

sys.path.insert(0, ".")  # run from repo root


TEXT = (
    "The quick brown fox jumps over the lazy dog. "
    "A journey of a thousand miles begins with a single step. "
    "To be or not to be, that is the question worth asking today."
)


def staggered_pass(batcher, nb, rng):
    lat_ms = []

    def one_stream(delay_s):
        time.sleep(delay_s)
        t0 = time.perf_counter()
        it = batcher.stream(TEXT)
        next(it)
        lat_ms.append((time.perf_counter() - t0) * 1000)
        for _ in it:
            pass

    delays = [rng.uniform(0.0, 2.5) for _ in range(nb)]
    threads = [threading.Thread(target=one_stream, args=(d,)) for d in delays]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    lat_ms.sort()
    return lat_ms, wall


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
        p50, p90 = lat[len(lat) // 2], lat[int(len(lat) * 0.9)]
        results[variant].append((p50, p90))
        print(f"{variant}: p50 {p50:.0f} ms  p90 {p90:.0f} ms  "
              f"max {lat[-1]:.0f} ms  wall {wall:.1f}s", file=sys.stderr)
    for v, runs in results.items():
        p50s = sorted(r[0] for r in runs)
        p90s = sorted(r[1] for r in runs)
        print(f"{v} summary: p50 med {p50s[len(p50s)//2]:.0f} ms  "
              f"p90 med {p90s[len(p90s)//2]:.0f} ms over {len(runs)} passes",
              file=sys.stderr)


if __name__ == "__main__":
    main()
