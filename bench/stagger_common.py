"""Shared staggered-arrival harness for the batched-latency A/B probes.

One definition of the arrival pattern and the percentile reporting, so a
measurement fix (delay distribution, percentile indexing) cannot silently
diverge between probes — stagger_probe.py, warm_probe.py, and bench.py's
batched-streaming leg all measure the SAME experiment: NB streams arriving
uniformly over 2.5 s, each timed from submit to first audio chunk.
"""

import threading
import time

TEXT = (
    "The quick brown fox jumps over the lazy dog. "
    "A journey of a thousand miles begins with a single step. "
    "To be or not to be, that is the question worth asking today."
)


def staggered_pass(batcher, nb, rng, text=TEXT, spread_s=2.5):
    """Run one pass of nb staggered streams; returns (sorted latencies ms, wall s)."""
    lat_ms = []

    def one_stream(delay_s):
        time.sleep(delay_s)
        t0 = time.perf_counter()
        it = batcher.stream(text)
        next(it)
        lat_ms.append((time.perf_counter() - t0) * 1000)
        for _ in it:
            pass

    delays = [rng.uniform(0.0, spread_s) for _ in range(nb)]
    threads = [threading.Thread(target=one_stream, args=(d,)) for d in delays]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    lat_ms.sort()
    return lat_ms, wall


def p50_p90(lat_ms):
    return lat_ms[len(lat_ms) // 2], lat_ms[int(len(lat_ms) * 0.9)]


def print_summary(label, runs, file):
    """runs: list of (p50, p90) tuples from repeated passes."""
    p50s = sorted(r[0] for r in runs)
    p90s = sorted(r[1] for r in runs)
    print(f"{label} summary: p50 med {p50s[len(p50s) // 2]:.0f} ms  "
          f"p90 med {p90s[len(p90s) // 2]:.0f} ms over {len(runs)} passes",
          file=file)
