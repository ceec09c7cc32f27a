"""Continuous batching: many concurrent requests share one decode loop.

The reference serializes requests behind a mutex (state.rs:67-70); on a TPU
the model is tiny, so batching concurrent streams is how the chip gets used —
B=16 yields ~250x aggregate realtime vs ~150x for one stream.  Streaming
requests get a warm-chunk admission ramp; whole-WAV requests take the pure
throughput path (docs/performance.md, "Batched serving latency")."""

import threading
import time

from pocket_tts_tpu import TTSModel
from pocket_tts_tpu.runtime.batcher import batched_tts

model = TTSModel.load()
batcher = batched_tts(model, batch_size=4, chunk_frames=64)

texts = [
    "First concurrent request speaking.",
    "Second request with different text, same batch.",
    "Third voice of the ensemble.",
    "And a fourth, all decoded in one scanned program.",
]
results = [None] * len(texts)


def run(i):
    results[i] = batcher.generate(texts[i])


threads = [threading.Thread(target=run, args=(i,)) for i in range(len(texts))]
t0 = time.perf_counter()
for t in threads:
    t.start()
for t in threads:
    t.join()
dt = time.perf_counter() - t0

total = sum(r.size for r in results) / model.sample_rate
print(f"{len(texts)} concurrent requests: {total:.2f}s audio in {dt:.2f}s "
      f"({total / dt:.1f}x aggregate realtime)")

# the same thing without threads: generate_batch submits every item up-front
# and returns results in input order (offline manifests: `cli.py batch`)
t0 = time.perf_counter()
batch_results = batcher.generate_batch(texts)
dt = time.perf_counter() - t0
print(f"generate_batch: {len(batch_results)} results in {dt:.2f}s "
      f"(input order, same decode programs)")
print(f"batcher stats: {batcher.stats()}")
batcher.stop()
