"""Chunked streaming: audio arrives while later frames still decode.

The first chunk lands in ~40 ms on a warm engine (the reference publishes
~80 ms, README.md:358); each chunk is float32 PCM in [-1, 1] at 24 kHz."""

import time

import numpy as np

from pocket_tts_tpu import TTSModel

model = TTSModel.load()
text = ("Streaming synthesis sends audio to the listener while the rest "
        "of the sentence is still being generated.")

model.generate("Warm up.")  # compile outside the timed run

t0 = time.perf_counter()
chunks = []
for i, chunk in enumerate(model.generate_stream(text)):
    dt = time.perf_counter() - t0
    chunks.append(chunk)
    print(f"chunk {i}: {len(chunk) / 24000 * 1000:6.0f} ms of audio "
          f"at t={dt * 1000:6.0f} ms")
wav = np.concatenate(chunks)
print(f"total {wav.size / 24000:.2f}s audio in "
      f"{time.perf_counter() - t0:.2f}s wall")
