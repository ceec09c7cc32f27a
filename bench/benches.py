"""Benchmark suite — counterparts of the reference's criterion benches
(crates/pocket-tts/benches/: full_benchmark, streaming_bench, attention_bench,
voice_state_bench) plus the hyperfine text-length ladder (scripts/benchmark.sh).

Run: ``python bench/benches.py [all|full|streaming|attention|voice]``
Prints human-readable tables to stdout (bench.py at the repo root remains the
driver's single-JSON-line entry point).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

# The four fixed benchmark texts (reference scripts/benchmark.sh:19-25 ladder).
TEXTS = {
    "short": "Hello, world!",
    "medium": "The quick brown fox jumps over the lazy dog. "
              "Pack my box with five dozen liquor jugs.",
    "long": ("The quick brown fox jumps over the lazy dog while the orchestra "
             "plays a quiet waltz in the background. ") * 4,
    "very_long": ("This is a considerably longer benchmark passage intended to "
                  "exercise multi-segment chunked generation across several "
                  "sentences of narration. ") * 8,
}


def _load():
    from pocket_tts_tpu import TTSModel

    model = TTSModel.load(eos_threshold=float("inf"))
    _ = model.generate("Warm up sentence for compilation, nothing more.")
    return model


def bench_full(model):
    print("== full generation (EOS disabled; wall vs audio) ==")
    for name, text in TEXTS.items():
        t0 = time.perf_counter()
        wav = model.generate(text)
        dt = time.perf_counter() - t0
        dur = wav.size / model.sample_rate
        print(f"{name:10s} {dur:7.2f}s audio  {dt:6.2f}s wall  "
              f"{dur/dt:6.1f}x realtime")


def bench_streaming(model):
    print("== streaming latency (reference: streaming_bench.rs) ==")
    lats, totals = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        it = model.generate_stream(TEXTS["medium"])
        first = next(it)
        lats.append((time.perf_counter() - t0) * 1000)
        n = len(first) + sum(len(c) for c in it)
        totals.append(n)
    lats.sort()
    print(f"first-chunk latency p50 {lats[len(lats)//2]:.0f} ms  "
          f"min {lats[0]:.0f} ms  max {lats[-1]:.0f} ms "
          f"({totals[0]/model.sample_rate:.1f}s streams)")


def bench_attention(model):
    """Step time vs context length (reference: attention_bench.rs 0..3000)."""
    import jax

    from pocket_tts_tpu.runtime.engine import GenParams

    print("== decode step time vs KV-cache fill ==")
    engine = model.engine
    key = jax.random.PRNGKey(0)
    for fill in (0, 250, 500, 900):
        state = engine.new_state()
        if fill:
            import jax.numpy as jnp

            state["pos"] = jnp.full_like(state["pos"], fill)
        state, key, audio, _ = engine.decode_frames(state, key, 16, GenParams())
        jax.block_until_ready(audio)
        state2 = engine.reset_for_segment(
            {"kc": state["kc"], "vc": state["vc"], "pos": state["pos"]})
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            state2, key, audio, _ = engine.decode_frames(state2, key, 16, GenParams())
        jax.block_until_ready(audio)
        ms = (time.perf_counter() - t0) / n / 16 * 1000
        print(f"context {fill:5d}: {ms:6.2f} ms/frame")


def bench_voice(model):
    """Voice-state creation cost vs prompt length (voice_state_bench.rs)."""
    print("== voice-state creation vs prompt length ==")
    rng = np.random.default_rng(0)
    for seconds in (3, 15, 30):
        wav = rng.normal(size=24000 * seconds).astype(np.float32) * 0.1
        model.get_voice_state_from_audio(wav)  # warm that bucket
        t0 = time.perf_counter()
        vs = model.get_voice_state_from_audio(wav)
        dt = (time.perf_counter() - t0) * 1000
        print(f"{seconds:3d}s prompt -> {vs.length:4d} frames in {dt:7.1f} ms")


def bench_batched_latency(model, nb: int = 16):
    """Batched streaming first-chunk latency under staggered arrivals (the
    admission-ramp path), plus the aggregate throughput of the same batcher.
    Occupancy 1 is served by the single-stream engine in the server
    (occupancy-adaptive routing), so its latency is bench_streaming's."""
    import random
    import threading

    from pocket_tts_tpu.runtime.batcher import batched_tts

    print(f"== batched streaming first-chunk latency (B={nb}, staggered) ==")
    b = batched_tts(model, batch_size=nb, chunk_frames=64, depth=2)
    text = TEXTS["long"]
    rng = random.Random(0)
    lat_ms = []

    def one(delay):
        time.sleep(delay)
        t0 = time.perf_counter()
        it = b.stream(text)
        next(it)
        lat_ms.append((time.perf_counter() - t0) * 1000)
        for _ in it:
            pass

    def run_pass():
        threads = [threading.Thread(target=one, args=(rng.uniform(0, 2.5),))
                   for _ in range(nb)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.perf_counter() - t0

    b.warmup()  # compile every (chunk, window) variant up front
    run_pass()  # warm the e2e glue
    lat_ms.clear()
    wall = run_pass()
    lat_ms.sort()
    st = b.stats()
    audio_s = st["frames_decoded"] * model.frame_size / model.sample_rate
    print(f"p50 {lat_ms[len(lat_ms)//2]:.0f} ms  "
          f"p90 {lat_ms[int(len(lat_ms)*0.9)]:.0f} ms  max {lat_ms[-1]:.0f} ms; "
          f"last pass {wall:.2f}s wall "
          f"({st['warm_dispatches']} warm dispatches total)")
    print(f"(decoded {audio_s:.0f}s of slot-audio across both passes)")
    b.stop()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    model = _load()
    if which in ("all", "full"):
        bench_full(model)
    if which in ("all", "streaming"):
        bench_streaming(model)
    if which in ("all", "attention"):
        bench_attention(model)
    if which in ("all", "voice"):
        bench_voice(model)
    if which in ("all", "batched"):
        bench_batched_latency(model)


if __name__ == "__main__":
    main()
