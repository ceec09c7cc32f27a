"""Measure the admission->first-audio mechanism floor at B=16 (VERDICT r4 #2).

An IDLE warm batcher admits one streaming request: no in-flight backlog, no
queueing — what remains is the irreducible per-arrival cost of the admission
machinery itself:

    submit overhead (tokenize + pad + h2d enqueue)   [host, overlaps nothing]
  + fused admit+prefill program                      [device]
  + warm chunk (8 frames) decode                     [device]
  + first-chunk fetch                                [transport]

Also times each component in isolation.  p50 over N repeats.

Usage (real TPU): python bench/admission_floor.py [repeats]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import jax
    import numpy as np
    from pocket_tts_tpu import TTSModel
    from pocket_tts_tpu.runtime.batcher import ContinuousBatcher
    from pocket_tts_tpu.runtime.engine import GenParams

    model = TTSModel.load(eos_threshold=float("inf"))
    NB = 16
    b = ContinuousBatcher(model, batch_size=NB, chunk_frames=64, depth=2,
                          warm_chunk=8)
    t0 = time.time()
    b.warmup()
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)
    b.start()
    text = "A short line of text to admit."

    # e2e idle-admission floor
    lats = []
    for _ in range(n):
        t0 = time.perf_counter()
        it = b.stream(text)
        next(it)
        lats.append((time.perf_counter() - t0) * 1000)
        for _ in it:
            pass
        time.sleep(0.05)
    lats.sort()
    print(f"idle-admission first-chunk: p50 {lats[len(lats)//2]:.0f} ms  "
          f"min {lats[0]:.0f}  max {lats[-1]:.0f}  (N={n})", file=sys.stderr)
    b.stop()

    # component walls (timed by result fetch — the only reliable wait here)
    eng = model.engine
    voice = model.get_voice_state().as_dict()
    gen = GenParams(temp=0.7)
    key = jax.random.PRNGKey(0)
    toks = np.arange(1, 8, dtype=np.int32)[None]
    state = eng.new_state(NB)

    row = eng.pad_token_row(toks)
    state = eng.admit_prefill_slot(state, 0, voice, row, toks.shape[1])

    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        r = eng.pad_token_row(toks)
        jax.device_get(r)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"pad_token_row h2d (incl fetch-back): {sorted(ts)[4]:.1f} ms",
          file=sys.stderr)

    # fused admit+prefill: chain the state (donated) and fetch only pos
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        state = eng.admit_prefill_slot(state, 0, voice, row, 7)
        jax.device_get(state["pos"])
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"fused admit+prefill (B={NB}) wall: {sorted(ts)[4]:.1f} ms",
          file=sys.stderr)

    # decode chunks: chain the state, fetch the audio (the realistic fetch)
    for k in (8, 16, 32, 64):
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            state, key, audio, _ = eng.decode_frames(state, key, k, gen)
            jax.device_get(audio)
            ts.append((time.perf_counter() - t0) * 1000)
        print(f"decode chunk {k} (B={NB}) wall incl audio fetch: "
              f"{sorted(ts)[4]:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
