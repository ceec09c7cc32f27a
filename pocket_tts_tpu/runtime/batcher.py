"""Continuous-batched serving: one decode loop, many concurrent requests.

The reference serializes requests behind a global mutex
(crates/pocket-tts-cli/src/server/state.rs:67-70) — one stream at a time.  On a
TPU the model is tiny, so the only way to use the chip is batch: this module
keeps a B-slot generation state resident and runs ONE scanned decode program
over all slots continuously, admitting/retiring requests between chunks:

* Each request is split into its (independent) <=50-token text segments up
  front; segments of one request synthesize **in parallel** across slots and
  are re-assembled in order on emit — long texts finish ~segments× faster than
  the reference's inherently serial per-segment loop.
* Admission: copy the request's voice snapshot into a free slot's cache lanes
  (engine.admit_slot) and prefill its text with a per-slot t_valid vector —
  in-flight slots see only causally-invisible garbage.
* Per-slot temperature / EOS-threshold vectors; EOS + frame budgets tracked on
  host; retired slots keep computing garbage until reused (the scan is
  static-shape — idle lanes are the price of zero recompilation).
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
from typing import Iterator

import jax
import numpy as np

from pocket_tts_tpu import pause as pause_mod
from pocket_tts_tpu import text as text_mod
from pocket_tts_tpu.runtime.engine import Engine, GenParams
from pocket_tts_tpu.tts import TTSModel, VoiceState

logger = logging.getLogger(__name__)

_SENTINEL = object()


@dataclasses.dataclass(eq=False)
class _Segment:
    request: "_Request"
    index: int  # position within the request (for ordered reassembly)
    kind: str  # "text" | "silence"
    tokens: np.ndarray | None = None
    n_tokens: int = 0
    max_frames: int = 0
    frames_after_eos: int = 0
    silence_samples: int = 0
    # filled during decode
    chunks: list = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass(eq=False)
class _Request:
    voice: VoiceState
    gen: GenParams
    out: queue.Queue
    segments: list = dataclasses.field(default_factory=list)
    emitted_upto: int = 0  # next segment index to stream out
    finished: bool = False
    failed: bool = False

    def pump(self):
        """Emit chunks of completed-prefix segments in order."""
        if self.finished:
            return
        while self.emitted_upto < len(self.segments):
            seg = self.segments[self.emitted_upto]
            for c in seg.chunks:
                self.out.put(c)
            seg.chunks = []
            if not seg.done:
                return
            self.emitted_upto += 1
        self.finished = True
        self.out.put(_SENTINEL)


@dataclasses.dataclass
class _Slot:
    segment: _Segment | None = None
    frames_done: int = 0   # frames fetched & routed
    dispatched: int = 0    # frames dispatched to the device (>= frames_done)
    eos_step: int | None = None
    base_pos: int = 0  # voice length + text tokens (for window bucketing)

    @property
    def free(self) -> bool:
        return self.segment is None

    @property
    def target(self) -> int:
        if self.segment is None:
            return 0
        if self.eos_step is None:
            return self.segment.max_frames
        return min(self.segment.max_frames,
                   self.eos_step + self.segment.frames_after_eos)


class ContinuousBatcher:
    """Owns a batched Engine and a background decode thread."""

    def __init__(self, model: TTSModel, batch_size: int = 4,
                 chunk_frames: int = 8, seed: int = 0, depth: int = 2):
        self.model = model
        self.batch = batch_size
        self.chunk = chunk_frames
        # pipeline depth: dispatches in flight before the oldest is fetched.
        # Measured on the axon TPU: each dispatch has ~30 ms fixed cost and
        # fetch blocks ~10 ms — depth 2 overlaps both with device compute.
        # Cost: EOS discovery / slot retirement lag depth*chunk frames (the
        # overshoot is computed-and-discarded, same as single-stream).
        self.depth = max(1, depth)
        self.engine = Engine(model.config, model.params, batch_size=batch_size)
        self.tokenizer = model.tokenizer
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)
        self._submit: queue.Queue[_Segment] = queue.Queue()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._dead = False
        self._active: set[_Request] = set()  # requests not yet finished
        # observability counters (written by the decode thread / submit)
        self._stats = {"dispatches": 0, "frames_decoded": 0,
                       "requests_completed": 0, "requests_submitted": 0}

    def stats(self) -> dict:
        """Snapshot of the decode loop's counters plus live queue depths."""
        with self._lock:
            return {**self._stats,
                    "active_requests": len(self._active),
                    "queued_segments": self._submit.qsize(),
                    "batch_size": self.batch,
                    "chunk_frames": self.chunk,
                    "dead": self._dead}

    # -- public API ----------------------------------------------------------

    def start(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._run, daemon=True,
                                            name="tts-batcher")
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def submit(self, text: str, voice: VoiceState | None = None,
               gen: GenParams | None = None, *, pauses: bool = True) -> queue.Queue:
        """Enqueue a request; returns a queue of float32 chunks ending with a
        sentinel (use :meth:`stream` for an iterator).

        ``pauses=True`` gives generate_with_pauses semantics ([pause:Xms] and
        natural comma/ellipsis silence); ``False`` matches plain generate."""
        if not text or not text.strip():
            raise ValueError("Text prompt cannot be empty")
        if self._dead:
            raise RuntimeError("batcher decode loop has crashed; restart it")
        if voice is None:
            voice = self.model.get_voice_state()
        gen = gen or self.model.gen
        req = _Request(voice=voice, gen=gen, out=queue.Queue())

        if pauses:
            parts = pause_mod.segment_text(text)
        else:
            parts = [pause_mod.Segment("text", text=text)]
        index = 0
        for part in parts:
            if part.kind == "pause":
                n = pause_mod.silence_samples(part.duration_ms,
                                              self.model.sample_rate)
                req.segments.append(_Segment(req, index, "silence",
                                             silence_samples=n))
                index += 1
                continue
            for chunk in text_mod.split_into_best_sentences(self.tokenizer,
                                                            part.text):
                prepared, fae = text_mod.prepare_text_prompt(chunk)
                tokens, n_tokens = text_mod.tokens_array(self.tokenizer, prepared)
                max_frames = text_mod.max_generation_frames(prepared)
                room = (self.engine._rcfg.max_seq - voice.length - n_tokens - 1)
                if room < max_frames:
                    logger.warning(
                        "voice prompt (%d frames) leaves only %d of %d "
                        "budgeted generation frames; audio may cut off",
                        voice.length, max(0, room), max_frames)
                seg = _Segment(req, index, "text", tokens=tokens,
                               n_tokens=n_tokens,
                               max_frames=max(0, min(max_frames, room)),
                               frames_after_eos=fae + 2)
                req.segments.append(seg)
                index += 1
        if not req.segments:
            req.out.put(_SENTINEL)
            return req.out
        for seg in req.segments:
            if seg.kind == "silence":
                seg.chunks = [np.zeros(seg.silence_samples, np.float32)]
                seg.done = True
        with self._lock:
            self._active.add(req)
            self._stats["requests_submitted"] += 1
            req.pump()
            if req.finished:  # e.g. pause-only request: done synchronously
                self._active.discard(req)
                self._stats["requests_completed"] += 1
                return req.out
        # enqueue only after registration so a crash can always fail us open
        for seg in req.segments:
            if seg.kind == "text":
                self._submit.put(seg)
        return req.out

    def stream(self, text: str, voice: VoiceState | None = None,
               gen: GenParams | None = None,
               timeout: float = 300.0, *, pauses: bool = True
               ) -> Iterator[np.ndarray]:
        req_out = self.submit(text, voice, gen, pauses=pauses)
        while True:
            item = req_out.get(timeout=timeout)
            if item is _SENTINEL:
                return
            if isinstance(item, Exception):
                raise item
            yield item

    def generate(self, text: str, voice: VoiceState | None = None,
                 gen: GenParams | None = None, *, pauses: bool = True) -> np.ndarray:
        chunks = list(self.stream(text, voice, gen, pauses=pauses))
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    # -- decode loop -----------------------------------------------------------

    def _run(self) -> None:
        try:
            self._run_inner()
        except Exception as e:  # noqa: BLE001
            logger.exception("batcher decode loop crashed")
            # fail open: surface the error to EVERY unfinished request (queued,
            # in-slot, or mid-stream) and refuse new submissions
            self._dead = True
            with self._lock:
                while True:
                    try:
                        self._submit.get_nowait()
                    except queue.Empty:
                        break
                for req in list(self._active):
                    req.failed = True
                    req.finished = True
                    req.out.put(RuntimeError(f"batcher crashed: {e!r}"))
                    req.out.put(_SENTINEL)
                self._active.clear()

    def _run_inner(self) -> None:
        engine = self.engine
        frame_size = engine.frame_size
        slots = [_Slot() for _ in range(self.batch)]
        state = engine.new_state(self.batch)
        temps = np.full((self.batch,), 0.7, np.float32)
        eos_th = np.full((self.batch,), -4.0, np.float32)
        # per-slot compile-static-in-the-reference knobs, here data: lsd step
        # counts (masked Euler) and noise clamps (< 0 = unclamped; 0 is a
        # hard zero-clamp, so None must NOT be encoded as 0)
        lsd = np.ones((self.batch,), np.int32)
        clamp = np.full((self.batch,), -1.0, np.float32)
        pending: list = []  # in-flight (owners, audio, is_eos) awaiting fetch

        while not self._stop.is_set():
            # 1. admit pending segments into free slots
            admitted = False
            t_valid = np.zeros((self.batch,), np.int32)
            tokens = np.zeros((self.batch, 1), np.int32)
            width = 1
            for i, slot in enumerate(slots):
                if not slot.free:
                    continue
                try:
                    seg = self._submit.get_nowait()
                except queue.Empty:
                    break
                state = engine.admit_slot(state, i, seg.request.voice.as_dict())
                width = max(width, seg.tokens.shape[1])
                t_valid[i] = seg.n_tokens
                grown = np.zeros((self.batch, width), np.int32)
                grown[:, : tokens.shape[1]] = tokens
                tokens = grown
                tokens[i, : seg.tokens.shape[1]] = seg.tokens[0]
                slot.segment = seg
                slot.frames_done = 0
                slot.dispatched = 0
                slot.eos_step = None
                slot.base_pos = seg.request.voice.length + seg.n_tokens
                temps[i] = seg.request.gen.temp
                eos_th[i] = seg.request.gen.eos_threshold
                lsd[i] = max(1, seg.request.gen.lsd_decode_steps)
                nc = seg.request.gen.noise_clamp
                clamp[i] = nc if nc is not None else -1.0
                admitted = True
            if admitted:
                state = engine.prefill_tokens(state, tokens, t_valid)

            active = [s for s in slots if not s.free]
            if not active:
                while pending:
                    self._route(slots, *pending.pop(0), frame_size)
                if self._stop.wait(0.005):
                    break
                continue

            # window must cover the DISPATCHED frontier, not the routed one —
            # with pipelining frames_done lags by up to depth chunks, and a
            # too-small window would clamp KV writes onto the window edge
            # (silent cache corruption)
            window = engine.window_for(
                max(s.base_pos + s.dispatched for s in active), self.chunk)
            # 2. dispatch one decode chunk over every slot; results of older
            #    chunks are fetched while newer ones compute (depth-N pipeline
            #    hides both the dispatch fixed cost and the device->host
            #    round-trip).  Slot ownership snapshot travels with each
            #    dispatch: routing must credit the frames to the segments that
            #    were resident at dispatch time.
            # free slots keep lsd=1 so an idle lane never raises the batch's
            # static step ceiling (and drop any stale clamp override)
            for i, s in enumerate(slots):
                if s.free:
                    lsd[i] = 1
                    clamp[i] = -1.0
            # Batches where every active slot matches the server DEFAULTS (the
            # common case: nobody overrides lsd/noise_clamp) take the plain
            # static decode — the per-slot vec program pays ~10% for masked
            # steps and the dual noise draw.  Overridden-but-homogeneous
            # batches still go through the vec path: its pow2 step ceiling
            # bounds compiled variants, whereas a static program per exact lsd
            # value would cold-compile (minutes on this backend) on THIS
            # thread, stalling every in-flight stream.
            gen = self.model.gen
            base = (max(1, gen.lsd_decode_steps),
                    gen.noise_clamp if gen.noise_clamp is not None else -1.0)
            act_idx = [i for i, s in enumerate(slots) if not s.free]
            default_only = all((int(lsd[i]), float(clamp[i])) == base
                               for i in act_idx)
            self._key, key = jax.random.split(self._key)
            if default_only:
                state, _, audio, is_eos = engine.decode_frames(
                    state, key, self.chunk, gen, temps=temps,
                    eos_thresholds=eos_th, window=window)
            else:
                state, _, audio, is_eos = engine.decode_frames(
                    state, key, self.chunk, gen, temps=temps,
                    eos_thresholds=eos_th, window=window, lsd_vec=lsd,
                    clamp_vec=clamp)
            for s in active:
                s.dispatched += self.chunk
            with self._lock:
                self._stats["dispatches"] += 1
                self._stats["frames_decoded"] += self.chunk * len(active)
            pending.append(([s.segment for s in slots], audio, is_eos))
            while len(pending) > self.depth:
                self._route(slots, *pending.pop(0), frame_size)
        while pending:
            self._route(slots, *pending.pop(0), frame_size)

    def _route(self, slots, owners, audio, is_eos, frame_size) -> None:
        """Fetch one chunk's results and route frames to their segments."""
        audio, eos = jax.device_get((audio, is_eos))
        audio = np.asarray(audio).astype(np.float32) / 32767.0
        eos = np.asarray(eos)
        with self._lock:
            touched_requests = set()
            for i, slot in enumerate(slots):
                seg = owners[i]
                if seg is None or seg.done:
                    continue
                if slot.eos_step is None:
                    hits = np.nonzero(eos[i])[0]
                    if hits.size:
                        slot.eos_step = slot.frames_done + int(hits[0])
                emit = min(slot.target, slot.frames_done + self.chunk) \
                    - slot.frames_done
                if emit > 0:
                    seg.chunks.append(audio[i, : emit * frame_size].copy())
                slot.frames_done += self.chunk
                if slot.frames_done >= slot.target:
                    seg.done = True
                    slot.segment = None
                touched_requests.add(seg.request)
            for req in touched_requests:
                req.pump()
                if req.finished:
                    self._active.discard(req)
                    self._stats["requests_completed"] += 1


def batched_tts(model: TTSModel, batch_size: int = 4,
                chunk_frames: int = 8, depth: int = 2) -> ContinuousBatcher:
    b = ContinuousBatcher(model, batch_size, chunk_frames, depth=depth)
    b.start()
    return b
