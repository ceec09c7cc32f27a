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
* Admission: ONE fused dispatch per request (engine.admit_prefill_slot)
  copies the voice snapshot into a free slot's cache lanes and prefills its
  text at B=1 on that lane; the token row is uploaded at submit() time so no
  h2d transfer rides the admission critical path.  In-flight slots are
  untouched.
* Per-slot temperature / EOS-threshold vectors; EOS + frame budgets tracked on
  host; retired slots keep computing garbage until reused (the scan is
  static-shape — idle lanes are the price of zero recompilation).
* Streaming arrivals get bounded time-to-first-audio: priority admission, a
  warm-chunk ramp at pipeline depth 1, preemption of not-yet-emitting
  segments at full occupancy, and a saturation guard that drops the ramp
  when the backlog exceeds the batch (docs/performance.md, "Batched serving
  latency").  Abandoned streams cancel their remaining work.
"""

from __future__ import annotations

import dataclasses
import logging
import os
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
    # device-resident [1, bucket] token row, uploaded on the SUBMITTING
    # thread (engine.pad_token_row) so the h2d transfer (~25-30 ms on the
    # tunneled backend) overlaps the in-flight decode chunk instead of
    # serializing into the admission -> first-audio critical path
    d_tokens: object = None
    # True only for the FIRST text segment of a latency-sensitive (streaming)
    # request: the one whose first chunk gates time-to-first-audio.  Later
    # segments emit behind seconds of already-buffered audio, and whole-WAV
    # requests only care about completion time — neither warrants slowing
    # the batch down to a warm chunk.
    ramp: bool = False
    seq: int = 0  # global submission order (FIFO within a priority class)
    # bumped on preemption so stale in-flight chunks stop crediting frames
    epoch: int = 0
    # filled during decode.  Progress lives on the SEGMENT, not the slot:
    # with early lane retirement (see _run_inner) a lane can be re-admitted
    # to a new segment while this one's final chunks are still in flight, so
    # slot-level counters would credit the wrong owner.
    chunks: list = dataclasses.field(default_factory=list)
    done: bool = False
    frames_routed: int = 0      # frames fetched & credited to this segment
    eos_step: int | None = None

    @property
    def target(self) -> int:
        """Exact frame budget: max_frames until EOS is discovered, then the
        host stop rule min(max_frames, eos_step + frames_after_eos)."""
        if self.eos_step is None:
            return self.max_frames
        return min(self.max_frames, self.eos_step + self.frames_after_eos)


@dataclasses.dataclass(eq=False)
class _Request:
    voice: VoiceState
    gen: GenParams
    out: queue.Queue
    latency_sensitive: bool = False  # streaming consumer (vs whole-WAV)
    # [N] adapter-bank mixing row (None = base model): the request's decode
    # AND text prefills run through its fine-tuned LoRA delta per slot
    lora_row: np.ndarray | None = None
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
    """Lane ownership only: which segment the lane's NEXT dispatch computes
    for, and how far its dispatch frontier has advanced.  Fetch-side progress
    is on the segment (owner snapshots route in-flight results)."""

    segment: _Segment | None = None
    dispatched: int = 0    # frames dispatched for the CURRENT segment
    base_pos: int = 0  # voice length + text tokens (for window bucketing)

    @property
    def free(self) -> bool:
        return self.segment is None


class ContinuousBatcher:
    """Owns a batched Engine and a background decode thread."""

    def __init__(self, model: TTSModel, batch_size: int = 4,
                 chunk_frames: int = 8, seed: int = 0, depth: int = 2,
                 warm_chunk: int | None = None, adapter_bank=None):
        self.model = model
        self.batch = batch_size
        self.chunk = chunk_frames
        # Multi-adapter serving (training.lora.AdapterBank): requests carry a
        # per-slot LoRA mixing row; dispatches with any adapter slot resident
        # take the lora decode programs, base-only batches keep the plain
        # ones (a zero row is an exact no-op, so mid-batch program switches
        # never change base lanes' audio)
        self.bank = adapter_bank
        # Warm-up ramp: while any active slot is still "young" (dispatched
        # fewer than ramp_frames), the loop uses this smaller chunk AND caps
        # the pipeline to one in-flight dispatch.  Rationale (measured on the
        # axon TPU, docs/performance.md): a steady-state dispatch at B=16 x
        # chunk 64 holds the device ~280 ms and depth 2 keeps two in flight,
        # so a newly admitted request's first audio could wait ~600 ms behind
        # work it cannot preempt.  Small chunks bound that backlog to tens of
        # ms while arrivals are in progress; once every slot has ~1 s of
        # audio buffered client-side, the loop returns to the big chunk.
        # None disables the ramp (warm == steady).
        self.warm_chunk = min(warm_chunk or chunk_frames, chunk_frames)
        self.ramp_frames = 2 * self.warm_chunk if self.warm_chunk < chunk_frames else 0
        # mid-size chunk used while streaming requests are resident (see the
        # chunk-size policy in _run_inner); equal to chunk_frames when the
        # ramp is disabled so tests pinning chunk_frames see one size only
        self.serve_chunk = (max(self.warm_chunk, chunk_frames // 2)
                            if self.ramp_frames else chunk_frames)
        # arrival-pressure chunk: used instead of serve_chunk while admissions
        # are WAITING (occupancy full, not yet saturated) — the smaller chunk
        # turns the loop over sooner, so retirements are discovered and the
        # waiters admitted with less in-flight backlog ahead of them
        self.press_chunk = (max(self.warm_chunk, self.serve_chunk // 2)
                            if self.ramp_frames else chunk_frames)
        # pipeline depth: dispatches in flight before the oldest is fetched.
        # Measured on the axon TPU: each dispatch has ~30 ms fixed cost and
        # fetch blocks ~10 ms — depth 2 overlaps both with device compute.
        # Cost: EOS discovery / slot retirement lag depth*chunk frames (the
        # overshoot is computed-and-discarded, same as single-stream).
        self.depth = max(1, depth)
        self.engine = Engine(model.config, model.params, batch_size=batch_size)
        if adapter_bank is not None:
            self.engine.set_adapter_bank(adapter_bank)
        self.tokenizer = model.tokenizer
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)
        self._submit: queue.Queue[_Segment] = queue.Queue()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._dead = False
        self._active: set[_Request] = set()  # requests not yet finished
        self._seq = 0  # submission counter (under _lock)
        self._waiting_n = 0  # segments drained but not yet admitted
        # observability counters (written by the decode thread / submit)
        self._stats = {"dispatches": 0, "warm_dispatches": 0,
                       "serve_dispatches": 0,
                       "frames_decoded": 0, "useful_frames": 0,
                       "early_retirements": 0, "preemptions": 0,
                       "requests_completed": 0, "requests_submitted": 0,
                       "requests_cancelled": 0}

    def warmup(self, vec_ceilings: tuple[int, ...] = (1, 2),
               parallel: int | None = None) -> None:
        """Compile every decode variant the loop can dispatch — each (chunk
        size, window bucket) pair, both the default program and the
        per-slot-vec program at the given lsd step ceilings, plus the
        text-prefill buckets — on throwaway states.  Without this, the first
        stream to cross an uncompiled combination blocks EVERY in-flight
        stream for the cold compile (minutes on remote-compile backends);
        which combination that is depends on arrival timing, so lazy
        compilation is a latency landmine.  Results persist in the JAX
        compilation cache, so a restarted server pays nothing.

        ``vec_ceilings``: power-of-two lsd ceilings to pre-compile for the
        vec path (requests overriding lsd_decode_steps/noise_clamp); (1, 2)
        covers clamp-only overrides and lsd_steps=2.  Higher overrides
        compile on first use.

        ``parallel``: jit compilation releases the GIL during the (remote)
        compile, so the ~50-variant matrix CAN compile from a thread pool —
        serial warmup walls were 5-30 min on the tunneled backend, gated on
        one compile/load round-trip at a time.  Each variant uses its own
        throwaway state, so tasks are independent.  Default is SERIAL
        (None -> POCKET_TTS_WARMUP_PARALLEL env or 1): an 8-way warmup
        coincided with a full axon-tunnel wedge (even jax.devices() hung
        afterwards) and could not be exonerated before the tunnel outage —
        opt in explicitly on backends whose compile service is known to
        handle concurrency."""
        if parallel is None:
            parallel = int(os.environ.get("POCKET_TTS_WARMUP_PARALLEL", "1"))
        engine = self.engine
        gen = self.model.gen
        key = jax.random.PRNGKey(0)
        state = engine.new_state(self.batch)
        # fused admission program (admit+prefill), one variant per text
        # bucket: otherwise created lazily at the first real admission, on
        # the decode thread.  Chained state -> stays serial (and fast: the
        # program is small).
        vs = self.model.get_voice_state().as_dict()
        zero_row = (np.zeros((self.bank.n,), np.float32)
                    if self.bank is not None else None)
        for width in tuple(getattr(engine._rcfg, "text_buckets", (8,))):
            row = jax.device_put(np.ones((1, width), np.int32))
            state = engine.admit_prefill_slot(state, 0, vs, row, 1)
            if zero_row is not None:  # the lora admission program, per bucket
                state = engine.admit_prefill_slot(state, 0, vs, row, 1,
                                                  lora_row=zero_row)
        chunks = sorted({self.warm_chunk, min(self.press_chunk, self.chunk),
                         min(self.serve_chunk, self.chunk), self.chunk})
        windows = tuple(getattr(engine._rcfg, "window_buckets", ())) + (0,)
        temps = np.full((self.batch,), gen.temp, np.float32)
        eos_th = np.full((self.batch,), gen.eos_threshold, np.float32)

        def variant(k, w, ceil, lora=False):
            # fresh state per variant: positions stay at 0 so every window
            # capacity is valid regardless of completion order
            st = engine.new_state(self.batch)
            vec = ({} if ceil is None else
                   {"lsd_vec": np.full((self.batch,), ceil, np.int32),
                    "clamp_vec": np.full((self.batch,), -1.0, np.float32)})
            if lora:  # the adapter-slot decode programs (zero rows compile
                # the same program shape real rows dispatch)
                vec["lora_w"] = np.zeros((self.batch, self.bank.n),
                                         np.float32)
            _, _, audio, _ = engine.decode_frames(
                st, key, k, gen, temps=temps, eos_thresholds=eos_th,
                window=w, **vec)
            return audio

        loras = (False, True) if self.bank is not None else (False,)
        tasks = [(k, w, c, lo) for k in chunks for w in windows
                 for c in (None, *vec_ceilings) for lo in loras]
        if parallel > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=parallel) as pool:
                audios = list(pool.map(lambda t: variant(*t), tasks))
        else:
            audios = [variant(*t) for t in tasks]
        for audio in audios:
            jax.device_get(audio)  # block_until_ready is unreliable on axon

    def idle(self) -> bool:
        """True when no request is active or queued — the server routes
        lone requests to the (~10x faster per-stream) single-stream engine
        while this holds (occupancy-adaptive serving)."""
        with self._lock:
            return not self._active and self._submit.qsize() == 0

    def stats(self) -> dict:
        """Snapshot of the decode loop's counters plus live queue depths.

        ``useful_frames`` counts frames actually emitted to consumers;
        ``frames_decoded`` counts slot-frames dispatched on segment-owned
        lanes.  Their ratio is the batch's compute efficiency — the gap is
        EOS/budget overshoot (bounded by the pipeline depth) plus
        preemption-discarded work."""
        with self._lock:
            dec = self._stats["frames_decoded"]
            return {**self._stats,
                    "useful_ratio": (round(self._stats["useful_frames"] / dec,
                                           3) if dec else None),
                    "active_requests": len(self._active),
                    "queued_segments": self._submit.qsize() + self._waiting_n,
                    "batch_size": self.batch,
                    "chunk_frames": self.chunk,
                    "dead": self._dead}

    # -- public API ----------------------------------------------------------

    def start(self) -> None:
        if self._thread is None:
            self._stop.clear()
            self._dead = False
            self._thread = threading.Thread(target=self._run, daemon=True,
                                            name="tts-batcher")
            self._thread.start()

    def stop(self, timeout: float = 600.0) -> None:
        """Stop the decode loop, waiting out any in-flight device dispatch.

        The loop checks the stop flag every iteration, but it cannot preempt
        a dispatch already executing — and on a slow backend (CPU at flagship
        dims) one 64-frame chunk can run for minutes.  Abandoning the daemon
        thread mid-XLA-call used to SIGABRT the interpreter at exit
        ("FATAL: exception not rethrown"), so we wait, loudly."""
        self._stop.set()
        if self._thread is not None:
            deadline = time.monotonic() + timeout
            while self._thread.is_alive():
                self._thread.join(
                    timeout=max(0.0, min(15.0, deadline - time.monotonic())))
                if not self._thread.is_alive():
                    break
                if time.monotonic() >= deadline:
                    logger.error(
                        "batcher decode thread still running after %.0fs; "
                        "abandoning it — the process may abort at exit if "
                        "the device call never returns", timeout)
                    break
                logger.warning("batcher stop(): waiting for the in-flight "
                               "device dispatch to finish")
            self._thread = None
        # a stopped batcher must fail open exactly like a crashed one: the
        # loop's shutdown drain delivers whatever was in flight, but anything
        # still unfinished would otherwise block its consumer for the full
        # read timeout, and a later submit() would enqueue into a void
        self._fail_open(RuntimeError("batcher stopped"))

    def submit(self, text: str, voice: VoiceState | None = None,
               gen: GenParams | None = None, *, pauses: bool = True,
               latency_sensitive: bool = True,
               frames_after_eos: int | None = None,
               adapter: str | None = None) -> queue.Queue:
        """Enqueue a request; returns a queue of float32 chunks ending with a
        sentinel (use :meth:`stream` for an iterator).

        ``pauses=True`` gives generate_with_pauses semantics ([pause:Xms] and
        natural comma/ellipsis silence); ``False`` matches plain generate.

        ``latency_sensitive=True`` (streaming consumers) gives the request's
        first text segment the warm-chunk admission ramp so its first audio
        surfaces in ~one small dispatch; ``False`` (whole-WAV consumers)
        skips the ramp and optimizes pure completion time.

        ``frames_after_eos``: extra frames synthesized past EOS detection for
        EVERY text segment; None derives it per sentence from the text length
        (same override semantics as TTSModel.generate, tts.py).

        ``adapter``: a name from the batcher's AdapterBank — this request's
        prefill + decode run through that fine-tuned LoRA delta on its slot
        while other slots concurrently serve other adapters (or the base
        model).  NOTE the voice state should be prefilled through the SAME
        adapter's backbone (the server keeps per-adapter voice caches)."""
        if not text or not text.strip():
            raise ValueError("Text prompt cannot be empty")
        if self._dead:
            raise RuntimeError("batcher decode loop has crashed; restart it")
        lora_row = None
        if adapter is not None:
            if self.bank is None:
                raise ValueError(f"adapter {adapter!r} requested but this "
                                 f"batcher has no adapter bank")
            lora_row = self.bank.row(adapter)  # raises KeyError if unknown
        if voice is None:
            voice = self.model.get_voice_state()
        gen = gen or self.model.gen
        req = _Request(voice=voice, gen=gen, out=queue.Queue(),
                       latency_sensitive=latency_sensitive,
                       lora_row=lora_row)
        req.out._pocket_request = req  # lets stream() cancel on disconnect

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
                first_text = not any(s.kind == "text" for s in req.segments)
                with self._lock:
                    self._seq += 1
                    seq = self._seq
                seg = _Segment(req, index, "text", tokens=tokens,
                               n_tokens=n_tokens,
                               max_frames=max(0, min(max_frames, room)),
                               frames_after_eos=(fae + 2
                                                 if frames_after_eos is None
                                                 else frames_after_eos),
                               ramp=latency_sensitive and first_text, seq=seq)
                seg.d_tokens = self.engine.pad_token_row(tokens)
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
            # re-check under the lock: the loop may have crashed (or stop()
            # run) during tokenization/upload above — registering now would
            # miss the fail-open sweep and strand the consumer for the full
            # read timeout
            if self._dead:
                raise RuntimeError("batcher decode loop has crashed; restart it")
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
               timeout: float = 300.0, *, pauses: bool = True,
               adapter: str | None = None) -> Iterator[np.ndarray]:
        """Iterator of audio chunks.  Abandoning the iterator (client
        disconnect) CANCELS the request: its remaining segments retire
        instead of decoding to completion in occupied slots."""
        req_out = self.submit(text, voice, gen, pauses=pauses,
                              adapter=adapter)
        req = getattr(req_out, "_pocket_request", None)
        try:
            while True:
                try:
                    item = req_out.get(timeout=timeout)
                except queue.Empty:
                    raise TimeoutError(
                        f"no audio chunk within {timeout}s "
                        f"(batcher stats: {self.stats()})") from None
                if item is _SENTINEL:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            if req is not None and not req.finished:
                self._cancel(req)

    def _cancel(self, req: "_Request") -> None:
        """Abandon a request: mark every segment done (admission drops them,
        in-flight routing skips them, the loop-top sweep frees their slots)."""
        with self._lock:
            for seg in req.segments:
                seg.done = True
                seg.chunks.clear()
            req.finished = True
            self._active.discard(req)
            self._stats["requests_cancelled"] += 1

    def generate(self, text: str, voice: VoiceState | None = None,
                 gen: GenParams | None = None, *, pauses: bool = True,
                 adapter: str | None = None) -> np.ndarray:
        out = self.submit(text, voice, gen, pauses=pauses,
                          latency_sensitive=False, adapter=adapter)
        return self._drain(out)

    def _drain(self, out: queue.Queue) -> np.ndarray:
        """Collect a submitted request's chunks into one array."""
        req = getattr(out, "_pocket_request", None)
        chunks = []
        try:
            while True:
                try:
                    item = out.get(timeout=300.0)
                except queue.Empty:
                    raise TimeoutError(
                        f"no audio chunk within 300s "
                        f"(batcher stats: {self.stats()})") from None
                if item is _SENTINEL:
                    break
                if isinstance(item, Exception):
                    raise item
                chunks.append(item)
        finally:
            # same contract as stream(): an abandoned request (timeout or any
            # other raise) must CANCEL — otherwise its remaining segments keep
            # occupying slots, decode to completion, and pump chunks into a
            # queue nobody reads
            if req is not None and not req.finished:
                self._cancel(req)
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def _cancel_out(self, out: queue.Queue | None) -> None:
        if out is None:
            return
        req = getattr(out, "_pocket_request", None)
        if req is not None and not req.finished:
            self._cancel(req)

    def generate_batch(self, texts, voices=None, gens=None, *,
                       pauses: bool = True, frames_after_eos: int | None = None,
                       return_exceptions: bool = False,
                       on_result=None, collect: bool = True,
                       adapters=None) -> list:
        """Synthesize many utterances concurrently at aggregate throughput.

        Every item is submitted up-front so the decode loop keeps all
        ``batch_size`` slots busy (aggregate RTF ~2x single-stream at B=16,
        docs/performance.md); results come back in input order.  This is the
        offline-synthesis surface — an extension beyond the reference, which
        only serves concurrency over HTTP — and dispatches the same decode
        programs as the server's batched tier.

        ``voices`` / ``gens``: ``None`` (model defaults), one value shared by
        every item, or a list/tuple with one entry per item (``None`` entries
        fall back to the default).  ``VoiceState``/``GenParams`` are frozen
        dataclasses, never sequences, so the shapes are unambiguous.

        ``return_exceptions=False`` (default): the first failing item cancels
        everything outstanding and re-raises.  ``True``: asyncio.gather
        semantics — a failed item holds its exception in the result list and
        the rest still complete.  ``on_result(index, audio_or_exception)``
        fires as each item finishes, in input order, from the calling thread.

        ``collect=False`` drops each item's audio right after its
        ``on_result`` call (its slot in the returned list is None; exceptions
        are still recorded) — a 10k-utterance manifest would otherwise pin
        every float32 waveform in memory until the call returns.

        ``adapters``: per-item AdapterBank names (None / shared / per-item
        list like ``voices``) — items with different fine-tuned voices
        synthesize concurrently in one decode loop.
        """
        texts = list(texts)
        n = len(texts)

        def per_item(x, name):
            if isinstance(x, (list, tuple)):
                if len(x) != n:
                    raise ValueError(f"{name} has {len(x)} entries for "
                                     f"{n} texts")
                return list(x)
            return [x] * n

        voices = per_item(voices, "voices")
        gens = per_item(gens, "gens")
        adapters = per_item(adapters, "adapters")

        outs: list[queue.Queue | None] = [None] * n
        results: list = [None] * n
        try:
            for i in range(n):
                try:
                    outs[i] = self.submit(texts[i], voices[i], gens[i],
                                          pauses=pauses,
                                          latency_sensitive=False,
                                          frames_after_eos=frames_after_eos,
                                          adapter=adapters[i])
                except Exception as e:  # noqa: BLE001
                    if not return_exceptions:
                        raise
                    results[i] = e
            for i in range(n):
                if outs[i] is None:  # submit failed, exception recorded
                    if on_result is not None:
                        on_result(i, results[i])
                    continue
                try:
                    results[i] = self._drain(outs[i])
                except Exception as e:  # noqa: BLE001
                    if not return_exceptions:
                        raise
                    results[i] = e
                finally:
                    outs[i] = None  # drained or cancelled by _drain
                if on_result is not None:
                    on_result(i, results[i])
                if not collect and not isinstance(results[i], Exception):
                    results[i] = None
        finally:
            # fail-fast path: everything not yet drained must be cancelled or
            # its segments keep occupying slots after the caller has given up
            for out in outs:
                self._cancel_out(out)
        return results

    # -- decode loop -----------------------------------------------------------

    def _run(self) -> None:
        try:
            self._run_inner()
        except Exception as e:  # noqa: BLE001
            logger.exception("batcher decode loop crashed")
            self._fail_open(RuntimeError(f"batcher crashed: {e!r}"))

    def _fail_open(self, error: Exception) -> None:
        """Surface ``error`` to EVERY unfinished request (queued, in-slot, or
        mid-stream) and refuse new submissions."""
        self._dead = True
        with self._lock:
            while True:
                try:
                    self._submit.get_nowait()
                except queue.Empty:
                    break
            for req in list(self._active):
                if not req.finished:
                    req.failed = True
                    req.finished = True
                    req.out.put(error)
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
        # [B, N] per-slot adapter mixing rows (bank mode); freed lanes keep
        # stale rows like temps — their output is discarded either way, and
        # re-admission always rewrites the row
        low = (np.zeros((self.batch, self.bank.n), np.float32)
               if self.bank is not None else None)
        vecs = None        # device copies of the per-slot vectors
        vecs_dirty = True  # re-uploaded only when slot occupancy changes
        waiting: list[_Segment] = []  # decode-thread-only admission queue
        pending: list = []  # in-flight (owners, k, audio, is_eos) to fetch

        while not self._stop.is_set():
            # 0. drain new submissions into the priority queue: first
            # segments of streaming requests admit before anything else
            # (their first chunk gates time-to-first-audio); FIFO otherwise.
            while True:
                try:
                    waiting.append(self._submit.get_nowait())
                except queue.Empty:
                    break
            # cancelled/finished segments free their slot; EARLY RETIREMENT
            # (VERDICT r4 #3): a lane whose dispatch frontier already covers
            # its segment's exact budget (max_frames, or eos_step + fae once
            # EOS is discovered) gains nothing from further dispatches — free
            # it NOW, up to depth chunks before its results finish fetching,
            # so a queued segment takes over the lane instead of it computing
            # garbage.  Owner snapshots keep in-flight routing correct; the
            # engine state is functional, so re-admission cannot corrupt
            # results already dispatched.
            for s in slots:
                if s.segment is None:
                    continue
                if s.segment.done:
                    s.segment = None
                elif s.dispatched >= s.segment.target:
                    s.segment = None
                    with self._lock:
                        self._stats["early_retirements"] += 1
            waiting = [s for s in waiting if not s.done]
            waiting.sort(key=lambda s: (not s.ramp, s.seq))

            # 1a. latency preemption: a waiting ramp segment with no free
            # slot evicts a NON-HEAD segment (a later segment of a request
            # still streaming an earlier one — nothing it produced has been
            # emitted).  The victim re-queues and restarts from its text
            # prefill; the discarded frames are the price of bounded
            # time-to-first-audio at full occupancy.  16 distinct streaming
            # heads = true saturation: nothing is preemptable, arrivals wait.
            free = [i for i, s in enumerate(slots) if s.free]
            n_ramp_waiting = sum(1 for s in waiting if s.ramp)
            while n_ramp_waiting > len(free):
                victim_i = self._pick_victim(slots)
                if victim_i is None:
                    break
                victim = slots[victim_i].segment
                with self._lock:
                    victim.epoch += 1  # stale in-flight routing ignores it
                    victim.chunks.clear()
                    self._stats["preemptions"] += 1
                slots[victim_i].segment = None
                waiting.append(victim)
                free.append(victim_i)
            waiting.sort(key=lambda s: (not s.ramp, s.seq))

            # 1b. admit into free slots: ONE fused admit+prefill dispatch per
            # admission (voice install + single-lane text prefill; the token
            # row was pre-uploaded at submit time) — K admissions cost K
            # programs instead of K+1, and no h2d rides the critical path
            for i in free:
                seg = None
                while waiting:  # skip segments cancelled since the drain
                    cand = waiting.pop(0)
                    if not cand.done:
                        seg = cand
                        break
                if seg is None:
                    break
                slot = slots[i]
                state = engine.admit_prefill_slot(
                    state, i, seg.request.voice.as_dict(),
                    seg.d_tokens, seg.n_tokens,
                    lora_row=seg.request.lora_row)
                if low is not None:
                    row = seg.request.lora_row
                    low[i] = 0.0 if row is None else row
                slot.segment = seg
                slot.dispatched = 0
                seg.frames_routed = 0   # fresh start (preemption re-queues)
                seg.eos_step = None
                slot.base_pos = seg.request.voice.length + seg.n_tokens
                temps[i] = seg.request.gen.temp
                eos_th[i] = seg.request.gen.eos_threshold
                lsd[i] = max(1, seg.request.gen.lsd_decode_steps)
                nc = seg.request.gen.noise_clamp
                clamp[i] = nc if nc is not None else -1.0
                vecs_dirty = True
            self._waiting_n = len(waiting)

            active = [s for s in slots if not s.free]
            if not active:
                while pending:
                    self._route(slots, *pending.pop(0), frame_size)
                if self._stop.wait(0.005):
                    break
                continue

            k, depth, ramping = self._chunk_policy(
                active, len(waiting),
                sum(1 for s in waiting if s.ramp))
            # window must cover the DISPATCHED frontier, not the routed one —
            # with pipelining the routed frontier lags by up to depth chunks, and a
            # too-small window would clamp KV writes onto the window edge
            # (silent cache corruption)
            window = engine.window_for(
                max(s.base_pos + s.dispatched for s in active), k)
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
            # temps/eos ride EVERY dispatch: cache them on device and
            # re-upload only when slot occupancy changed (a numpy argument
            # would otherwise ride the tunnel per dispatch).  lsd/clamp stay
            # numpy — the vec path inspects them eagerly on host
            # (engine.decode_frames: validity check + pow2 step ceiling), so
            # device copies would force blocking device->host reads there.
            if vecs_dirty or vecs is None:
                vecs = jax.device_put(
                    (temps.copy(), eos_th.copy(),
                     low.copy() if low is not None else np.zeros(0)))
                vecs_dirty = False
            d_temps, d_eos, d_low = vecs
            # lora decode programs only while an adapter segment is resident:
            # a zero row is an exact no-op, so base lanes are bit-identical
            # under either program and the plain path stays zero-overhead
            lora_on = low is not None and any(
                s.segment is not None
                and s.segment.request.lora_row is not None for s in slots)
            lora_kw = {"lora_w": d_low} if lora_on else {}
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
                    state, key, k, gen, temps=d_temps,
                    eos_thresholds=d_eos, window=window, **lora_kw)
            else:
                state, _, audio, is_eos = engine.decode_frames(
                    state, key, k, gen, temps=d_temps,
                    eos_thresholds=d_eos, window=window, lsd_vec=lsd,
                    clamp_vec=clamp, **lora_kw)
            for s in active:
                s.dispatched += k
            with self._lock:
                self._stats["dispatches"] += 1
                if ramping:
                    self._stats["warm_dispatches"] += 1
                elif k < self.chunk:
                    self._stats["serve_dispatches"] += 1
                self._stats["frames_decoded"] += k * len(active)
            owners = [(s.segment, s.segment.epoch) if s.segment else None
                      for s in slots]
            pending.append((owners, k, audio, is_eos))
            while len(pending) > depth:
                if self._route(slots, *pending.pop(0), frame_size):
                    vecs_dirty = True  # a retirement changed slot occupancy
        while pending:
            self._route(slots, *pending.pop(0), frame_size)

    def _chunk_policy(self, active, n_waiting: int,
                      n_ramp_waiting: int = 0) -> tuple[int, int, bool]:
        """(chunk frames, pipeline depth, ramping) for the next dispatch.
        Smallest applicable chunk wins (each size is its own compiled
        program):

        * warm chunk while any ramp slot is young — the newcomer's first
          audio is never stuck behind deep in-flight steady chunks.  Depth 0
          (fetch IMMEDIATELY after dispatch, no pipelining) until every ramp
          slot has emitted its first chunk: on this backend a result fetch
          rides the FIFO tunnel BEHIND any already-enqueued dispatch, so at
          depth 1 the first chunk's audio waits out a whole second chunk's
          execution (instrumented idle admission: ~300-400 ms e2e vs the
          ~130 ms sum of admit+chunk+fetch walls; depth 0 removes the
          difference).  Once first audio is out, depth 1 restores overlap;
        * pressure chunk (16) + depth 1 while a STREAMING-FIRST segment is
          waiting for admission but the queue hasn't saturated — occupancy is
          full (preemption found no victim), so it admits only on a
          retirement; the smaller chunk halves both the loop turnover
          (retirement discovery) and the in-flight backlog it then waits out
          (VERDICT r3 #2).  Whole-WAV backlog does NOT trigger this: nothing
          in it is latency-sensitive, so it drains at full throughput;
        * serve chunk (32) + depth 1 while any STREAMING request is resident
          — the in-flight backlog a future arrival waits out is ONE half-size
          chunk (measured p90 350 -> ~250 ms at B=16; wall unchanged, the
          fetch still overlaps the executing chunk);
        * throughput chunk (64) + full depth for pure whole-WAV load.

        Saturation guard: with more STREAMING-FIRST segments queued than
        slots, every streaming arrival waits out the backlog regardless —
        bounded first-chunk latency is already lost, so stop paying the
        ramp's throughput tax and drain at full chunk size (a sustained
        arrival storm would otherwise pin the batch at warm chunks, ~0.48 vs
        0.27 ms/slot-frame; observed in a soak).  Counted over ramp waiters,
        not the whole backlog: a deep whole-WAV queue is not an arrival
        storm, and a streamer admitted into it via preemption still deserves
        its (ramp_frames-bounded) warm ramp."""
        saturated = n_ramp_waiting > self.batch
        ramping = (not saturated
                   and any(s.dispatched < self.ramp_frames and s.segment.ramp
                           for s in active))
        streamy = any(s.segment.request.latency_sensitive for s in active)
        if ramping:
            first_audio_pending = any(
                s.segment.frames_routed == 0 and s.segment.ramp
                for s in active)
            return self.warm_chunk, (0 if first_audio_pending else 1), True
        if n_ramp_waiting and not saturated:
            return min(self.press_chunk, self.chunk), 1, False
        if streamy and not saturated:
            return min(self.serve_chunk, self.chunk), 1, False
        return self.chunk, self.depth, False

    @staticmethod
    def _pick_victim(slots) -> int | None:
        """Least-progress active slot whose segment has emitted nothing (a
        later segment of a request still streaming an earlier one).  Head
        segments — whose chunks may already be in the client's ears — and
        ramp segments are never evicted."""
        best, best_i = None, None
        for i, s in enumerate(slots):
            seg = s.segment
            if seg is None or seg.ramp:
                continue
            if seg.index <= seg.request.emitted_upto:
                continue
            if best is None or seg.frames_routed < best:
                best, best_i = seg.frames_routed, i
        return best_i

    def _route(self, slots, owners, k, audio, is_eos, frame_size) -> bool:
        """Fetch one chunk's results and route frames to the segments that
        owned each lane AT DISPATCH TIME.  Returns True if a slot retired
        (occupancy changed).  An epoch mismatch means the owner was preempted
        after this chunk was dispatched — its lane data is discarded.
        Progress is credited on the SEGMENT: with early retirement the lane
        may already belong to a different segment by fetch time."""
        audio, eos = jax.device_get((audio, is_eos))
        audio = self.engine.wire_to_float(audio)
        eos = np.asarray(eos)
        freed = False
        with self._lock:
            touched_requests = set()
            for i, slot in enumerate(slots):
                if owners[i] is None:
                    continue
                seg, epoch = owners[i]
                if seg.done or seg.epoch != epoch:
                    continue
                if seg.eos_step is None:
                    hits = np.nonzero(eos[i])[0]
                    if hits.size:
                        seg.eos_step = seg.frames_routed + int(hits[0])
                emit = min(seg.target, seg.frames_routed + k) \
                    - seg.frames_routed
                if emit > 0:
                    seg.chunks.append(audio[i, : emit * frame_size].copy())
                    self._stats["useful_frames"] += emit
                seg.frames_routed += k
                if seg.frames_routed >= seg.target:
                    seg.done = True
                    if slot.segment is seg:  # not already early-retired
                        slot.segment = None
                        freed = True
                touched_requests.add(seg.request)
            for req in touched_requests:
                req.pump()
                if req.finished:
                    self._active.discard(req)
                    self._stats["requests_completed"] += 1
        return freed


def batched_tts(model: TTSModel, batch_size: int = 4,
                chunk_frames: int = 8, depth: int = 2,
                warm_chunk: int | None = None,
                adapter_bank=None) -> ContinuousBatcher:
    b = ContinuousBatcher(model, batch_size, chunk_frames, depth=depth,
                          # warm 4 beats 8 under the depth-0 pre-first-audio
                          # policy (A/B at B=16: p50 med 170 vs 191 ms, p90
                          # 229 vs 256); the older "warm 4 worse" result was
                          # an artifact of the fetch-behind-dispatch ride
                          warm_chunk=warm_chunk or min(4, chunk_frames),
                          adapter_bank=adapter_bank)
    b.start()
    return b
