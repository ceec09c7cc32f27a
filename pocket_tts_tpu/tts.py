"""TTSModel — the public orchestrator.

API mirrors the reference contract (README.md:106-153 of the reference;
crates/pocket-tts/src/tts_model.rs): ``load`` / ``load_with_params`` /
``get_voice_state*`` / ``generate`` / ``generate_stream`` /
``generate_stream_long`` / ``generate_with_pauses`` / ``estimate_generation_steps``.

Host-side orchestration only — all compute lives in compiled programs owned by
``runtime.Engine``.  A voice state is an immutable pytree snapshot of the FlowLM
KV cache after conditioning prefill (the same "the KV cache *is* the voice"
design as voice_state.rs).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from pathlib import Path
from typing import Iterator

import jax
import numpy as np

from pocket_tts_tpu import audio as audio_io
from pocket_tts_tpu import pause as pause_mod
from pocket_tts_tpu import text as text_mod
from pocket_tts_tpu import weights as weights_mod
from pocket_tts_tpu.config import (
    DEFAULT_EOS_THRESHOLD,
    DEFAULT_LSD_DECODE_STEPS,
    DEFAULT_NOISE_CLAMP,
    DEFAULT_TEMPERATURE,
    DEFAULT_VARIANT,
    Config,
    load_variant,
)
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.runtime.engine import Engine, GenParams

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class VoiceState:
    """Immutable voice snapshot: prefilled KV cache + cursor.

    ``length`` mirrors ``pos`` on the host so generation never has to sync the
    device just to know how much cache room remains."""

    kc: jax.Array
    vc: jax.Array
    pos: jax.Array
    length: int = 0

    def as_dict(self) -> dict:
        return {"kc": self.kc, "vc": self.vc, "pos": self.pos}


class TTSModel:
    def __init__(self, cfg: Config, params: dict, *, gen: GenParams,
                 has_real_weights: bool, seed: int = 0):
        self.config = cfg
        self.params = params
        self.gen = gen
        self.has_real_weights = has_real_weights
        self.is_quantized = False
        self.engine = Engine(cfg, params, batch_size=1)
        # staged codec opt-in lives HERE, not in Engine.__init__: only the
        # single-stream TTS path routes state through reset_for_segment's
        # device placement; a ContinuousBatcher's engine (even batch_size=1)
        # must keep the fused single-device program
        if (os.environ.get("POCKET_TTS_STAGE_CODEC", "0") == "1"
                and len(jax.devices()) > 1):
            self.engine.enable_staged_codec(jax.devices()[1])
        self.tokenizer = text_mod.load_tokenizer(None)
        # mutable holder so with_params() clones share and ADVANCE one RNG
        # stream (torch's process-global generator semantics in the reference)
        self._rng = {"key": jax.random.PRNGKey(seed)}
        # lazily built, shared across requests: voice states are immutable
        # (reset/prefill copy, never donate, their kc/vc inputs), and a
        # ~50 MB fresh cache per unconditioned request exhausted HBM under
        # sustained serving load.  A mutable HOLDER (like _rng) so
        # with_params()/quantize_model clones share ONE cached state — a
        # per-clone attribute would re-allocate per request and re-open the
        # exhaustion.  Safe to share across clones: the empty state is
        # all-zero kc/vc + pos 0, independent of params/gen.
        self._empty_voice: dict = {"vs": None}

    # -- loading -----------------------------------------------------------

    @classmethod
    def load(cls, variant: str = DEFAULT_VARIANT, **kwargs) -> "TTSModel":
        return cls.load_with_params(variant, **kwargs)

    @classmethod
    def load_with_params(
        cls,
        variant: str = DEFAULT_VARIANT,
        temp: float = DEFAULT_TEMPERATURE,
        lsd_decode_steps: int = DEFAULT_LSD_DECODE_STEPS,
        noise_clamp: float | None = DEFAULT_NOISE_CLAMP,
        eos_threshold: float = DEFAULT_EOS_THRESHOLD,
        seed: int = 0,
        voice_prompt_chunk_frames: int | None = None,
        max_seq: int | None = None,
        transport_format: str | None = None,
        kv_dtype: str | None = None,
    ) -> "TTSModel":
        """``voice_prompt_chunk_frames`` overrides the streaming voice-encode
        chunk size (the reference's load-time knob, tts_model.rs:59/:562-577);
        None keeps the config default (240 frames).

        ``max_seq`` overrides the FlowLM KV-cache capacity (default 1024
        positions = voice prompt + text + generation; the reference has the
        same dense-cache bound via init_states(1, 1000)).  Longer voice
        prompts than ~71 s need a bigger cache: each +256 positions admits
        +20 s of prompt for ~24 MB more KV memory.  Decode cost is unchanged
        at short positions (windowed attention buckets are re-derived), but
        each newly reached window bucket is one compile."""
        cfg = load_variant(variant)
        cfg = cls._apply_config_overrides(
            cfg, transport_format=transport_format, kv_dtype=kv_dtype,
            voice_prompt_chunk_frames=voice_prompt_chunk_frames,
            max_seq=max_seq)
        plans = MimiPlans(cfg.mimi)
        params, real = weights_mod.load_params(cfg, plans, variant=variant)
        gen = GenParams(temp=temp, lsd_decode_steps=lsd_decode_steps,
                        noise_clamp=noise_clamp, eos_threshold=eos_threshold)
        return cls(cfg, params, gen=gen, has_real_weights=real, seed=seed)

    @staticmethod
    def _apply_config_overrides(cfg, *, transport_format=None, kv_dtype=None,
                                voice_prompt_chunk_frames=None, max_seq=None):
        """Runtime-config overrides shared by every loader entry point.

        * ``transport_format`` — device->host wire format: "int16" (exact) or
          "mulaw" (half the fetch bytes at ~37 dB SNR; ops/mulaw.py).  Kwarg
          wins over the POCKET_TTS_TRANSPORT env var; config default otherwise.
        * ``kv_dtype`` — FlowLM KV-cache storage dtype: "float8_e4m3" halves
          decode-attention HBM reads (opt-in; see RuntimeConfig.kv_dtype).
          Kwarg wins over POCKET_TTS_KV_DTYPE.
        * ``voice_prompt_chunk_frames`` / ``max_seq`` — see load_with_params.
        """
        transport = transport_format or os.environ.get("POCKET_TTS_TRANSPORT")
        if transport is not None:
            cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
                cfg.runtime, transport_format=transport))
        kvd = kv_dtype or os.environ.get("POCKET_TTS_KV_DTYPE")
        if kvd is not None:
            cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
                cfg.runtime, kv_dtype=kvd))
        if voice_prompt_chunk_frames is not None:
            cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
                cfg.runtime,
                voice_prompt_chunk_frames=voice_prompt_chunk_frames))
        if max_seq is not None:
            if max_seq < 256:
                raise ValueError(f"max_seq must be >= 256, got {max_seq}")
            cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
                cfg.runtime, max_seq=max_seq,
                window_buckets=tuple(range(256, max_seq, 256))))
        return cfg

    _GEN_KEYS = ("temp", "lsd_decode_steps", "noise_clamp", "eos_threshold")
    _CFG_KEYS = ("transport_format", "kv_dtype", "voice_prompt_chunk_frames",
                 "max_seq")

    @classmethod
    def _parse_loader_kwargs(cls, cfg, kwargs):
        """(cfg, gen, seed) for the **kwargs loaders (load_from_bytes /
        load_quantized): the same GenParams + runtime overrides as
        load_with_params, and unknown keys raise instead of being silently
        dropped (a typo'd kwarg previously vanished; review finding r4)."""
        kw = dict(kwargs)
        gen = GenParams(**{k: kw.pop(k) for k in cls._GEN_KEYS if k in kw})
        seed = kw.pop("seed", 0)
        cfg = cls._apply_config_overrides(
            cfg, **{k: kw.pop(k) for k in cls._CFG_KEYS if k in kw})
        if kw:
            raise TypeError(f"unknown load kwargs: {sorted(kw)}")
        return cfg, gen, seed

    @classmethod
    def load_from_bytes(cls, weights_bytes: bytes,
                        variant: str = DEFAULT_VARIANT, **kwargs) -> "TTSModel":
        """Construct from in-memory safetensors bytes (the reference's WASM
        loader entry, tts_model.rs:239-276).  Genuinely in-memory: the bytes
        never touch the filesystem."""
        cfg, gen, seed = cls._parse_loader_kwargs(load_variant(variant), kwargs)
        sd = weights_mod.load_safetensors_bytes(weights_bytes)
        params = weights_mod.convert_tts_state_dict(sd, cfg, MimiPlans(cfg.mimi))
        return cls(cfg, params, gen=gen, has_real_weights=True, seed=seed)

    @classmethod
    def load_quantized(cls, path: str | Path,
                       variant: str = DEFAULT_VARIANT, **kwargs) -> "TTSModel":
        """Load a real int8 checkpoint (runtime.quantize.save_quantized).

        The reference's ``load_quantized`` is a placeholder that loads fp32
        (tts_model.rs:122-179, is_quantized() returns false); here the weights
        are genuinely int8-in-HBM."""
        from pocket_tts_tpu.runtime.quantize import load_quantized

        cfg, gen, seed = cls._parse_loader_kwargs(load_variant(variant), kwargs)
        params = load_quantized(weights_mod.resolve_uri(path))
        model = cls(cfg, params, gen=gen, has_real_weights=True, seed=seed)
        model.is_quantized = True
        return model

    def with_params(self, **overrides) -> "TTSModel":
        """Cheap per-request override clone (shares params/engine;
        reference: handlers.rs:147-160).

        ``None`` means "not overridden" (the server passes absent JSON fields
        as None), so it cannot express "unclamp noise" — pass
        ``noise_clamp=-1`` for that (GenParams normalizes negatives to None,
        matching the per-slot clamp_vec convention)."""
        clone = object.__new__(TTSModel)
        clone.__dict__.update(self.__dict__)
        clone.gen = dataclasses.replace(self.gen, **{
            k: v for k, v in overrides.items() if v is not None})
        return clone

    @property
    def sample_rate(self) -> int:
        return self.config.mimi.sample_rate

    @property
    def frame_size(self) -> int:
        return self.config.mimi.frame_size

    # -- voice states --------------------------------------------------------

    def get_voice_state(self, source: str | Path | bytes | None = None,
                        truncate: bool = False,
                        overflow: str | None = None) -> VoiceState:
        """Voice state from ``source``, or the unconditioned (empty) state.

        ``source`` may be a WAV path/bytes (runs the Mimi encoder — the
        reference's ``get_voice_state(path)``, tts_model.rs:449) or an
        ``audio_prompt`` safetensors path (the stock-voice artifact,
        tts_model.rs:465-501).  ``overflow``: over-budget prompt policy
        (see get_voice_state_from_audio)."""
        if source is not None:
            if (isinstance(source, (str, Path))
                    and str(source).endswith(".safetensors")):
                return self.get_voice_state_from_prompt_file(source)
            return self.get_voice_state_from_wav(source, truncate=truncate,
                                                 overflow=overflow)
        if self._empty_voice["vs"] is None:
            st = self.engine.new_state()
            self._empty_voice["vs"] = VoiceState(st["kc"], st["vc"],
                                                 st["pos"], 0)
        return self._empty_voice["vs"]

    def get_voice_state_from_wav(self, path: str | Path | bytes,
                                 truncate: bool = False,
                                 overflow: str | None = None) -> VoiceState:
        wav, sr = audio_io.read_wav(path)
        if truncate:
            wav = wav[..., : 30 * sr]
        wav = audio_io.convert_audio(wav, sr, self.sample_rate, 1)
        return self.get_voice_state_from_audio(wav, overflow=overflow)

    def get_voice_state_from_audio(self, wav: np.ndarray,
                                   overflow: str | None = None) -> VoiceState:
        """24 kHz mono waveform -> voice state via the Mimi encoder + speaker
        projection + conditioning prefill (tts_model.rs:504-560).

        ``overflow`` controls prompts longer than the cache budget
        (max_seq minus the generation reserve, ~71 s at the default 1024 —
        the reference shares the bound and truncates, tts_model.rs:530):

        * ``"truncate"`` (default, reference behavior): keep the prompt head.
        * ``"compress"``: encode the WHOLE prompt, then keep the first
          budget/4 frames (the speaker-identity onset — the "attention sink"
          prefix streaming LLMs must retain, Xiao et al. arXiv:2309.17453)
          plus the most recent 3·budget/4 frames, prefilled contiguously.
          A >71 s voice keeps both how the speaker STARTS and how they sound
          NOW, instead of losing the entire recent half.  One-time host
          round-trip of the full conditioning per voice.  For exact long
          prompts use ``load_with_params(max_seq=<bigger>)`` instead — this
          mode is for a fixed cache.

        ``overflow=None`` takes the process default from
        ``POCKET_TTS_VOICE_OVERFLOW`` (itself defaulting to "truncate"), so
        servers/CLIs inherit the policy without threading a flag through
        every voice-resolution path.
        """
        if overflow is None:
            overflow = os.environ.get("POCKET_TTS_VOICE_OVERFLOW", "truncate")
        if overflow not in ("truncate", "compress"):
            raise ValueError(f"overflow must be 'truncate' or 'compress', "
                             f"got {overflow!r}")
        if overflow == "compress":
            cond, n_frames = self.engine.encode_voice(wav, cap=False)
            budget = (self.engine._rcfg.max_seq - self.engine.prompt_reserve)
            if n_frames > budget:
                sink = budget // 4
                recent = budget - sink
                # host-side selection: a device gather would compile per
                # distinct prompt length (seconds each on remote-compile
                # backends); the f32 fetch is a one-time per-voice cost
                full = np.asarray(jax.device_get(cond), np.float32)
                cond = np.concatenate(
                    [full[:, :sink], full[:, n_frames - recent: n_frames]],
                    axis=1)
                logger.info(
                    "voice prompt %d frames > %d budget: compressed to "
                    "%d-frame sink + %d-frame recency", n_frames, budget,
                    sink, recent)
                n_frames = budget
        else:
            cond, n_frames = self.engine.encode_voice(wav)
        return self._prefill_voice(cond, n_frames)

    def get_voice_state_from_prompt(self, prompt: np.ndarray) -> VoiceState:
        """From a precomputed ``audio_prompt`` latent [1, T, d_model] — the
        format of the stock-voice safetensors (tts_model.rs:465-501)."""
        prompt = np.asarray(prompt, np.float32)
        if prompt.ndim == 2:
            prompt = prompt[None]
        return self._prefill_voice(prompt, prompt.shape[1])

    def get_voice_state_from_prompt_file(self, path: str | Path) -> VoiceState:
        from safetensors import safe_open

        with safe_open(str(path), framework="numpy") as f:
            prompt = f.get_tensor("audio_prompt").astype(np.float32)
        return self.get_voice_state_from_prompt(prompt)

    def save_voice_prompt(self, wav: np.ndarray, path: str | Path) -> None:
        """Encode a 24 kHz waveform and save the conditioning as an
        ``audio_prompt`` safetensors — the stock-voice artifact format
        (tts_model.py:624-628), loadable via get_voice_state_from_prompt_file."""
        from safetensors.numpy import save_file

        cond, n_frames = self.engine.encode_voice(wav)
        # slice the bucket padding off on host, after the fetch (a device
        # slice would compile per distinct prompt length)
        save_file({"audio_prompt": np.asarray(cond, np.float32)[:, :n_frames]},
                  str(path))

    def _prefill_voice(self, cond, n_frames: int,
                       base: VoiceState | None = None) -> VoiceState:
        # prefill only reads/updates kc/vc/pos, so a base snapshot's dict is a
        # sufficient starting state (no fresh cache allocation needed)
        st = self.engine.new_state() if base is None else dict(base.as_dict())
        base_len = 0 if base is None else base.length
        # conditioning that cannot fit alongside the generation reserve is
        # clipped to its MOST RECENT frames — writing past the cache would
        # silently corrupt the state and generation would emit nothing
        room = (self.engine._rcfg.max_seq - self.engine.prompt_reserve
                - base_len)
        if n_frames > room:
            logger.warning(
                "voice conditioning (%d frames) exceeds the %d-position "
                "cache budget; keeping the most recent %d frames — load "
                "with max_seq=<bigger> for longer prompts",
                n_frames, self.engine._rcfg.max_seq, max(0, room))
            cond = cond[:, n_frames - max(0, room): n_frames]
            n_frames = max(0, room)
        # conditioning longer than the largest prompt bucket prefills in
        # bucket-sized pieces — positions continue from the cache cursor, so
        # chunked prefill equals one-shot prefill.  cond may carry bucket
        # padding beyond n_frames (engine.encode_voice); slices land on
        # max_bucket strides so the eager-slice shape set stays tiny, and
        # prefill_conditioning's n_valid masks the padded tail.
        max_bucket = max(self.engine._rcfg.prompt_buckets)
        width = cond.shape[1]
        off = 0
        while off < n_frames:
            n = min(max_bucket, n_frames - off)
            piece = (cond if off == 0 and width <= max_bucket
                     else cond[:, off:min(off + max_bucket, width)])
            st = self.engine.prefill_conditioning(st, piece, n)
            off += n
        return VoiceState(st["kc"], st["vc"], st["pos"], base_len + n_frames)

    def extend_voice_state(self, voice_state: VoiceState,
                           wav: np.ndarray) -> VoiceState:
        """Append audio conditioning on top of an existing voice state.

        Encodes ``wav`` (24 kHz mono) through the Mimi encoder + speaker
        projection and prefills it AFTER the snapshot's existing cache
        content, as if the voice prompt had been that much longer.  Used by
        teacher-forced segment continuation (the reference lists this as its
        own TODO, python-reference tts_model.py:399-400); also public — e.g.
        to refine a voice with additional prompt audio.

        Conditioning that would squeeze generation below the cache reserve is
        clipped to its most recent frames (or skipped entirely when the base
        state already fills the budget)."""
        cond, n_frames = self.engine.encode_voice(wav)
        rcfg = self.engine._rcfg
        room = rcfg.max_seq - self.engine.prompt_reserve - voice_state.length
        if room <= 0:
            logger.warning(
                "voice state (%d frames) already fills the cache budget; "
                "skipping continuation conditioning", voice_state.length)
            return voice_state
        if n_frames > room:
            cond = cond[:, n_frames - room: n_frames]
            n_frames = room
        return self._prefill_voice(cond, n_frames, base=voice_state)

    # -- generation ----------------------------------------------------------

    def estimate_generation_steps(self, text: str) -> int:
        prepared, _ = text_mod.prepare_text_prompt(text)
        return text_mod.max_generation_frames(prepared)

    def split_into_best_sentences(self, text: str) -> list[str]:
        """Method-level home matching the reference API (tts_model.rs:604);
        delegates to the canonical algorithm in ``text.py``."""
        return text_mod.split_into_best_sentences(self.tokenizer, text)

    def generate(self, text: str, voice_state: VoiceState | None = None,
                 frames_after_eos: int | None = None, *,
                 continuation_frames: int = 0) -> np.ndarray:
        """Synthesize ``text`` -> float32 waveform [samples] @ 24 kHz.

        ``frames_after_eos``: extra frames after EOS detection; None derives it
        from the text length (1-3 frames + 2, reference tts_model.py:326-330)."""
        chunks = list(self.generate_stream(
            text, voice_state, frames_after_eos, low_latency=False,
            continuation_frames=continuation_frames))
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def generate_stream(self, text: str, voice_state: VoiceState | None = None,
                        frames_after_eos: int | None = None, *,
                        low_latency: bool = True,
                        continuation_frames: int = 0,
                        _tail: dict | None = None) -> Iterator[np.ndarray]:
        """Stream audio chunks.  Text is split into <=50-token sentence chunks;
        each restarts from the voice state (tts_model.py:396-411).

        ``low_latency=False`` (used by the whole-utterance ``generate`` /
        ``generate_with_pauses``) skips the warm-up chunk ramp for ~25% more
        throughput; the audio is identical either way.

        ``continuation_frames`` > 0 enables teacher-forced continuation: each
        segment after the first is conditioned on the last N generated audio
        frames (re-encoded through the Mimi encoder on top of the voice
        state), so prosody carries across segment boundaries instead of
        resetting.  The reference lists this as its own TODO
        (tts_model.py:399-400).  Costs one voice-encode per segment and
        disables cross-segment pipelining (each segment's conditioning
        depends on the previous segment's audio)."""
        if voice_state is None:
            voice_state = self.get_voice_state()
        chunks = text_mod.split_into_best_sentences(self.tokenizer, text)
        # ``_tail`` (private): mutable {"audio": np.ndarray} carrying the
        # continuation tail ACROSS generate_stream calls — generate_stream_long
        # passes one holder per utterance so prosody bridges pause segments
        # (every comma is a 200 ms pause segment; without the holder each
        # would reset the conditioning the feature exists to provide)
        if continuation_frames > 0 and (
                len(chunks) > 1 or (_tail is not None)):
            yield from self._run_segments_continuation(
                chunks, voice_state, frames_after_eos, low_latency,
                continuation_frames, _tail)
        else:
            yield from self._run_segments(chunks, voice_state, frames_after_eos,
                                          low_latency)

    def generate_with_pauses(self, text: str,
                             voice_state: VoiceState | None = None, *,
                             continuation_frames: int = 0) -> np.ndarray:
        chunks = list(self.generate_stream_long(
            text, voice_state, low_latency=False,
            continuation_frames=continuation_frames))
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def generate_stream_long(self, text: str, voice_state: VoiceState | None = None,
                             frames_after_eos: int | None = None, *,
                             low_latency: bool = True,
                             continuation_frames: int = 0) -> Iterator[np.ndarray]:
        """Pause-aware streaming: interleaves synthesized text segments with
        silence for ``[pause:Xms]`` / natural pauses (tts_model.rs:1074-1127)."""
        if voice_state is None:
            voice_state = self.get_voice_state()
        # one tail holder for the whole utterance: continuation conditioning
        # carries across pause boundaries (commas, ellipses, [pause:Xms]),
        # which are exactly the seams the feature exists to bridge
        tail = ({"audio": np.zeros(0, np.float32)}
                if continuation_frames > 0 else None)
        for seg in pause_mod.segment_text(text):
            if seg.kind == "pause":
                n = pause_mod.silence_samples(seg.duration_ms, self.sample_rate)
                yield np.zeros(n, np.float32)
            else:
                yield from self.generate_stream(
                    seg.text, voice_state, frames_after_eos,
                    low_latency=low_latency,
                    continuation_frames=continuation_frames, _tail=tail)

    # -- internals -------------------------------------------------------------

    def _run_segments(self, texts: list[str], voice_state: VoiceState,
                      frames_after_eos: int | None,
                      low_latency: bool = True) -> Iterator[np.ndarray]:
        """Drive the segments with CROSS-segment pipelining.

        Segments are independent (each resets from the voice state), so the
        next segment's reset/prefill/first chunks dispatch while the current
        segment's results drain — the per-segment serial gap (reset + prefill
        + pipeline refill, ~50-100 ms on the tunneled backend) disappears.
        Numerics are UNCHANGED vs serial execution: every dispatch is a pure
        function of its own segment's state and key, and keys are split in
        segment order.
        """
        depth = max(1, getattr(self.engine._rcfg, "pipeline_depth", 1))
        queue = list(texts)
        active: list[_SegmentRun] = []
        # head-of-stream latency (STREAMING only): the tunnel serializes
        # fetches behind queued executes, so before any audio has been
        # emitted keep exactly one dispatch in flight and fetch it — a second
        # queued chunk would ride ahead of the first chunk's fetch and add
        # its whole execution to time-to-first-audio.  Whole-utterance mode
        # (low_latency=False) must NOT pay this: nobody hears audio early,
        # its first chunk is the LARGEST of the throughput schedule, and
        # serializing it costs ~60-90 ms per utterance (the r4 headline
        # regression: 159.7x -> 139x at unchanged device time and BETTER
        # transport weather — caught by the r5 gauge instrumentation).
        emitted_any = not low_latency
        MAX_ACTIVE = 2  # head + one lookahead (each holds a full KV state)
        while queue or active:
            while True:
                in_flight = sum(len(s.pending) for s in active)
                if in_flight > (depth if emitted_any else 0):
                    break
                seg = next((s for s in active if s.dispatchable), None)
                if seg is not None:
                    seg.dispatch_one()
                    continue
                if queue and len(active) < MAX_ACTIVE:
                    active.append(_SegmentRun(self, queue.pop(0), voice_state,
                                              frames_after_eos, low_latency))
                    continue
                break
            if not active:
                continue
            head = active[0]
            if head.pending and not head.done:
                out = head.fetch_one()
                if out is not None:
                    emitted_any = True
                    yield out
            if head.done or (not head.pending and not head.dispatchable):
                head.finish()
                active.pop(0)

    def _run_segments_continuation(self, texts: list[str],
                                   voice_state: VoiceState,
                                   frames_after_eos: int | None,
                                   low_latency: bool,
                                   continuation_frames: int,
                                   tail_holder: dict | None = None,
                                   ) -> Iterator[np.ndarray]:
        """Teacher-forced variant of _run_segments: segment N+1 is conditioned
        on the tail of the audio generated so far.

        Each segment extends the ORIGINAL voice state (never a chained
        extension), so cache use stays bounded at
        voice + continuation_frames + text + generation regardless of how many
        segments the utterance has.  Segments run serially — the conditioning
        data dependency removes the cross-segment pipelining of
        _run_segments, trading ~5-10% throughput for prosodic continuity.

        ``tail_holder`` ({"audio": ndarray}) carries the tail in from (and
        back out to) the caller, so generate_stream_long can bridge it across
        pause segments."""
        tail_cap = continuation_frames * self.frame_size
        if tail_holder is None:
            tail_holder = {"audio": np.zeros(0, np.float32)}
        for text in texts:
            tail = tail_holder["audio"]
            vs = (self.extend_voice_state(voice_state, tail) if tail.size
                  else voice_state)
            for out in self._run_segments([text], vs, frames_after_eos,
                                          low_latency):
                tail_holder["audio"] = np.concatenate(
                    [tail_holder["audio"], out])[-tail_cap:]
                yield out


class _SegmentRun:
    """Dispatch/fetch state machine for one text segment (single stream).

    Dispatches are enqueued ahead of fetches (the engine state threads through
    device-side, never synced); ``fetch_one`` pulls the oldest in-flight chunk,
    applies the EOS + frames_after_eos stop rule, and truncates overshoot.
    """

    def __init__(self, model: TTSModel, chunk_text: str,
                 voice_state: VoiceState, frames_after_eos: int | None,
                 low_latency: bool = True):
        self.model = model
        self.t_start = time.monotonic()
        prepared, fae_guess = text_mod.prepare_text_prompt(chunk_text)
        # frames_after_eos: None derives it from the text length
        # (1-3 frames + 2, reference tts_model.py:326-330)
        self.frames_after_eos = (fae_guess + 2 if frames_after_eos is None
                                 else frames_after_eos)
        max_frames = text_mod.max_generation_frames(prepared)
        tokens, n_tokens = text_mod.tokens_array(model.tokenizer, prepared)
        eng = model.engine
        room = eng._rcfg.max_seq - voice_state.length
        clipped = max(room - n_tokens - 1, 0)
        if clipped < max_frames:
            logger.warning(
                "voice prompt (%d frames) leaves only %d of %d budgeted "
                "generation frames in the %d-position cache; audio may cut off",
                voice_state.length, clipped, max_frames, eng._rcfg.max_seq)
        self.max_frames = min(max_frames, clipped)
        state = eng.reset_for_segment(voice_state.as_dict())
        self.state = eng.prefill_tokens(state, tokens, n_tokens)
        model._rng["key"], self.key = jax.random.split(model._rng["key"])
        # Whole-utterance mode: decode the entire segment in ONE dispatch with
        # the EOS stop rule on device (engine.decode_segment) — zero frames
        # computed past eos_step + frames_after_eos, vs up to depth x chunk
        # discarded frames on the chunked path.  Falls back to the chunk
        # schedule for streaming (incremental audio), staged codec (the fused
        # program contains both stages), budgets past the largest bucket, or
        # an infinite eos_threshold: with EOS unreachable there is no
        # overshoot to save, and the while_loop program measured ~5% slower
        # than the chunked scan on TPU (docs/performance.md).
        import math

        self.fused_bucket = None
        if (not low_latency and self.max_frames
                and getattr(eng._rcfg, "segment_dispatch", "chunked") == "auto"
                and getattr(eng, "_codec_device", None) is None
                and math.isfinite(model.gen.eos_threshold)):
            self.fused_bucket = eng.segment_bucket(self.max_frames)
        if self.fused_bucket is not None:
            self._schedule = iter([self.fused_bucket])
        else:
            self._schedule = iter(eng.chunk_schedule(self.max_frames,
                                                     low_latency=low_latency))
        self._next_k = next(self._schedule, None) if self.max_frames else None
        self.base_pos = voice_state.length + n_tokens
        self.issued = 0
        self.pending: list[tuple[int, object, object]] = []
        self.frames_done = 0
        self.eos_step: int | None = None
        self.total_samples = 0
        self.done = self.max_frames == 0

    @property
    def dispatchable(self) -> bool:
        return (not self.done and self._next_k is not None
                and self.issued < self.max_frames)

    def dispatch_one(self) -> None:
        k = self._next_k
        eng = self.model.engine
        if self.fused_bucket is not None:
            # tight bound: the while_loop writes at most max_frames positions
            # past base_pos, regardless of the (larger) bucket capacity k —
            # sizing from k would pick a needlessly large window bucket, and
            # each (bucket, window) pair is a separate cold compile
            window = eng.window_for(self.base_pos, self.max_frames)
            self.state, self.key, audio, n_valid, eos_step = eng.decode_segment(
                self.state, self.key, self.model.gen,
                max_frames=self.max_frames,
                frames_after_eos=self.frames_after_eos, bucket=k,
                window=window)
            self.pending.append(("fused", audio, n_valid, eos_step))
        else:
            window = eng.window_for(self.base_pos + self.issued, k)
            self.state, self.key, audio, is_eos = eng.decode_frames(
                self.state, self.key, k, self.model.gen, window=window)
            self.pending.append((k, audio, is_eos))
        self.issued += k
        self._next_k = next(self._schedule, None)

    def fetch_one(self) -> np.ndarray | None:
        if self.pending and self.pending[0][0] == "fused":
            _, audio, n_valid, eos_step = self.pending.pop(0)
            audio, n_valid, eos_step = jax.device_get((audio, n_valid, eos_step))
            n_valid, eos_step = int(n_valid), int(eos_step)
            self.eos_step = eos_step if eos_step >= 0 else None
            self.frames_done = n_valid
            self.done = True
            if n_valid == 0:
                return None
            out = self.model.engine.wire_to_float(
                np.asarray(audio)[0, : n_valid * self.model.frame_size])
            self.total_samples += out.size
            return out
        k, audio, is_eos = self.pending.pop(0)
        audio, eos_np = jax.device_get((audio, is_eos))
        # device ships int16 PCM (or mu-law); public API stays float32
        audio = self.model.engine.wire_to_float(np.asarray(audio)[0])
        eos_np = np.asarray(eos_np)[0]
        if self.eos_step is None:
            hits = np.nonzero(eos_np)[0]
            if hits.size:
                self.eos_step = self.frames_done + int(hits[0])
        target = self.max_frames if self.eos_step is None else min(
            self.max_frames, self.eos_step + self.frames_after_eos)
        emit = min(target, self.frames_done + k) - self.frames_done
        self.frames_done += k
        if self.frames_done >= target:
            self.done = True  # remaining pending chunks are dropped unfetched
        if emit > 0:
            out = audio[: emit * self.model.frame_size]
            self.total_samples += out.size
            return out
        return None

    def finish(self) -> None:
        if self.eos_step is None:
            import os

            # the K-prefixed spelling is NOT a typo here: the reference checks
            # exactly that variable (python-reference tts_model.py:540), so
            # scripts written against it keep working; the sane spelling is
            # honored too
            if (os.environ.get("POCKET_TTS_ERROR_WITHOUT_EOS", "0") == "1"
                    or os.environ.get("KPOCKET_TTS_ERROR_WITHOUT_EOS", "0") == "1"):
                raise RuntimeError(
                    "Generation reached maximum length without EOS!")
            logger.warning(
                "Maximum generation length reached without EOS, "
                "this very often indicates an error.")
        dt = time.monotonic() - self.t_start
        if self.total_samples:
            dur = self.total_samples / self.model.sample_rate
            logger.info("Generated %.2f s audio in %.2f s (RTF %.3f, %.1fx realtime)",
                        dur, dt, dt / dur, dur / dt)
