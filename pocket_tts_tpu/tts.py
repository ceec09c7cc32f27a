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
        self.tokenizer = text_mod.load_tokenizer(None)
        # mutable holder so with_params() clones share and ADVANCE one RNG
        # stream (torch's process-global generator semantics in the reference)
        self._rng = {"key": jax.random.PRNGKey(seed)}

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
    ) -> "TTSModel":
        cfg = load_variant(variant)
        plans = MimiPlans(cfg.mimi)
        params, real = weights_mod.load_params(cfg, plans, variant=variant)
        gen = GenParams(temp=temp, lsd_decode_steps=lsd_decode_steps,
                        noise_clamp=noise_clamp, eos_threshold=eos_threshold)
        return cls(cfg, params, gen=gen, has_real_weights=real, seed=seed)

    @classmethod
    def load_from_bytes(cls, weights_bytes: bytes,
                        variant: str = DEFAULT_VARIANT, **kwargs) -> "TTSModel":
        """Construct from in-memory safetensors bytes (the reference's WASM
        loader entry, tts_model.rs:239-276)."""
        import tempfile

        from pocket_tts_tpu.models.mimi import MimiPlans

        cfg = load_variant(variant)
        with tempfile.NamedTemporaryFile(suffix=".safetensors") as f:
            f.write(weights_bytes)
            f.flush()
            sd = weights_mod.load_safetensors(f.name)
        params = weights_mod.convert_tts_state_dict(sd, cfg, MimiPlans(cfg.mimi))
        gen = GenParams(**{k: v for k, v in kwargs.items()
                           if k in ("temp", "lsd_decode_steps", "noise_clamp",
                                    "eos_threshold")})
        return cls(cfg, params, gen=gen, has_real_weights=True)

    def with_params(self, **overrides) -> "TTSModel":
        """Cheap per-request override clone (shares params/engine;
        reference: handlers.rs:147-160)."""
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

    def get_voice_state(self) -> VoiceState:
        """Unconditioned (empty) voice state."""
        st = self.engine.new_state()
        return VoiceState(st["kc"], st["vc"], st["pos"], 0)

    def get_voice_state_from_wav(self, path: str | Path | bytes,
                                 truncate: bool = False) -> VoiceState:
        wav, sr = audio_io.read_wav(path)
        if truncate:
            wav = wav[..., : 30 * sr]
        wav = audio_io.convert_audio(wav, sr, self.sample_rate, 1)
        return self.get_voice_state_from_audio(wav)

    def get_voice_state_from_audio(self, wav: np.ndarray) -> VoiceState:
        """24 kHz mono waveform -> voice state via the Mimi encoder + speaker
        projection + conditioning prefill (tts_model.rs:504-560)."""
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
        save_file({"audio_prompt": np.asarray(cond[:, :n_frames], np.float32)},
                  str(path))

    def _prefill_voice(self, cond, n_frames: int) -> VoiceState:
        st = self.engine.new_state()
        # conditioning longer than the largest prompt bucket prefills in
        # bucket-sized pieces — positions continue from the cache cursor, so
        # chunked prefill equals one-shot prefill
        max_bucket = max(self.engine._rcfg.prompt_buckets)
        off = 0
        while off < n_frames:
            n = min(max_bucket, n_frames - off)
            st = self.engine.prefill_conditioning(st, cond[:, off:off + n], n)
            off += n
        return VoiceState(st["kc"], st["vc"], st["pos"], n_frames)

    # -- generation ----------------------------------------------------------

    def estimate_generation_steps(self, text: str) -> int:
        prepared, _ = text_mod.prepare_text_prompt(text)
        return text_mod.max_generation_frames(prepared)

    def generate(self, text: str, voice_state: VoiceState | None = None,
                 frames_after_eos: int | None = None) -> np.ndarray:
        """Synthesize ``text`` -> float32 waveform [samples] @ 24 kHz.

        ``frames_after_eos``: extra frames after EOS detection; None derives it
        from the text length (1-3 frames + 2, reference tts_model.py:326-330)."""
        chunks = list(self.generate_stream(text, voice_state, frames_after_eos))
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def generate_stream(self, text: str, voice_state: VoiceState | None = None,
                        frames_after_eos: int | None = None
                        ) -> Iterator[np.ndarray]:
        """Stream audio chunks.  Text is split into <=50-token sentence chunks;
        each restarts from the voice state (tts_model.py:396-411)."""
        if voice_state is None:
            voice_state = self.get_voice_state()
        for chunk in text_mod.split_into_best_sentences(self.tokenizer, text):
            yield from self._generate_segment(chunk, voice_state, frames_after_eos)

    def generate_with_pauses(self, text: str,
                             voice_state: VoiceState | None = None) -> np.ndarray:
        chunks = list(self.generate_stream_long(text, voice_state))
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def generate_stream_long(self, text: str, voice_state: VoiceState | None = None,
                             frames_after_eos: int | None = None
                             ) -> Iterator[np.ndarray]:
        """Pause-aware streaming: interleaves synthesized text segments with
        silence for ``[pause:Xms]`` / natural pauses (tts_model.rs:1074-1127)."""
        if voice_state is None:
            voice_state = self.get_voice_state()
        for seg in pause_mod.segment_text(text):
            if seg.kind == "pause":
                n = pause_mod.silence_samples(seg.duration_ms, self.sample_rate)
                yield np.zeros(n, np.float32)
            else:
                yield from self.generate_stream(seg.text, voice_state,
                                                frames_after_eos)

    # -- internals -------------------------------------------------------------

    def _generate_segment(self, chunk: str, voice_state: VoiceState,
                          frames_after_eos: int | None = None
                          ) -> Iterator[np.ndarray]:
        t_start = time.monotonic()
        prepared, fae_guess = text_mod.prepare_text_prompt(chunk)
        if frames_after_eos is None:
            frames_after_eos = fae_guess + 2  # tts_model.py:405
        max_frames = text_mod.max_generation_frames(prepared)

        tokens, n_tokens = text_mod.tokens_array(self.tokenizer, prepared)
        room = self.engine._rcfg.max_seq - voice_state.length
        max_frames = min(max_frames, max(room - n_tokens - 1, 0))
        state = self.engine.reset_for_segment(voice_state.as_dict())
        state = self.engine.prefill_tokens(state, tokens, n_tokens)

        # Depth-1 pipelined decode: chunk i+1 is dispatched before chunk i is
        # fetched, hiding the device->host sync latency.  On EOS we overshoot
        # at most one chunk (discarded; segment state is reset anyway).
        frames_done = 0  # frames fetched & accounted
        eos_step: int | None = None
        total_samples = 0
        self._rng["key"], key = jax.random.split(self._rng["key"])
        pending: list[tuple[int, object, object]] = []
        schedule = iter(self.engine.chunk_schedule(max_frames))
        issued = 0

        def fetch():
            nonlocal frames_done, eos_step, total_samples
            k, audio, is_eos = pending.pop(0)
            audio, eos_np = jax.device_get((audio, is_eos))
            # device ships int16 PCM; the public API stays float32 in [-1, 1]
            audio = np.asarray(audio)[0].astype(np.float32) / 32767.0
            eos_np = np.asarray(eos_np)[0]
            if eos_step is None:
                hits = np.nonzero(eos_np)[0]
                if hits.size:
                    eos_step = frames_done + int(hits[0])
            target = max_frames if eos_step is None else min(
                max_frames, eos_step + frames_after_eos)
            emit = min(target, frames_done + k) - frames_done
            frames_done += k
            if emit > 0:
                out = audio[: emit * self.frame_size]
                total_samples += out.size
                return out, frames_done >= target
            return None, frames_done >= target

        depth = max(1, getattr(self.engine._rcfg, "pipeline_depth", 1))
        base_pos = voice_state.length + n_tokens
        done = False
        fetched_any = False
        while not done:
            k = next(schedule, None)
            if k is not None and issued < max_frames:
                window = self.engine.window_for(base_pos + issued, k)
                state, key, audio, is_eos = self.engine.decode_frames(
                    state, key, k, self.gen, window=window)
                pending.append((k, audio, is_eos))
                issued += k
            # first-audio latency: the tunnel serializes the fetch behind
            # queued executes, so fetch the FIRST chunk at depth 1 before
            # filling the pipeline with the big steady-state chunks
            eff_depth = depth if fetched_any else 1
            if len(pending) > (eff_depth if k is not None else 0):
                out, done = fetch()
                fetched_any = True
                if out is not None:
                    yield out
            elif k is None and not pending:
                break
        if eos_step is None:
            import os

            if (os.environ.get("POCKET_TTS_ERROR_WITHOUT_EOS", "0") == "1"
                    or os.environ.get("KPOCKET_TTS_ERROR_WITHOUT_EOS", "0") == "1"):
                raise RuntimeError(
                    "Generation reached maximum length without EOS!")
            logger.warning(
                "Maximum generation length reached without EOS, "
                "this very often indicates an error.")
        dt = time.monotonic() - t_start
        if total_samples:
            dur = total_samples / self.sample_rate
            logger.info("Generated %.2f s audio in %.2f s (RTF %.3f, %.1fx realtime)",
                        dur, dt, dt / dur, dur / dt)
