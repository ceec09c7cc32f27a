"""Generation engine: compiled, static-shape programs around the model.

This is the TPU-native replacement for the reference's per-frame host loop
(tts_model.py:513-548 / tts_model.rs:1006-1070).  Design:

* One **GenState** pytree (FlowLM KV cache + cursor, previous latent, Mimi
  decode state, RNG key) threads through everything; no Python-side tensors.
* **decode_frames(K)**: a single compiled ``lax.scan`` emits K latent frames AND
  their decoded audio per device dispatch — FlowLM step, LSD flow, codec decode
  all fused in one program.  The chunk schedule starts tiny (first-audio latency)
  and grows (dispatch amortization).
* **Prefill** functions are bucketed on sequence length (right-padded; padded
  positions are causally invisible — see ops/attention.py).
* Params are always jit *arguments* (never closure constants: 90 MB of weights
  inlined into HLO breaks compilation) and the big caches are donated.
* EOS is data: the scan returns per-frame EOS logits; the host applies the
  ``eos_step + frames_after_eos`` stop rule and truncates — compute overshoot is
  discarded, segment state is reset from the voice state anyway.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.config import Config
from pocket_tts_tpu.models import flow_lm, flow_mlp, mimi, transformer
from pocket_tts_tpu.models.mimi import MimiPlans
from pocket_tts_tpu.ops import mulaw

logger = logging.getLogger(__name__)

_CACHE_SET = False


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache — first-compile of the decode scan runs
    minutes through the axon remote-compile tunnel; cached reloads are instant."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    import os

    cache_dir = os.environ.get(
        "POCKET_TTS_JAX_CACHE", os.path.expanduser("~/.cache/pocket_tts_tpu/jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # noqa: BLE001
        logger.debug("compilation cache unavailable: %s", e)
    _CACHE_SET = True


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")


@dataclasses.dataclass
class GenParams:
    """Per-request generation knobs (reference: config.rs:118-124).

    Validated at construction so every load/override path fails loudly:
    lsd_decode_steps=0 would run zero Euler iterations and emit raw noise as
    audio, and a negative temp would sqrt() into NaN latents — both
    previously returned HTTP 200 with garbage on the scalar decode path
    (the vec path already raised)."""

    temp: float = 0.7
    lsd_decode_steps: int = 1
    noise_clamp: float | None = None
    eos_threshold: float = -4.0

    def __post_init__(self):
        if self.lsd_decode_steps < 1:
            raise ValueError(
                f"lsd_decode_steps must be >= 1, got {self.lsd_decode_steps}")
        if not self.temp >= 0.0:  # also rejects NaN
            raise ValueError(f"temp must be >= 0, got {self.temp}")
        if self.noise_clamp is not None:
            if self.noise_clamp != self.noise_clamp:  # NaN
                raise ValueError("noise_clamp must not be NaN")
            # "< 0 = unclamped" is the repo-wide convention (the batched
            # clamp_vec already encodes None as -1): normalize so the scalar
            # path agrees instead of computing truncated_normal with an
            # inverted [+1/std, -1/std] bound (constant garbage audio), and
            # so with_params(noise_clamp=-1) can express "unclamp" (None is
            # indistinguishable from "not overridden" there)
            if self.noise_clamp < 0:
                self.noise_clamp = None


def _cast_params(params: dict, dtype) -> dict:
    """Cast the bandwidth-heavy weights to the compute dtype.

    Kept in float32: the flow net (latents feed back autoregressively — bf16
    there compounds across frames), the output norm/EOS head, and the latent
    statistics.  Everything the MXU streams per frame (backbone, codec) goes
    bf16: halves HBM traffic, which bounds this model's per-frame time.
    """
    if dtype == jnp.float32:
        return params

    def cast(tree):
        return jax.tree.map(lambda x: x.astype(dtype)
                            if x.dtype == jnp.float32 else x, tree)

    fl = dict(params["flow_lm"])
    for name in ("tf", "input_w", "text_embed"):
        fl[name] = cast(fl[name])
    return {"flow_lm": fl, "mimi": cast(params["mimi"])}


class Engine:
    """Owns the jit caches for one (config, batch_size) pair."""

    def __init__(self, cfg: Config, params: dict, batch_size: int = 1,
                 mesh: Any | None = None):
        enable_compilation_cache()
        self.cfg = cfg
        self.batch = batch_size
        self.plans = MimiPlans(cfg.mimi)
        self.mesh = mesh
        rcfg = cfg.runtime
        tcfg = cfg.flow_lm.transformer
        self._tcfg = tcfg
        self._rcfg = rcfg
        self.ldim = cfg.mimi.quantizer.dimension
        self.frame_size = cfg.mimi.frame_size

        dt = rcfg.compute_dtype
        if dt == "auto":
            dt = "bfloat16" if jax.default_backend() != "cpu" else "float32"
        self.dtype = jnp.dtype(dt)
        kdt = getattr(rcfg, "kv_dtype", "auto")
        if kdt == "auto":
            kdt = dt
        # fn variants: finite-only e4m3 (the non-fn e4m3 is not an XLA dtype)
        self.kv_dtype = {"float8_e4m3": jnp.float8_e4m3fn,
                         "float8_e5m2": jnp.float8_e5m2}.get(kdt, jnp.dtype(kdt))
        up = getattr(rcfg, "use_pallas", "auto")
        self._use_pallas = (jax.default_backend() == "tpu") if up == "auto"             else up in ("1", "true", True)
        self.params = jax.jit(_cast_params, static_argnames=("dtype",)
                              )(params, dtype=self.dtype)

        # jitted entry points ---------------------------------------------
        # Prefill does NOT donate: its kc/vc inputs are often the live voice
        # state (shared across segments) — donation would invalidate it.  The
        # decode scan donates: its state is always segment-fresh.
        self._prefill_tokens = jax.jit(self._prefill_tokens_impl)
        self._prefill_cond = jax.jit(self._prefill_cond_impl)
        self._decode = jax.jit(
            self._decode_impl,
            static_argnames=("n_frames", "lsd_steps", "clamped", "window"),
            donate_argnums=(1,),
        )
        self._encode = jax.jit(self._encode_impl)
        self._new_state = jax.jit(self._new_state_impl, static_argnames=("batch",))
        self._reset = jax.jit(self._reset_impl, static_argnames=("batch",))

        # Per-slot multi-adapter serving (set_adapter_bank): None = the
        # plain programs; set = decode/admit programs gain lora args
        self.adapter_bank = None
        self._lora_stacks = None

        # Stage parallelism (opt-in): AR scan and Mimi codec on separate
        # devices, overlapped by the host dispatch pipeline.  Enabled by
        # TTSModel (via POCKET_TTS_STAGE_CODEC) — not here: the engine cannot
        # know whether its consumer is the single-stream TTS path or a
        # batch_size=1 ContinuousBatcher, whose slot admission never routes
        # state through reset_for_segment's per-device placement.
        self._codec_device = None

    # -- state ------------------------------------------------------------
    # State creation runs jitted: on this machine every *eager* op round-trips
    # through the axon remote-compile tunnel (seconds each).

    def _new_state_impl(self, params, *, batch: int) -> dict:
        tcfg = self._tcfg
        kc, vc = transformer.init_cache(
            tcfg.num_layers, batch, self._rcfg.max_seq, tcfg.num_heads,
            tcfg.head_dim, self.kv_dtype,
        )
        return {
            "kc": kc,
            "vc": vc,
            "pos": jnp.zeros((batch,), jnp.int32),
            "latent": jnp.broadcast_to(
                params["bos_emb"].astype(jnp.float32), (batch, self.ldim)),
            "mimi": mimi.init_decode_state(self.plans, batch, self.dtype),
        }

    def _reset_impl(self, params, kc, vc, pos, *, batch: int) -> dict:
        return {
            "kc": kc, "vc": vc, "pos": pos,
            "latent": jnp.broadcast_to(
                params["bos_emb"].astype(jnp.float32), (batch, self.ldim)),
            "mimi": mimi.init_decode_state(self.plans, batch, self.dtype),
        }

    def new_state(self, batch: int | None = None) -> dict:
        return self._new_state(self.params["flow_lm"], batch=batch or self.batch)

    def reset_for_segment(self, voice_state: dict, batch: int | None = None) -> dict:
        """Per-segment restart from a voice state: the FlowLM cache is the
        (immutable) voice snapshot; latent and the Mimi decoder start fresh.
        The jit pass-through copies kc/vc, so downstream decode donation never
        invalidates the live voice snapshot."""
        st = self._reset(self.params["flow_lm"], voice_state["kc"],
                         voice_state["vc"], voice_state["pos"],
                         batch=batch or self.batch)
        if self._codec_device is not None:
            # one transfer per segment: the codec stage owns the Mimi state
            st["mimi"] = jax.device_put(st["mimi"], self._codec_device)
        return st

    # -- slot admission (continuous batching) --------------------------------

    def _admit_impl(self, params, state, slot, kc_v, vc_v, pos_v):
        """Install a (batch-1) voice snapshot into slot ``slot`` of a batched
        GenState and reset that slot's latent + Mimi decoder lanes.  Other
        slots' lanes are untouched, so admission can interleave with decoding."""
        from jax import lax

        def write(leaf, new, axis):
            start = [0] * leaf.ndim
            start[axis] = slot
            return lax.dynamic_update_slice(leaf, new.astype(leaf.dtype),
                                            tuple(start))

        kc = write(state["kc"], kc_v, 1)
        vc = write(state["vc"], vc_v, 1)
        pos = write(state["pos"], pos_v.astype(jnp.int32), 0)
        latent = write(state["latent"],
                       params["bos_emb"].astype(jnp.float32)[None], 0)
        fresh = mimi.init_decode_state(self.plans, 1, self.dtype)
        new_mimi = dict(state["mimi"])
        new_mimi["kc"] = write(state["mimi"]["kc"], fresh["kc"], 1)
        new_mimi["vc"] = write(state["mimi"]["vc"], fresh["vc"], 1)
        for name in ("up", "pos", "dec"):
            new_mimi[name] = jax.tree.map(
                lambda leaf, f: write(leaf, f, 0),
                state["mimi"][name], fresh[name])
        return {"kc": kc, "vc": vc, "pos": pos, "latent": latent,
                "mimi": new_mimi}

    def admit_slot(self, state: dict, slot: int, voice_state: dict) -> dict:
        if not hasattr(self, "_admit"):
            self._admit = jax.jit(self._admit_impl, donate_argnums=(1,))
        return self._admit(self.params["flow_lm"], state,
                           np.int32(slot), voice_state["kc"],
                           voice_state["vc"], voice_state["pos"])

    def _admit_prefill_impl(self, params, state, slot, kc_v, vc_v, pos_v,
                            tokens_row, n_tokens, lora=None, lora_w=None):
        """Fused admission: voice-snapshot install + THIS lane's text prefill
        in one program.  The lane is sliced out of the batched cache, prefilled
        at B=1 (1/B of the batched prefill FLOPs — other lanes used to compute
        causally-invisible garbage), and written back.  ``lora_w`` ([1, N]):
        the admitted lane's adapter row — its text prefill must run through
        the same adapted backbone its decode will."""
        st = self._admit_impl(params, state, slot, kc_v, vc_v, pos_v)
        kc1 = jax.lax.dynamic_slice_in_dim(st["kc"], slot, 1, axis=1)
        vc1 = jax.lax.dynamic_slice_in_dim(st["vc"], slot, 1, axis=1)
        pos1 = jax.lax.dynamic_slice_in_dim(st["pos"], slot, 1, axis=0)
        emb = flow_lm.embed_text(params, tokens_row)
        kc1, vc1, pos1 = flow_lm.prefill(
            params, self.cfg, kc1, vc1, pos1, emb,
            jnp.full((1,), n_tokens, jnp.int32), lora=lora, lora_w=lora_w)
        zk = [0] * st["kc"].ndim
        zk[1] = slot
        return {**st,
                "kc": jax.lax.dynamic_update_slice(st["kc"], kc1, tuple(zk)),
                "vc": jax.lax.dynamic_update_slice(st["vc"], vc1, tuple(zk)),
                "pos": jax.lax.dynamic_update_slice(st["pos"], pos1, (slot,))}

    def admit_prefill_slot(self, state: dict, slot: int, voice_state: dict,
                           tokens_row, n_tokens: int,
                           lora_row: np.ndarray | None = None) -> dict:
        """One-dispatch admission for the continuous batcher: admit_slot +
        this slot's text prefill fused into a single program.  Replaces the
        two-program admit + batched-prefill sequence on the time-to-first-
        audio critical path (each extra program costs ~10-30 ms device fixed
        time on the tunneled backend).  ``tokens_row`` should be a
        DEVICE-RESIDENT [1, bucket] int32 row (pre-uploaded off-thread at
        submit time so the h2d transfer overlaps the in-flight decode chunk
        instead of serializing into the admission path)."""
        if not hasattr(self, "_admit_prefill"):
            self._admit_prefill = jax.jit(self._admit_prefill_impl,
                                          donate_argnums=(1,))
        if lora_row is not None:
            if self._lora_stacks is None:
                raise ValueError("lora_row requires set_adapter_bank() first")
            lo, lw = self._lora_stacks, jnp.asarray(
                np.asarray(lora_row, np.float32).reshape(1, -1))
        else:
            lo = lw = None
        return self._admit_prefill(self.params["flow_lm"], state,
                                   np.int32(slot), voice_state["kc"],
                                   voice_state["vc"], voice_state["pos"],
                                   tokens_row, np.int32(n_tokens), lo, lw)

    def pad_token_row(self, tokens: np.ndarray) -> jnp.ndarray:
        """[1, n] int32 -> device-resident [1, bucket] row for
        admit_prefill_slot (async upload; safe from any thread)."""
        bucket = _bucket(tokens.shape[1], self._rcfg.text_buckets)
        padded = np.zeros((1, bucket), np.int32)
        padded[:, : tokens.shape[1]] = tokens
        return jax.device_put(padded)

    # -- prefill ----------------------------------------------------------

    def _prefill_tokens_impl(self, params, kc, vc, pos, tokens, t_valid):
        emb = flow_lm.embed_text(params, tokens)
        return flow_lm.prefill(params, self.cfg, kc, vc, pos, emb, t_valid)

    def _prefill_cond_impl(self, params, kc, vc, pos, cond, t_valid):
        return flow_lm.prefill(params, self.cfg, kc, vc, pos, cond, t_valid)

    def prefill_tokens(self, state: dict, tokens: np.ndarray,
                       n_valid: int | np.ndarray) -> dict:
        """``n_valid`` may be a per-slot [B] vector (continuous batching: slots
        with 0 valid tokens write only causally-invisible garbage beyond their
        cursor and keep their position).

        NOTE adapter serving does NOT thread lora rows through here: batched
        text prefill rides admit_prefill_slot (which does), and voice states
        for adapter requests prefill through the per-adapter MERGED model
        (server/app.py _adapted_for) — keeping these prefills lora-free."""
        b = tokens.shape[0]
        bucket = _bucket(tokens.shape[1], self._rcfg.text_buckets)
        padded = np.zeros((b, bucket), np.int32)
        padded[:, : tokens.shape[1]] = tokens
        if np.isscalar(n_valid) or np.ndim(n_valid) == 0:
            n_valid = np.full((b,), n_valid, np.int32)
        kc, vc, pos = self._prefill_tokens(
            self.params["flow_lm"], state["kc"], state["vc"], state["pos"],
            jnp.asarray(padded), jnp.asarray(np.asarray(n_valid, np.int32)),
        )
        return {**state, "kc": kc, "vc": vc, "pos": pos}

    def prefill_conditioning(self, state: dict, cond: jnp.ndarray,
                             n_valid: int) -> dict:
        """cond: [B, T, d_model] speaker conditioning (bucketed on T)."""
        b, t = cond.shape[:2]
        bucket = _bucket(t, self._rcfg.prompt_buckets)
        if t < bucket:
            cond = jnp.pad(cond, ((0, 0), (0, bucket - t), (0, 0)))
        kc, vc, pos = self._prefill_cond(
            self.params["flow_lm"], state["kc"], state["vc"], state["pos"],
            cond, jnp.asarray(np.full((b,), n_valid, np.int32)),
        )
        return {**state, "kc": kc, "vc": vc, "pos": pos}

    # -- decode -----------------------------------------------------------

    def _split_cache(self, state: dict, window: int) -> dict:
        """Stacked [L, B, S, ...] kc/vc -> per-layer tuples (scan carries),
        optionally sliced to the first ``window`` positions.  Inverse:
        _merge_cache."""
        state = dict(state)
        if window:
            state["kc"] = state["kc"][:, :, :window]
            state["vc"] = state["vc"][:, :, :window]
        n_layers = self._tcfg.num_layers
        state["kc"] = tuple(state["kc"][i] for i in range(n_layers))
        state["vc"] = tuple(state["vc"][i] for i in range(n_layers))
        return state

    @staticmethod
    def _merge_cache(state: dict, full_kc, full_vc, window: int) -> dict:
        state = dict(state)
        state["kc"] = jnp.stack(state["kc"])
        state["vc"] = jnp.stack(state["vc"])
        if window:
            zero = (0,) * full_kc.ndim
            state["kc"] = jax.lax.dynamic_update_slice(full_kc, state["kc"], zero)
            state["vc"] = jax.lax.dynamic_update_slice(full_vc, state["vc"], zero)
        return state

    def _pcm16(self, audio) -> jnp.ndarray:
        """Codec output [B, 1, T] float -> [B, T] wire samples.

        int16 is the default device->host wire format: it is the final output
        format (16-bit WAV / raw PCM streams), and f32 transfers of ~1 MB hit
        a pathological slow path in the tunneled backend (2 s vs 3 ms).
        transport_format="mulaw" compands to G.711 uint8 on device — half the
        wire bytes on a ~30 ms + ~31 ms/MB fetch path (ops/mulaw.py)."""
        a = audio[:, 0, :].astype(jnp.float32)
        pcm = (jnp.clip(a, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        if self._rcfg.transport_format == "mulaw":
            return mulaw.encode(pcm)
        return pcm

    @property
    def wire_dtype(self):
        return (jnp.uint8 if self._rcfg.transport_format == "mulaw"
                else jnp.int16)

    def wire_to_float(self, arr) -> "np.ndarray":
        """Fetched wire samples -> float32 in [-1, 1] (host side)."""
        a = np.asarray(arr)
        if self._rcfg.transport_format == "mulaw":
            a = mulaw.decode(a)
        return a.astype(np.float32) / 32767.0

    def set_adapter_bank(self, bank) -> None:
        """Attach a :class:`training.lora.AdapterBank`: decode/admit/prefill
        programs gain per-slot LoRA arguments (stacked factors as jit args —
        device-resident, ~2 MB/adapter — plus a [B, N] mixing-row matrix), so
        one batched decode loop serves requests with DIFFERENT fine-tuned
        adapters concurrently (VERDICT r4 #5).  Callers opt in per dispatch
        by passing ``lora_w``; dispatches without it keep the exact plain
        programs (zero overhead for non-adapter traffic)."""
        self.adapter_bank = bank
        self._lora_stacks = jax.device_put(bank.stacks)

    def _ar_impl(self, params, state, key, gen, lsd_vec=None, lora=None,
                 lora_w=None, *,
                 n_frames: int, lsd_steps: int, clamped, window: int = 0):
        """AR half of a decode chunk: ``lax.scan`` over the (inherently
        sequential) FlowLM steps, collecting K latents and EOS logits.

        ``state`` holds only the FlowLM pytree (kc/vc/pos/latent).  Returns
        (flow_state, key, denormalized latents [B, ldim, K], is_eos [B, K]).

        ``window`` (static): if nonzero, the scan runs over only the first
        ``window`` cache positions — attention cost scales with live context
        instead of max_seq.  The caller guarantees max(pos) + K <= window; the
        window prefix is merged back afterwards (two ~window-sized copies per
        CHUNK, vs a per-FRAME attention over the dead tail).

        ``lsd_vec`` ([B] int32, batched serving): per-slot LSD step counts —
        ``lsd_steps`` is then the static batch ceiling and each slot runs its
        own count via masked Euler steps (flow_mlp.lsd_decode_masked), with
        ``clamped="vec"`` making per-slot noise truncation data too.  One
        compiled program serves mixed per-request knobs.
        """
        cfg = self.cfg
        if lsd_vec is not None:
            tables = flow_mlp.time_embedding_tables(params["flow_lm"]["flow"],
                                                    lsd_steps)
            table = tables[lsd_vec - 1].transpose(1, 0, 2)  # [S, B, dim]
        else:
            table = flow_mlp.time_embedding_table(params["flow_lm"]["flow"],
                                                  lsd_steps)
        b = state["pos"].shape[0]
        temp, noise_clamp, eos_threshold = gen
        full_kc, full_vc = state["kc"], state["vc"]
        # split the stacked cache into per-layer carries for the frame scan
        # (see transformer.cache_forward); restacked once after the scan
        state = self._split_cache(state, window)

        def body(carry, i):
            st, key = carry
            key, sub = jax.random.split(key)
            noise = flow_lm.sample_noise(sub, (b, self.ldim), temp, noise_clamp,
                                         clamped=clamped)
            latent, eos_logit, kc, vc, pos = flow_lm.step(
                params["flow_lm"], cfg, st["kc"], st["vc"], st["pos"], st["latent"],
                noise, table, lsd_steps, 0.0, use_pallas=self._use_pallas,
                lsd_vec=lsd_vec, lora=lora, lora_w=lora_w,
            )
            new_st = {"kc": kc, "vc": vc, "pos": pos, "latent": latent}
            return (new_st, key), (latent, eos_logit)

        flow_st = {k: state[k] for k in ("kc", "vc", "pos", "latent")}
        # unroll=4: the scan re-streams ~190 MB of weights per frame; XLA
        # pipelines the next frame's weight DMA over the current frame's
        # compute only across unrolled bodies — measured -25 us/frame (~8%)
        # on the while body at B=1 (r5 A/B probe), identical numerics.
        (flow_st, key), (latents, eos_logits) = jax.lax.scan(
            body, (flow_st, key), jnp.arange(n_frames),
            unroll=min(4, n_frames),
        )
        flow_st = self._merge_cache(flow_st, full_kc, full_vc, window)
        # latents: [K, B, ldim] -> denormalize -> [B, ldim, K] for the codec
        denorm = flow_lm.denormalize(params["flow_lm"], latents)
        is_eos = (eos_logits > eos_threshold[None, :]).T  # [B, K]
        return flow_st, key, denorm.transpose(1, 2, 0), is_eos

    def _codec_impl(self, params_mimi, mimi_state, latents):
        """Codec half: ONE grouped Mimi decode over all K frames (16K steps
        @ 200 Hz) — grouped codec decode is ~13x cheaper per frame than
        framewise (convs and attention get real sequence lengths to chew on).
        """
        audio, mimi_state = mimi.decode_step(params_mimi, self.plans,
                                             mimi_state, latents)
        return mimi_state, self._pcm16(audio)

    def _decode_impl(self, params, state, key, gen, lsd_vec=None, lora=None,
                     lora_w=None, *,
                     n_frames: int, lsd_steps: int, clamped, window: int = 0):
        """K frames per dispatch: AR scan + grouped codec decode fused into
        one program (the single-device default; see enable_staged_codec for
        the two-device pipeline split)."""
        flow_state = {k: state[k] for k in ("kc", "vc", "pos", "latent")}
        flow_st, key, denorm, is_eos = self._ar_impl(
            params, flow_state, key, gen, lsd_vec, lora, lora_w,
            n_frames=n_frames,
            lsd_steps=lsd_steps, clamped=clamped, window=window)
        mimi_state, audio_i16 = self._codec_impl(params["mimi"], state["mimi"],
                                                 denorm)
        return {**flow_st, "mimi": mimi_state}, key, audio_i16, is_eos

    def _decode_segment_impl(self, params, state, key, gen, mf, fae, *,
                             n_frames: int, lsd_steps: int, clamped,
                             window: int = 0, group: int = 64):
        """A WHOLE segment in one dispatch, with the EOS stop rule on device.

        The chunked path computes every dispatched frame even after EOS fires
        — with pipelining, up to depth x chunk frames of discarded work per
        segment (SURVEY hard-part #4; the host cannot know EOS before
        fetching).  Here the AR loop is a ``lax.while_loop`` whose carry
        tracks ``eos_step`` and stops at ``min(mf, eos_step + fae)`` exactly
        like the host rule (tts.py _SegmentRun.fetch_one), so zero AR frames
        are wasted; the codec then runs as ``lax.cond``-guarded groups of
        ``group`` frames (TPU executes only the taken branch), bounding codec
        overshoot at group-1 frames.

        ``n_frames`` (static) is the bucket capacity; ``mf`` (dynamic) the
        text-derived frame budget; ``fae`` (dynamic) frames_after_eos.
        Single-stream (B=1) only.  Returns
        (state, key, audio_i16 [1, n_frames*frame], n_valid, eos_step).
        """
        cfg = self.cfg
        table = flow_mlp.time_embedding_table(params["flow_lm"]["flow"],
                                              lsd_steps)
        temp, noise_clamp, eos_threshold = gen
        full_kc, full_vc = state["kc"], state["vc"]
        flow = {k: state[k] for k in ("kc", "vc", "pos", "latent")}
        flow = self._split_cache(flow, window)
        lat_buf = jnp.zeros((n_frames, 1, self.ldim), jnp.float32)

        def cond_fn(c):
            _, _, _, i, eos_step = c
            live = (eos_step < 0) | (i < eos_step + fae)
            return (i < mf) & live

        def body_fn(c):
            st, key, buf, i, eos_step = c
            key, sub = jax.random.split(key)
            noise = flow_lm.sample_noise(sub, (1, self.ldim), temp,
                                         noise_clamp, clamped=clamped)
            latent, eos_logit, kc, vc, pos = flow_lm.step(
                params["flow_lm"], cfg, st["kc"], st["vc"], st["pos"],
                st["latent"], noise, table, lsd_steps, 0.0,
                use_pallas=self._use_pallas,
            )
            buf = jax.lax.dynamic_update_slice(buf, latent[None], (i, 0, 0))
            hit = (eos_logit[0] > eos_threshold[0]) & (eos_step < 0)
            eos_step = jnp.where(hit, i, eos_step)
            st = {"kc": kc, "vc": vc, "pos": pos, "latent": latent}
            return st, key, buf, i + 1, eos_step

        flow, key, lat_buf, n_valid, eos_step = jax.lax.while_loop(
            cond_fn, body_fn,
            (flow, key, lat_buf, jnp.int32(0), jnp.int32(-1)))
        # the host stop rule is min(mf, eos_step + fae); with fae == 0 the
        # loop body has already computed the EOS frame before cond_fn can
        # stop, so clamp n_valid back down instead of emitting that frame
        n_valid = jnp.where(eos_step >= 0,
                            jnp.minimum(mf, eos_step + fae), n_valid)
        flow = self._merge_cache(flow, full_kc, full_vc, window)

        denorm = flow_lm.denormalize(params["flow_lm"], lat_buf)
        lat_bct = denorm.transpose(1, 2, 0)  # [1, ldim, n_frames]
        # buckets need not be multiples of ``group``: pad the latent/audio
        # buffers up to one (static padding; the tail group decodes zero
        # latents past n_frames, bounded overshoot like any partial group)
        group = min(group, n_frames)
        n_pad = -(-n_frames // group) * group
        if n_pad > n_frames:
            lat_bct = jnp.pad(lat_bct, ((0, 0), (0, 0), (0, n_pad - n_frames)))
        audio_buf = jnp.zeros((1, n_pad * self.frame_size), self.wire_dtype)

        def gbody(g, carry):
            def run(args):
                mimi_state, audio_buf = args
                lat_g = jax.lax.dynamic_slice(
                    lat_bct, (0, 0, g * group), (1, self.ldim, group))
                audio, mimi_state = mimi.decode_step(
                    params["mimi"], self.plans, mimi_state, lat_g)
                audio_buf = jax.lax.dynamic_update_slice(
                    audio_buf, self._pcm16(audio),
                    (0, g * group * self.frame_size))
                return mimi_state, audio_buf
            return jax.lax.cond(g * group < n_valid, run, lambda a: a, carry)

        mimi_state, audio_buf = jax.lax.fori_loop(
            0, n_pad // group, gbody, (state["mimi"], audio_buf))
        audio_buf = audio_buf[:, : n_frames * self.frame_size]
        return ({**flow, "mimi": mimi_state}, key, audio_buf, n_valid, eos_step)

    def segment_bucket(self, max_frames: int) -> int | None:
        """Smallest fused-segment bucket covering ``max_frames`` (None = too
        big for single-dispatch mode; callers fall back to the chunk path)."""
        for b in getattr(self._rcfg, "segment_buckets", ()):
            if max_frames <= b:
                return b
        return None

    def decode_segment(self, state: dict, key: jax.Array, gen: GenParams, *,
                       max_frames: int, frames_after_eos: int, bucket: int,
                       window: int = 0):
        """One-dispatch segment decode (see _decode_segment_impl).  Not
        available with staged codec (the fused program contains both stages)
        or per-slot knob vectors (B=1 only)."""
        if not hasattr(self, "_decode_segment"):
            self._decode_segment = jax.jit(
                self._decode_segment_impl,
                static_argnames=("n_frames", "lsd_steps", "clamped", "window",
                                 "group"),
                donate_argnums=(1,),
            )
        gen_args = (
            jnp.full((1,), gen.temp, jnp.float32),
            jnp.float32(gen.noise_clamp if gen.noise_clamp is not None else 0.0),
            jnp.full((1,), gen.eos_threshold, jnp.float32),
        )
        return self._decode_segment(
            self.params, state, key, gen_args, jnp.int32(max_frames),
            jnp.int32(frames_after_eos), n_frames=bucket,
            lsd_steps=gen.lsd_decode_steps,
            clamped=gen.noise_clamp is not None, window=window,
        )

    # -- stage (pipeline) parallelism ---------------------------------------

    def enable_staged_codec(self, codec_device) -> None:
        """Two-device pipeline parallelism: AR scan on this engine's default
        device, Mimi codec on ``codec_device``.

        The decode chunk splits into two programs chained by an async
        device-to-device latent transfer ([B, 32, K] — tiny next to the
        audio).  The host dispatch pipeline (tts._SegmentRun / pipeline_depth)
        already queues chunks ahead, so chunk N's codec runs on the second
        device WHILE chunk N+1's AR scan runs on the first — on real
        multi-chip hardware steady-state per-frame time drops from
        (AR + codec) to max(AR, codec), ~0.5 -> ~0.3 ms/frame for the full
        model.  The reference measured and rejected the same split on CPU
        (sequential by design, tts_model.rs:705-854) because two CPU thread
        pools contend; two TPU chips don't.

        Single-stream engines only — the continuous batcher keeps the fused
        single-device program (its slot admission writes into the Mimi state
        in the same program as the FlowLM cache).  Numerics match the chunked
        single-device program exactly op-for-op; vs the fused-segment
        while_loop program, differences stay within 1 int16 PCM LSB
        (see tests/test_stages.py).
        """
        if self.batch != 1:
            raise ValueError("staged codec supports batch_size=1 engines; "
                             "the continuous batcher keeps the fused program")
        self._codec_device = codec_device
        self._mimi_params_staged = jax.device_put(self.params["mimi"],
                                                  codec_device)
        self._decode_ar = jax.jit(
            self._ar_impl,
            static_argnames=("n_frames", "lsd_steps", "clamped", "window"),
            donate_argnums=(1,),
        )
        self._decode_codec = jax.jit(self._codec_impl, donate_argnums=(1,))

    def window_for(self, max_pos: int, n_frames: int) -> int:
        """Smallest window bucket covering max(pos) + n_frames (0 = full)."""
        need = max_pos + n_frames
        for w in getattr(self._rcfg, "window_buckets", ()):
            if need <= w < self._rcfg.max_seq:
                return w
        return 0

    def decode_frames(self, state: dict, key: jax.Array, n_frames: int,
                      gen: GenParams, *, temps: np.ndarray | None = None,
                      eos_thresholds: np.ndarray | None = None,
                      window: int = 0,
                      lsd_vec: np.ndarray | None = None,
                      clamp_vec: np.ndarray | None = None,
                      lora_w=None,
                      ) -> tuple[dict, jax.Array, np.ndarray, np.ndarray]:
        """``temps`` / ``eos_thresholds``: optional per-slot [B] vectors for the
        continuous batcher; default broadcasts the request GenParams.
        ``window``: static attention window (see _decode_impl).
        ``lsd_vec`` / ``clamp_vec``: per-slot lsd_decode_steps / noise clamp
        (< 0 = unclamped; 0 = hard zero-clamp, like scalar noise_clamp=0.0) —
        the static step ceiling is the batch max rounded up to a power of
        two, bounding compiled-variant count at log2(max_lsd).
        ``lora_w``: per-slot [B, N] adapter mixing rows (requires a bank,
        see set_adapter_bank); None keeps the plain (lora-free) program."""
        b = state["pos"].shape[0]
        if temps is None:
            temps = np.full((b,), gen.temp, np.float32)
        if eos_thresholds is None:
            eos_thresholds = np.full((b,), gen.eos_threshold, np.float32)
        if lsd_vec is not None or clamp_vec is not None:
            if lsd_vec is None:
                lsd_vec = np.full((b,), gen.lsd_decode_steps, np.int32)
            if np.any(np.asarray(lsd_vec) < 1):
                # 0 would negative-index the time-embedding tables and emit
                # raw noise as the slot's latent — fail at the API boundary
                raise ValueError(f"lsd_vec entries must be >= 1, got {lsd_vec}")
            if clamp_vec is None:
                clamp_vec = np.full(
                    (b,), gen.noise_clamp if gen.noise_clamp is not None
                    else -1.0, np.float32)
            lsd_steps = 1 << (int(max(1, lsd_vec.max())) - 1).bit_length()
            gen_args = (jnp.asarray(temps, jnp.float32),
                        jnp.asarray(clamp_vec, jnp.float32),
                        jnp.asarray(eos_thresholds, jnp.float32))
            lsd_arg = jnp.asarray(np.asarray(lsd_vec, np.int32))
            clamped = "vec"
        else:
            gen_args = (
                jnp.asarray(temps, jnp.float32),
                jnp.float32(gen.noise_clamp if gen.noise_clamp is not None
                            else 0.0),
                jnp.asarray(eos_thresholds, jnp.float32),
            )
            lsd_arg = None
            lsd_steps = gen.lsd_decode_steps
            clamped = gen.noise_clamp is not None
        if lora_w is not None:
            if self._lora_stacks is None:
                raise ValueError("lora_w requires set_adapter_bank() first")
            lora, lora_w = self._lora_stacks, jnp.asarray(lora_w, jnp.float32)
        else:
            lora = None
        if self._codec_device is not None:
            flow_state = {k: state[k] for k in ("kc", "vc", "pos", "latent")}
            flow_st, key, denorm, is_eos = self._decode_ar(
                self.params, flow_state, key, gen_args, lsd_arg, lora, lora_w,
                n_frames=n_frames, lsd_steps=lsd_steps, clamped=clamped,
                window=window)
            # async inter-device latent hop ([B, 32, K]); on multi-chip
            # hardware this rides the ICI while the next AR chunk dispatches
            denorm = jax.device_put(denorm, self._codec_device)
            mimi_state, audio = self._decode_codec(
                self._mimi_params_staged, state["mimi"], denorm)
            return {**flow_st, "mimi": mimi_state}, key, audio, is_eos
        return self._decode(
            self.params, state, key, gen_args, lsd_arg, lora, lora_w,
            n_frames=n_frames, lsd_steps=lsd_steps, clamped=clamped,
            window=window,
        )

    # -- voice encoding ----------------------------------------------------

    def _encode_impl(self, params, audio):
        lat = mimi.encode_to_latent(params["mimi"], self.plans, audio,
                                    block=self._rcfg.encoder_block)
        return flow_lm.speaker_project(params["flow_lm"], lat.transpose(0, 2, 1))

    def _encode_chunk_impl(self, params, state, audio):
        lat, state = mimi.encode_step(params["mimi"], self.plans, state, audio)
        return flow_lm.speaker_project(params["flow_lm"],
                                       lat.transpose(0, 2, 1)), state

    @property
    def prompt_reserve(self) -> int:
        """Cache positions held back from voice-prompt conditioning: room for
        a text segment plus a typical generated segment (~15 s).  Shared by
        encode_voice's cap and TTSModel.extend_voice_state's clipping so the
        two budgets cannot drift."""
        return max(self._rcfg.text_buckets) + 192

    def encode_voice(self, audio: np.ndarray,
                     cap: bool = True) -> tuple[jnp.ndarray, int]:
        """24 kHz mono [T] or [1, T] -> ([1, >=frames, d_model] conditioning, frames).

        ``cap=False`` skips the cache-budget truncation and encodes the WHOLE
        prompt (the chunked streaming encoder handles any length) — used by
        the compressive overflow mode (tts.get_voice_state_from_audio), which
        selects a budget-sized subset of the frames AFTER encoding.

        The returned conditioning keeps its BUCKET-PADDED width (frames
        beyond the returned count are causal-padding garbage — consumers
        mask by the count, e.g. prefill_conditioning's n_valid).  Slicing to
        the exact frame count here would compile one eager device op per
        distinct prompt length — seconds per new length on remote-compile
        backends.

        Short prompts (up to the largest encode bucket) run one batch encode,
        bucketed on duration; longer prompts stream through fixed-size chunks
        with carried conv/ring-KV state (mimi.encode_step) — any length in ONE
        extra compiled program, replacing the reference's adaptive 120/180/240
        chunking (tts_model.rs:530-577).  The encoder stack is causal, so
        right-padding only affects frames beyond the valid count, which are
        sliced off.  Prompts are bounded only by the FlowLM cache: frames are
        capped at max_seq minus a generation reserve.
        """
        audio = np.asarray(audio, np.float32).reshape(1, 1, -1)
        reserve = self.prompt_reserve
        max_frames = self._rcfg.max_seq - reserve
        if max_frames <= 0:
            raise ValueError(
                f"max_seq={self._rcfg.max_seq} leaves no room for voice "
                f"prompts after the generation reserve ({reserve} frames)")
        if cap and audio.shape[-1] > max_frames * self.frame_size:
            logger.warning(
                "voice prompt %0.1f s exceeds the cache budget (%d frames); "
                "truncating", audio.shape[-1] / self.cfg.mimi.sample_rate,
                max_frames)
            audio = audio[..., : max_frames * self.frame_size]
        t = audio.shape[-1]
        n_frames = -(-t // self.frame_size)
        buckets = [int(s * self.cfg.mimi.sample_rate)
                   for s in self._rcfg.encode_seconds_buckets]
        if t <= buckets[-1]:
            target = _bucket(t, tuple(buckets))
            if t < target:
                audio = np.pad(audio, ((0, 0), (0, 0), (0, target - t)))
            cond = self._encode(self.params, jnp.asarray(audio))
            return cond, n_frames
        return self._encode_chunked(audio, n_frames), n_frames

    def _encode_chunked(self, audio: np.ndarray, n_frames: int) -> jnp.ndarray:
        if not hasattr(self, "_encode_chunk"):
            self._encode_chunk = jax.jit(self._encode_chunk_impl,
                                         donate_argnums=(1,))
            self._init_encode_state = jax.jit(
                lambda: mimi.init_encode_state(self.plans, 1, self.dtype))
            # eager ops are per-op remote compiles on this backend: the final
            # assembly runs jitted (one cached program per chunk count)
            self._concat_cond = jax.jit(
                lambda *cs: jnp.concatenate(cs, axis=1))
        chunk_frames = max(1, self._rcfg.voice_prompt_chunk_frames)
        samples = chunk_frames * self.frame_size
        pad = (-audio.shape[-1]) % samples
        if pad:
            audio = np.pad(audio, ((0, 0), (0, 0), (0, pad)))
        state = self._init_encode_state()
        conds = []
        for start in range(0, audio.shape[-1], samples):
            cond, state = self._encode_chunk(
                self.params, state, jnp.asarray(audio[..., start:start + samples]))
            conds.append(cond)
        full = conds[0] if len(conds) == 1 else self._concat_cond(*conds)
        return full


    # -- generation-side helpers -------------------------------------------

    def chunk_schedule(self, max_frames: int,
                       low_latency: bool = True) -> list[int]:
        """Decode chunk sizes covering ``max_frames`` (tail may overshoot; the
        host truncates).  Every size comes from the compiled-variant set
        (config decode_chunks).

        ``low_latency=True`` (streaming): warm-up ramp for fast first audio,
        then the largest chunk.  ``False`` (whole-utterance generate): largest
        chunk from the start, tail right-sized to the smallest variant that
        covers the remainder — the ramp's small chunks each cost ~10 ms of
        fixed device work, pure waste when nobody hears audio early.  The
        per-frame RNG key chain advances one split per frame regardless of
        chunking, so the schedule does not change the audio."""
        schedule = list(self._rcfg.decode_chunks)
        out, total = [], 0
        i = len(schedule) - 1 if not low_latency else 0
        while total < max_frames:
            c = schedule[min(i, len(schedule) - 1)]
            remaining = max_frames - total
            if c > remaining:
                # smallest compiled chunk covering the tail (less overshoot)
                c = next(s for s in schedule if s >= remaining)
            out.append(c)
            total += c
            i += 1
        return out
