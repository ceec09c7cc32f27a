"""HTTP server (aiohttp): health, generate, stream, tts, OpenAI-compatible speech.

Route surface mirrors the reference (crates/pocket-tts-cli/src/server/routes.rs:19-28):

  GET  /health            -> {"status": "ok", ...}
  POST /generate          -> whole WAV     {text, voice?, temperature?, lsd_steps?,
                                            eos_threshold?, noise_clamp?,
                                            continuation_frames?}
  POST /stream            -> chunked raw s16le PCM (same body)
  POST /tts               -> multipart (text, voice_url | voice_wav) -> WAV
  POST /v1/audio/speech   -> OpenAI-compatible {model, input, voice} -> WAV

Generation runs in a single-worker thread pool behind a lock, like the reference's
async-mutex + spawn_blocking (handlers.rs:128-209); continuous batching replaces
this in the batched serving tier (runtime/batcher.py).
"""

from __future__ import annotations

import asyncio
import collections
import concurrent.futures
import json
import logging
import signal
import threading
import time

import numpy as np

from pocket_tts_tpu import audio as audio_io
from pocket_tts_tpu.server import voices as voices_mod
from pocket_tts_tpu.tts import TTSModel

logger = logging.getLogger(__name__)


class AdapterError(ValueError):
    """Unknown/unloadable adapter name — a client error (400)."""


class ServerState:
    def __init__(self, model: TTSModel, *, voice_cache_capacity: int = 8,
                 default_voice: str = voices_mod.DEFAULT_VOICE,
                 batcher=None, adapters: dict[str, str] | None = None,
                 adapter_cache_capacity: int = 2,
                 bankable: frozenset = frozenset()):
        self.model = model
        self.cache = voices_mod.VoiceStateCache(voice_cache_capacity)
        self.default_voice = default_voice
        self.batcher = batcher  # ContinuousBatcher: concurrent requests share
        # one resident decode loop instead of serializing behind self.lock
        # Adapter names in the batcher's AdapterBank: requests for these ride
        # the batched decode loop as per-slot LoRA rows (concurrent multi-
        # adapter serving); other adapters (full-checkpoint fine-tunes,
        # non-backbone targets) keep the merged single-stream path
        self.bankable = bankable
        # Fine-tuned voices: name -> checkpoint/LoRA artifact path (CLI
        # --adapter).  Adapted models build lazily into a small LRU — each
        # holds its own FlowLM copy in HBM (the Mimi/text subtrees alias the
        # base), plus a PER-ADAPTER voice-state cache: a VoiceState is a KV
        # snapshot of the voice prefill THROUGH the adapted backbone, so base
        # voice states are numerically wrong for an adapted model.
        self.adapters = dict(adapters or {})
        self._adapted: collections.OrderedDict[str, tuple] = \
            collections.OrderedDict()
        self._adapted_lock = threading.Lock()
        self._adapter_cap = max(1, adapter_cache_capacity)
        self._voice_cache_capacity = voice_cache_capacity
        self.lock = asyncio.Lock()
        # each in-flight stream OCCUPIES one worker for its whole duration
        # (the producer runs in the pool), so the pool must cover every
        # batcher slot plus headroom for voice resolution — 8 workers against
        # a B=16 batcher stalled request 9 until a whole utterance finished
        workers = (batcher.batch + 4) if batcher is not None else 1
        self.pool = concurrent.futures.ThreadPoolExecutor(max_workers=workers)
        self.started_at = time.time()

    def adapted(self, name: str):
        """(model, voice_cache) for a registered fine-tuned adapter.

        Builds lazily (checkpoint load + merge + engine — seconds; call off
        the event loop) into an LRU of ``adapter_cache_capacity``.  Two
        concurrent misses may build the same adapter twice — the build runs
        OUTSIDE the lock because it holds device work; the duplicate is
        benign (last insert wins, the loser is garbage)."""
        if name not in self.adapters:
            raise AdapterError(
                f"unknown adapter {name!r}; registered: "
                f"{sorted(self.adapters) or 'none'}")
        with self._adapted_lock:
            pair = self._adapted.get(name)
            if pair is not None:
                self._adapted.move_to_end(name)
                return pair
        from pocket_tts_tpu.training import apply_adapted

        try:
            model = apply_adapted(self.model, self.adapters[name])
        except (OSError, ValueError) as e:
            raise AdapterError(f"adapter {name!r} failed to load: {e}") from e
        pair = (model, voices_mod.VoiceStateCache(self._voice_cache_capacity))
        with self._adapted_lock:
            self._adapted[name] = pair
            self._adapted.move_to_end(name)
            while len(self._adapted) > self._adapter_cap:
                evicted, _ = self._adapted.popitem(last=False)
                logger.info("adapter cache evicted %s", evicted)
        return pair

    def resolve(self, spec: str | None, *, model: TTSModel | None = None,
                cache=None):
        """Resolve a voice spec to a VoiceState.

        An EXPLICITLY requested voice that fails resolves to a client error
        (VoiceResolutionError -> 400): silently substituting the
        unconditioned state would return 200 with wrong-voice audio.  The
        DEFAULT voice still falls back (offline servers can't fetch the
        hf:// stock voices; the server must stay usable).

        ``model``/``cache`` select an adapted model's world — voice prefill
        runs through its backbone, so states are cached per adapter."""
        model = model if model is not None else self.model
        cache = cache if cache is not None else self.cache
        explicit = spec is not None and spec != self.default_voice
        spec = spec or self.default_voice
        try:
            return voices_mod.resolve_voice_cached(model, spec, cache)
        except Exception as e:  # noqa: BLE001
            if explicit:
                raise voices_mod.VoiceResolutionError(
                    f"voice {spec!r} unresolvable: {e}") from e
            logger.warning("voice %r unresolvable (%s); using unconditioned state",
                           spec, e)
            return model.get_voice_state()

    def model_with_overrides(self, body: dict,
                             base: TTSModel | None = None) -> TTSModel:
        return (base if base is not None else self.model).with_params(
            temp=body.get("temperature"),
            # "lsd_steps" is the reference API field (handlers.rs:89); accept
            # the library's "lsd_decode_steps" spelling as an alias
            lsd_decode_steps=body.get("lsd_steps",
                                      body.get("lsd_decode_steps")),
            eos_threshold=body.get("eos_threshold"),
            noise_clamp=body.get("noise_clamp"),
        )


def create_app(state: ServerState):
    from aiohttp import web

    routes = web.RouteTableDef()

    def _int_field(body: dict, name: str, default: int = 0) -> int:
        """Parse an optional integer request field; malformed values are a
        client error (json 400), never an unhandled 500."""
        val = body.get(name)
        if val is None or val == "":
            return default
        try:
            if isinstance(val, bool):  # json true/false would pass int() as 1/0
                raise ValueError(name)
            return int(val)
        except (TypeError, ValueError):
            raise web.HTTPBadRequest(
                text=json.dumps({"error": f"{name} must be an integer"}),
                content_type="application/json")

    def _model_for(body: dict, base: TTSModel | None = None) -> TTSModel:
        """Per-request overrides; invalid knob values (lsd_steps < 1,
        negative temperature) are a 400, not a 500 or silent garbage."""
        try:
            return state.model_with_overrides(body, base)
        except (ValueError, TypeError) as e:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": str(e)}),
                content_type="application/json")

    async def _adapted_for(body: dict):
        """(base model, voice cache) for the request's optional ``adapter``
        field — a fine-tuned checkpoint/LoRA registered at startup.  The
        build (load + merge + engine) runs off the event loop; an unknown or
        broken adapter is a 400."""
        name = body.get("adapter")
        if not name:
            return state.model, state.cache
        loop = asyncio.get_running_loop()
        try:
            return await loop.run_in_executor(
                state.pool, state.adapted, str(name))
        except AdapterError as e:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": str(e)}),
                content_type="application/json")

    async def _json_body(request) -> dict:
        """Malformed request bodies are a client error (400) — an unhandled
        json.JSONDecodeError would 500, and the fleet router treats 5xx as
        worker failure, so one bad client request could mark every worker
        unhealthy (review finding r4)."""
        try:
            body = await request.json()
        except Exception:  # noqa: BLE001 (json + unicode decode errors)
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "request body must be valid JSON"}),
                content_type="application/json")
        if not isinstance(body, dict):
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "request body must be a JSON object"}),
                content_type="application/json")
        return body

    def _route_to_batcher(cont: int, adapter: str | None) -> bool:
        """Occupancy-adaptive routing policy, shared by /generate and
        /stream (the two handlers MUST agree or identical requests route
        differently by endpoint): concurrent traffic rides the batcher —
        including adapter requests the bank covers — while lone requests,
        continuations, and non-bankable adapters take the single-stream
        path.  The lock check + the caller's following `async with` have no
        await between them, so the decision is atomic on the event loop."""
        return (state.batcher is not None and cont <= 0
                and (adapter is None or adapter in state.bankable)
                and (state.lock.locked() or not state.batcher.idle()))

    async def _resolve_voice(body: dict, base: TTSModel | None = None,
                             vcache=None):
        """Voice resolution off the event loop (it can run the Mimi encoder —
        seconds of device work); an unresolvable EXPLICIT voice is a 400."""
        loop = asyncio.get_running_loop()
        try:
            return await loop.run_in_executor(
                state.pool, lambda: state.resolve(
                    body.get("voice"), model=base, cache=vcache))
        except voices_mod.VoiceResolutionError as e:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": str(e)}),
                content_type="application/json")

    @routes.get("/")
    async def index(request):
        from pathlib import Path

        html = (Path(__file__).parent / "webui.html").read_text()
        return web.Response(text=html, content_type="text/html")

    @routes.get("/metrics")
    async def metrics(request):
        """Prometheus text exposition of the serving counters (beyond the
        reference's /health-only observability)."""
        lines = [
            "# TYPE pocket_tts_uptime_seconds gauge",
            f"pocket_tts_uptime_seconds {time.time() - state.started_at:.1f}",
        ]
        if state.batcher is not None:
            st = state.batcher.stats()
            for key in ("dispatches", "warm_dispatches", "serve_dispatches",
                        "frames_decoded", "useful_frames",
                        "early_retirements", "preemptions",
                        "requests_submitted", "requests_completed",
                        "requests_cancelled"):
                lines.append(f"# TYPE pocket_tts_{key} counter")
                lines.append(f"pocket_tts_{key} {st[key]}")
            for key in ("active_requests", "queued_segments"):
                lines.append(f"# TYPE pocket_tts_{key} gauge")
                lines.append(f"pocket_tts_{key} {st[key]}")
            if st["useful_ratio"] is not None:  # batch compute efficiency
                lines.append("# TYPE pocket_tts_useful_ratio gauge")
                lines.append(f"pocket_tts_useful_ratio {st['useful_ratio']}")
            lines.append("# TYPE pocket_tts_batcher_dead gauge")
            lines.append(f"pocket_tts_batcher_dead {int(st['dead'])}")
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    @routes.get("/health")
    async def health(request):
        out = {
            "status": "ok",
            "model": "pocket-tts-tpu",
            "uptime_s": round(time.time() - state.started_at, 1),
            "real_weights": state.model.has_real_weights,
        }
        if state.adapters:
            out["adapters"] = sorted(state.adapters)
        if state.batcher is not None:
            out["batcher"] = state.batcher.stats()
            if out["batcher"].pop("dead"):
                out["status"] = "degraded"  # decode loop crashed; fail-open
        return web.json_response(out)

    async def _generate_wav(body: dict) -> bytes:
        base, vcache = await _adapted_for(body)
        model = _model_for(body, base)
        text = body.get("text") or body.get("input")
        if not text or not str(text).strip():
            raise web.HTTPBadRequest(text=json.dumps({"error": "text is required"}),
                                     content_type="application/json")
        loop = asyncio.get_running_loop()
        voice = await _resolve_voice(body, base, vcache)
        cont = _int_field(body, "continuation_frames")
        # Routing: see _route_to_batcher.  Bankable adapter requests ride
        # the batcher as per-slot LoRA rows (the voice state above was
        # prefilled through the adapted backbone via the per-adapter cache).
        adapter = str(body["adapter"]) if body.get("adapter") else None
        if _route_to_batcher(cont, adapter):
            # per-request lsd_decode_steps / noise_clamp ride the batch as
            # per-slot data (engine lsd_vec/clamp_vec) — no single-flight path
            wav = await loop.run_in_executor(
                state.pool, lambda: state.batcher.generate(
                    str(text), voice, model.gen, adapter=adapter))
        else:
            # single-stream path: lone requests (occupancy 1) and
            # continuation requests, whose per-segment conditioning depends
            # on previously fetched audio and cannot ride the batch
            async with state.lock:
                wav = await loop.run_in_executor(
                    state.pool, lambda: model.generate_with_pauses(
                        str(text), voice, continuation_frames=cont))
        return audio_io.wav_bytes(wav, model.sample_rate)

    @routes.post("/generate")
    async def generate(request):
        body = await _json_body(request)
        data = await _generate_wav(body)
        return web.Response(body=data, content_type="audio/wav")

    async def _stream_audio(request, body: dict, *, wav_compat: bool = False):
        """Shared chunked-streaming path.

        ``wav_compat=False`` (POST /stream): raw s16le PCM chunks.
        ``wav_compat=True`` (POST /tts with compat=python): the oracle's
        streaming-WAV contract (python-reference main.py:114-171,
        data/audio.py:37-126) — a WAV header with a sentinel frame count,
        the first bytes held back until FIRST_CHUNK_LENGTH_SECONDS of audio
        is buffered, and 200 ms of trailing silence appended."""
        base, vcache = await _adapted_for(body)
        model = _model_for(body, base)
        text = body.get("text", "")
        if not str(text).strip():
            raise web.HTTPBadRequest(text=json.dumps({"error": "text is required"}),
                                     content_type="application/json")
        # parse/validate before the response is prepared — after prepare()
        # the status line is sent and a 400 can no longer be raised
        cont = _int_field(body, "continuation_frames")
        voice = await _resolve_voice(body, base, vcache)

        if wav_compat:
            import os

            sr = state.model.sample_rate
            try:
                prebuf_s = float(os.environ.get("FIRST_CHUNK_LENGTH_SECONDS",
                                                "0"))
            except ValueError:
                logger.warning("invalid FIRST_CHUNK_LENGTH_SECONDS=%r; "
                               "using 0",
                               os.environ["FIRST_CHUNK_LENGTH_SECONDS"])
                prebuf_s = 0.0
            prebuffer_bytes = 2 * int(sr * prebuf_s)
            trailing = bytes(2 * int(sr * 0.2))
            headers = {"Content-Type": "audio/wav",
                       "Content-Disposition":
                           "attachment; filename=generated_speech.wav"}
        else:
            headers = {"Content-Type":
                       "audio/pcm;rate=24000;encoding=signed-int;bits=16"}
        resp = web.StreamResponse(headers=headers)
        await resp.prepare(request)

        import threading

        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue(maxsize=10)
        cancelled = threading.Event()  # set when the client goes away

        def put(item) -> bool:
            """Bounded put that gives up once the consumer is gone — a dropped
            connection must never wedge a pool worker on a full queue."""
            fut = asyncio.run_coroutine_threadsafe(queue.put(item), loop)
            while not cancelled.is_set():
                try:
                    fut.result(timeout=0.5)
                    return True
                except concurrent.futures.TimeoutError:
                    # NOT the builtin TimeoutError on Python 3.10 (they merge
                    # in 3.11): catching the builtin let normal backpressure
                    # fall into the except-Exception arm and silently
                    # truncate the stream for a connected client
                    continue
                except Exception:  # loop closing / cancelled
                    return False
            fut.cancel()
            return False

        def producer():
            try:
                if use_batcher:
                    source = state.batcher.stream(str(text), voice, model.gen,
                                                  adapter=adapter)
                else:
                    source = model.generate_stream_long(
                        str(text), voice, continuation_frames=cont)
                try:
                    for chunk in source:
                        if not put(audio_io.pcm_i16_le_bytes(chunk)):
                            logger.info("stream client gone; aborting generation")
                            return
                finally:
                    # deterministic cancellation (the batcher retires the
                    # request's remaining segments), not GC-timed
                    source.close()
                put(None)
            except Exception as e:  # noqa: BLE001
                logger.exception("stream producer failed")
                put(e)

        import contextlib

        # routing decided here with no await before the lock acquisition
        # below (atomic on the event loop).  Occupancy CAN change earlier —
        # voice resolution above awaits in the executor — but every stale
        # outcome is benign: worst case a second stream rides the batcher
        # (slightly higher latency than the exclusive single-stream engine)
        # or briefly queues on the lock.  Correctness never depends on it.
        adapter = str(body["adapter"]) if body.get("adapter") else None
        use_batcher = _route_to_batcher(cont, adapter)
        ctx = contextlib.nullcontext() if use_batcher else state.lock
        held: list[bytes] = []  # wav_compat pre-buffer (header + first bytes)
        held_size = 0
        if wav_compat:
            held.append(audio_io.wav_header(state.model.sample_rate))
        stream_error: Exception | None = None
        async with ctx:
            task = loop.run_in_executor(state.pool, producer)
            try:
                while True:
                    item = await queue.get()
                    if item is None:
                        break
                    if isinstance(item, Exception):
                        stream_error = item
                        break
                    if held is not None and wav_compat:
                        held.append(item)
                        held_size += len(item)
                        if held_size >= prebuffer_bytes:
                            await resp.write(b"".join(held))
                            held = None
                        continue
                    await resp.write(item)
            finally:
                cancelled.set()  # unblock the producer on any exit path
                while not queue.empty():  # drain so pending puts resolve
                    queue.get_nowait()
                await task
        if stream_error is not None:
            # the 200 status line is already on the wire — ABORT the
            # connection instead of terminating it cleanly, so the client
            # can distinguish truncation from success (a clean EOF here
            # previously made a mid-stream crash look like a complete
            # response; review finding r4)
            if request.transport is not None:
                request.transport.close()
            raise stream_error
        if wav_compat:
            if held is not None:  # short utterance never hit the threshold
                await resp.write(b"".join(held))
            await resp.write(trailing)
        await resp.write_eof()
        return resp

    @routes.post("/stream")
    async def stream(request):
        body = await _json_body(request)
        return await _stream_audio(request, body)

    @routes.post("/tts")
    async def tts(request):
        """Python-reference-compatible multipart endpoint (main.py:114-171).

        Response contract: by default a COMPLETE WAV (the Rust handler's
        behavior, handlers.rs:312-372).  With ``compat=python`` (form or
        JSON field) it instead follows the Python oracle's streaming-WAV
        contract: chunked transfer, sentinel-length header,
        FIRST_CHUNK_LENGTH_SECONDS pre-buffer, 200 ms trailing silence
        (main.py:114-171, data/audio.py:37-126)."""
        body: dict = {}
        ctype = request.content_type
        if ctype.startswith("multipart") or ctype == "application/x-www-form-urlencoded":
            form = await request.post()
            if "text" in form:
                body["text"] = str(form["text"])
            if "compat" in form:
                body["compat"] = str(form["compat"])
            if "adapter" in form:
                body["adapter"] = str(form["adapter"])
            if "voice_url" in form:
                body["voice"] = str(form["voice_url"])
            if "voice_wav" in form:
                import base64 as b64

                raw = form["voice_wav"]
                raw = raw.file.read() if hasattr(raw, "file") else (
                    raw.encode() if isinstance(raw, str) else bytes(raw))
                body["voice"] = b64.b64encode(raw).decode()
        else:
            body = await _json_body(request)
        if str(body.get("compat", "")).lower() == "python":
            return await _stream_audio(request, body, wav_compat=True)
        data = await _generate_wav(body)
        return web.Response(body=data, content_type="audio/wav")

    @routes.post("/v1/audio/speech")
    async def openai_speech(request):
        """OpenAI-compatible endpoint (handlers.rs:378-398): {model, input, voice}."""
        body = await _json_body(request)
        data = await _generate_wav({
            "text": body.get("input"),
            "voice": body.get("voice"),
            "temperature": body.get("temperature"),
            "adapter": body.get("adapter"),
        })
        return web.Response(body=data, content_type="audio/wav")

    app = web.Application()
    app.add_routes(routes)
    return app


def start_server(model: TTSModel, host: str = "0.0.0.0", port: int = 8000, *,
                 voice_cache_capacity: int = 8,
                 default_voice: str = voices_mod.DEFAULT_VOICE,
                 prewarm: tuple[str, ...] = (), warmup: bool = True,
                 batch_size: int = 0,
                 adapters: dict[str, str] | None = None) -> None:
    """Blocking entry: preload default voice, prewarm LRU, warmup compile, serve
    (reference: crates/pocket-tts-cli/src/server/mod.rs:15-166).

    ``batch_size > 1`` enables continuous batching: concurrent requests share
    one resident decode loop (the reference serializes requests instead).
    ``adapters`` maps request-selectable names to fine-tuned checkpoint/LoRA
    artifact paths (CLI ``--adapter name=path``); formats are validated here
    so a typo fails at startup, not on the first request."""
    from aiohttp import web

    bank = None
    if adapters:
        from safetensors import safe_open

        from pocket_tts_tpu.training.lora import LORA_FORMAT
        from pocket_tts_tpu.training.trainer import FINETUNED_FORMAT

        from pocket_tts_tpu.training.lora import bankable_lora_targets

        bankable_paths: dict[str, str] = {}
        for name, path in adapters.items():
            with safe_open(str(path), framework="numpy") as f:
                fmt = (f.metadata() or {}).get("format")
                # LoRA adapters whose targets all lie on the batched delta
                # path can ride the decode loop as per-slot rows
                # (AdapterBank); anything else keeps the merged
                # single-stream path.  One shared definition of "bankable"
                # (lora.bankable_lora_targets) — a prefix check here once
                # admitted tf/norm1_w adapters the delta path silently drops
                if fmt == LORA_FORMAT and bankable_lora_targets(f.keys()):
                    bankable_paths[name] = str(path)
            if fmt not in (FINETUNED_FORMAT, LORA_FORMAT):
                raise ValueError(f"adapter {name!r}: {path} has unknown "
                                 f"format {fmt!r}")
        if bankable_paths and batch_size > 1:
            from pocket_tts_tpu.training.lora import build_adapter_bank

            bank = build_adapter_bank(bankable_paths)
            logger.info("adapter bank: %s ride the batched decode loop",
                        sorted(bank.names))

    batcher = None
    if batch_size > 1:
        from pocket_tts_tpu.runtime.batcher import batched_tts

        # 64-frame steady chunks are the measured throughput knee at B=16;
        # the admission ramp + serve chunk keep streaming first-chunk
        # latency bounded (docs/performance.md "Batched serving latency")
        batcher = batched_tts(model, batch_size=batch_size, chunk_frames=64,
                              depth=2, adapter_bank=bank)
    state = ServerState(model, voice_cache_capacity=voice_cache_capacity,
                        default_voice=default_voice, batcher=batcher,
                        adapters=adapters,
                        bankable=(frozenset(bank.names) if bank is not None
                                  else frozenset()))
    state.resolve(default_voice)
    for name in prewarm:
        state.resolve(name)
    if warmup:
        t0 = time.time()
        _ = model.generate("Warm up.", state.resolve(default_voice))
        # Build registered adapters up to the LRU capacity so the first
        # adapter request doesn't pay checkpoint load + merge + engine build
        # (seconds; any uncached decode compile on top of that).  Beyond
        # capacity the LRU would immediately evict, so stop there.
        for name in list(state.adapters)[:state._adapter_cap]:
            ta = time.time()
            adapted_model, _cache = state.adapted(name)
            _ = adapted_model.generate("Warm up.")
            logger.info("adapter %r prewarmed in %.1fs", name,
                        time.time() - ta)
        if batcher is not None:
            # compile every (chunk, window) decode variant up front: a lazy
            # compile would block every in-flight stream whenever the first
            # request crosses an uncompiled combination
            batcher.warmup()
            for _chunk in batcher.stream("Warm up.",
                                         state.resolve(default_voice)):
                pass
        logger.info("warmup generation in %.1fs", time.time() - t0)

    app = create_app(state)
    logger.info("serving on http://%s:%d", host, port)
    web.run_app(app, host=host, port=port, handle_signals=True, print=None)
