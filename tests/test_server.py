"""In-process HTTP server tests (aiohttp test client) — mirrors the reference's
tower::oneshot server tests (crates/pocket-tts-cli/tests/server_tests.rs) —
plus CLI end-to-end generation (cli_tests.rs)."""

import io
import json
import sys
import wave

import numpy as np
import pytest

pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from pocket_tts_tpu import weights  # noqa: E402
from pocket_tts_tpu.models.mimi import MimiPlans  # noqa: E402
from pocket_tts_tpu.runtime.engine import GenParams  # noqa: E402
from pocket_tts_tpu.server.app import ServerState, create_app  # noqa: E402
from pocket_tts_tpu.tts import TTSModel  # noqa: E402
from tests.test_tts import CFG  # noqa: E402


@pytest.fixture(scope="module")
def model():
    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    return TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)


@pytest.fixture()
def client(model, event_loop=None):
    import asyncio

    loop = asyncio.new_event_loop()
    state = ServerState(model)
    app = create_app(state)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


def _check_wav(data: bytes) -> int:
    with wave.open(io.BytesIO(data), "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        return f.getnframes()


def test_health(client):
    c, loop = client

    async def go():
        resp = await c.get("/health")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "ok"

    loop.run_until_complete(go())


def test_generate_returns_wav(client):
    c, loop = client

    async def go():
        resp = await c.post("/generate", json={"text": "Hello from the server."})
        assert resp.status == 200
        assert resp.content_type == "audio/wav"
        return await resp.read()

    data = loop.run_until_complete(go())
    assert _check_wav(data) > 0


def test_generate_missing_text_400(client):
    c, loop = client

    async def go():
        resp = await c.post("/generate", json={})
        return resp.status

    assert loop.run_until_complete(go()) == 400


def test_stream_pcm(client):
    c, loop = client

    async def go():
        resp = await c.post("/stream", json={"text": "Stream me some audio."})
        assert resp.status == 200
        return await resp.read()

    data = loop.run_until_complete(go())
    assert len(data) > 0 and len(data) % 2 == 0
    pcm = np.frombuffer(data, "<i2")
    assert np.isfinite(pcm.astype(np.float32)).all()


def test_openai_speech(client):
    c, loop = client

    async def go():
        resp = await c.post("/v1/audio/speech", json={
            "model": "pocket-tts", "input": "OpenAI compatible.", "voice": "alba"})
        assert resp.status == 200
        return await resp.read()

    assert _check_wav(loop.run_until_complete(go())) > 0


def test_tts_multipart(client):
    c, loop = client

    async def go():
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("text", "Multipart request.")
        resp = await c.post("/tts", data=form)
        assert resp.status == 200
        return await resp.read()

    assert _check_wav(loop.run_until_complete(go())) > 0


def test_per_request_override(client):
    """Temperature/lsd overrides must not mutate the shared model."""
    c, loop = client
    model = c.server.app  # noqa: F841

    async def go():
        resp = await c.post("/generate", json={
            "text": "Override parameters please.", "temperature": 0.1,
            "lsd_steps": 2, "eos_threshold": -2.0})
        # the library spelling is accepted as an alias for the reference
        # API's "lsd_steps" (handlers.rs:89)
        resp2 = await c.post("/generate", json={
            "text": "Alias spelling please.", "lsd_decode_steps": 2})
        return resp.status, resp2.status

    assert loop.run_until_complete(go()) == (200, 200)


class TestAdapters:
    """Request-selectable fine-tuned adapters (--adapter name=path): per-
    request model swap on the single-stream path, per-adapter voice caches,
    unknown names are client errors."""

    @pytest.fixture(scope="class")
    def adapter_path(self, model, tmp_path_factory):
        from pocket_tts_tpu.training import finetune, save_lora_params

        rng = np.random.default_rng(4)
        pairs = [("adapter voice", rng.normal(size=(2 * 1920,)
                                              ).astype(np.float32) * 0.1)]
        tuned = finetune(model, pairs, steps=4, batch_size=1, lr=5e-2,
                         log_every=0, lora_rank=2)
        factors, rank, alpha = tuned._lora
        path = tmp_path_factory.mktemp("adapters") / "spk.lora.safetensors"
        save_lora_params(factors, path, rank=rank, alpha=alpha)
        return str(path)

    @pytest.fixture()
    def aclient(self, model, adapter_path):
        import asyncio

        loop = asyncio.new_event_loop()
        state = ServerState(model, adapters={"spk": adapter_path})
        app = create_app(state)
        client = TestClient(TestServer(app), loop=loop)
        loop.run_until_complete(client.start_server())
        yield client, loop
        loop.run_until_complete(client.close())
        loop.close()

    def test_adapter_selects_tuned_model(self, aclient):
        c, loop = aclient

        async def go():
            resp = await c.get("/health")
            assert (await resp.json())["adapters"] == ["spk"]

            base = await c.post("/generate", json={"text": "Adapter test."})
            assert base.status == 200
            tuned = await c.post("/generate", json={"text": "Adapter test.",
                                                    "adapter": "spk"})
            assert tuned.status == 200
            return await base.read(), await tuned.read()

        base_wav, tuned_wav = loop.run_until_complete(go())
        assert _check_wav(base_wav) > 0 and _check_wav(tuned_wav) > 0
        # temp=0: same request differs only through the adapter's weights
        assert base_wav != tuned_wav

    def test_adapter_streams_and_caches(self, aclient):
        c, loop = aclient

        async def go():
            resp = await c.post("/stream", json={"text": "Stream adapted.",
                                                 "adapter": "spk"})
            assert resp.status == 200
            pcm = await resp.read()
            assert len(pcm) > 0 and len(pcm) % 2 == 0

            # OpenAI-compatible route accepts the adapter field too
            resp = await c.post("/v1/audio/speech",
                                json={"input": "Speech.", "adapter": "spk"})
            assert resp.status == 200

        loop.run_until_complete(go())

    def test_unknown_adapter_400(self, aclient):
        c, loop = aclient

        async def go():
            resp = await c.post("/generate", json={"text": "x",
                                                   "adapter": "nope"})
            assert resp.status == 400
            assert "unknown adapter" in (await resp.json())["error"]
            resp = await c.post("/stream", json={"text": "x",
                                                 "adapter": "nope"})
            assert resp.status == 400

        loop.run_until_complete(go())

    def test_adapter_cache_eviction(self, model, adapter_path):
        """The adapted-model LRU is bounded; eviction drops the oldest."""
        state = ServerState(model, adapters={"a": adapter_path,
                                             "b": adapter_path},
                            adapter_cache_capacity=1)
        m_a, cache_a = state.adapted("a")
        assert state.adapted("a")[0] is m_a  # hit
        state.adapted("b")  # evicts a
        assert list(state._adapted) == ["b"]
        m_a2, _ = state.adapted("a")  # rebuilt after eviction
        assert m_a2 is not m_a
        from pocket_tts_tpu.server.app import AdapterError

        with pytest.raises(AdapterError, match="unknown adapter"):
            state.adapted("zzz")
        _ = cache_a

    def test_bankable_adapter_rides_batcher(self, model, adapter_path):
        """Backbone-LoRA adapter traffic on a busy batched server rides the
        batched decode loop as a per-slot row (VERDICT r4 #5: the old code
        bypassed the batcher for ANY adapter request), and matches the
        merged single-stream model at temp=0."""
        import asyncio

        from pocket_tts_tpu.runtime.batcher import batched_tts
        from pocket_tts_tpu.training import apply_adapted
        from pocket_tts_tpu.training.lora import build_adapter_bank

        bank = build_adapter_bank({"spk": adapter_path})
        batcher = batched_tts(model, batch_size=2, chunk_frames=4,
                              adapter_bank=bank)
        loop = asyncio.new_event_loop()
        state = ServerState(model, batcher=batcher,
                            adapters={"spk": adapter_path},
                            bankable=frozenset(bank.names))
        app = create_app(state)
        client = TestClient(TestServer(app), loop=loop)
        loop.run_until_complete(client.start_server())
        try:
            async def busy():
                # hold the single-stream lock: the adapter request must now
                # ride the batcher instead of queueing on the lock
                async with state.lock:
                    resp = await client.post("/generate", json={
                        "text": "Adapter rides the batch.",
                        "adapter": "spk"})
                    assert resp.status == 200
                    return await resp.read()

            wav = loop.run_until_complete(busy())
            assert batcher.stats()["requests_submitted"] == 1
            from pocket_tts_tpu import audio as audio_io

            got, sr = audio_io.read_wav(wav)
            want = apply_adapted(model, adapter_path).generate_with_pauses(
                "Adapter rides the batch.")
            assert got.shape[-1] == want.shape[-1]
            corr = np.corrcoef(got.reshape(-1), want)[0, 1]
            assert corr > 0.999, corr
        finally:
            loop.run_until_complete(client.close())
            loop.close()
            batcher.stop()


class TestCLI:
    def test_generate_to_wav(self, model, tmp_path, monkeypatch):
        from pocket_tts_tpu import cli

        out = tmp_path / "out.wav"
        monkeypatch.setattr(cli, "_load_model", lambda args: model)
        rc = cli.main(["generate", "--text", "CLI generation test.",
                       "--output", str(out), "--quiet"])
        assert rc == 0
        with wave.open(str(out), "rb") as f:
            assert f.getnframes() > 0

    def test_batch_manifest(self, model, tmp_path, monkeypatch):
        """`batch` synthesizes a mixed plain/JSONL manifest concurrently:
        one WAV per line, JSONL `output` names honored, failures reported
        per-item without sinking the run (exit 1)."""
        from pocket_tts_tpu import cli

        manifest = tmp_path / "lines.txt"
        manifest.write_text(
            "A plain manifest line.\n"
            "# a comment, skipped\n"
            '{"text": "A JSONL line.", "output": "named.wav"}\n'
            '{"text": "   "}\n',  # blank text -> per-item failure
            encoding="utf-8")
        out_dir = tmp_path / "out"
        monkeypatch.setattr(cli, "_load_model", lambda args: model)
        rc = cli.main(["batch", "--manifest", str(manifest),
                       "--out-dir", str(out_dir), "--batch-size", "2",
                       "--quiet"])
        assert rc == 1  # the blank-text item failed
        for name in ("00000.wav", "named.wav"):
            with wave.open(str(out_dir / name), "rb") as f:
                assert f.getnframes() > 0
        # the failed item is index 2 (plain line, JSONL line, blank-text)
        assert not (out_dir / "00002.wav").exists()

        for bad_line in ('{"voice": "no text key"}',        # missing text
                         '{"text": "x", "output": 5}',      # non-string output
                         '{"text": "x", "output": "../esc.wav"}',  # escape
                         '{"text": "x", "output": "/tmp/abs.wav"}'):
            bad = tmp_path / "bad.txt"
            bad.write_text(bad_line + "\n", encoding="utf-8")
            assert cli.main(["batch", "--manifest", str(bad),
                             "--out-dir", str(out_dir)]) == 2, bad_line
        # unresolvable voice: clean exit 2 before any synthesis
        bad = tmp_path / "bad.txt"
        bad.write_text('{"text": "x", "voice": "no-such-voice.wav"}\n',
                       encoding="utf-8")
        assert cli.main(["batch", "--manifest", str(bad),
                         "--out-dir", str(out_dir)]) == 2

    def test_batch_manifest_adapters(self, model, tmp_path, monkeypatch):
        """Manifest items select registered LoRA adapters; mixed items ride
        one decode loop; unregistered names fail before synthesis."""
        from pocket_tts_tpu import cli
        from pocket_tts_tpu.training import finetune, save_lora_params

        rng = np.random.default_rng(9)
        tuned = finetune(model, [("batch adapter voice",
                                  rng.normal(size=(2 * 1920,)
                                             ).astype(np.float32) * 0.1)],
                         steps=2, batch_size=1, lr=5e-2, log_every=0,
                         lora_rank=2)
        factors, rank, alpha = tuned._lora
        apath = tmp_path / "spk.lora.safetensors"
        save_lora_params(factors, apath, rank=rank, alpha=alpha)

        manifest = tmp_path / "m.txt"
        manifest.write_text(
            '{"text": "Tuned item.", "adapter": "spk", "output": "a.wav"}\n'
            '{"text": "Base item.", "output": "b.wav"}\n', encoding="utf-8")
        out_dir = tmp_path / "out"
        monkeypatch.setattr(cli, "_load_model", lambda args: model)
        rc = cli.main(["batch", "--manifest", str(manifest),
                       "--out-dir", str(out_dir), "--batch-size", "2",
                       "--adapter", f"spk={apath}", "--quiet"])
        assert rc == 0
        for name in ("a.wav", "b.wav"):
            with wave.open(str(out_dir / name), "rb") as f:
                assert f.getnframes() > 0
        # unregistered adapter name: clean exit 2 before any synthesis
        bad = tmp_path / "bad.txt"
        bad.write_text('{"text": "x", "adapter": "nope"}\n', encoding="utf-8")
        assert cli.main(["batch", "--manifest", str(bad),
                         "--out-dir", str(out_dir)]) == 2
        # malformed --adapter spec
        assert cli.main(["batch", "--manifest", str(manifest),
                         "--out-dir", str(out_dir),
                         "--adapter", "justaname"]) == 2

    def test_batch_write_failure_is_per_item(self, model, tmp_path,
                                             monkeypatch):
        """A WAV write error (disk full, bad subdir) fails that ITEM — the
        rest of the manifest still lands and the exit code is 1, not a
        traceback that cancels everything."""
        from pocket_tts_tpu import audio as audio_io, cli

        manifest = tmp_path / "m.txt"
        manifest.write_text("First utterance.\nSecond utterance.\n",
                            encoding="utf-8")
        out_dir = tmp_path / "out"
        monkeypatch.setattr(cli, "_load_model", lambda args: model)
        real_write = audio_io.write_wav

        def flaky_write(path, *a, **kw):
            if path.name == "00000.wav":
                raise OSError(28, "No space left on device")
            return real_write(path, *a, **kw)

        monkeypatch.setattr(audio_io, "write_wav", flaky_write)
        rc = cli.main(["batch", "--manifest", str(manifest),
                       "--out-dir", str(out_dir), "--quiet"])
        assert rc == 1
        assert not (out_dir / "00000.wav").exists()
        with wave.open(str(out_dir / "00001.wav"), "rb") as f:
            assert f.getnframes() > 0

    def test_batch_nested_output_and_frames_after_eos(self, model, tmp_path,
                                                      monkeypatch):
        """Relative subdir outputs are created; --frames-after-eos reaches
        the batcher (longer override -> more audio)."""
        from pocket_tts_tpu import cli

        manifest = tmp_path / "m.txt"
        manifest.write_text('{"text": "Nested output line.", '
                            '"output": "sub/dir/x.wav"}\n', encoding="utf-8")
        out = tmp_path / "o1"
        monkeypatch.setattr(cli, "_load_model", lambda args: model)
        assert cli.main(["batch", "--manifest", str(manifest),
                         "--out-dir", str(out), "--quiet"]) == 0
        with wave.open(str(out / "sub/dir/x.wav"), "rb") as f:
            short = f.getnframes()
        out2 = tmp_path / "o2"
        assert cli.main(["batch", "--manifest", str(manifest),
                         "--out-dir", str(out2), "--quiet",
                         "--frames-after-eos", "40"]) == 0
        with wave.open(str(out2 / "sub/dir/x.wav"), "rb") as f:
            assert f.getnframes() > short

    def test_stream_to_stdout(self, model, tmp_path, monkeypatch, capfdbinary):
        from pocket_tts_tpu import cli

        monkeypatch.setattr(cli, "_load_model", lambda args: model)
        rc = cli.main(["generate", "--text", "Stream to stdout.", "--stream"])
        assert rc == 0
        data = capfdbinary.readouterr().out
        assert len(data) > 0 and len(data) % 2 == 0

    def test_finetune_command_and_finetuned_flag(self, model, tmp_path,
                                                 monkeypatch):
        """`finetune` trains on a JSONL manifest of (text, audio) pairs,
        writes the artifact + a sample WAV, and `generate --finetuned` loads
        it through the REAL _load_model wiring (load_with_params patched to
        the small fixture model; --finetuned / --quantized layering runs)."""
        from pocket_tts_tpu import audio as audio_io, cli

        rng = np.random.default_rng(0)
        for name in ("a.wav", "b.wav"):
            wav = (rng.normal(size=model.sample_rate // 2) * 0.1
                   ).astype(np.float32)
            audio_io.write_wav(tmp_path / name, wav, model.sample_rate)
        manifest = tmp_path / "pairs.jsonl"
        manifest.write_text(
            '{"text": "first pair", "audio": "a.wav"}\n'
            "# comment\n"
            '{"text": "second pair", "audio": "b.wav"}\n', encoding="utf-8")

        monkeypatch.setattr(
            TTSModel, "load_with_params",
            classmethod(lambda cls_, *a, **k: model))
        art = tmp_path / "tuned.safetensors"
        rc = cli.main(["finetune", "--manifest", str(manifest),
                       "--output", str(art), "--steps", "2",
                       "--batch-size", "2", "--log-every", "0",
                       "--sample-text", "tuned sample"])
        assert rc == 0 and art.exists()
        with wave.open(str(tmp_path / "tuned.sample.wav"), "rb") as f:
            assert f.getnframes() > 0

        out = tmp_path / "gen.wav"
        rc = cli.main(["generate", "--text", "With tuned weights.",
                       "--finetuned", str(art), "--output", str(out),
                       "--quiet"])
        assert rc == 0
        with wave.open(str(out), "rb") as f:
            assert f.getnframes() > 0

        # LoRA path: tiny adapter artifact, loads through the same --finetuned
        lart = tmp_path / "tuned.lora.safetensors"
        rc = cli.main(["finetune", "--manifest", str(manifest),
                       "--output", str(lart), "--steps", "2",
                       "--batch-size", "2", "--log-every", "0",
                       "--lora-rank", "2"])
        assert rc == 0 and lart.exists()
        assert lart.stat().st_size < art.stat().st_size / 2
        rc = cli.main(["generate", "--text", "With a LoRA adapter.",
                       "--finetuned", str(lart), "--output", str(out),
                       "--quiet"])
        assert rc == 0

        # manifest error paths: bad JSONL and unreadable audio exit 2
        bad = tmp_path / "bad.jsonl"
        bad.write_text('{"text": "no audio key"}\n', encoding="utf-8")
        assert cli.main(["finetune", "--manifest", str(bad)]) == 2
        bad.write_text('{"text": "x", "audio": "missing.wav"}\n',
                       encoding="utf-8")
        assert cli.main(["finetune", "--manifest", str(bad)]) == 2


def test_generate_continuation_param(client):
    """continuation_frames is accepted over HTTP and changes the audio of a
    multi-segment utterance (teacher-forced continuation)."""
    c, loop = client
    text = ("The first sentence sets the voice in motion and keeps a steady "
            "measured pace through every single word of this opening line. "
            "The second sentence should carry that same voice onward without "
            "resetting the established prosody at the segment boundary here.")

    async def go(body):
        resp = await c.post("/generate", json=body)
        assert resp.status == 200
        return await resp.read()

    plain = loop.run_until_complete(go({"text": text}))
    cont = loop.run_until_complete(go({"text": text,
                                       "continuation_frames": 8}))
    _check_wav(plain)
    _check_wav(cont)
    assert plain != cont


def test_malformed_continuation_frames_is_400(client):
    """A malformed continuation_frames is a client error (json 400), not an
    unhandled 500 — and /stream validates it BEFORE the response is prepared
    (after prepare() the status line is already on the wire)."""
    c, loop = client

    async def go(route, body):
        resp = await c.post(route, json=body)
        return resp.status, await resp.json()

    for route in ("/generate", "/stream"):
        for bad in ("lots", [1], {"n": 1}):
            status, body = loop.run_until_complete(
                go(route, {"text": "hi", "continuation_frames": bad}))
            assert status == 400, (route, bad)
            assert "continuation_frames" in body["error"]


def test_continuation_frames_bool_is_400(client):
    """JSON true/false must not silently coerce to 1/0 (advisor r2)."""
    c, loop = client

    async def go(val):
        resp = await c.post("/generate", json={
            "text": "Bool check.", "continuation_frames": val})
        return resp.status

    assert loop.run_until_complete(go(True)) == 400
    assert loop.run_until_complete(go(False)) == 400


def test_tts_python_compat_streaming_wav(client, monkeypatch):
    """compat=python follows the oracle's streaming-WAV contract: chunked
    WAV with sentinel-length header + 200 ms trailing silence
    (python-reference main.py:114-171, data/audio.py:37-126)."""
    monkeypatch.setenv("FIRST_CHUNK_LENGTH_SECONDS", "0.1")
    c, loop = client

    async def go():
        default = await c.post("/tts", data={"text": "Contract check."})
        assert default.status == 200
        whole = await default.read()

        resp = await c.post("/tts", data={"text": "Contract check.",
                                          "compat": "python"})
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("audio/wav")
        streamed = await resp.read()
        return whole, streamed

    whole, streamed = loop.run_until_complete(go())
    # default: complete, correctly-sized WAV (Rust handler contract)
    n_whole = _check_wav(whole)
    assert len(whole) == 44 + 2 * n_whole
    # compat: sentinel-length header (not patched after streaming)
    assert streamed[:4] == b"RIFF"
    import struct

    data_size = struct.unpack_from("<I", streamed, 40)[0]
    assert data_size >= 1_000_000_000  # sentinel, NOT the real length
    pcm = streamed[44:]
    sr = 24000
    trailing = pcm[-int(0.2 * sr) * 2:]
    assert trailing == bytes(len(trailing))  # 200 ms of appended silence
    # audio payload = whole-WAV payload + the trailing silence
    assert len(pcm) == 2 * n_whole + int(0.2 * sr) * 2


def test_occupancy_adaptive_routing(model):
    """A lone request on an idle batched server takes the single-stream
    engine; traffic arriving while it is busy rides the batcher (VERDICT r2
    #2).  Routing is observable through the batcher's submit counter."""
    import asyncio

    from pocket_tts_tpu.runtime.batcher import batched_tts

    batcher = batched_tts(model, batch_size=2, chunk_frames=4)
    loop = asyncio.new_event_loop()
    state = ServerState(model, batcher=batcher)
    app = create_app(state)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def lone():
            resp = await c_post("Lone request routing.")
            assert resp.status == 200

        async def c_post(text):
            return await client.post("/generate", json={"text": text})

        loop.run_until_complete(lone())
        assert batcher.stats()["requests_submitted"] == 0  # single-stream path

        async def busy():
            # hold the single-stream lock: the request must ride the batcher
            async with state.lock:
                resp = await c_post("Busy server routing.")
                assert resp.status == 200

        loop.run_until_complete(busy())
        assert batcher.stats()["requests_submitted"] == 1

        async def concurrent():
            # two simultaneous requests: at most one takes single-stream
            r1, r2 = await asyncio.gather(
                c_post("Concurrent request one."),
                c_post("Concurrent request two."))
            assert r1.status == 200 and r2.status == 200

        loop.run_until_complete(concurrent())
        assert batcher.stats()["requests_submitted"] >= 2
    finally:
        loop.run_until_complete(client.close())
        loop.close()
        batcher.stop()


def test_metrics_endpoint(model):
    """Prometheus text exposition of serving counters."""
    import asyncio

    from pocket_tts_tpu.runtime.batcher import batched_tts

    batcher = batched_tts(model, batch_size=2, chunk_frames=4)
    loop = asyncio.new_event_loop()
    state = ServerState(model, batcher=batcher)
    app = create_app(state)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def go():
            resp = await client.get("/metrics")
            assert resp.status == 200
            text = await resp.text()
            return text

        _ = batcher.generate("Metric fodder.")
        text = loop.run_until_complete(go())
        assert "pocket_tts_requests_completed 1" in text
        assert "pocket_tts_uptime_seconds" in text
        assert "pocket_tts_batcher_dead 0" in text
    finally:
        loop.run_until_complete(client.close())
        loop.close()
        batcher.stop()


def test_invalid_gen_knobs_are_400(client):
    """lsd_steps=0 previously emitted raw noise as audio on the scalar
    decode path (zero Euler iterations) and temperature<0 NaN'd the latents
    — both with HTTP 200.  They must be client errors on every route."""
    c, loop = client

    async def go(body):
        resp = await c.post("/generate", json=body)
        return resp.status

    assert loop.run_until_complete(go({"text": "x", "lsd_steps": 0})) == 400
    assert loop.run_until_complete(go({"text": "x", "temperature": -1})) == 400
    assert loop.run_until_complete(
        go({"text": "x", "lsd_steps": 2, "temperature": 0.5})) == 200


def test_genparams_validate():
    import pytest as _pytest

    from pocket_tts_tpu.runtime.engine import GenParams

    with _pytest.raises(ValueError, match="lsd_decode_steps"):
        GenParams(lsd_decode_steps=0)
    with _pytest.raises(ValueError, match="temp"):
        GenParams(temp=-0.1)
    with _pytest.raises(ValueError, match="temp"):
        GenParams(temp=float("nan"))
    GenParams(temp=0.0, lsd_decode_steps=1, noise_clamp=0.0)  # all valid


# ---------------------------------------------------------------------------
# Web UI fetch contract (VERDICT r3 item 7): the fields webui.html's body()
# actually sends must be accepted by /stream (and /generate), so a server-side
# rename can't silently break the page.  The field list is scraped from the
# page source, not duplicated here.
# ---------------------------------------------------------------------------

def _webui_body_fields() -> set:
    import re
    from pathlib import Path
    from pocket_tts_tpu.server import app as app_mod

    src = (Path(app_mod.__file__).parent / "webui.html").read_text()
    body_js = re.search(r"const body = \(\) => \{(.*?)\n\};", src, re.S).group(1)
    # object-literal keys (text:, voice:, ...) + conditional `b.foo =` fields
    fields = set(re.findall(r"^\s*(\w+):", body_js, re.M))
    fields |= set(re.findall(r"\bb\.(\w+)\s*=", body_js))
    return fields


def test_webui_fetch_contract(client):
    c, loop = client
    fields = _webui_body_fields()
    # the page must at minimum send the reference SPA's request shape
    assert {"text", "voice", "temperature", "lsd_steps"} <= fields
    # every knob the page can send, all at once, through the page's endpoints
    body = {"text": "Contract check.", "voice": None, "temperature": 0.6,
            "lsd_steps": 2, "noise_clamp": 1.5, "eos_threshold": 4.0,
            "continuation_frames": 0, "adapter": None}
    assert set(body) == fields, (set(body), fields)
    body["voice"] = "alba"

    async def go():
        resp = await c.post("/stream", json=body)
        assert resp.status == 200, await resp.text()
        data = await resp.read()
        resp2 = await c.post("/generate", json=body)
        assert resp2.status == 200, await resp2.text()
        return data, await resp2.read()

    pcm, wav = loop.run_until_complete(go())
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    _check_wav(wav)


def test_webui_endpoints_exist(client):
    """Every endpoint the page fetches must be routed (scraped, not listed)."""
    import re
    from pathlib import Path
    from pocket_tts_tpu.server import app as app_mod

    src = (Path(app_mod.__file__).parent / "webui.html").read_text()
    endpoints = set(re.findall(r"fetch\('(/[\w/]*)'", src))
    assert {"/stream", "/generate"} <= endpoints
    c, loop = client

    async def go():
        for ep in endpoints:
            resp = await c.post(ep, json={"text": "ping"})
            if resp.status == 405:  # GET-only route (e.g. /health)
                resp = await c.get(ep)
            assert resp.status == 200, (ep, await resp.text())

    loop.run_until_complete(go())


def test_malformed_json_is_400(client):
    """Invalid JSON bodies are a client error on every JSON route — an
    unhandled JSONDecodeError would 500, and the fleet router treats 5xx as
    worker failure (one bad request could mark every worker unhealthy)."""
    c, loop = client

    async def go(route):
        resp = await c.post(route, data=b"{not json",
                            headers={"Content-Type": "application/json"})
        return resp.status

    for route in ("/generate", "/stream", "/tts", "/v1/audio/speech"):
        assert loop.run_until_complete(go(route)) == 400, route

    async def go_nonobject():
        resp = await c.post("/generate", json=["a", "list"])
        return resp.status

    assert loop.run_until_complete(go_nonobject()) == 400


def test_unresolvable_explicit_voice_is_400(client):
    """An explicitly requested voice that cannot be resolved must be a 400 —
    silently substituting the unconditioned state returned 200 with
    wrong-voice audio (review finding r4).  The DEFAULT voice still falls
    back so offline servers stay usable."""
    c, loop = client

    async def go(body):
        resp = await c.post("/generate", json=body)
        return resp.status

    assert loop.run_until_complete(
        go({"text": "hi", "voice": "albba-no-such-voice"})) == 400
    # no voice field -> default -> fallback -> 200
    assert loop.run_until_complete(go({"text": "hi"})) == 200


def test_midstream_failure_aborts_connection(model):
    """A producer crash mid-stream must ABORT the connection, not terminate
    the chunked response cleanly — a clean EOF made truncation
    indistinguishable from success (review finding r4)."""
    import asyncio

    loop = asyncio.new_event_loop()
    state = ServerState(model)

    calls = {"n": 0}
    orig = model.generate_stream_long

    def exploding(*a, **kw):
        for chunk in orig(*a, **kw):
            yield chunk
            calls["n"] += 1
            if calls["n"] >= 1:
                raise RuntimeError("simulated mid-stream decode failure")

    model.generate_stream_long = exploding
    try:
        app = create_app(state)
        c = TestClient(TestServer(app), loop=loop)
        loop.run_until_complete(c.start_server())

        async def go():
            import aiohttp

            resp = await c.post("/stream", json={"text": "A failing stream."})
            assert resp.status == 200  # status line was already on the wire
            try:
                await resp.read()
            except aiohttp.ClientError:
                return "aborted"
            return "clean"

        assert loop.run_until_complete(go()) == "aborted"
        loop.run_until_complete(c.close())
    finally:
        model.generate_stream_long = orig
        loop.close()
