"""Voice resolution & LRU cache (reference: voice.rs:224-258, state.rs:87-107)."""

import base64

import numpy as np
import pytest

from pocket_tts_tpu import audio as audio_io
from pocket_tts_tpu.server import voices
from tests.test_tts import CFG


@pytest.fixture(scope="module")
def model():
    from pocket_tts_tpu import weights
    from pocket_tts_tpu.models.mimi import MimiPlans
    from pocket_tts_tpu.runtime.engine import GenParams
    from pocket_tts_tpu.tts import TTSModel

    plans = MimiPlans(CFG.mimi)
    params = weights.random_params(CFG, plans, seed=3)
    return TTSModel(CFG, params, gen=GenParams(temp=0.0), has_real_weights=False)


class TestCacheKeys:
    def test_stock(self):
        assert voices.voice_cache_key("alba") == "stock:alba"

    def test_hf(self):
        key = voices.voice_cache_key("hf://a/b/c.safetensors")
        assert key.startswith("hf:")

    def test_file_key_includes_mtime_size(self, tmp_path):
        p = tmp_path / "v.wav"
        p.write_bytes(b"RIFF0000WAVE")
        k1 = voices.voice_cache_key(str(p))
        p.write_bytes(b"RIFF00000000WAVE")
        k2 = voices.voice_cache_key(str(p))
        assert k1 != k2  # size change invalidates

    def test_b64_key(self):
        assert voices.voice_cache_key("AAAA").startswith("b64:")


class TestLRU:
    def test_eviction_order(self):
        cache = voices.VoiceStateCache(capacity=2)
        cache.put("a", "A")
        cache.put("b", "B")
        cache.get("a")  # refresh a
        cache.put("c", "C")  # evicts b
        assert cache.get("b") is None
        assert cache.get("a") == "A"
        assert cache.get("c") == "C"


class TestResolve:
    def test_wav_file(self, model, tmp_path):
        wav = np.random.default_rng(0).normal(size=24000).astype(np.float32) * 0.1
        p = tmp_path / "voice.wav"
        audio_io.write_wav(p, wav, 24000)
        vs = voices.resolve_voice(model, str(p))
        assert vs.length > 0

    def test_base64_wav(self, model, tmp_path):
        wav = np.random.default_rng(1).normal(size=24000).astype(np.float32) * 0.1
        b = audio_io.wav_bytes(wav, 24000)
        vs = voices.resolve_voice(model, base64.b64encode(b).decode())
        assert vs.length > 0

    def test_data_url(self, model):
        wav = np.zeros(24000, np.float32)
        b = audio_io.wav_bytes(wav, 24000)
        spec = "data:audio/wav;base64," + base64.b64encode(b).decode()
        vs = voices.resolve_voice(model, spec)
        assert vs.length > 0

    def test_prompt_safetensors(self, model, tmp_path):
        from safetensors.numpy import save_file

        d = model.config.flow_lm.transformer.d_model
        prompt = np.random.default_rng(2).normal(size=(1, 5, d)).astype(np.float32)
        p = tmp_path / "stock.safetensors"
        save_file({"audio_prompt": prompt}, str(p))
        vs = voices.resolve_voice(model, str(p))
        assert vs.length == 5

    def test_unresolvable_raises(self, model):
        with pytest.raises(ValueError):
            voices.resolve_voice(model, "no_such_voice_xyz")

    def test_cached_resolution_reuses(self, model, tmp_path):
        wav = np.zeros(24000, np.float32)
        p = tmp_path / "v.wav"
        audio_io.write_wav(p, wav, 24000)
        cache = voices.VoiceStateCache(4)
        v1 = voices.resolve_voice_cached(model, str(p), cache)
        v2 = voices.resolve_voice_cached(model, str(p), cache)
        assert v1 is v2
        assert len(cache) == 1


class TestVoicePromptArtifacts:
    def test_save_then_load_voice_prompt(self, model, tmp_path):
        """save_voice_prompt -> get_voice_state_from_prompt_file round trip
        must equal the direct wav path (the stock-voice artifact flow)."""
        import numpy as np

        wav = np.random.default_rng(5).normal(size=24000).astype(np.float32) * 0.1
        p = tmp_path / "me.safetensors"
        model.save_voice_prompt(wav, p)
        via_file = model.get_voice_state_from_prompt_file(p)
        direct = model.get_voice_state_from_audio(wav)
        assert via_file.length == direct.length
        a = model.generate("Artifact round trip.", via_file)
        b = model.generate("Artifact round trip.", direct)
        np.testing.assert_allclose(a, b, atol=1e-4)


class TestURLVoices:
    """Plain http(s):// voice specs (reference voice.rs:171-222; the oracle's
    voice_url accepts URLs, python-reference main.py:114-171)."""

    @pytest.fixture()
    def http_server(self, tmp_path, monkeypatch):
        import functools
        import http.server
        import threading

        # loopback voice fetches are their own opt-in (SSRF hardening)
        monkeypatch.setenv("POCKET_TTS_LOOPBACK_VOICES", "1")
        wav = np.random.default_rng(7).normal(size=24000).astype(np.float32) * 0.1
        audio_io.write_wav(tmp_path / "voice.wav", wav, 24000)
        (tmp_path / "not_audio.bin").write_bytes(b"\x00" * 64)
        handler = functools.partial(
            http.server.SimpleHTTPRequestHandler, directory=str(tmp_path))
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}", wav
        srv.shutdown()
        srv.server_close()

    def test_cache_key(self):
        assert voices.voice_cache_key("https://x.test/v.wav").startswith("url:")

    def test_url_wav(self, model, http_server):
        base, wav = http_server
        vs = voices.resolve_voice(model, f"{base}/voice.wav")
        assert vs.length > 0
        direct = model.get_voice_state_from_audio(wav)
        assert vs.length == direct.length

    def test_url_prompt_safetensors(self, model, http_server, tmp_path):
        from safetensors.numpy import save_file

        base, _ = http_server
        d = model.config.flow_lm.transformer.d_model
        prompt = np.random.default_rng(8).normal(size=(1, 4, d)).astype(np.float32)
        save_file({"audio_prompt": prompt}, str(tmp_path / "stock.safetensors"))
        vs = voices.resolve_voice(model, f"{base}/stock.safetensors")
        assert vs.length == 4

    def test_url_garbage_rejected(self, model, http_server):
        base, _ = http_server
        with pytest.raises(Exception):
            voices.resolve_voice(model, f"{base}/not_audio.bin")

    def test_nonlocal_url_offline_is_clean_error(self, model, monkeypatch):
        monkeypatch.delenv("POCKET_TTS_ONLINE", raising=False)
        with pytest.raises(ValueError, match="POCKET_TTS_ONLINE"):
            voices.resolve_voice(model, "https://example.com/v.wav")

    def test_loopback_url_gated(self, model, monkeypatch):
        """Without the explicit opt-in, a loopback voice_url must be rejected
        — an unconditional exemption from the online gate hands every client
        a blind-SSRF probe against localhost-only services (review r4)."""
        monkeypatch.delenv("POCKET_TTS_LOOPBACK_VOICES", raising=False)
        monkeypatch.setenv("POCKET_TTS_ONLINE", "1")  # online gate not enough
        with pytest.raises(ValueError, match="LOOPBACK"):
            voices.resolve_voice(model, "http://127.0.0.1:9091/admin")
