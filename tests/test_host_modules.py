"""Unit tests for host-side modules: text prep/chunking, pause parsing, audio IO.
Mirrors the reference's inline unit tests (tts_model.rs:1239-1299,
pause.rs:187-249, audio.rs:262-347)."""

import numpy as np
import pytest

from pocket_tts_tpu import audio, pause, text


class TestTextPrep:
    def test_capitalize_and_punctuate(self):
        out, _ = text.prepare_text_prompt("hello world how are you doing")
        assert out == "Hello world how are you doing."

    def test_short_text_padded(self):
        out, guess = text.prepare_text_prompt("hi there")
        assert out.startswith(" " * 8)
        assert out.endswith("Hi there.")
        assert guess == 3

    def test_long_text_guess(self):
        _, guess = text.prepare_text_prompt("one two three four five six")
        assert guess == 1

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            text.prepare_text_prompt("   ")

    def test_existing_punctuation_kept(self):
        out, _ = text.prepare_text_prompt("This is a question, right?")
        assert out.endswith("?")

    def test_max_generation_frames(self):
        assert text.max_generation_frames("one two three") == int(5 * 12.5)


class TestChunking:
    def setup_method(self):
        self.tk = text.load_tokenizer()

    def test_short_text_single_chunk(self):
        chunks = text.split_into_best_sentences(self.tk, "Hello, world!")
        assert len(chunks) == 1

    def test_long_text_chunk_budget(self):
        sentence = "This is a fairly normal sentence with several words in it. "
        chunks = text.split_into_best_sentences(self.tk, sentence * 12)
        assert len(chunks) > 1
        for c in chunks:
            assert self.tk.count_tokens(c) <= text.MAX_TOKENS_PER_CHUNK + 2

    def test_sentences_not_split_mid_sentence(self):
        chunks = text.split_into_best_sentences(
            self.tk, "First sentence here. Second sentence there. Third one now.")
        for c in chunks[:-1]:
            assert c.rstrip().endswith((".", "!", "?"))

    def test_chunk_reencode_fits_largest_bucket(self):
        """Chunk budgets use stale token counts (decode+join+re-encode adds
        ~1-4 tokens vs the 50 budget — the oracle algorithm has the same
        drift); the invariant the static prefill buckets DEPEND on is that a
        prepared chunk re-encodes within the largest text bucket.  Pins the
        headroom so a bucket-config change that breaks it fails here, not as
        an 'exceeds largest bucket' ValueError at prefill time."""
        from pocket_tts_tpu.config import RuntimeConfig

        largest_bucket = RuntimeConfig().text_buckets[-1]
        # adversarial inputs: dense punctuation (many short sentences merge,
        # maximizing join drift) and long punctuation-free runs (hard splits)
        texts = [
            "One. Two! Three? Four. Five! Six? Seven. Eight! Nine? Ten. " * 8,
            ("antidisestablishmentarianism " * 120),
            ("This is a fairly normal sentence with several words in it. "
             * 12),
        ]
        for t in texts:
            for c in text.split_into_best_sentences(self.tk, t):
                prepared, _ = text.prepare_text_prompt(c)
                _, n = text.tokens_array(self.tk, prepared)
                assert n <= largest_bucket, (n, largest_bucket, c[:60])


class TestPause:
    def test_explicit_ms(self):
        p = pause.parse_explicit_pauses("Hello [pause:500ms] world")
        assert len(p) == 1 and p[0].duration_ms == 500

    def test_explicit_seconds(self):
        p = pause.parse_explicit_pauses("A [pause:1s] B [pause:1.5s] C")
        assert [x.duration_ms for x in p] == [1000, 1500]

    def test_ellipsis(self):
        p = pause.parse_natural_pauses("Hello... world")
        assert len(p) == 1 and p[0].duration_ms == pause.ELLIPSIS_MS

    def test_comma(self):
        p = pause.parse_natural_pauses("Hello, world")
        assert len(p) == 1 and p[0].duration_ms == pause.COMMA_MS

    def test_comma_in_number_ignored(self):
        assert pause.parse_natural_pauses("That costs 1,000 dollars") == []

    def test_strip(self):
        assert pause.strip_pause_markers("a [pause:500ms] b") == "a   b"

    def test_parse_text_with_pauses(self):
        parsed = pause.parse_text_with_pauses("Hello... [pause:500ms] world, done")
        assert parsed.clean_text == "Hello...   world, done"
        assert len(parsed.pauses) == 3

    def test_segments(self):
        segs = pause.segment_text("Hello world [pause:300ms] goodbye world")
        kinds = [s.kind for s in segs]
        assert kinds == ["text", "pause", "text"]
        assert segs[1].duration_ms == 300

    def test_silence_samples(self):
        assert pause.silence_samples(500, 24000) == 12000


class TestAudio:
    def test_wav_roundtrip(self, tmp_path):
        sr = 24000
        wav = np.sin(np.linspace(0, 100, sr)).astype(np.float32) * 0.5
        path = tmp_path / "t.wav"
        audio.write_wav(path, wav, sr)
        back, sr2 = audio.read_wav(path)
        assert sr2 == sr
        assert back.shape == (1, sr)
        assert np.abs(back[0] - wav).max() < 1e-3  # 16-bit quantization

    def test_pcm_bytes_clamped(self):
        b = audio.pcm_i16_le_bytes(np.array([2.0, -2.0, 0.0], np.float32))
        vals = np.frombuffer(b, "<i2")
        assert list(vals) == [32767, -32767, 0]

    def test_resample_poly_identity(self):
        wav = np.random.default_rng(0).normal(size=(1, 4800)).astype(np.float32)
        out = audio.resample(wav, 24000, 24000)
        assert out is wav

    def test_resample_rate(self):
        wav = np.zeros((1, 44100), np.float32)
        out = audio.resample(wav, 44100, 24000)
        assert out.shape[-1] == 24000

    def test_convert_audio_downmix(self):
        wav = np.ones((2, 100), np.float32)
        out = audio.convert_audio(wav, 24000, 24000, 1)
        assert out.shape == (1, 100)

    def test_normalize_peak(self):
        wav = np.array([0.5, -2.0], np.float32)
        out = audio.normalize_peak(wav)
        assert abs(np.abs(out).max() - 0.99) < 1e-6

    def test_float32_wav(self, tmp_path):
        """IEEE-float WAV files must decode (stdlib wave rejects them)."""
        import struct

        sr = 24000
        x = (np.sin(np.linspace(0, 40, 1000)) * 0.5).astype(np.float32)
        data = x.tobytes()
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
               + b"data" + struct.pack("<I", len(data)))
        p = tmp_path / "f32.wav"
        p.write_bytes(hdr + data)
        back, sr2 = audio.read_wav(p)
        assert sr2 == sr
        np.testing.assert_allclose(back[0], x, atol=1e-7)

    def test_truncated_wav_tolerated(self, tmp_path):
        """A WAV whose data section is shorter than the header claims decodes
        the available samples (reference: audio.rs:36-50)."""
        sr = 24000
        wav = np.zeros(1000, np.float32)
        p = tmp_path / "t.wav"
        audio.write_wav(p, wav, sr)
        raw = p.read_bytes()
        p.write_bytes(raw[: len(raw) - 500])  # chop 250 samples
        back, _ = audio.read_wav(p)
        assert back.shape[-1] == 750

    def test_wav_header_parses(self):
        hdr = audio.wav_header(24000)
        assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"


class TestWavHardening:
    """Client-supplied WAV bytes reach read_wav via the voice-upload path —
    malformed fmt fields must raise ValueError (a sample_rate=0 previously
    reached the native resampler's integer division: SIGFPE kills the whole
    process, uncatchable from Python), and WAVE_FORMAT_EXTENSIBLE float32
    (the common DAW output) must decode as float, not int PCM garbage."""

    @staticmethod
    def _wav(tag, n_ch, sr, bits, data, ext_subformat=None):
        import struct

        if ext_subformat is not None:
            # tag..bits (16 bytes) + cbSize=22 + validBits u16 + channelMask
            # u32 + 16-byte SubFormat GUID whose first u16 is the real tag
            fmt = (struct.pack("<HHIIHH", tag, n_ch, sr, sr * 4, 4, bits)
                   + struct.pack("<HHI", 22, bits, 0x4)
                   + struct.pack("<H", ext_subformat) + b"\x00" * 14)
        else:
            fmt = struct.pack("<HHIIHH", tag, n_ch, sr, sr * 4, 4, bits)
        chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_zero_sample_rate_rejected(self):
        import struct

        wav = self._wav(1, 1, 0, 16, struct.pack("<4h", 0, 1, -1, 0))
        with pytest.raises(ValueError, match="sample rate"):
            audio.read_wav(wav)

    def test_zero_channels_rejected(self):
        import struct

        wav = self._wav(1, 0, 24000, 16, struct.pack("<4h", 0, 1, -1, 0))
        with pytest.raises(ValueError, match="channel"):
            audio.read_wav(wav)

    def test_extensible_float32_decodes_as_float(self):
        import struct

        payload = struct.pack("<4f", 0.5, -0.25, 1.0, 0.0)
        wav = self._wav(0xFFFE, 1, 24000, 32, payload, ext_subformat=3)
        samples, sr = audio.read_wav(wav)
        assert sr == 24000
        np.testing.assert_allclose(samples[0], [0.5, -0.25, 1.0, 0.0])

    def test_extensible_int16_decodes_as_pcm(self):
        import struct

        payload = struct.pack("<4h", 0, 16384, -16384, 32767)
        wav = self._wav(0xFFFE, 1, 24000, 16, payload, ext_subformat=1)
        samples, _ = audio.read_wav(wav)
        np.testing.assert_allclose(samples[0], [0.0, 0.5, -0.5, 32767 / 32768],
                                   atol=1e-4)


def test_examples_compile():
    """Every example script must at least be valid Python — they are user
    documentation and break silently otherwise (none are executed in CI:
    each loads the ~90 MB flagship model)."""
    import py_compile
    from pathlib import Path

    examples = sorted((Path(__file__).parent.parent / "examples").glob("*.py"))
    assert examples, "examples/ directory is empty"
    for ex in examples:
        py_compile.compile(str(ex), doraise=True)
