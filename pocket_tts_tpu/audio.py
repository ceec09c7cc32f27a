"""Audio I/O and resampling (host side).

WAV read/write via the stdlib ``wave`` module + numpy; polyphase resampling via
``scipy.signal.resample_poly`` which is exactly the oracle's conversion
(python-reference/pocket_tts/data/audio_utils.py) and the behavior the Rust port
matches with rubato (crates/pocket-tts/src/audio.rs:197-255).
"""

from __future__ import annotations

import io
import math
import wave
from pathlib import Path

import numpy as np


def read_wav(path: str | Path | bytes) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 [channels, samples] in [-1, 1], sample_rate).

    Direct RIFF parser (stdlib ``wave`` rejects IEEE-float files): handles
    PCM 8/16/24/32-bit and 32-bit float, skips unknown chunks, and tolerates
    truncated data sections like the reference reader (audio.rs:36-50)."""
    if isinstance(path, bytes):
        buf = path
    else:
        buf = Path(path).read_bytes()
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("Not a RIFF/WAVE file")
    off = 12
    fmt = None
    while off + 8 <= len(buf):
        cid = buf[off:off + 4]
        (size,) = np.frombuffer(buf[off + 4:off + 8], "<u4")
        size = int(size)
        if cid == b"fmt " and off + 24 <= len(buf):
            body = off + 8  # tag u16, channels u16, rate u32, byterate u32,
            #                 blockalign u16, bits u16
            tag = int(np.frombuffer(buf[body:body + 2], "<u2")[0])
            n_ch = int(np.frombuffer(buf[body + 2:body + 4], "<u2")[0])
            sr = int(np.frombuffer(buf[body + 4:body + 8], "<u4")[0])
            bits = int(np.frombuffer(buf[body + 14:body + 16], "<u2")[0])
            if tag == 0xFFFE and size >= 40 and body + 26 <= len(buf):
                # WAVE_FORMAT_EXTENSIBLE: the real format tag is the first
                # u16 of the SubFormat GUID (fmt offset 24).  DAWs commonly
                # write float32 this way — treating it as int32 PCM decodes
                # IEEE-754 bit patterns as garbage samples.
                tag = int(np.frombuffer(buf[body + 24:body + 26], "<u2")[0])
            # validate BEFORE any data is decoded: sample_rate=0 would reach
            # the native resampler's integer division (SIGFPE kills the whole
            # process — no Python except can catch it) and n_ch=0 a
            # ZeroDivisionError; both are client-supplied bytes on the
            # voice-upload path
            if n_ch < 1 or n_ch > 64:
                raise ValueError(f"Invalid WAV channel count {n_ch}")
            if sr < 1 or sr > 4_000_000:
                raise ValueError(f"Invalid WAV sample rate {sr}")
            fmt = (tag, n_ch, sr, bits)
        elif cid == b"data" and fmt is not None:
            tag, n_ch, sr, bits = fmt
            raw = buf[off + 8: off + 8 + size]  # tolerate truncation
            bytes_per = max(bits // 8, 1)
            raw = raw[: len(raw) - len(raw) % (bytes_per * n_ch)]
            if tag == 3 and bits == 32:
                samples = np.frombuffer(raw, "<f4").astype(np.float32)
            elif bits == 16:
                samples = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
            elif bits == 32:
                samples = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
            elif bits == 24:
                b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
                val = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                       | (b[:, 2].astype(np.int32) << 16))
                val = np.where(val >= 1 << 23, val - (1 << 24), val)
                samples = val.astype(np.float32) / float(1 << 23)
            elif bits == 8:
                samples = (np.frombuffer(raw, np.uint8).astype(np.float32)
                           - 128.0) / 128.0
            else:
                raise ValueError(f"Unsupported WAV format tag={tag} bits={bits}")
            samples = samples.reshape(-1, n_ch).T
            return np.ascontiguousarray(samples), sr
        off += 8 + size + (size & 1)
    raise ValueError("No data chunk found in WAV file")


def pcm_i16_le_bytes(audio: np.ndarray) -> bytes:
    """float [-1,1] -> little-endian int16 PCM bytes — the single shared
    conversion for CLI/HTTP streaming (crates/pocket-tts/src/audio.rs:110-146).
    Uses the native (C++) runtime when built; this is the pure fallback."""
    from pocket_tts_tpu import native

    if native.available():
        return native.pcm_i16_le_bytes(np.asarray(audio, np.float32))
    clipped = np.clip(audio, -1.0, 1.0)
    return (clipped * 32767.0).astype("<i2").tobytes()


def write_wav(path: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm_i16_le_bytes(np.asarray(audio).reshape(-1)))


def wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    from pocket_tts_tpu import native

    if native.available():
        return native.wav_bytes(np.asarray(audio, np.float32), sample_rate)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm_i16_le_bytes(np.asarray(audio).reshape(-1)))
    return buf.getvalue()


def wav_header(sample_rate: int, n_frames: int = 1_000_000_000) -> bytes:
    """Standalone WAV header for chunked HTTP streaming (frame count is a large
    placeholder, like the oracle's StreamingWAVWriter)."""
    buf = io.BytesIO()
    f = wave.open(buf, "wb")
    f.setnchannels(1)
    f.setsampwidth(2)
    f.setframerate(sample_rate)
    f.setnframes(n_frames)
    f._write_header(0)  # noqa: SLF001 - stdlib wave has no public header-only API
    return buf.getvalue()


def resample(audio: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Polyphase resampling identical to the oracle's convert_audio.
    Dispatches to the native (C++) polyphase kernel when built."""
    if from_rate == to_rate:
        return audio
    from pocket_tts_tpu import native

    if native.available():
        return native.resample(np.asarray(audio, np.float32), from_rate, to_rate)
    from scipy.signal import resample_poly

    g = math.gcd(int(from_rate), int(to_rate))
    return resample_poly(audio, int(to_rate) // g, int(from_rate) // g,
                         axis=-1).astype(np.float32)


def convert_audio(audio: np.ndarray, from_rate: int, to_rate: int,
                  to_channels: int = 1) -> np.ndarray:
    """[C, T] -> resampled [to_channels, T'] (downmix by mean if needed)."""
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    if audio.shape[0] != to_channels:
        if to_channels == 1:
            audio = audio.mean(axis=0, keepdims=True)
        else:
            raise ValueError(f"Cannot convert {audio.shape[0]} -> {to_channels} channels")
    return resample(audio, from_rate, to_rate)


def normalize_peak(audio: np.ndarray, peak: float = 0.99) -> np.ndarray:
    from pocket_tts_tpu import native

    if native.available():
        return native.normalize_peak(np.asarray(audio, np.float32), peak)
    m = float(np.max(np.abs(audio))) if audio.size else 0.0
    if m <= peak or m == 0.0:
        return audio
    return audio * (peak / m)
