"""ctypes bindings for the native (C++) audio runtime.

Loads ``native/libpocket_audio.so`` (building it with the in-tree Makefile on
first use if a compiler is available).  Every entry point has a NumPy/stdlib
fallback in :mod:`pocket_tts_tpu.audio`; ``available()`` gates the fast path.
Set ``POCKET_TTS_NO_NATIVE=1`` to force the Python implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpocket_audio.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "pocket_audio.cc"
    if not src.exists():
        return False
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:  # noqa: BLE001
        logger.debug("native build failed: %s", e)
        return False


def _find_lib() -> Path | None:
    """Search order: $POCKET_TTS_NATIVE_LIB -> wheel location (setup.py puts
    it in pocket_tts_tpu/_native/) -> in-tree native/ (building on demand)."""
    env = os.environ.get("POCKET_TTS_NATIVE_LIB")
    if env:
        if Path(env).exists():
            return Path(env)
        logger.warning("POCKET_TTS_NATIVE_LIB=%s does not exist; falling "
                       "back to the bundled library", env)
    wheel = Path(__file__).parent / "_native" / "libpocket_audio.so"
    if wheel.exists():
        return wheel
    # rebuild a stale .so after a pocket_audio.cc edit (the old exists()
    # short-circuit kept serving the old binary until someone deleted it by
    # hand); if the rebuild fails (no make), stale beats nothing
    src = _NATIVE_DIR / "pocket_audio.cc"
    if _LIB_PATH.exists():
        if src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime:
            _build()  # best-effort refresh
        return _LIB_PATH
    return _LIB_PATH if _build() else None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("POCKET_TTS_NO_NATIVE") == "1":
        return None
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        i64, i32, f32p, i16p, u8p = (ctypes.c_int64, ctypes.c_int32,
                                     np.ctypeslib.ndpointer(np.float32),
                                     np.ctypeslib.ndpointer(np.int16),
                                     np.ctypeslib.ndpointer(np.uint8))
        lib.pcm_f32_to_i16.argtypes = [f32p, i64, i16p]
        lib.normalize_peak.argtypes = [f32p, i64, ctypes.c_float]
        lib.resample_poly_out_len.argtypes = [i64, i64, i64]
        lib.resample_poly_out_len.restype = i64
        lib.resample_poly.argtypes = [f32p, i64, i64, i64, f32p]
        lib.resample_poly.restype = i64
        lib.wav_encoded_size.argtypes = [i64]
        lib.wav_encoded_size.restype = i64
        lib.wav_encode.argtypes = [f32p, i64, i32, u8p]
    except (OSError, AttributeError) as e:
        # AttributeError: a stale/foreign library missing a symbol must fall
        # back to the pure-Python path, not crash the first audio conversion
        logger.warning("native library unusable (%s); using Python fallback", e)
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def pcm_i16_le_bytes(audio: np.ndarray) -> bytes:
    lib = _load()
    flat = np.ascontiguousarray(audio.reshape(-1), np.float32)
    out = np.empty(flat.size, np.int16)
    lib.pcm_f32_to_i16(flat, flat.size, out)
    return out.tobytes()


def resample(audio: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    shape = audio.shape
    flat = audio.reshape(-1, shape[-1])
    n_out = lib.resample_poly_out_len(shape[-1], from_rate, to_rate)
    out = np.empty((flat.shape[0], n_out), np.float32)
    for i in range(flat.shape[0]):
        row = np.ascontiguousarray(flat[i])
        lib.resample_poly(row, row.size, from_rate, to_rate, out[i])
    return out.reshape(*shape[:-1], n_out)


def normalize_peak(audio: np.ndarray, peak: float = 0.99) -> np.ndarray:
    lib = _load()
    out = np.ascontiguousarray(audio, np.float32).copy()
    lib.normalize_peak(out.reshape(-1), out.size, ctypes.c_float(peak))
    return out


def wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    lib = _load()
    flat = np.ascontiguousarray(audio.reshape(-1), np.float32)
    buf = np.empty(lib.wav_encoded_size(flat.size), np.uint8)
    lib.wav_encode(flat, flat.size, sample_rate, buf)
    return buf.tobytes()
