"""G.711 mu-law transport codec for the device->host audio wire.

The tunneled backend's fetch cost is ~30 ms fixed + ~31 ms/MB (measured,
docs/performance.md): at 150x realtime the PCM stream itself (7.2 MB/s of
int16) approaches the tunnel's bandwidth, so halving wire bytes directly
raises the e2e ceiling.  mu-law is the classic 8-bit companding format
(G.711, WAV format code 7): ~35-38 dB SNR on speech, encode is a handful of
elementwise ops fused into the decode program (reads int16 already in
registers, writes HALF the HBM->host bytes), decode is a 256-entry table
lookup on host.  Opt-in via RuntimeConfig.transport_format="mulaw"; the
public float32 API is unchanged apart from the companding quantization.

Reference analogue: none (the reference is in-process; its wire format
concern doesn't exist).  This is TPU-deployment plumbing.
"""

import numpy as np

import jax.numpy as jnp

_BIAS = 0x84  # 132
_CLIP = 32635


def encode(pcm16: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> uint8 mu-law (G.711), elementwise, jit-safe.

    The exponent is the position of the highest set bit of (|x|+BIAS) above
    bit 7, computed with integer compares (no float log2 edge cases)."""
    x = pcm16.astype(jnp.int32)
    sign = jnp.where(x < 0, jnp.int32(0x80), jnp.int32(0))
    mag = jnp.clip(jnp.abs(x), 0, _CLIP) + _BIAS  # [132, 32767]
    # exponent e in [0,7]: mag >= 2^(e+7); count thresholds passed
    e = (
        (mag >= (1 << 8)).astype(jnp.int32)
        + (mag >= (1 << 9)).astype(jnp.int32)
        + (mag >= (1 << 10)).astype(jnp.int32)
        + (mag >= (1 << 11)).astype(jnp.int32)
        + (mag >= (1 << 12)).astype(jnp.int32)
        + (mag >= (1 << 13)).astype(jnp.int32)
        + (mag >= (1 << 14)).astype(jnp.int32)
    )
    mant = (mag >> (e + 3)) & 0x0F
    u = ~(sign | (e << 4) | mant) & 0xFF
    return u.astype(jnp.uint8)


def _decode_table() -> np.ndarray:
    """256-entry mu-law -> int16 LUT (exact inverse midpoint of encode)."""
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    sign = (u & 0x80) != 0
    e = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + (1 << 7) + (1 << 2) << e) - _BIAS
    out = np.where(sign, -mag, mag)
    return out.astype(np.int16)


DECODE_TABLE = _decode_table()


def decode(u8: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> int16 PCM via table lookup (host-side, numpy)."""
    return DECODE_TABLE[np.asarray(u8, dtype=np.uint8)]


def encode_np(pcm16: np.ndarray) -> np.ndarray:
    """numpy mirror of :func:`encode` (tests, host-side tools)."""
    x = np.asarray(pcm16, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.clip(np.abs(x), 0, _CLIP) + _BIAS
    e = sum((mag >= (1 << k)).astype(np.int32) for k in range(8, 15))
    mant = (mag >> (e + 3)) & 0x0F
    return (~(sign | (e << 4) | mant) & 0xFF).astype(np.uint8)
