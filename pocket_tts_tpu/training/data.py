"""Fine-tune data preparation: (text, audio) pairs -> training batches.

The released checkpoint's Mimi has **no encode-side 32-dim bottleneck**: the
DummyQuantizer only carries the decode projection 32 -> 512
(python-reference/pocket_tts/modules/dummy_quantizer.py — output_proj only),
so the 32-dim latent space the FlowLM is trained to produce is not directly
reachable from audio.  Targets are recovered as the **least-squares preimage**
through that projection: with W [512, 32] the decoder applies z512 = W @ z32,
so ``z32 = pinv(W) @ encode_to_latent(audio)`` is the unique minimum-norm
latent whose decode projection best matches the encoder embedding.  Latents a
FlowLM actually generated round-trip exactly (they lie in span(W) by
construction); encoder embeddings of arbitrary audio project onto it.

Targets are normalized to the FlowLM's output space — the inverse of
flow_lm.denormalize: (z32 - emb_mean) / emb_std.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def latent_preimage_matrix(params: dict) -> np.ndarray:
    """[32, 512] pseudo-inverse of the DummyQuantizer output projection."""
    w = params["mimi"]["quantizer_w"]
    if hasattr(w, "dequant"):  # QTensor (int8-quantized model)
        w = w.dequant()
    w = np.asarray(jax.device_get(w), np.float32)[:, :, 0]  # [512, 32]
    return np.linalg.pinv(w)


def encode_latent_targets(model, wavs: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Audio -> normalized 32-dim FlowLM target latents.

    ``wavs``: mono f32 waveforms at model.sample_rate (any lengths).  Returns
    (latents [B, Tf_max, 32] f32, latent_valid [B] int32).  One jitted program
    per padded length bucket (lengths round up to the frame size).
    """
    from pocket_tts_tpu.models import mimi

    frame = model.engine.frame_size
    frames = [max(1, int(np.ceil(len(w) / frame))) for w in wavs]
    tmax = max(frames)
    batch = np.zeros((len(wavs), 1, tmax * frame), np.float32)
    for i, w in enumerate(wavs):
        batch[i, 0, : len(w)] = np.asarray(w, np.float32)

    pinv = jnp.asarray(latent_preimage_matrix(model.params))

    @jax.jit
    def encode(params, audio):
        z512 = mimi.encode_to_latent(params["mimi"], model.engine.plans, audio)
        z32 = jnp.einsum("bct,lc->btl", z512.astype(jnp.float32), pinv)
        fl = params["flow_lm"]
        return (z32 - fl["emb_mean"]) / fl["emb_std"]

    latents = np.asarray(jax.device_get(encode(model.params, jnp.asarray(batch))))
    return latents, np.asarray(frames, np.int32)


def encode_voice_conditioning(model, wav: np.ndarray) -> np.ndarray:
    """Voice-prompt conditioning latents [1, Tv, 512] (the speaker_proj input,
    matching tts.get_voice_state's conditioning path)."""
    from pocket_tts_tpu.models import mimi

    frame = model.engine.frame_size
    t = max(1, int(np.ceil(len(wav) / frame))) * frame
    audio = np.zeros((1, 1, t), np.float32)
    audio[0, 0, : len(wav)] = np.asarray(wav, np.float32)

    @jax.jit
    def encode(params, a):
        return mimi.encode_to_latent(params["mimi"], model.engine.plans, a)

    z512 = jax.device_get(encode(model.params, jnp.asarray(audio)))
    return np.transpose(np.asarray(z512, np.float32), (0, 2, 1))  # [1, Tv, 512]


def make_batch(
    model,
    pairs: list[tuple[str, np.ndarray]],
    *,
    voice_wav: np.ndarray | None = None,
    max_tokens: int | None = None,
) -> dict:
    """(text, waveform) pairs -> a training batch dict (host numpy; the train
    step moves it to device).  ``voice_wav`` optionally prepends one shared
    voice prompt's conditioning to every example (the common "clone this
    speaker" fine-tune)."""
    texts = [t for t, _ in pairs]
    wavs = [w for _, w in pairs]
    token_lists = [model.tokenizer.encode(t) for t in texts]
    if max_tokens is not None:
        token_lists = [ids[:max_tokens] for ids in token_lists]
    tt = max(1, max(len(ids) for ids in token_lists))
    tokens = np.zeros((len(pairs), tt), np.int32)
    token_valid = np.zeros((len(pairs),), np.int32)
    for i, ids in enumerate(token_lists):
        tokens[i, : len(ids)] = ids
        token_valid[i] = len(ids)

    latents, latent_valid = encode_latent_targets(model, wavs)
    batch = {
        "tokens": tokens,
        "token_valid": token_valid,
        "latents": latents,
        "latent_valid": latent_valid,
    }
    if voice_wav is not None:
        voice = encode_voice_conditioning(model, voice_wav)
        batch["voice_latents"] = np.broadcast_to(
            voice, (len(pairs), *voice.shape[1:])).copy()
    return batch
