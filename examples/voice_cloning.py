"""Voice cloning: a voice is a prefilled KV-cache snapshot.

Three ways to get one (reference: tts_model.rs:429-560, voice.rs):
  1. from a reference WAV (runs the Mimi encoder + speaker projection),
  2. from a saved ``audio_prompt`` artifact (the stock-voice format),
  3. by name/URL through the server's resolver (see server_client.py).
Voice states are immutable — reuse one across any number of generations."""

import numpy as np

from pocket_tts_tpu import TTSModel
from pocket_tts_tpu import audio as audio_io

model = TTSModel.load()

# 1. from audio (here: synthetic noise, since no real WAV ships offline)
rng = np.random.default_rng(0)
prompt_wav = (rng.normal(size=3 * 24000) * 0.1).astype(np.float32)
voice = model.get_voice_state_from_audio(prompt_wav)
print(f"voice state from 3s prompt: {voice.length} conditioning frames")

# 2. save the encoded conditioning as a reusable artifact (instant to load —
#    skips the Mimi encoder)
model.save_voice_prompt(prompt_wav, "my_voice.safetensors")
same_voice = model.get_voice_state_from_prompt_file("my_voice.safetensors")
print(f"artifact round trip: {same_voice.length} frames")

a = model.generate("Same voice, first take.", voice)
b = model.generate("Same voice, second take.", voice)
audio_io.write_wav("cloned_a.wav", a, model.sample_rate)
audio_io.write_wav("cloned_b.wav", b, model.sample_rate)
print("wrote cloned_a.wav / cloned_b.wav")
