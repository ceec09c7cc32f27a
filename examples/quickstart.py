"""Minimal use: load the model, synthesize a sentence, write a WAV.

Mirrors the reference README's first example (README.md:106-123)."""

from pocket_tts_tpu import TTSModel
from pocket_tts_tpu import audio as audio_io

model = TTSModel.load()  # variant b6369a24; weights via POCKET_TTS_WEIGHTS
voice = model.get_voice_state()  # unconditioned; see voice_cloning.py

wav = model.generate("Hello! This is Pocket TTS running natively on TPU.",
                     voice)
audio_io.write_wav("quickstart.wav", wav, model.sample_rate)
print(f"wrote quickstart.wav: {wav.size / model.sample_rate:.2f}s @ "
      f"{model.sample_rate} Hz")
