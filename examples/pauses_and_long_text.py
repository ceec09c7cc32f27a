"""Pause markers, natural pauses, and long-text generation.

Grammar (reference: pause.rs): explicit ``[pause:300ms]`` / ``[pause:1s]``,
ellipses insert 500 ms, commas 200 ms (digit-guarded: "3,14" stays intact).
Long texts split into <=50-token sentence chunks; ``continuation_frames``
teacher-forces each chunk on the tail of the previous audio so prosody
carries across the seams."""

from pocket_tts_tpu import TTSModel
from pocket_tts_tpu import audio as audio_io

model = TTSModel.load()

text = ("Let me think about that... [pause:400ms] Yes, I am sure. "
        "The answer, as always, is forty two.")
wav = model.generate_with_pauses(text)
audio_io.write_wav("pauses.wav", wav, model.sample_rate)
print(f"pauses.wav: {wav.size / model.sample_rate:.2f}s")

long_text = ("This is a long narration that will be split into several "
             "sentence chunks. Each chunk is synthesized against the same "
             "voice state. With continuation enabled, every chunk is also "
             "conditioned on the audio generated so far. That keeps the "
             "speaking rate and tone from resetting at chunk boundaries.")
wav = model.generate_with_pauses(long_text, continuation_frames=120)
audio_io.write_wav("long_text.wav", wav, model.sample_rate)
print(f"long_text.wav (teacher-forced continuation): "
      f"{wav.size / model.sample_rate:.2f}s")
