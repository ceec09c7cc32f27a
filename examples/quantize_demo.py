"""int8 weight-only quantization with an SNR quality report.

Counterpart of the reference's examples/quantize_demo.rs — but the artifact
here is REAL int8-in-HBM (per-channel scales), not the reference's simulated
f32 round-trip (quantize.rs:1-10).  Same skip-list policy: embeddings, norms
and the tiny heads stay f32."""

from pocket_tts_tpu import TTSModel
from pocket_tts_tpu.runtime.quantize import (
    quantize_model, save_quantized, snr_report)

model = TTSModel.load()
qmodel = quantize_model(model)

snrs = snr_report(model.params, qmodel.params)
worst = sorted(snrs.items(), key=lambda kv: kv[1])[:5]
print(f"quantized {len(snrs)} tensors; "
      f"SNR min {min(snrs.values()):.1f} dB mean "
      f"{sum(snrs.values()) / len(snrs):.1f} dB")
for name, db in worst:
    print(f"  {db:6.1f} dB  {name}")

save_quantized(qmodel.params, "model.int8.safetensors")
print("saved model.int8.safetensors; reload with "
      "TTSModel.load_quantized('model.int8.safetensors')")

wav = qmodel.generate("Quantized inference sounds the same to most ears.")
print(f"int8 generation: {wav.size / qmodel.sample_rate:.2f}s audio")

# experimental: int4 halves the ARTIFACT size (nibble-packed uint8) but
# measured slower than int8 at runtime on TPU (unpack overhead beats the
# bandwidth saved — docs/performance.md); use it for distribution, not serving
q4 = quantize_model(model, bits=4)
snrs4 = snr_report(model.params, q4.params)
print(f"int4: SNR min {min(snrs4.values()):.1f} dB mean "
      f"{sum(snrs4.values()) / len(snrs4):.1f} dB")

# max-bandwidth combo: int8 weights AND an fp8 KV cache — every large HBM
# stream of the AR decode step at 8 bits (kv_dtype is a load-time knob; the
# quantize_model clone keeps it).  Listen before serving: both quantizations
# shift the autoregressive trajectory slightly.
combo = quantize_model(TTSModel.load(kv_dtype="float8_e4m3"))
wav = combo.generate("Eight bit weights and an eight bit cache.")
print(f"int8+fp8 generation: {wav.size / combo.sample_rate:.2f}s audio")
