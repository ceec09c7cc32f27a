"""Client for a running server (`pocket-tts-tpu serve --port 8000`).

Exercises the reference's route surface (routes.rs:19-28): /health,
/generate, /stream (raw PCM), /v1/audio/speech (OpenAI-compatible), and
/tts with the Python oracle's streaming-WAV compat mode."""

import json
import sys
import time
import urllib.request

BASE = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:8000"


def post(path, body, ctype="application/json"):
    data = json.dumps(body).encode() if ctype == "application/json" else body
    req = urllib.request.Request(BASE + path, data=data,
                                 headers={"Content-Type": ctype})
    return urllib.request.urlopen(req, timeout=300)


print("health:", json.load(urllib.request.urlopen(BASE + "/health")))

wav = post("/generate", {"text": "A complete WAV in one response.",
                         "voice": "alba", "temperature": 0.6}).read()
open("server_generate.wav", "wb").write(wav)
print(f"/generate -> server_generate.wav ({len(wav)} bytes)")

t0 = time.perf_counter()
with post("/stream", {"text": "Raw PCM chunks, lowest latency."}) as resp:
    first = resp.read(3840)
    print(f"/stream first audio after {(time.perf_counter()-t0)*1000:.0f} ms")
    rest = resp.read()
print(f"/stream total {(len(first) + len(rest)) // 2} samples")

wav = post("/v1/audio/speech",
           {"model": "pocket-tts", "input": "OpenAI compatible endpoint.",
            "voice": "marius"}).read()
print(f"/v1/audio/speech -> {len(wav)} bytes")
