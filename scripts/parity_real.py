"""Real-weights parity runner — the first command to run when the released
checkpoint becomes reachable.

Runs the weight-gated golden-asset tests (tests/test_golden_assets.py, which
encode the reference tolerances from parity_tests.rs) and dumps A/B listen
files: the reference's golden output next to this framework's output for the
same text and voice, so a human can compare by ear.

Self-skips cleanly when the checkpoint is unreachable:

    POCKET_TTS_WEIGHTS=/path/to/tts_b6369a24.safetensors make parity-real
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ASSETS = Path("/root/reference/assets")
OUT = REPO / "parity_listen"


def checkpoint_reachable() -> bool:
    sys.path.insert(0, str(REPO))
    from pocket_tts_tpu import weights
    from pocket_tts_tpu.config import load_variant
    from pocket_tts_tpu.models.mimi import MimiPlans

    cfg = load_variant()
    try:
        weights.load_params(cfg, MimiPlans(cfg.mimi), allow_random=False)
        return True
    except FileNotFoundError:
        return False


def main() -> int:
    if not checkpoint_reachable():
        print("parity-real: released checkpoint not reachable "
              "(set POCKET_TTS_WEIGHTS); skipping cleanly.")
        return 0

    print("== golden-asset parity tests (reference tolerances) ==")
    rc = subprocess.call([sys.executable, "-m", "pytest",
                          "tests/test_golden_assets.py", "-v", "--no-header"],
                         cwd=REPO)
    if rc != 0:
        return rc

    print("== A/B listen files ==")
    from pocket_tts_tpu import audio as audio_io
    from pocket_tts_tpu.tts import TTSModel

    OUT.mkdir(exist_ok=True)
    model = TTSModel.load(temp=0.0)
    if ASSETS.exists():
        for name in ("ref.wav", "ref_output.wav"):
            if (ASSETS / name).exists():
                shutil.copy(ASSETS / name, OUT / f"reference_{name}")
    voice = None
    if (ASSETS / "ref.wav").exists():
        voice = model.get_voice_state_from_wav(ASSETS / "ref.wav")
    for tag, text in (
        ("hello", "Hello, world!"),
        ("pangram", "The quick brown fox jumps over the lazy dog."),
        ("long", "Real weights at last. This longer sentence exercises "
                 "chunking, pauses, and the full decode path end to end."),
    ):
        wav = model.generate_with_pauses(text, voice)
        audio_io.write_wav(OUT / f"tpu_{tag}.wav", wav, model.sample_rate)
        print(f"  wrote {OUT / f'tpu_{tag}.wav'} ({wav.size / 24000:.2f}s)")
    print(f"Listen-compare files in {OUT}/ "
          "(reference_* vs tpu_*; same voice as ref_output).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
