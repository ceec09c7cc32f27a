from pocket_tts_tpu.models import flow_lm, flow_mlp, mimi, seanet, transformer  # noqa: F401
