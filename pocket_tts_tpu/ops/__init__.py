from pocket_tts_tpu.ops import attention, conv, norms, rope  # noqa: F401
