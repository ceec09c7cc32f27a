"""Build hook: compile the native audio runtime into the wheel.

The C++ library is an optional fast path (pocket_tts_tpu/native.py falls back
to NumPy/stdlib implementations), so a missing compiler degrades gracefully
instead of failing the install."""

import logging
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        super().run()
        root = Path(__file__).parent
        src = root / "native" / "pocket_audio.cc"
        if not src.exists():
            return
        out_dir = Path(self.build_lib) / "pocket_tts_tpu" / "_native"
        out_dir.mkdir(parents=True, exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-Wall",
                 "-o", str(out_dir / "libpocket_audio.so"), str(src)],
                check=True, capture_output=True, timeout=300)
        except Exception as e:  # noqa: BLE001 - optional fast path
            logging.getLogger(__name__).warning(
                "native audio runtime not built (%s); pure-Python fallbacks "
                "will be used", e)


setup(cmdclass={"build_py": build_py_with_native})
