"""Build hooks: compile the native host-ingestion library at install.

The reference drives a CMake/CUDA build from setup.py (reference:
setup.py:47-163). Here the native piece is one portable C++ file built
with the system compiler; it is optional — the package falls back to
numpy if the build is unavailable (vptq_tpu/native/__init__.py).
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = Path(__file__).parent / "csrc" / "vptq_host.cc"
        if not src.exists():
            return
        out_dir = Path(self.build_lib) / "vptq_tpu" / "native"
        out_dir.mkdir(parents=True, exist_ok=True)
        out = out_dir / "libvptq_host.so"
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-pthread", str(src), "-o", str(out),
        ]
        try:
            subprocess.run(cmd, check=True, timeout=300)
        except Exception as e:  # pragma: no cover
            print(f"native build skipped: {e}", file=sys.stderr)


setup(cmdclass={"build_py": BuildWithNative})
