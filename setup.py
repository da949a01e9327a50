"""Build hook for the native runtime library.

All metadata lives in pyproject.toml; this file only adds the csrc build
(reference ships its C the same way, setup.py:1-57).  The library is
OPTIONAL: every native entry point (CSV fast path, pedestal scan) has a
pure-Python fallback, so a missing compiler degrades performance, not
functionality — the build is therefore best-effort.
"""
import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).resolve().parent


class BuildWithNative(build_py):
    def run(self):
        super().run()
        source = ROOT / "csrc" / "pylbl_native.cpp"
        if not source.exists():
            return
        out_dir = Path(self.build_lib) / "pylbl_tpu"
        out_dir.mkdir(parents=True, exist_ok=True)
        target = out_dir / "libpylbl_native.so"
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
               str(source), "-o", str(target)]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as exc:
            print(f"warning: native library build skipped ({exc}); "
                  "pure-Python fallbacks will be used", file=sys.stderr)


setup(cmdclass={"build_py": BuildWithNative})
