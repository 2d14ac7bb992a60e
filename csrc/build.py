"""Build the C++ host extension library (libqwen3_host.so).

Usage: python csrc/build.py  — also invoked on demand by
qwen3_rs_tpu/utils/native.py when the library is missing.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

CSRC = Path(__file__).resolve().parent
SOURCES = [CSRC / "bpe_tokenizer.cpp", CSRC / "host_io.cpp"]
OUTPUT = CSRC / "libqwen3_host.so"


def build() -> int:
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        print("no C++ compiler found", file=sys.stderr)
        return 1
    cmd = [
        cxx,
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-Wall",
        "-pthread",
        "-o",
        str(OUTPUT),
        *[str(s) for s in SOURCES],
    ]
    print(" ".join(cmd))
    return subprocess.run(cmd).returncode


if __name__ == "__main__":
    sys.exit(build())
