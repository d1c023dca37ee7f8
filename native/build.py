"""Build the native image-ops shared library (lazy, build-on-first-use).

Mirrors the reference's JIT extension build pattern
(reference: enhancing/losses/op/fused_act.py:11-17 — torch cpp_extension.load
at import); here a plain cc invocation cached next to the source.
"""
from __future__ import annotations

import subprocess
from pathlib import Path

SRC = Path(__file__).parent / "image_ops.cpp"
LIB = Path(__file__).parent / "libimage_ops.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force \
            and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = ["c++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(SRC), "-o", str(LIB), "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True)
    except subprocess.CalledProcessError:
        # image without libjpeg/libpng dev files: build without decoders
        # (has_decoders() then reports 0 and the loader stays on PIL)
        cmd = [c for c in cmd if c not in ("-ljpeg", "-lpng")]
        subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
