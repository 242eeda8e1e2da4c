"""Build the native coding runtime (`_tm_rans.so`) with g++.

No pybind11 in this image — the extension is a plain C-ABI shared object
loaded via ctypes. Build is cached next to the source; `python -m
textmae_tpu.coding.build` forces a rebuild.
"""
from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path

_HERE = Path(__file__).resolve().parent
SRC = _HERE / "csrc" / "rans.cpp"
# artifact lives in csrc/ (not a package dir): a bare .so in the package
# looks like an importable extension module to pkgutil and breaks walks
LIB = _HERE / "csrc" / "_tm_rans.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    with tempfile.TemporaryDirectory(dir=_HERE) as td:
        tmp = Path(td) / LIB.name
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-o", str(tmp), str(SRC),
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, LIB)  # atomic: parallel test workers can race the build
    return LIB


if __name__ == "__main__":
    print(build(force=True))
