"""Build helper for the embedded-interpreter C API shim."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "ceres_tpu_c.cpp")
HEADER = os.path.join(_DIR, "ceres_tpu_c.h")
LIB = os.path.join(_DIR, "libceres_tpu_c.so")


def _py_config(*flags) -> list:
    out = subprocess.run(["python3-config", *flags], check=True,
                         capture_output=True, text=True).stdout
    return out.split()


def build(force: bool = False) -> str:
    """Compile libceres_tpu_c.so (cached); returns its path."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = (["g++", "-O2", "-shared", "-fPIC"] + _py_config("--includes")
           + [SRC, "-o", LIB] + _py_config("--embed", "--ldflags"))
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


def available() -> bool:
    try:
        build()
        return True
    except Exception:
        return False
