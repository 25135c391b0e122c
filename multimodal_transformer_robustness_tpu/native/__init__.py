"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ into a cached shared library next to the sources;
every consumer has a pure-Python fallback so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def build_and_load(name: str) -> Optional[ctypes.CDLL]:
    """Compile ``<name>.cpp`` to ``lib<name>.so`` (cached by mtime) and load
    it.  Returns None when compilation is unavailable/fails."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"lib{name}.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib
