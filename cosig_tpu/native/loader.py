"""Lazy builder/loader for the native shared library (ctypes)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "build", "libcosig_native.so")

_lock = threading.Lock()
_lib = None
_failed = False


def load():
    """Return the loaded CDLL, building it on first use.

    Raises ImportError when the toolchain or build is unavailable so
    callers fall back to the Python implementations."""
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            raise ImportError("native library build failed previously")
        if not os.path.exists(_LIB):
            try:
                subprocess.run(
                    ["make", "-C", _DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError) as e:
                _failed = True
                raise ImportError(f"native build failed: {e}") from e
        try:
            _lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _failed = True
            raise ImportError(f"cannot load {_LIB}: {e}") from e
        return _lib
