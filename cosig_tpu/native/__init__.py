"""Optional native (C++) components with pure-Python fallbacks.

Modules here lazily build/load shared libraries via ctypes; importing a
submodule raises ImportError when the toolchain or library is unavailable,
and callers fall back to the Python implementations.
"""
