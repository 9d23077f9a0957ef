"""Native (C++) runtime helpers, built on demand with g++.

`get()` returns the `_b32native` extension module, compiling it on first
use (cached as a .so next to the source, keyed on source mtime).  Returns
None when no compiler is available — callers fall back to pure Python.
"""

import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "b32native.cpp")
_SO = os.path.join(_HERE, "_b32native.so")

_module = None
_attempted = False


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    return os.path.getmtime(_SO) < os.path.getmtime(_SRC)


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", _SRC, "-o", _SO]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        sys.stderr.write(f"b32native build failed:\n{proc.stderr}\n")
        return False
    return True


def get():
    """The compiled module, or None when unavailable."""
    global _module, _attempted
    if _module is not None:
        return _module
    if _attempted:
        return None
    _attempted = True
    if _needs_build() and not _build():
        return None
    if _HERE not in sys.path:
        sys.path.insert(0, _HERE)
    try:
        import _b32native
    except ImportError:
        return None
    from ..io.ron import Tag
    _b32native.set_tag_factory(Tag)
    _module = _b32native
    return _module
