"""Build-and-load helper for the C++ components under native/.

Compiles ``native/<name>.cpp`` → ``native/build/lib<name>.so`` with g++ on
first use (rebuilds when the source is newer) and returns the ctypes CDLL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_lock = threading.Lock()
_cache: dict[str, ctypes.CDLL] = {}


def load_native(name: str, extra_flags: tuple[str, ...] = ()) -> ctypes.CDLL:
    with _lock:
        if name in _cache:
            return _cache[name]
        src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
        lib_path = os.path.join(_BUILD_DIR, f"lib{name}.so")
        os.makedirs(_BUILD_DIR, exist_ok=True)
        if (not os.path.exists(lib_path) or
                os.path.getmtime(lib_path) < os.path.getmtime(src)):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", *extra_flags, src, "-o", lib_path + ".tmp"]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except subprocess.CalledProcessError as e:
                raise ImportError(
                    f"failed to build native/{name}.cpp: "
                    f"{e.stderr.decode()[:500]}") from e
            os.replace(lib_path + ".tmp", lib_path)
        _cache[name] = ctypes.CDLL(lib_path)
        return _cache[name]
