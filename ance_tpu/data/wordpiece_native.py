"""ctypes bridge to the C++ WordPiece core (native/wordpiece.cpp).

Builds the shared library on first use (g++ -O3) into a per-repo build dir;
raises ImportError when no toolchain is available so callers fall back to the
pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "wordpiece.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libwordpiece.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (not os.path.exists(_LIB) or
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _LIB + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_LIB + ".tmp", _LIB)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int]
            lib.wp_encode.restype = ctypes.c_int
            lib.wp_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.c_int]
            lib.wp_free.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


class NativeWordPiece:
    """Vocab-bound encoder. ASCII-only — the caller routes non-ASCII text to
    the Python reference implementation."""

    def __init__(self, vocab: dict[str, int], unk_token: str,
                 lowercase: bool):
        self._lib = _load()
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        if [i for _, i in ordered] != list(range(len(ordered))):
            raise ValueError("vocab ids must be contiguous from 0")
        arr = (ctypes.c_char_p * len(ordered))(
            *[t.encode("utf-8") for t, _ in ordered])
        self._handle = self._lib.wp_create(arr, len(ordered),
                                           vocab[unk_token],
                                           1 if lowercase else 0)
        self._buf = (ctypes.c_int * 65536)()

    def encode(self, text: str) -> list[int]:
        n = self._lib.wp_encode(self._handle, text.encode("utf-8"),
                                self._buf, len(self._buf))
        if n < 0:
            raise ValueError("text produced too many tokens")
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.wp_free(self._handle)
        except Exception:
            pass
