"""ctypes bindings for the native host library (native/libqwen3_host.so).

Every entry point has a pure-Python fallback; the native path is used
automatically when the library is present (build with `make -C native`).
The reference's equivalents live in its C++ runtime (Q8_0 decode in ggml,
BPE in text_decoder.cpp:911-949, LIS in forced_aligner.cpp:1183-1265).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libqwen3_host.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _LIB_PATH
    if not os.path.exists(path) and os.environ.get("QWEN3_BUILD_NATIVE", "1") == "1":
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.q8_0_dequant.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.lis_repair.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.bpe_encode_piece.restype = ctypes.c_int32
    lib.bpe_encode_piece.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def q8_0_dequant(raw: np.ndarray, n_elements: int) -> np.ndarray | None:
    """Native Q8_0 decode; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    n_blocks = raw.size // 34
    out = np.empty(n_blocks * 32, dtype=np.float32)
    lib.q8_0_dequant(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n_blocks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:n_elements]


def lis_repair(data: list[int]) -> list[int] | None:
    lib = _load()
    if lib is None:
        return None
    arr = np.asarray(data, dtype=np.int32)
    out = np.empty_like(arr)
    lib.lis_repair(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(arr.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [int(x) for x in out]


class NativeBPE:
    """Native byte-level BPE encoder over the same vocab/merges as
    text.bpe.BPETokenizer."""

    def __init__(self, vocab: list[str], merges: list[str]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        vb = "\n".join(vocab).encode("utf-8")
        mb = "\n".join(merges).encode("utf-8")
        self._lib = lib
        self._handle = lib.bpe_create(vb, len(vb), mb, len(mb))
        self._buf = (ctypes.c_int32 * 4096)()

    def encode_piece(self, text: str) -> list[int]:
        raw = text.encode("utf-8")
        n = self._lib.bpe_encode_piece(
            self._handle, raw, len(raw), self._buf, len(self._buf)
        )
        return list(self._buf[:n])

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bpe_destroy(self._handle)
            self._handle = None
