"""ctypes bridge to the C++ host extensions (csrc/).

The reference implements its CPU-bound host components (BPE tokenizer,
binary (de)serialization) in native Rust; here the equivalents are C++
(csrc/bpe_tokenizer.cpp) loaded through ctypes.  Build with
``python csrc/build.py`` (or it happens on demand); pure-Python fallbacks
exist for every native component.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sys
from pathlib import Path

logger = logging.getLogger(__name__)

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libqwen3_host.so"
_lib = None


def _build_library() -> bool:
    build_script = _CSRC / "build.py"
    if not build_script.exists():
        return False
    try:
        subprocess.run(
            [sys.executable, str(build_script)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # noqa: BLE001
        logger.debug("native build failed: %s", e)
        return False


def load_library():
    """Load (building on demand) the host extension library, or None."""
    global _lib
    if _lib is not None:
        return _lib or None
    if os.environ.get("QWEN3_TPU_DISABLE_NATIVE", "0") == "1":
        _lib = False
        return None
    if not _LIB_PATH.exists() and not _build_library():
        _lib = False
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        logger.debug("failed to load %s: %s", _LIB_PATH, e)
        _lib = False
        return None
    lib.bpe_new.restype = ctypes.c_void_p
    lib.bpe_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_encode.restype = ctypes.c_int32
    lib.bpe_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint32,
    ]
    for name in ("transpose_i8", "transpose_f32"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
    _lib = lib
    return lib


def native_transpose(src: "np.ndarray", n_threads: int = 0):
    """Batched last-two-axes transpose [..., R, C] -> [..., C, R] through the
    C++ blocked/multithreaded kernel (csrc/host_io.cpp); returns None when
    the native library or dtype is unavailable so callers can fall back to
    numpy.  This is the loader hot path: the checkpoint stores row-major
    [out, in] weight codes, compute wants in-major (checkpoint.py)."""
    import numpy as np

    lib = load_library()
    if lib is None:
        return None
    if src.dtype == np.int8:
        fn = lib.transpose_i8
    elif src.dtype == np.float32:
        fn = lib.transpose_f32
    else:
        return None
    if src.ndim < 2:
        return None
    src = np.ascontiguousarray(src)
    *lead, rows, cols = src.shape
    batch = int(np.prod(lead)) if lead else 1
    dst = np.empty((*lead, cols, rows), dtype=src.dtype)
    fn(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        batch,
        rows,
        cols,
        n_threads,
    )
    return dst


class NativeBpeEncoder:
    """C++ BPE encoder with reference-identical semantics
    (see csrc/bpe_tokenizer.cpp)."""

    def __init__(self, vocab: list[bytes], merge_scores: list[float], max_token_length: int):
        lib = load_library()
        if lib is None:
            raise ImportError("native host library unavailable")
        self._lib = lib
        n = len(vocab)
        self._tokens = (ctypes.c_char_p * n)(*vocab)
        self._lens = (ctypes.c_uint32 * n)(*[len(t) for t in vocab])
        self._scores = (ctypes.c_float * n)(*merge_scores)
        self._handle = lib.bpe_new(self._tokens, self._lens, self._scores, n, max_token_length)
        if not self._handle:
            raise ImportError("bpe_new failed")

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        cap = max(len(text) + 16, 64)
        out = (ctypes.c_uint32 * cap)()
        n = self._lib.bpe_encode(self._handle, data, len(data), out, cap)
        if n < 0:
            raise RuntimeError("bpe_encode failed")
        return list(out[:n])

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bpe_free(self._handle)
        except Exception:  # noqa: BLE001
            pass
