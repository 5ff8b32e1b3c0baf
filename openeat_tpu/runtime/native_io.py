"""ctypes bindings to the native IO runtime (native/libopeneat_io.so).

The C++ library decodes whole batches of wav segments with a thread
pool (no GIL), replacing the reference's libsox-in-worker-process data
path (SURVEY.md §2.6). Falls back transparently to the pure-Python
reader (openeat_tpu.dataset.audio) when the library isn't built; build
with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libopeneat_io.so"),
]


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for path in _SO_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.oet_read_wav_batch.restype = ctypes.c_int
                lib.oet_read_wav_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.oet_wav_info.restype = ctypes.c_int
                lib.oet_wav_info.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32)]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _load() is not None


def read_wav_batch(paths: Sequence[str],
                   starts: Sequence[Optional[float]],
                   ends: Sequence[Optional[float]],
                   max_samples: int, n_threads: int = 8
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel decode -> (wav [n, max_samples] f32 in [-1,1],
    lens [n] i64, rates [n] i32); failed files get len 0."""
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode("utf-8") for p in paths])
    c_starts = (ctypes.c_double * n)(
        *[-1.0 if s is None else float(s) for s in starts])
    c_ends = (ctypes.c_double * n)(
        *[-1.0 if e is None else float(e) for e in ends])
    # np.empty: rows are only defined up to out_lens[i]; callers slice.
    # (zeroing a multi-MB buffer per batch dominated the decode time.)
    out = np.empty((n, max_samples), np.float32)
    out_lens = np.zeros((n,), np.int64)
    out_rates = np.zeros((n,), np.int32)
    lib.oet_read_wav_batch(
        c_paths, c_starts, c_ends, n, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, out_lens, out_rates


def wav_info(path: str) -> tuple[int, int]:
    lib = _load()
    assert lib is not None
    n = ctypes.c_int64()
    r = ctypes.c_int32()
    if lib.oet_wav_info(path.encode("utf-8"), ctypes.byref(n),
                        ctypes.byref(r)) != 0:
        raise ValueError(f"cannot decode {path}")
    return int(n.value), int(r.value)
