"""ctypes bindings for the native host runtime (``wavio.cc``).

Builds the shared library on first use with the system compiler and falls
back to pure numpy when no compiler is available.  This is host-side code:
it feeds the TPU and serves the overview/cache path — the analog of the
compiled code the reference borrows from numpy/scipy/libsndfile (SURVEY.md
section 2, "Native / accelerated components").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libaudianative.so"
_SRC = _HERE / "wavio.cc"
_SRCS = [_HERE / "wavio.cc", _HERE / "flacdec.cc"]
_lock = threading.Lock()
_lib = None
_tried = False

_TAGS = {"PCM_16": (1, 16), "PCM_24": (1, 24), "PCM_32": (1, 32),
         "FLOAT": (3, 32), "DOUBLE": (3, 64)}


def _build():
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-march=native", "-shared",
        "-fPIC", "-pthread", *[str(s) for s in _SRCS],
        "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """The loaded shared library, building it on demand; None when
    unavailable (callers fall back to numpy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists() or any(
                s.stat().st_mtime > _LIB_PATH.stat().st_mtime
                for s in _SRCS
            ):
                _build()
            lib = ctypes.CDLL(str(_LIB_PATH))
        except Exception:
            return None
        lib.an_decode.restype = ctypes.c_int
        lib.an_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.an_read_frames.restype = ctypes.c_int64
        lib.an_read_frames.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.an_minmax.restype = None
        lib.an_minmax.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ]
        lib.an_file_minmax.restype = ctypes.c_int
        lib.an_file_minmax.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.an_flac_decode_frame.restype = ctypes.c_int64
        lib.an_flac_decode_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available():
    return get_lib() is not None


def read_frames(path, data_off, encoding, channels, start, nframes,
                out=None):
    """Native read+decode of a frame range to float32; None when the native
    path is unavailable or the encoding unsupported.

    ``out`` (optional) receives the frames in place — pass a recycled
    (nframes, channels) float32 C-contiguous array to avoid fresh-page
    allocation costs on hot read paths; the return value is a view of it.
    """
    lib = get_lib()
    tb = _TAGS.get(encoding)
    if lib is None or tb is None:
        return None
    if out is None:
        out = np.empty((nframes, channels), np.float32)
    else:
        if (out.dtype != np.float32 or out.shape != (nframes, channels)
                or not out.flags.c_contiguous):
            raise ValueError("out must be C-contiguous float32 "
                             f"of shape {(nframes, channels)}")
    got = lib.an_read_frames(
        str(path).encode(), int(data_off), tb[0], tb[1], int(channels),
        int(start), int(nframes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        return None
    return out[:got]


def flac_decode_frame(buf, offset, sinfo):
    """Decode one FLAC frame at byte ``offset`` of ``buf`` (the whole
    stream) — the hot loop of :mod:`audian_tpu.data.flac`.  Returns the
    ``(blocksize, channels)`` int32 samples, or None when the native
    library is unavailable or rejects the frame (the caller falls back
    to the Python reference decoder)."""
    lib = get_lib()
    if lib is None:
        return None
    channels = int(sinfo["channels"])
    maxbs = int(sinfo["max_blocksize"])
    out = np.empty((maxbs, channels), np.int32)
    work = np.empty(3 * maxbs, np.int64)
    n = lib.an_flac_decode_frame(
        buf, len(buf), int(offset), int(sinfo["rate"]), channels,
        int(sinfo["bits"]), maxbs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        work.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n < 0:
        return None
    return out[:n]


def minmax(x, step):
    """Interleaved min/max decimation of an (n, channels) float32 array;
    None when the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    frames, channels = x.shape
    nseg = -(-frames // step)
    out = np.empty((2 * nseg, channels), np.float64)
    lib.an_minmax(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, channels, int(step),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def file_minmax(path, data_off, encoding, channels, frames, step,
                nthreads=None):
    """Threaded whole-file min/max overview (the reference's
    `down_sample_worker` pool, `src/audian/compresseddata.py:25-53`, as
    lock-free C++ threads).  Returns (2*nseg, channels) float64 or None."""
    lib = get_lib()
    tb = _TAGS.get(encoding)
    if lib is None or tb is None:
        return None
    if nthreads is None:
        nthreads = max(1, (os.cpu_count() or 2) - 1)
    nseg = -(-frames // step)
    out = np.zeros((2 * nseg, channels), np.float64)
    rc = lib.an_file_minmax(
        str(path).encode(), int(data_off), tb[0], tb[1], int(channels),
        int(frames), int(step), int(nthreads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return out
