"""Native (C++) host-runtime tier: libjpeg decode + fused resize/crop.

The reference's host data path rode tf.data's C++ kernels (reference:
data/preprocess/preprocess.py:61-77 uses `decode_and_crop_jpeg`). Here the
equivalent native tier is a small libjpeg(-turbo) extension
(``decode_jpeg.cc``) compiled on first use with the system toolchain and
loaded via ctypes — no pip dependencies. Everything degrades gracefully:
if g++ or libjpeg is unavailable, or a stream uses an unsupported color
space (CMYK), callers fall back to the PIL path in
``sav_tpu.data.jpeg_source``.

Set ``SAV_TPU_NO_NATIVE=1`` to disable the native tier entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'decode_jpeg.cc')
_LIB_NAME = 'libsavjpeg.so'

_lock = threading.Lock()
_lib = None          # ctypes.CDLL once loaded
_lib_failed = False  # tried and failed — don't retry every call


def _build(lib_path: str) -> bool:
    """Compile decode_jpeg.cc -> lib_path. Atomic (tmp + rename)."""
    fd, tmp = tempfile.mkstemp(suffix='.so', dir=_DIR)
    os.close(fd)
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           '-o', tmp, _SRC, '-ljpeg', '-pthread']
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
        if proc.returncode != 0:
            return False
        os.replace(tmp, lib_path)
        return True
    except (OSError, subprocess.SubprocessError):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed or os.environ.get('SAV_TPU_NO_NATIVE'):
        return None
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        lib_path = os.path.join(_DIR, _LIB_NAME)
        try:
            if (not os.path.exists(lib_path)
                    or os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
                if not _build(lib_path):
                    _lib_failed = True
                    return None
            lib = ctypes.CDLL(lib_path)
            lib.sav_decode_jpeg.restype = ctypes.c_int
            lib.sav_decode_jpeg.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.sav_decode_jpeg_batch.restype = ctypes.c_int
            lib.sav_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            _lib = lib
        except OSError:
            _lib_failed = True
            return None
    return _lib


def available() -> bool:
    """True when the native decoder can be (or has been) loaded."""
    return _load() is not None


def decode_jpeg_fixed_native(data: bytes, decode_size: int
                             ) -> Optional[np.ndarray]:
    """Native decode of JPEG ``data`` to ``[S, S, 3]`` uint8, or None.

    None means "use the PIL fallback" — either the library is unavailable
    or this stream needs PIL (CMYK, corrupt, ...). Geometry matches
    ``jpeg_source.decode_jpeg_fixed``: DCT-scaled draft decode, keep-aspect
    resize-small, center crop.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty((decode_size, decode_size, 3), dtype=np.uint8)
    rc = lib.sav_decode_jpeg(
        data, len(data), decode_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_jpeg_batch_native(datas: Sequence[bytes], decode_size: int,
                             nthreads: int = 0) -> Optional[np.ndarray]:
    """Threaded batch decode -> ``[N, S, S, 3]`` uint8, or None.

    The GIL is released for the whole batch, so this parallelizes inside a
    single Python process (``nthreads=0`` -> cpu_count). Any image the
    native path can't handle is re-decoded via the per-image wrapper's PIL
    fallback by the caller; here such frames are filled by PIL directly so
    the result is always complete when a result is returned.
    """
    lib = _load()
    if lib is None or not datas:
        return None
    n = len(datas)
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    out = np.empty((n, decode_size, decode_size, 3), dtype=np.uint8)
    status = (ctypes.c_int * n)()
    bufs = (ctypes.c_char_p * n)(*datas)
    lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    failures = lib.sav_decode_jpeg_batch(
        bufs, lens, n, decode_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status, nthreads)
    if failures:
        import io

        from sav_tpu.data import jpeg_source

        for i in range(n):
            if status[i] != 0:
                out[i] = jpeg_source.decode_jpeg_fixed(
                    io.BytesIO(datas[i]), decode_size, allow_native=False)
    return out
