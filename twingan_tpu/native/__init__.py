"""Native (C++) runtime components, loaded via ctypes.

Currently: the TFRecord data-path library (hardware CRC32C + one-pass record
scanning). Built on first import with g++ and cached next to the source;
every user has a pure-Python fallback, so a missing toolchain only costs
speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tfrecord.cc")
_LIB = os.path.join(_HERE, "libtwindata.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load():
    """Returns the ctypes library handle, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.twin_crc32c.restype = ctypes.c_uint32
        lib.twin_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.twin_masked_crc32c.restype = ctypes.c_uint32
        lib.twin_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.twin_scan_tfrecord.restype = ctypes.c_int64
        lib.twin_scan_tfrecord.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib
