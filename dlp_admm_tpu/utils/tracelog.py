"""Python bindings for the native trace logger (ctypes).

``native/tracelog.cpp`` is the C++ runtime IO piece: fixed-size float32
records buffered in memory and flushed by a background thread, so kHz-rate
telemetry from serving loops never stalls the dispatch thread. The shared
library is built on demand with ``make`` (g++); if no toolchain is available
a pure-Python fallback writer with the same file format is used.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtracelog.so")
_MAGIC = 0x444C5031


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tl_open.restype = ctypes.c_void_p
    lib.tl_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.tl_append.restype = ctypes.c_int
    lib.tl_append.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_float),
                              ctypes.c_uint32]
    lib.tl_flush.restype = ctypes.c_int
    lib.tl_flush.argtypes = [ctypes.c_void_p]
    lib.tl_records.restype = ctypes.c_uint64
    lib.tl_records.argtypes = [ctypes.c_void_p]
    lib.tl_close.restype = ctypes.c_int
    lib.tl_close.argtypes = [ctypes.c_void_p]
    lib.tl_read.restype = ctypes.c_int64
    lib.tl_read.argtypes = [ctypes.c_char_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.c_int64,
                            ctypes.POINTER(ctypes.c_uint32)]
    return lib


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


class TraceLog:
    """Append-only fixed-width float32 record log.

    >>> log = TraceLog("/tmp/run.dlplog", record_floats=8)
    >>> log.append(np.zeros((4, 8), np.float32))
    >>> log.close()
    >>> read_tracelog("/tmp/run.dlplog").shape
    (4, 8)
    """

    def __init__(self, path: str, record_floats: int):
        self.path = path
        self.record_floats = int(record_floats)
        self._handle = None
        self._file = None
        if _LIB is not None:
            self._handle = _LIB.tl_open(path.encode(), self.record_floats)
        if self._handle is None:  # pure-python fallback, same format
            self._file = open(path, "wb")
            self._file.write(struct.pack("<IIQ", _MAGIC, self.record_floats,
                                         0))

    def append(self, records: np.ndarray) -> None:
        rec = np.ascontiguousarray(records, np.float32).reshape(
            -1, self.record_floats)
        if self._handle is not None:
            ptr = rec.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if _LIB.tl_append(self._handle, ptr, rec.shape[0]) != 0:
                raise IOError("tl_append failed")
        else:
            self._file.write(rec.tobytes())

    def flush(self) -> None:
        if self._handle is not None:
            _LIB.tl_flush(self._handle)
        else:
            self._file.flush()

    @property
    def n_records(self) -> int:
        if self._handle is not None:
            return int(_LIB.tl_records(self._handle))
        pos = self._file.tell()
        return (pos - 16) // (4 * self.record_floats)

    def close(self) -> None:
        if self._handle is not None:
            _LIB.tl_close(self._handle)
            self._handle = None
        elif self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_tracelog(path: str) -> np.ndarray:
    """Read a trace log back as ``[n_records, record_floats]`` float32."""
    if _LIB is not None:
        rf = ctypes.c_uint32(0)
        n = _LIB.tl_read(path.encode(), None, 0, ctypes.byref(rf))
        if n < 0:
            raise IOError(f"tl_read failed ({n}) for {path}")
        out = np.empty((n, rf.value), np.float32)
        got = _LIB.tl_read(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           n, ctypes.byref(rf))
        return out[:got]
    with open(path, "rb") as f:
        magic, rf, _ = struct.unpack("<IIQ", f.read(16))
        if magic != _MAGIC:
            raise IOError(f"bad magic in {path}")
        data = np.frombuffer(f.read(), np.float32)
        return data.reshape(-1, rf)
