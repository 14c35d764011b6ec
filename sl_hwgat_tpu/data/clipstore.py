"""Clip store: mmap-backed float32 record file for preprocessed keypoint
clips — the production-serving replacement for the reference's all-in-RAM
``data_map`` pickle (`hwgat/data_preprocess.py:102-116`).

Two access paths to the SAME on-disk format (see ``native/clipstore.cpp``):

1. **Native (C++)**: a small C-ABI reader built on demand with ``g++ -O3
   -shared`` and bound via ctypes — zero-syscall mmap reads shared across
   loader workers via the page cache.
2. **Fallback (numpy)**: ``np.memmap`` parsing of the identical layout when
   no compiler is available; bitwise-identical results (tested).

``ClipStore`` is mapping-like (``store[vid] -> np.ndarray``), so it drops
into ``KeypointDataset.data_map`` unchanged. ``write_clipstore`` converts any
``{id: (T, V, C) float32 array}`` mapping; the id→row table is a ``.ids``
pickle sidecar.
"""

from __future__ import annotations

import ctypes
import os
import pickle
import struct
import subprocess
import sys

import numpy as np

MAGIC = b"SLCS"
VERSION = 2
_HEADER = 32  # magic, version u32, n u64, store uuid (16 bytes)
_INDEX_ENTRY = 16  # offset u64, T u32, (V<<16|C) u32

_NATIVE_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "clipstore.cpp")
_NATIVE_LIB = None
_NATIVE_TRIED = False


def _native_lib():
    """Build (once) and load the C++ reader; None when unavailable."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    so_path = os.path.join(os.path.dirname(_NATIVE_SRC),
                           f"clipstore_{sys.implementation.cache_tag}.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_NATIVE_SRC)):
            # build to a process-unique temp then atomically replace so
            # concurrent builders (multi-host launch, parallel tests) never
            # load or persist a half-written .so
            tmp_so = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp_so, _NATIVE_SRC],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, so_path)
        lib = ctypes.CDLL(so_path)
        lib.cs_open.restype = ctypes.c_void_p
        lib.cs_open.argtypes = [ctypes.c_char_p]
        lib.cs_close.argtypes = [ctypes.c_void_p]
        lib.cs_len.restype = ctypes.c_int64
        lib.cs_len.argtypes = [ctypes.c_void_p]
        lib.cs_shape.restype = ctypes.c_int64
        lib.cs_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_uint32)]
        lib.cs_read.restype = ctypes.c_int
        lib.cs_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_float)]
        _NATIVE_LIB = lib
    except Exception:  # no compiler / load failure → numpy fallback
        _NATIVE_LIB = None
    return _NATIVE_LIB


def write_clipstore(path: str, mapping: dict) -> None:
    """Write ``{id: (T, V, C) float32 ndarray}`` as a clip store + id sidecar.

    A random store uuid is embedded in BOTH files and checked at open, so a
    crash between the two atomic replaces can never silently pair a new
    store with a stale id->row table (it fails loudly instead)."""
    import uuid as uuid_mod

    ids = list(mapping.keys())
    n = len(ids)
    store_uuid = uuid_mod.uuid4().bytes
    offset = _HEADER + n * _INDEX_ENTRY
    index = bytearray()
    payloads = []
    for vid in ids:
        arr = np.ascontiguousarray(np.asarray(mapping[vid], dtype=np.float32))
        if arr.ndim != 3:
            raise ValueError(f"clip {vid!r} must be (T, V, C), got {arr.shape}")
        t, v, c = arr.shape
        if v >= 1 << 16 or c >= 1 << 16:
            raise ValueError(f"clip {vid!r} dims too large for the index: {arr.shape}")
        index += struct.pack("<QII", offset, t, (v << 16) | c)
        payloads.append(arr)
        offset += arr.nbytes
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC + struct.pack("<IQ", VERSION, n) + store_uuid)
        f.write(bytes(index))
        for arr in payloads:
            f.write(arr.tobytes())
    tmp_ids = path + ".ids.tmp"
    with open(tmp_ids, "wb") as f:
        pickle.dump({"rows": {vid: row for row, vid in enumerate(ids)},
                     "uuid": store_uuid}, f)
    os.replace(tmp, path)
    os.replace(tmp_ids, path + ".ids")


class ClipStore:
    """Mapping-like reader over a clip store file (native or numpy path)."""

    def __init__(self, path: str, force_numpy: bool = False):
        self.path = path
        with open(path + ".ids", "rb") as f:
            sidecar = pickle.load(f)
        self._rows = sidecar["rows"]
        # the store/sidecar pair must come from the same write (see writer)
        with open(path, "rb") as f:
            header = f.read(_HEADER)
        if len(header) < _HEADER or header[:4] != MAGIC:
            raise ValueError(f"{path}: not a clip store")
        version, n = struct.unpack("<IQ", header[4:16])
        if version != VERSION:
            raise ValueError(f"{path}: unsupported version {version}")
        if header[16:32] != sidecar["uuid"]:
            raise ValueError(
                f"{path}: id sidecar does not match the store (uuid mismatch "
                "— interrupted rewrite?); regenerate with write_clipstore")
        if n != len(self._rows):
            raise ValueError(f"{path}: record count {n} != sidecar {len(self._rows)}")
        self._lib = None if force_numpy else _native_lib()
        if self._lib is not None:
            self._handle = self._lib.cs_open(path.encode())
            if not self._handle:
                self._lib = None
        if self._lib is None:
            self._mm = np.memmap(path, dtype=np.uint8, mode="r")
            raw = self._mm[_HEADER:_HEADER + n * _INDEX_ENTRY].tobytes()
            self._index = [struct.unpack("<QII", raw[i * 16:(i + 1) * 16])
                           for i in range(n)]

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "numpy"

    def __len__(self):
        return len(self._rows)

    def __contains__(self, vid):
        return vid in self._rows

    def keys(self):
        return self._rows.keys()

    def _read_row(self, row: int) -> np.ndarray:
        if self._lib is not None:
            dims = (ctypes.c_uint32 * 3)()
            count = self._lib.cs_shape(self._handle, row, dims)
            if count < 0:
                raise KeyError(row)
            out = np.empty((dims[0], dims[1], dims[2]), np.float32)
            rc = self._lib.cs_read(
                self._handle, row,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc != 0:
                raise IOError(f"clip store read failed: rc={rc}")
            return out
        offset, t, vc = self._index[row]
        v, c = vc >> 16, vc & 0xFFFF
        count = t * v * c
        flat = np.frombuffer(self._mm, dtype=np.float32, count=count,
                             offset=offset)
        return flat.reshape(t, v, c).copy()

    def __getitem__(self, vid) -> np.ndarray:
        return self._read_row(self._rows[vid])

    def close(self):
        if self._lib is not None and self._handle:
            self._lib.cs_close(self._handle)
            self._handle = None

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass
