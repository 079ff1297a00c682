"""ctypes binding for the native GGUF loader (native/libmagpie_gguf.so).

Provides ``NativeGGUFReader`` with the same ``.metadata`` / ``.tensors`` /
``.tensor(name)`` surface as the pure-Python ``GGUFReader``. ``open_gguf``
returns the native reader when the shared library is present (building it:
``make -C native``), else the Python one — behavior is identical, the native
path is just a faster parse + threaded dequant for the ~GB checkpoints.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

from . import gguf as pygguf

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_T_STRING = 8


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    native_dir = os.path.join(here, "..", "..", "native")
    candidates = [
        os.environ.get("MAGPIE_GGUF_LIB", ""),
        os.path.join(native_dir, "libmagpie_gguf.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return os.path.abspath(c)
    # The .so is a build artifact (not committed); build it on first use.
    if (os.path.exists(os.path.join(native_dir, "Makefile"))
            and os.environ.get("MAGPIE_BUILD_NATIVE", "1") != "0"):
        import subprocess

        try:
            subprocess.run(["make", "-C", native_dir],
                           capture_output=True, timeout=120, check=True)
        except (OSError, subprocess.SubprocessError):
            return None
        so = os.path.join(native_dir, "libmagpie_gguf.so")
        if os.path.exists(so):
            return os.path.abspath(so)
    return None


def _load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.gguf_open.restype = ctypes.c_void_p
    lib.gguf_open.argtypes = [ctypes.c_char_p]
    lib.gguf_close.argtypes = [ctypes.c_void_p]
    lib.gguf_n_tensors.restype = ctypes.c_int64
    lib.gguf_n_tensors.argtypes = [ctypes.c_void_p]
    lib.gguf_tensor_name.restype = ctypes.c_char_p
    lib.gguf_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_tensor_ndims.restype = ctypes.c_int32
    lib.gguf_tensor_ndims.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_tensor_dims.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int64)]
    lib.gguf_tensor_type.restype = ctypes.c_int32
    lib.gguf_tensor_type.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_tensor_nelements.restype = ctypes.c_int64
    lib.gguf_tensor_nelements.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_n_kv.restype = ctypes.c_int64
    lib.gguf_n_kv.argtypes = [ctypes.c_void_p]
    lib.gguf_kv_key.restype = ctypes.c_char_p
    lib.gguf_kv_key.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_kv_type.restype = ctypes.c_int32
    lib.gguf_kv_type.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_kv_num.restype = ctypes.c_double
    lib.gguf_kv_num.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_kv_str.restype = ctypes.c_char_p
    lib.gguf_kv_str.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_tensor_read_f32.restype = ctypes.c_int
    lib.gguf_tensor_read_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.POINTER(ctypes.c_float)]
    # Raw-bytes accessors are newer than the f32 path; an older .so built
    # before they existed triggers a rebuild via the version probe below.
    for fn, restype, argtypes in (
            ("gguf_tensor_nbytes", ctypes.c_int64,
             [ctypes.c_void_p, ctypes.c_int64]),
            ("gguf_tensor_read_raw", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_int64,
              ctypes.POINTER(ctypes.c_uint8)])):
        if hasattr(lib, fn):
            getattr(lib, fn).restype = restype
            getattr(lib, fn).argtypes = argtypes
    _LIB = lib
    return lib


class NativeGGUFReader:
    def __init__(self, path: str):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native GGUF library not available")
        self._lib = lib
        self._handle = lib.gguf_open(path.encode())
        if not self._handle:
            raise ValueError(f"{path}: failed to parse GGUF")
        self.path = path
        self.metadata: Dict[str, object] = {}
        self.tensors: Dict[str, pygguf.TensorInfo] = {}
        self._index: Dict[str, int] = {}

        for i in range(lib.gguf_n_kv(self._handle)):
            key = lib.gguf_kv_key(self._handle, i).decode()
            vtype = lib.gguf_kv_type(self._handle, i)
            if vtype == _T_STRING:
                self.metadata[key] = lib.gguf_kv_str(self._handle, i).decode()
            else:
                num = lib.gguf_kv_num(self._handle, i)
                self.metadata[key] = int(num) if float(num).is_integer() else num

        dims = (ctypes.c_int64 * 4)()
        for i in range(lib.gguf_n_tensors(self._handle)):
            name = lib.gguf_tensor_name(self._handle, i).decode()
            n_dims = lib.gguf_tensor_ndims(self._handle, i)
            lib.gguf_tensor_dims(self._handle, i, dims)
            shape = tuple(int(dims[d]) for d in range(n_dims))
            ggml_type = lib.gguf_tensor_type(self._handle, i)
            self.tensors[name] = pygguf.TensorInfo(name, shape, ggml_type, 0)
            self._index[name] = i

    def tensor(self, name: str, dequant_dtype=np.float32) -> np.ndarray:
        idx = self._index[name]
        info = self.tensors[name]
        out = np.empty(info.n_elements, dtype=np.float32)
        rc = self._lib.gguf_tensor_read_f32(
            self._handle, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise ValueError(f"{name}: native read failed (rc={rc})")
        if info.ggml_type == pygguf.GGML_I32:
            out = out.view(np.int32)
        elif dequant_dtype != np.float32:
            out = out.astype(dequant_dtype)
        return out.reshape(info.shape)

    def raw(self, name: str) -> np.ndarray:
        """The tensor's stored bytes, undecoded (GGUFReader.raw parity) —
        Q8_0 blocks stay blocks, as the Q8-native serving path needs."""
        if not hasattr(self._lib, "gguf_tensor_read_raw"):
            # .so predates the raw accessors; the pure-Python reader mmaps
            # the same file (cheap) and is byte-identical.
            return pygguf.GGUFReader(self.path).raw(name)
        idx = self._index[name]
        nbytes = self._lib.gguf_tensor_nbytes(self._handle, idx)
        if nbytes < 0:
            raise ValueError(f"{name}: unknown stored size")
        out = np.empty(nbytes, dtype=np.uint8)
        rc = self._lib.gguf_tensor_read_raw(
            self._handle, idx,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise ValueError(f"{name}: native raw read failed (rc={rc})")
        return out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.gguf_close(self._handle)
            self._handle = None


def open_gguf(path: str):
    """Fastest available reader: native if built, else pure Python."""
    if _load_library() is not None:
        try:
            return NativeGGUFReader(path)
        except (RuntimeError, ValueError):
            pass
    return pygguf.GGUFReader(path)
