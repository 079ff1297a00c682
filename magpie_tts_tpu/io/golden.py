"""Golden-tensor .bin format: interchange with the reference test suite.

Byte-compatible with the reference dumper (scripts/dump_reference.py:21-42;
consumed by e.g. tests/test_full_encoder_v2.cpp:7-19): the shape is padded to
4 dims, the header is those 4 dims written int64 REVERSED, and the payload is
float32 in the tensor's natural row-major order (which is GGML's ne-innermost-
first layout once the dims are reversed). Token dumps are stored as float32
too (tests/test_e2e_inference.cpp:12-38).

A .bin produced by the real NeMo-side dumper (reference scripts or
tools/dump_reference_nemo.py here) reads back identically through
``read_golden`` — this is what lets tools/verify_golden.py localize real-
checkpoint divergence per layer.
"""

from __future__ import annotations

import numpy as np


def write_golden(path: str, array: np.ndarray) -> None:
    array = np.ascontiguousarray(np.asarray(array, dtype=np.float32))
    if array.ndim > 4:
        raise ValueError("golden format supports at most 4 dims")
    padded = list(array.shape) + [1] * (4 - array.ndim)
    with open(path, "wb") as f:
        np.asarray(list(reversed(padded)), np.int64).tofile(f)
        array.tofile(f)


def read_golden(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        dims = np.fromfile(f, dtype=np.int64, count=4)
        data = np.fromfile(f, dtype=np.float32)
    shape = [int(d) for d in reversed(dims)]   # back to torch/numpy order
    while len(shape) > 1 and shape[-1] == 1:   # drop the padding dims
        shape.pop()
    n = int(np.prod(shape))
    return np.reshape(data[:n], shape)
