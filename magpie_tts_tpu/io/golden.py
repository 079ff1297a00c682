"""Golden-tensor .bin format: interchange with the reference test suite.

Format per the reference dumper (scripts/dump_reference.py:21-42, loader
tests/test_full_encoder_v2.cpp:7-19): header of 4 int64 dims in GGML order
(innermost/fastest first, unused dims = 1), then float32 payload in column-major
("Fortran") order. Token dumps are stored as float32 too
(tests/test_e2e_inference.cpp:12-38).
"""

from __future__ import annotations

import numpy as np


def write_golden(path: str, array: np.ndarray) -> None:
    array = np.asarray(array, dtype=np.float32)
    if array.ndim > 4:
        raise ValueError("golden format supports at most 4 dims")
    dims = list(reversed(array.shape)) + [1] * (4 - array.ndim)
    with open(path, "wb") as f:
        np.asarray(dims, np.int64).tofile(f)
        array.reshape(-1, order="F").astype(np.float32).tofile(f)


def read_golden(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        dims = np.fromfile(f, dtype=np.int64, count=4)
        data = np.fromfile(f, dtype=np.float32)
    # dims are in GGML ne order (innermost first); drop the padded trailing 1s
    ne = [int(d) for d in dims]
    while len(ne) > 1 and ne[-1] == 1:
        ne.pop()
    shape = tuple(reversed(ne))
    n = int(np.prod(shape))
    return np.reshape(data[:n], shape, order="F")
