"""Native C++ GGUF reader vs the pure-Python reader (same files, same results)."""

import numpy as np
import pytest

from magpie_tts_tpu.io import gguf as pygguf
from magpie_tts_tpu.io import native
from tests import fixtures

pytestmark = pytest.mark.skipif(native._load_library() is None,
                                reason="native library not built (make -C native)")


@pytest.fixture(scope="module")
def gguf_pair(tmp_path_factory, rng=None):
    tmp = tmp_path_factory.mktemp("native")
    path = str(tmp / "m.gguf")
    fixtures.write_tiny_magpie_gguf(path, quant="q8_0")
    return path


def test_native_matches_python(gguf_pair):
    py = pygguf.GGUFReader(gguf_pair)
    nat = native.NativeGGUFReader(gguf_pair)

    assert set(nat.tensors) == set(py.tensors)
    for key, val in py.metadata.items():
        assert key in nat.metadata
        if isinstance(val, float):
            assert abs(nat.metadata[key] - val) < 1e-6
        else:
            assert nat.metadata[key] == val, key

    for name, info in py.tensors.items():
        assert nat.tensors[name].shape == info.shape, name
        a = py.tensor(name)
        b = nat.tensor(name)
        assert a.dtype == b.dtype, name
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_open_gguf_prefers_native(gguf_pair):
    reader = native.open_gguf(gguf_pair)
    assert isinstance(reader, native.NativeGGUFReader)


def test_native_f16_q4(tmp_path, rng):
    path = str(tmp_path / "t.gguf")
    w = pygguf.GGUFWriter()
    t16 = rng.normal(size=(8, 64)).astype(np.float32)
    t4 = rng.normal(size=(4, 64)).astype(np.float32)
    ti = rng.integers(0, 100, size=(6,)).astype(np.int32)
    w.add_tensor("h", t16, pygguf.GGML_F16)
    w.add_tensor("q", t4, pygguf.GGML_Q4_0)
    w.add_tensor("i", ti)
    w.write(path)
    py = pygguf.GGUFReader(path)
    nat = native.NativeGGUFReader(path)
    for name in ("h", "q", "i"):
        np.testing.assert_array_equal(py.tensor(name), nat.tensor(name),
                                      err_msg=name)
