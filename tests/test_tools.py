"""Offline tooling tests: nemo->GGUF converters, golden format, inspection."""

import io
import subprocess
import sys
import tarfile

import numpy as np
import pytest
import torch

from magpie_tts_tpu.io import gguf
from magpie_tts_tpu.io.golden import read_golden, write_golden


def _write_fake_nemo(path, tensors: dict, config_yaml: str = "model: {}\n"):
    """Build a .nemo-style tar (model_config.yaml + model_weights.ckpt)."""
    buf = io.BytesIO()
    torch.save({k: torch.from_numpy(v) for k, v in tensors.items()}, buf)
    ckpt = buf.getvalue()
    with tarfile.open(path, "w") as tar:
        def add(name, data):
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tar.addfile(ti, io.BytesIO(data))
        add("./model_config.yaml", config_yaml.encode())
        add("./model_weights.ckpt", ckpt)


def test_magpie_converter_roundtrip(tmp_path, rng):
    from tools.convert_nemo_to_gguf import convert

    tensors = {
        "text_embedding.weight": rng.normal(size=(10, 8)).astype(np.float32),
        "encoder.layers.0.self_attention.qkv_net.weight":
            rng.normal(size=(96, 32)).astype(np.float32),
        "encoder.layers.0.norm_self.weight": rng.normal(size=(32,)).astype(np.float32),
        "magpie_codec_model.some.weight": rng.normal(size=(4, 4)).astype(np.float32),
        "final_proj.bias": rng.normal(size=(16,)).astype(np.float32),
    }
    nemo = str(tmp_path / "m.nemo")
    out = str(tmp_path / "m.gguf")
    _write_fake_nemo(nemo, tensors)
    convert(nemo, out, quant="q8_0")

    r = gguf.GGUFReader(out)
    assert "magpie_codec_model.some.weight" not in r.tensors  # skipped
    assert r.metadata["magpie.d_model"] == 768
    np.testing.assert_array_equal(r.tensor("text_embedding.weight"),
                                  tensors["text_embedding.weight"])
    # qkv matches quant gating -> Q8_0
    info = r.tensors["encoder.layers.0.self_attention.qkv_net.weight"]
    assert info.ggml_type == gguf.GGML_Q8_0
    deq = r.tensor("encoder.layers.0.self_attention.qkv_net.weight")
    orig = tensors["encoder.layers.0.self_attention.qkv_net.weight"]
    assert np.abs(deq - orig).max() < np.abs(orig).max() / 64
    # norms / biases stay f32
    assert r.tensors["final_proj.bias"].ggml_type == gguf.GGML_F32


def test_codec_converter_weight_norm_folding(tmp_path, rng):
    from tools.convert_codec_to_gguf import convert

    v = rng.normal(size=(6, 4, 3)).astype(np.float32)
    g = rng.uniform(0.5, 2.0, size=(6, 1, 1)).astype(np.float32)
    tensors = {
        "audio_decoder.pre_conv.conv.parametrizations.weight.original0": g,
        "audio_decoder.pre_conv.conv.parametrizations.weight.original1": v,
        "audio_decoder.pre_conv.conv.bias": rng.normal(size=(6,)).astype(np.float32),
        "vector_quantizer.fsqs.0.dim_base_index":
            np.array([1, 8, 56, 336], np.float32).reshape(1, 4, 1),
        "discriminator.should_be_dropped": rng.normal(size=(3,)).astype(np.float32),
    }
    nemo = str(tmp_path / "c.nemo")
    out = str(tmp_path / "c.gguf")
    _write_fake_nemo(nemo, tensors)
    convert(nemo, out)

    r = gguf.GGUFReader(out)
    assert "dec.pre.weight" in r.tensors
    assert "dec.pre.bias" in r.tensors
    assert "vq.fsqs.0.dim_base_index" in r.tensors
    assert not any("discriminator" in n for n in r.tensors)
    got = r.tensor("dec.pre.weight")
    expect = g * v / np.sqrt(np.sum(v ** 2, axis=(1, 2), keepdims=True) + 1e-12)
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_codec_converter_name_shortening():
    from tools.convert_codec_to_gguf import shorten_name

    long = ("audio_decoder.res_layers.0.res_blocks.1.res_blocks.2"
            ".input_activation.activation.snake_act.alpha")
    assert shorten_name(long) == "dec.rl.0.rb.1.rb.2.in_act.alpha"
    assert len(shorten_name(long)) <= 64
    assert shorten_name("audio_decoder.up_sample_conv_layers.3.conv.weight") == \
        "dec.up.3.c.weight"


@pytest.mark.parametrize("shape", [(7,), (3, 5), (2, 3, 4), (2, 3, 4, 5)])
def test_golden_roundtrip(tmp_path, rng, shape):
    arr = rng.normal(size=shape).astype(np.float32)
    path = str(tmp_path / "g.bin")
    write_golden(path, arr)
    back = read_golden(path)
    assert back.shape == arr.shape
    np.testing.assert_array_equal(back, arr)


def test_golden_layout_matches_reference_convention(tmp_path):
    """2-D [seq, d] array: header = (d, seq, 1, 1), payload column-major."""
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)  # seq=2, d=3
    path = str(tmp_path / "g.bin")
    write_golden(path, arr)
    raw = np.fromfile(path, dtype=np.int64, count=4)
    np.testing.assert_array_equal(raw, [3, 2, 1, 1])
    payload = np.fromfile(path, dtype=np.float32, offset=32)
    # Fortran order of [[0,1,2],[3,4,5]] is 0,3,1,4,2,5
    np.testing.assert_array_equal(payload, [0, 3, 1, 4, 2, 5])


def test_inspect_gguf_runs(tmp_path, rng):
    from tests import fixtures

    path = str(tmp_path / "m.gguf")
    fixtures.write_tiny_magpie_gguf(path)
    proc = subprocess.run([sys.executable, "tools/inspect_gguf.py", path],
                         capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0
    assert "text_embedding.weight" in proc.stdout
    assert "metadata" in proc.stdout
