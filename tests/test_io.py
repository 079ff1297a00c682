"""GGUF reader/writer + quantization round-trip tests."""

import numpy as np
import pytest

from magpie_tts_tpu.io import gguf, quant


def test_q8_0_roundtrip(rng):
    data = rng.normal(0, 2.0, size=(8, 64)).astype(np.float32)
    payload = np.frombuffer(quant.quantize_q8_0(data), dtype=np.uint8)
    out = quant.dequantize_q8_0(payload, data.size).reshape(data.shape)
    # Q8_0: 8-bit signed, per-32-block absmax scale -> relative error < ~1/127 per block
    block_amax = np.abs(data.reshape(-1, 32)).max(axis=1)
    err = np.abs(out - data).reshape(-1, 32).max(axis=1)
    assert np.all(err <= block_amax / 127.0 + 1e-6)


def test_q8_0_block_layout(rng):
    """Byte layout must match the reference converter: f16 scale + 32 int8."""
    data = np.arange(32, dtype=np.float32) - 16.0
    raw = quant.quantize_q8_0(data)
    assert len(raw) == 34
    scale = np.frombuffer(raw[:2], dtype=np.float16)[0]
    np.testing.assert_allclose(float(scale), 16.0 / 127.0, rtol=1e-3)
    quants = np.frombuffer(raw[2:], dtype=np.int8)
    np.testing.assert_allclose(quants * float(scale), data, atol=float(scale) * 0.5 + 1e-6)


def test_q4_0_roundtrip(rng):
    data = rng.normal(0, 1.0, size=(4, 64)).astype(np.float32)
    payload = np.frombuffer(quant.quantize_q4_0(data), dtype=np.uint8)
    out = quant.dequantize_q4_0(payload, data.size).reshape(data.shape)
    block_amax = np.abs(data.reshape(-1, 32)).max(axis=1)
    err = np.abs(out - data).reshape(-1, 32).max(axis=1)
    assert np.all(err <= block_amax / 7.0 + 1e-6)


def test_gguf_roundtrip(tmp_path, rng):
    path = str(tmp_path / "test.gguf")
    w = gguf.GGUFWriter()
    w.add_metadata("general.architecture", "magpie")
    w.add_metadata("magpie.d_model", 768)
    w.add_metadata("magpie.eps", 1e-5)
    w.add_metadata("magpie.tokenizer.vocab", "a\nb\nc")

    t_f32 = rng.normal(size=(17, 64)).astype(np.float32)
    t_f16 = rng.normal(size=(8, 32)).astype(np.float32)
    t_i32 = rng.integers(0, 100, size=(5,)).astype(np.int32)
    t_q8 = rng.normal(size=(64, 96)).astype(np.float32)
    w.add_tensor("plain.f32", t_f32)
    w.add_tensor("half.f16", t_f16, gguf.GGML_F16)
    w.add_tensor("ints.i32", t_i32)
    w.add_tensor("quant.q8", t_q8, gguf.GGML_Q8_0)
    w.write(path)

    r = gguf.GGUFReader(path)
    assert r.metadata["magpie.d_model"] == 768
    assert abs(r.metadata["magpie.eps"] - 1e-5) < 1e-12
    assert r.metadata["magpie.tokenizer.vocab"] == "a\nb\nc"
    np.testing.assert_array_equal(r.tensor("plain.f32"), t_f32)
    np.testing.assert_allclose(r.tensor("half.f16"), t_f16, atol=1e-2)
    np.testing.assert_array_equal(r.tensor("ints.i32"), t_i32)
    q8 = r.tensor("quant.q8")
    assert q8.shape == t_q8.shape
    assert np.max(np.abs(q8 - t_q8)) < np.abs(t_q8).max() / 64


def test_gguf_shape_order(tmp_path, rng):
    """GGUF stores dims reversed; reader must restore numpy order."""
    path = str(tmp_path / "s.gguf")
    w = gguf.GGUFWriter()
    t = rng.normal(size=(3, 5, 7)).astype(np.float32)
    w.add_tensor("t", t)
    w.write(path)
    r = gguf.GGUFReader(path)
    assert r.tensors["t"].shape == (3, 5, 7)
    np.testing.assert_array_equal(r.tensor("t"), t)


def test_q8_native_load_materializes_bitexact(tmp_path):
    """Full-native Q8 serving (--serve-q8): loading with q8_native=True keeps
    every allowlisted tensor as its raw Q8_0 blocks (Q8Blocks) and
    materialize_weights dequantizes them BIT-IDENTICAL to the ordinary
    dequantize-at-load path — for every field, in f32 and after a bf16 cast
    (the dequant->cast ordering matches the dense load->astype path)."""
    import jax
    import jax.numpy as jnp

    from magpie_tts_tpu.io.magpie_weights import (Q8Blocks, has_q8_blocks,
                                                  load_magpie_weights,
                                                  materialize_weights)
    from tests import fixtures

    path = str(tmp_path / "m_q8.gguf")
    fixtures.write_tiny_magpie_gguf(path, quant="q8_0")
    _, dense = load_magpie_weights(path)
    config, blocks = load_magpie_weights(path, q8_native=True)
    assert has_q8_blocks(blocks)
    # Every allowlisted matmul tensor is block-stored (no dense copy).
    for node in (blocks.encoder.qkv, blocks.encoder.ff_proj,
                 blocks.decoder.qkv, blocks.decoder.ff_out,
                 blocks.decoder.xa_kv, blocks.lt.in_proj_w,
                 blocks.lt.out_proj_w, blocks.final_proj_w):
        assert isinstance(node, Q8Blocks)

    flat_d = jax.tree_util.tree_leaves_with_path(dense)
    mat = materialize_weights(blocks)
    flat_m = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(mat)}
    assert set(flat_m) == {jax.tree_util.keystr(k) for k, _ in flat_d}
    for k, v in flat_d:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_m[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))

    # bf16 engine cast: astype skips blocks; materialize matches dense astype.
    mat16 = materialize_weights(blocks.astype(jnp.bfloat16))
    d16 = dense.astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(mat16.decoder.qkv),
                                  np.asarray(d16.decoder.qkv))
    np.testing.assert_array_equal(np.asarray(mat16.encoder.ff_proj),
                                  np.asarray(d16.encoder.ff_proj))

    # A dense (f32) checkpoint with q8_native=True simply loads dense.
    path32 = str(tmp_path / "m_f32.gguf")
    fixtures.write_tiny_magpie_gguf(path32)
    _, w32 = load_magpie_weights(path32, q8_native=True)
    assert not has_q8_blocks(w32)
