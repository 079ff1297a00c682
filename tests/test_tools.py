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


def test_golden_bytes_match_reference_dumper(tmp_path):
    """write_golden is BYTE-IDENTICAL to the reference's dumper
    (scripts/dump_reference.py:21-42: shape padded to 4 dims, header = those
    dims int64-reversed, payload row-major float32) — so goldens dumped from
    a real NeMo checkpoint by either tool interchange freely."""
    import struct

    arr = np.arange(6, dtype=np.float32).reshape(2, 3)  # [seq=2, d=3]
    path = str(tmp_path / "g.bin")
    write_golden(path, arr)

    # Independent re-derivation of the reference writer's bytes.
    padded = [2, 3, 1, 1]
    expected = b"".join(struct.pack("<q", d) for d in reversed(padded))
    expected += arr.tobytes()
    with open(path, "rb") as f:
        assert f.read() == expected


def test_torch_hook_dumper(tmp_path):
    """dump_reference_nemo's capture machinery on a small torch module: the
    goldens on disk equal the module's actual intermediate outputs."""
    import torch

    from tools.dump_reference_nemo import (DEFAULT_PATTERNS, TensorCapture,
                                           dump_module_outputs, safe_name)

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(4, 4)

        def forward(self, x):
            # dict-style output (NeMo transformer layers do this)
            return {"output": torch.relu(self.lin(x))}

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = torch.nn.Linear(4, 4)
            self.layers = torch.nn.ModuleList([Block(), Block()])

        def forward(self, x):
            h = self.emb(x)
            for layer in self.layers:
                h = layer(h)["output"]
            return h

    torch.manual_seed(0)
    model = Model().eval()
    x = torch.randn(3, 4)

    out_dir = str(tmp_path / "goldens")
    patterns = ["emb", "layers.0", "layers.1"]
    written = dump_module_outputs(model, lambda m: m(x), patterns, out_dir,
                                  quiet=True)
    assert set(written) == set(patterns)

    # Ground truth recomputed without hooks.
    with torch.no_grad():
        h_emb = model.emb(x)
        h0 = model.layers[0](h_emb)["output"]
        h1 = model.layers[1](h0)["output"]
    for name, want in [("emb", h_emb), ("layers.0", h0), ("layers.1", h1)]:
        got = read_golden(f"{out_dir}/{safe_name(name)}.bin")
        np.testing.assert_allclose(got, want.numpy(), atol=1e-7)

    # Hooks are removed on close: a later forward must not record.
    cap = TensorCapture(model, patterns)
    cap.close()
    with torch.no_grad():
        model(x)
    assert cap.captures == {}
    assert len(DEFAULT_PATTERNS) > 20  # per-layer coverage of the 357M model


def test_inspect_gguf_runs(tmp_path, rng):
    from tests import fixtures

    path = str(tmp_path / "m.gguf")
    fixtures.write_tiny_magpie_gguf(path)
    proc = subprocess.run([sys.executable, "tools/inspect_gguf.py", path],
                         capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0
    assert "text_embedding.weight" in proc.stdout
    assert "metadata" in proc.stdout


# ---- per-layer golden tracing + verify_golden --------------------------------


@pytest.mark.slow
def test_trace_forward_consistency(rng):
    """Per-layer traces must agree with the production building blocks."""
    import jax.numpy as jnp

    from magpie_tts_tpu.io import trace_forward as tf
    from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
    from magpie_tts_tpu.models import local_transformer as lt_mod
    from magpie_tts_tpu.models.decoder import decode_full
    from magpie_tts_tpu.models.encoder import run_encoder
    from magpie_tts_tpu.models.magpie import audio_frame_embedding, speaker_context
    from magpie_tts_tpu.ops import sampling
    from tests.utils import tiny_magpie_config

    c = tiny_magpie_config()
    w = random_magpie_weights(c, seed=5)
    tokens = jnp.asarray(rng.integers(2, 90, size=7), jnp.int32)

    enc_trace = tf.trace_encoder(tokens, w, c)
    np.testing.assert_allclose(enc_trace["encoder_output"],
                               np.asarray(run_encoder(tokens, w, c)),
                               atol=1e-6)
    assert f"encoder_layer_{c.enc_layers - 1}" in enc_trace

    enc_out = jnp.asarray(enc_trace["encoder_output"])
    dec_trace = tf.trace_decoder(enc_out, w, c, speaker_id=0)
    ctx = speaker_context(w, jnp.int32(0))
    bos = jnp.full((c.num_codebooks,), c.audio_bos_id, jnp.int32)
    dec_in = jnp.concatenate(
        [ctx, audio_frame_embedding(bos, w, c)[None]], axis=0)
    want = np.asarray(decode_full(dec_in, enc_out, w, c))
    np.testing.assert_allclose(dec_trace["decoder_output"], want, atol=1e-5)
    assert f"decoder_layer_{c.dec_layers - 1}" in dec_trace

    hidden = jnp.asarray(dec_trace["decoder_output"][-1])
    lt_trace = tf.trace_local_transformer(hidden, w, c)
    static_mask = sampling.forbidden_token_mask(
        c.vocab_per_cb, c.audio_bos_id, c.audio_eos_id)
    import jax
    sampled, argmax = lt_mod.sample_frame_codes(
        hidden, w, c, jax.random.PRNGKey(0), jnp.float32(0.0), 8,
        jnp.bool_(False), static_mask)
    np.testing.assert_array_equal(lt_trace["lt_greedy_codes"].astype(np.int32),
                                  np.asarray(argmax))


@pytest.mark.slow
def test_trace_codec_consistency(rng):
    from magpie_tts_tpu.config import CodecConfig
    from magpie_tts_tpu.io import trace_forward as tf
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.models import codec as cm
    import jax.numpy as jnp

    c = CodecConfig()
    w = random_codec_weights(c, seed=2)
    codes = rng.integers(0, 2016, size=(c.num_codebooks, 6)).astype(np.int32)
    trace = tf.trace_codec(codes, w, c)
    want = np.asarray(cm.codec_decode(jnp.asarray(codes), w, c,
                                      use_pallas=False))
    np.testing.assert_allclose(trace["codec_audio"], want, atol=1e-6)
    assert trace["codec_latent"].shape[0] == c.latent_dim  # reference [C, T]
    for s in range(len(c.up_sample_rates)):
        assert f"codec_stage{s}" in trace


def test_verify_golden_cli(tmp_path, rng):
    """verify_golden passes on identical dirs, fails on perturbed/missing."""
    from tools import verify_golden

    a, b, c = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    for d in (a, b, c):
        d.mkdir()
    enc = rng.normal(size=(5, 8)).astype(np.float32)
    codes = rng.integers(0, 100, size=(3, 8)).astype(np.float32)
    write_golden(a / "encoder_layer_0.bin", enc)
    write_golden(a / "greedy_codes.bin", codes)
    write_golden(b / "encoder_layer_0.bin", enc + 1e-5)   # within 8e-3 bar
    write_golden(b / "greedy_codes.bin", codes)
    write_golden(c / "encoder_layer_0.bin", enc + 0.1)    # FAIL
    write_golden(c / "greedy_codes.bin", codes)

    def run_cli(ref, cand, *extra):
        old = sys.argv
        sys.argv = ["verify_golden.py", str(ref), str(cand), *extra]
        try:
            return verify_golden.main()
        finally:
            sys.argv = old

    assert run_cli(a, b) == 0
    assert run_cli(a, c) == 1
    (c / "greedy_codes.bin").unlink()
    assert run_cli(a, c) == 1                              # missing file
    assert run_cli(a, c, "--tol", "encoder=1.0") == 1      # still missing
    assert run_cli(a, b, "--tol", "encoder=1e-9") == 1     # tightened tol


def test_inspect_torch_model_call_tree():
    """inspect_torch_model on a plain torch module: the call tree lists every
    called module in first-call order with shapes, counts repeats, and flags
    never-called modules (architecture-discovery analog of the reference's
    inspect_inference.py / inspect_codec.py)."""
    import io

    import torch

    from tools.inspect_torch_model import inspect_model

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(4, 4)

        def forward(self, x):
            return {"output": torch.relu(self.lin(x))}

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = torch.nn.Linear(4, 4)
            self.shared = Block()
            self.dead = torch.nn.Linear(4, 4)   # never called

        def forward(self, x):
            h = self.emb(x)
            for _ in range(3):                  # autoregressive-style reuse
                h = self.shared(h)["output"]
            return h

    torch.manual_seed(0)
    model = Model().eval()
    buf = io.StringIO()
    insp = inspect_model(model, lambda m: m(torch.randn(2, 4)), stream=buf)
    text = buf.getvalue()

    # First-call order: root, emb, shared, shared.lin.
    assert insp.order == ["(root)", "emb", "shared", "shared.lin"]
    rec = insp.records["shared"]
    assert rec.n_calls == 3 and rec.cls == "Block"
    assert "x3" in text                         # repeat count rendered
    assert "float32[2, 4]" in text              # tensor signatures
    assert "{output=float32[2, 4]}" in text     # dict output signature
    assert insp.records["emb"].params == [("weight", [4, 4]), ("bias", [4])]
    # Dead module flagged, with its class.
    assert dict(insp.uncalled()) == {"dead": "Linear"}
    assert "dead [Linear]" in text
