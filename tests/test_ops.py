"""Per-op parity vs torch at production sizes (golden-tensor discipline, tier 2)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from magpie_tts_tpu.ops.attention import (cross_attention, mha_cached_step,
                                          mha_full, precompute_cross_attention_kv)
from magpie_tts_tpu.ops.conv_ffn import conv_ffn
from magpie_tts_tpu.ops.norms import layer_norm
from magpie_tts_tpu.ops import sampling
from tests.oracle import ref_magpie

import jax


def test_layer_norm_vs_torch(rng):
    x = rng.normal(size=(17, 768)).astype(np.float32)
    w = rng.normal(1.0, 0.1, size=(768,)).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    theirs = F.layer_norm(torch.from_numpy(x), (768,),
                          weight=torch.from_numpy(w), bias=None, eps=1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_mha_causal_vs_oracle(rng):
    seq, d, heads = 21, 768, 12
    x = rng.normal(0, 0.5, size=(seq, d)).astype(np.float32)
    qkv_w = rng.normal(0, 0.02, size=(d, 3 * d)).astype(np.float32)
    out_w = rng.normal(0, 0.02, size=(d, d)).astype(np.float32)
    ours = np.asarray(mha_full(jnp.asarray(x), jnp.asarray(qkv_w), jnp.asarray(out_w),
                               heads, causal=True))
    theirs = ref_magpie.mha(torch.from_numpy(x),
                            torch.from_numpy(qkv_w.T.copy()),
                            torch.from_numpy(out_w.T.copy()),
                            heads, causal=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_conv_ffn_k3_vs_torch(rng):
    """Encoder conv-FFN (kernel 3) against real F.conv1d with causal padding."""
    seq, d, ffn, k = 13, 768, 3072, 3
    x = rng.normal(0, 0.5, size=(seq, d)).astype(np.float32)
    proj = rng.normal(0, 0.02, size=(k, d, ffn)).astype(np.float32)
    outw = rng.normal(0, 0.02, size=(k, ffn, d)).astype(np.float32)
    ours = np.asarray(conv_ffn(jnp.asarray(x), jnp.asarray(proj), jnp.asarray(outw)))
    proj_t = torch.from_numpy(np.transpose(proj, (2, 1, 0)).copy())
    outw_t = torch.from_numpy(np.transpose(outw, (2, 1, 0)).copy())
    theirs = ref_magpie.conv_ffn(torch.from_numpy(x), proj_t, outw_t).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_conv_ffn_causality(rng):
    """Future positions must not influence earlier outputs (prefix exactness)."""
    d, ffn, k = 64, 128, 3
    proj = jnp.asarray(rng.normal(0, 0.05, size=(k, d, ffn)).astype(np.float32))
    outw = jnp.asarray(rng.normal(0, 0.05, size=(k, ffn, d)).astype(np.float32))
    x = rng.normal(size=(10, d)).astype(np.float32)
    full = np.asarray(conv_ffn(jnp.asarray(x), proj, outw))
    x2 = x.copy()
    x2[7:] = 99.0
    pert = np.asarray(conv_ffn(jnp.asarray(x2), proj, outw))
    np.testing.assert_allclose(full[:7], pert[:7], atol=1e-5)


def test_cross_attention_vs_oracle(rng):
    d, d_xa, enc_seq, q_len = 768, 128, 14, 3
    q = rng.normal(0, 0.5, size=(q_len, d)).astype(np.float32)
    mem = rng.normal(0, 0.5, size=(enc_seq, d)).astype(np.float32)
    q_w = rng.normal(0, 0.02, size=(d, d_xa)).astype(np.float32)
    kv_w = rng.normal(0, 0.02, size=(d, 2 * d_xa)).astype(np.float32)
    out_w = rng.normal(0, 0.02, size=(d_xa, d)).astype(np.float32)

    k, v = precompute_cross_attention_kv(jnp.asarray(mem), jnp.asarray(kv_w))
    ours = np.asarray(cross_attention(jnp.asarray(q), k, v, jnp.asarray(q_w),
                                      jnp.asarray(out_w), 1))
    theirs = ref_magpie.cross_attention(
        torch.from_numpy(q), torch.from_numpy(mem),
        torch.from_numpy(q_w.T.copy()), torch.from_numpy(kv_w.T.copy()),
        torch.from_numpy(out_w.T.copy()), 1, d_xa).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_cross_attention_enc_length_masks_padding(rng):
    """Bucketed mode: padded encoder keys must not change the result."""
    d, d_xa = 64, 32
    q = jnp.asarray(rng.normal(size=(2, d)).astype(np.float32))
    q_w = jnp.asarray(rng.normal(0, 0.05, size=(d, d_xa)).astype(np.float32))
    out_w = jnp.asarray(rng.normal(0, 0.05, size=(d_xa, d)).astype(np.float32))
    k = rng.normal(size=(10, d_xa)).astype(np.float32)
    v = rng.normal(size=(10, d_xa)).astype(np.float32)
    k_pad, v_pad = k.copy(), v.copy()
    k_pad[6:], v_pad[6:] = 123.0, -55.0
    out_a = np.asarray(cross_attention(q, jnp.asarray(k[:6]), jnp.asarray(v[:6]),
                                       q_w, out_w, 1))
    out_b = np.asarray(cross_attention(q, jnp.asarray(k_pad), jnp.asarray(v_pad),
                                       q_w, out_w, 1, enc_length=jnp.int32(6)))
    np.testing.assert_allclose(out_a, out_b, atol=1e-5)


def test_cached_step_matches_full(rng):
    """Step-by-step cached attention == full causal attention, row by row."""
    seq, d, heads, max_seq = 9, 64, 4, 16
    x = rng.normal(0, 0.5, size=(seq, d)).astype(np.float32)
    qkv_w = jnp.asarray(rng.normal(0, 0.05, size=(d, 3 * d)).astype(np.float32))
    out_w = jnp.asarray(rng.normal(0, 0.05, size=(d, d)).astype(np.float32))

    full = np.asarray(mha_full(jnp.asarray(x), qkv_w, out_w, heads, causal=True))

    k_cache = jnp.zeros((max_seq, d))
    v_cache = jnp.zeros((max_seq, d))
    for t in range(seq):
        out, k_cache, v_cache = mha_cached_step(
            jnp.asarray(x[t]), qkv_w, out_w, k_cache, v_cache, jnp.int32(t), heads)
        np.testing.assert_allclose(np.asarray(out), full[t], atol=1e-4)


def test_sampling_greedy_and_masks():
    vocab = 40
    static = sampling.forbidden_token_mask(vocab, audio_bos_id=32, audio_eos_id=33)
    logits = jnp.zeros((vocab,))
    logits = logits.at[32].set(10.0).at[33].set(9.0).at[5].set(8.0)
    masked = sampling.mask_logits(logits, static, jnp.bool_(False), 33)
    key = jax.random.PRNGKey(0)
    sampled, argmax = sampling.sample_top_k(key, masked, jnp.float32(0.0), 8)
    assert int(argmax) == 33  # BOS masked; EOS allowed
    assert int(sampled) == 33
    masked2 = sampling.mask_logits(logits, static, jnp.bool_(True), 33)
    sampled2, argmax2 = sampling.sample_top_k(key, masked2, jnp.float32(0.0), 8)
    assert int(argmax2) == 5  # EOS also masked


def test_sampling_topk_respects_k():
    vocab = 100
    logits = jnp.asarray(np.linspace(0, 10, vocab).astype(np.float32))
    key = jax.random.PRNGKey(1)
    draws = set()
    for i in range(64):
        s, _ = sampling.sample_top_k(jax.random.fold_in(key, i), logits,
                                     jnp.float32(5.0), 5)
        draws.add(int(s))
    assert draws <= {95, 96, 97, 98, 99}
    assert len(draws) > 1  # actually stochastic
