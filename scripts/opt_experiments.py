#!/usr/bin/env python3
"""Optimization experiments: LT unroll, codec conv-transpose overlap-add,
resblock conv strategies. Measures candidate implementations side by side."""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from magpie_tts_tpu.config import CodecConfig, MagpieConfig
from magpie_tts_tpu.io.codec_weights import random_codec_weights
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.models import codec as codec_mod
from magpie_tts_tpu.models import local_transformer as lt_mod
from magpie_tts_tpu.ops import sampling
from magpie_tts_tpu.ops.attention import mha_full
from magpie_tts_tpu.ops.conv_ffn import conv_ffn
from magpie_tts_tpu.ops.norms import layer_norm

DTYPE = jnp.bfloat16


def timed(label, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt * 1e3:8.3f} ms")
    return out


# ---------------- LT variants ----------------

def lt_unrolled(hidden, weights, config, key, temperature, top_k, forbid_eos,
                static_mask):
    """Static unroll over the 8 codebooks: all weight indexing is static."""
    lt = weights.lt
    n_cb = config.num_codebooks
    proj0 = (hidden @ lt.in_proj_w + lt.in_proj_b).astype(hidden.dtype)
    seq_buf = jnp.zeros((9, config.lt_dim), dtype=hidden.dtype)
    seq_buf = seq_buf.at[0].set(proj0)
    sampled = []
    argmaxed = []
    for cb in range(n_cb):
        x = seq_buf + lt.pos_emb[:9]
        h = layer_norm(x, lt.norm_self, config.eps)
        x = x + mha_full(h, lt.qkv, lt.sa_out, config.lt_heads, causal=True)
        h = layer_norm(x, lt.norm_ff, config.eps)
        x = x + conv_ffn(h, lt.ff_proj, lt.ff_out)
        hid = x[cb]
        logits = (hid @ lt.out_proj_w[cb] + lt.out_proj_b[cb]).astype(jnp.float32)
        logits = sampling.mask_logits(logits, static_mask, forbid_eos,
                                      config.audio_eos_id)
        key, sub = jax.random.split(key)
        code, amax = sampling.sample_top_k(sub, logits, temperature, top_k)
        sampled.append(code)
        argmaxed.append(amax)
        if cb < n_cb - 1:
            emb = weights.audio_emb[cb, code]
            proj = (emb @ lt.in_proj_w + lt.in_proj_b).astype(seq_buf.dtype)
            seq_buf = seq_buf.at[cb + 1].set(proj)
    return jnp.stack(sampled), jnp.stack(argmaxed)


def main():
    config = MagpieConfig()
    weights = random_magpie_weights(config, seed=0).astype(DTYPE)
    static_mask = sampling.forbidden_token_mask(
        config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)
    hidden = jnp.zeros((config.d_model,), DTYPE)
    key = jax.random.PRNGKey(0)

    lt_orig = jax.jit(lambda w, h, k: lt_mod.sample_frame_codes(
        h, w, config, k, jnp.float32(0.7), 80, jnp.bool_(False), static_mask))
    lt_new = jax.jit(lambda w, h, k: lt_unrolled(
        h, w, config, k, jnp.float32(0.7), 80, jnp.bool_(False), static_mask))

    timed("LT fori_loop (current)", lt_orig, weights, hidden, key)
    timed("LT unrolled", lt_new, weights, hidden, key)

    # parity check greedy
    a = jax.jit(lambda w, h, k: lt_mod.sample_frame_codes(
        h, w, config, k, jnp.float32(0.0), 80, jnp.bool_(False), static_mask))(
        weights, hidden, key)
    b = jax.jit(lambda w, h, k: lt_unrolled(
        h, w, config, k, jnp.float32(0.0), 80, jnp.bool_(False), static_mask))(
        weights, hidden, key)
    print("greedy parity:", np.array_equal(np.asarray(a[0]), np.asarray(b[0])))

    # top_k cost probe
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2024,)).astype(np.float32))
    timed("lax.top_k(2024, 80)", jax.jit(lambda l: jax.lax.top_k(l, 80)), logits)
    timed("argmax(2024)", jax.jit(lambda l: jnp.argmax(l)), logits)

    # ---------------- codec conv-transpose variants ----------------
    ccfg = CodecConfig()
    T = 64
    in_ch, out_ch, K, s = 864, 432, 16, 8
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, T, in_ch)).astype(np.float32)).astype(DTYPE)
    w_pt = jnp.asarray(np.random.default_rng(2).normal(size=(in_ch, K)).astype(np.float32)).astype(DTYPE)
    b = jnp.zeros((out_ch,), DTYPE)

    f_conv = jax.jit(lambda x, w, b: codec_mod.grouped_conv_transpose1d(x, w, b, s))

    def overlap_add(x, w_pt, b, stride):
        # z[n, t, k, g] = x[n,t,2g]*w[2g,k] + x[n,t,2g+1]*w[2g+1,k]
        n, T, in_ch = x.shape
        out_ch = in_ch // 2
        k = w_pt.shape[1]
        xp = x.reshape(n, T, out_ch, 2)
        wp = w_pt.reshape(out_ch, 2, k)
        z = jnp.einsum("ntgj,gjk->ntkg", xp, wp,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        # overlap-add: k = stride*j + r with j in {0, 1}; out[(t+j)*s + r] += z[t, s*j+r]
        z = z.reshape(n, T, 2, stride, out_ch)
        part0 = z[:, :, 0]                       # lands at (t)*s + r
        part1 = z[:, :, 1]                       # lands at (t+1)*s + r
        part1 = jnp.pad(part1, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :T]
        out = part0 + part1                      # [n, T, s, out_ch]
        out = out.reshape(n, T * stride, out_ch)
        return (out + b).astype(x.dtype)

    f_oa = jax.jit(lambda x, w, b: overlap_add(x, w, b, s))

    a1 = timed("grouped convT (feature_group_count)", f_conv, x, w_pt, b)
    a2 = timed("grouped convT (overlap-add)", f_oa, x, w_pt, b)
    print("convT parity:", float(jnp.max(jnp.abs(a1.astype(jnp.float32) - a2.astype(jnp.float32)))))

    # ---------------- full codec breakdown ----------------
    cweights = random_codec_weights(ccfg, seed=1).astype(DTYPE)
    latent = jnp.asarray(np.random.default_rng(3).normal(size=(1, T, 32)).astype(np.float32)).astype(DTYPE)

    x0 = codec_mod.causal_conv1d(latent, cweights.pre_conv_w, cweights.pre_conv_b)
    f_pre = jax.jit(lambda l, w: codec_mod.causal_conv1d(l, w.pre_conv_w, w.pre_conv_b))
    timed("codec pre_conv", f_pre, latent, cweights)

    cur = x0
    for i, (stage, stride) in enumerate(zip(cweights.stages, ccfg.up_sample_rates)):
        st = stage

        def up_fn(x, st=st, stride=stride):
            h = codec_mod.half_snake(x, st.act_alpha, ccfg.leaky_slope)
            return codec_mod.grouped_conv_transpose1d(h, st.convt_w, st.convt_b, stride)

        def res_fn(x, st=st):
            return codec_mod.res_layer(x, st.resblocks, ccfg.resblock_dilations,
                                       ccfg.leaky_slope)

        up_out = timed(f"stage{i} upsample (T={cur.shape[1]})", jax.jit(up_fn), cur)
        res_out = timed(f"stage{i} res_layer (T={up_out.shape[1]})", jax.jit(res_fn), up_out, n=10)
        cur = res_out


if __name__ == "__main__":
    main()
