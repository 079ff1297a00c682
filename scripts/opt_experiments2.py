#!/usr/bin/env python3
"""Amortized (in-loop) op timings: dispatch-free measurement via fori_loop."""

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

DTYPE = jnp.bfloat16


def timed_loop(label, body, init, iters=200, n=3):
    """body: carry -> carry, iterated `iters` times inside one jit."""
    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, iters, lambda i, c: body(c), init)

    out = run(init)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"{label:44s} {per * 1e6:9.1f} us/iter")
    return per


def main():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2024,)).astype(np.float32))

    # --- top-k strategies (keep a data dependency through the carry) ---
    def topk_body(c):
        l = logits + c
        vals, idx = jax.lax.top_k(l, 80)
        return c + vals[0] * 1e-9

    timed_loop("lax.top_k(2024, 80)", topk_body, jnp.float32(0.0))

    def approx_body(c):
        l = logits + c
        vals, idx = jax.lax.approx_max_k(l, 80)
        return c + vals[0] * 1e-9

    timed_loop("lax.approx_max_k(2024, 80)", approx_body, jnp.float32(0.0))

    def argmax_body(c):
        l = logits + c
        return c + jnp.max(l) * 1e-9 + jnp.argmax(l).astype(jnp.float32) * 0

    timed_loop("argmax(2024)", argmax_body, jnp.float32(0.0))

    def gumbel_body(c):
        # top-k-free sampling: Gumbel-max over thresholded logits
        l = logits + c
        key = jax.random.PRNGKey(1)
        g = jax.random.gumbel(key, l.shape)
        return c + jnp.argmax(l + g).astype(jnp.float32) * 1e-9

    timed_loop("gumbel argmax full-vocab", gumbel_body, jnp.float32(0.0))

    # --- LT full sample amortized ---
    config = MagpieConfig()
    weights = random_magpie_weights(config, seed=0).astype(DTYPE)
    static_mask = sampling.forbidden_token_mask(
        config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)

    def lt_body(c):
        hidden, key = c
        key, sub = jax.random.split(key)
        s, a = lt_mod.sample_frame_codes(hidden, weights, config, sub,
                                         jnp.float32(0.7), 80, jnp.bool_(False),
                                         static_mask)
        return hidden + s[0].astype(DTYPE) * 1e-9, key

    timed_loop("LT sample_frame_codes (fori inner)", lt_body,
               (jnp.zeros((config.d_model,), DTYPE), jax.random.PRNGKey(0)),
               iters=50)

    # --- decoder step amortized ---
    from magpie_tts_tpu.models import decoder as dec_mod

    enc_seq = 32
    xa_k = jnp.zeros((config.dec_layers, enc_seq, config.d_xa), DTYPE)
    xa_v = jnp.zeros_like(xa_k)
    k_cache = jnp.zeros((config.dec_layers, config.max_seq, config.d_model), DTYPE)
    v_cache = jnp.zeros_like(k_cache)

    def step_body(c):
        emb, kc, vc, pos = c
        hidden, kc, vc = dec_mod.decode_step(emb, pos, xa_k, xa_v, kc, vc,
                                             weights, config)
        return hidden * 1e-9, kc, vc, pos + 1

    timed_loop("decoder step (12L cached)", step_body,
               (jnp.zeros((config.d_model,), DTYPE), k_cache, v_cache,
                jnp.int32(110)), iters=50)

    # --- codec conv strategies, amortized at stage shapes ---
    ccfg = CodecConfig()
    for (C, T, k, dil) in [(432, 512, 3, 1), (432, 512, 11, 5),
                           (108, 16384, 3, 1), (27, 65536, 11, 5)]:
        x = jnp.asarray(rng.normal(size=(1, T, C)).astype(np.float32)).astype(DTYPE)
        w = jnp.asarray(rng.normal(0, 0.1, size=(k, C, C)).astype(np.float32)).astype(DTYPE)
        b = jnp.zeros((C,), DTYPE)

        def conv_body(c, x=x, w=w, b=b, dil=dil):
            return codec_mod.causal_conv1d(c, w, b, dil) * 0.5 + x * 0.5

        timed_loop(f"conv_general C={C} T={T} k={k} d={dil}", conv_body, x, iters=20)

        def shifted_body(c, x=x, w=w, b=b, dil=dil, k=k):
            seq = c.shape[1]
            pad = (k - 1) * dil
            xp = jnp.pad(c, ((0, 0), (pad, 0), (0, 0)))
            out = None
            for i in range(k):
                xi = jax.lax.dynamic_slice_in_dim(xp, i * dil, seq, axis=1)
                t = jnp.einsum("nsc,cd->nsd", xi, w[i],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
            return (out + b).astype(c.dtype) * 0.5 + x * 0.5

        timed_loop(f"shifted-matmul C={C} T={T} k={k} d={dil}", shifted_body, x, iters=20)

    # grouped convT amortized
    for (in_ch, K, s, T) in [(864, 16, 8, 64), (216, 8, 4, 4096), (54, 4, 2, 32768)]:
        out_ch = in_ch // 2
        x = jnp.asarray(rng.normal(size=(1, T, in_ch)).astype(np.float32)).astype(DTYPE)
        wt = jnp.asarray(rng.normal(size=(in_ch, K)).astype(np.float32)).astype(DTYPE)
        b = jnp.zeros((out_ch,), DTYPE)

        def gc_body(c, x=x, wt=wt, b=b, s=s):
            out = codec_mod.grouped_conv_transpose1d(c, wt, b, s)
            # reduce back to input shape to carry
            return x + out[:, :c.shape[1], :c.shape[2]] * 1e-9

        timed_loop(f"grouped convT fg in={in_ch} K={K} s={s} T={T}", gc_body, x, iters=20)

        def oa_body(c, x=x, wt=wt, b=b, s=s, K=K):
            n, T0, in_ch0 = c.shape
            out_ch0 = in_ch0 // 2
            xp = c.reshape(n, T0, out_ch0, 2)
            wp = wt.reshape(out_ch0, 2, K)
            z = jnp.einsum("ntgj,gjk->ntkg", xp, wp,
                           preferred_element_type=jnp.float32).astype(c.dtype)
            z = z.reshape(n, T0, K // s, s, out_ch0)
            out = z[:, :, 0]
            part1 = jnp.pad(z[:, :, 1], ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :T0]
            out = (out + part1).reshape(n, T0 * s, out_ch0) + b
            return x + out[:, :T0, :in_ch0 // 2].repeat(2, axis=-1) * 1e-9

        timed_loop(f"grouped convT oa in={in_ch} K={K} s={s} T={T}", oa_body, x, iters=20)


if __name__ == "__main__":
    main()
