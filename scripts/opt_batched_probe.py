#!/usr/bin/env python3
"""Isolated per-kernel timing for the batched decode step (chained fori_loop).

Times, at B slots / bf16 / fixed pos (half- or full-prefix variant):
  A. batched decoder kernel alone
  B. batched LT sampler alone
  C. fused frame kernel
  D. split composition (LT kernel + XLA glue + decoder kernel) — the old body
State chains through iterations so the tunnel cannot memoize.
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from magpie_tts_tpu.config import MagpieConfig
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.models import magpie as magpie_mod
from magpie_tts_tpu.ops import sampling

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
POS_OFF = int(sys.argv[2]) if len(sys.argv) > 2 else 40   # 40=half, 340=full
ITERS = 100
DTYPE = jnp.bfloat16


def timed_loop(label, run, init, n=3):
    out = run(init)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best / ITERS * 1e6:9.1f} us/iter")


def main():
    c = MagpieConfig()
    w = random_magpie_weights(c, seed=0).astype(DTYPE)
    w = jax.device_put(w)
    rng = np.random.default_rng(0)
    E = 64
    S, D = c.max_seq, c.d_model
    L = c.dec_layers

    xa_k = jnp.asarray(rng.normal(0, 0.3, size=(B, L, E, c.d_xa)),
                       DTYPE)
    xa_v = jnp.asarray(rng.normal(0, 0.3, size=(B, L, E, c.d_xa)), DTYPE)
    k_cache = jnp.asarray(rng.normal(0, 0.3, size=(B, L, S, D)), DTYPE)
    v_cache = jnp.asarray(rng.normal(0, 0.3, size=(B, L, S, D)), DTYPE)
    hidden0 = jnp.asarray(rng.normal(0, 0.5, size=(B, D)), DTYPE)
    enc_lens = jnp.full((B,), 50, jnp.int32)
    pos = jnp.int32(c.context_frames + POS_OFF)
    valid = (jnp.arange(S)[None, :] <= pos) & jnp.ones((B, 1), bool)
    posemb = jnp.broadcast_to(w.decoder.pos_emb[pos][None, :].astype(DTYPE),
                              (B, D))
    temp = jnp.float32(0.7)
    forbid = jnp.zeros((B,), bool)
    maycont = jnp.ones((B,), bool)
    static_mask = sampling.forbidden_token_mask(
        c.vocab_per_cb, c.audio_bos_id, c.audio_eos_id)

    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)
    from magpie_tts_tpu.ops.pallas_kernels.frame_step_batched import (
        frame_step_batched_pallas)
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)

    # A: decoder kernel alone
    @jax.jit
    def run_dec(init):
        def body(i, carry):
            h, kc, vc = carry
            h2, kc, vc = decode_step_batched_pallas(
                h, pos, valid, xa_k, xa_v, kc, vc, w, c, enc_lens)
            return (h2.astype(DTYPE), kc, vc)
        return jax.lax.fori_loop(0, ITERS, body, init)

    timed_loop(f"A decoder kernel (B={B}, pos_off={POS_OFF})", run_dec,
               (hidden0, k_cache, v_cache))

    # B: LT sampler alone
    @jax.jit
    def run_lt(init):
        def body(i, h):
            seeds = jnp.full((B,), i, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
            s, a = sample_frame_codes_batched_pallas(
                h, w, c, seeds, temp, 80, forbid)
            return h + (s.astype(DTYPE) @ jnp.zeros((8, D), DTYPE)) * 0
        return jax.lax.fori_loop(0, ITERS, body, init)

    timed_loop("B LT sampler kernel", run_lt, hidden0)

    # C: fused frame kernel
    @jax.jit
    def run_fused(init):
        def body(i, carry):
            h, kc, vc = carry
            seeds = jnp.full((B,), i, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
            s, a, h2, kc, vc = frame_step_batched_pallas(
                h, pos, valid, maycont, posemb, xa_k, xa_v, kc, vc, w, c,
                enc_lens, seeds, temp, 80, forbid)
            return (h2.astype(DTYPE), kc, vc)
        return jax.lax.fori_loop(0, ITERS, body, init)

    timed_loop("C fused frame kernel", run_fused,
               (hidden0, k_cache, v_cache))

    # D: split composition with XLA glue (old loop body)
    @jax.jit
    def run_split(init):
        def body(i, carry):
            h, kc, vc = carry
            seeds = jnp.full((B,), i, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
            s, a = sample_frame_codes_batched_pallas(
                h, w, c, seeds, temp, 80, forbid)
            emb = magpie_mod.audio_frame_embedding(s, w, c).astype(DTYPE)
            x_pe = emb + w.decoder.pos_emb[pos][None, :].astype(DTYPE)
            h2, kc, vc = decode_step_batched_pallas(
                x_pe, pos, valid, xa_k, xa_v, kc, vc, w, c, enc_lens)
            return (h2.astype(DTYPE), kc, vc)
        return jax.lax.fori_loop(0, ITERS, body, init)

    timed_loop("D split kernels + glue", run_split,
               (hidden0, k_cache, v_cache))


if __name__ == "__main__":
    main()
