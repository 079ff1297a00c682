#!/usr/bin/env python3
"""Breakdown profiling: prefill vs AR decode vs LT sampling vs codec on the TPU."""

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
from magpie_tts_tpu.models import decoder as dec_mod
from magpie_tts_tpu.models import local_transformer as lt_mod
from magpie_tts_tpu.models import magpie as magpie_mod
from magpie_tts_tpu.ops import sampling
from magpie_tts_tpu.runtime.engine import CodecEngine, MagpieEngine

DTYPE = jnp.bfloat16
N = 200


def timed(label, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:32s} {dt * 1e3:8.3f} ms")
    return out, dt


def main():
    config = dataclasses.replace(MagpieConfig(), max_dec_steps=N,
                                 min_generated_frames=N)
    weights = random_magpie_weights(config, seed=0).astype(DTYPE)
    static_mask = sampling.forbidden_token_mask(
        config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)

    enc_seq = 32
    xa_k = jnp.zeros((config.dec_layers, enc_seq, config.d_xa), DTYPE)
    xa_v = jnp.zeros_like(xa_k)
    k_cache = jnp.zeros((config.dec_layers, config.max_seq, config.d_model), DTYPE)
    v_cache = jnp.zeros_like(k_cache)

    # decoder step alone
    @jax.jit
    def step(weights, emb, pos, xa_k, xa_v, k_cache, v_cache):
        return dec_mod.decode_step(emb, pos, xa_k, xa_v, k_cache, v_cache,
                                   weights, config)

    emb = jnp.zeros((config.d_model,), DTYPE)
    (hidden, k_cache, v_cache), dt_step = timed(
        "decoder step (1 pos, 12L)", step, weights, emb, jnp.int32(120),
        xa_k, xa_v, k_cache, v_cache)

    # LT sampling alone
    @jax.jit
    def lt(weights, hidden, key):
        return lt_mod.sample_frame_codes(hidden, weights, config, key,
                                         jnp.float32(0.7), 80, jnp.bool_(False),
                                         static_mask)

    _, dt_lt = timed("LT sample (8 codebooks)", lt, weights, hidden,
                     jax.random.PRNGKey(0))

    # full prepare (encoder + XA + prefill + BOS)
    @jax.jit
    def prep(weights, tokens):
        return magpie_mod.prepare(tokens, jnp.int32(32), jnp.int32(0),
                                  weights, config)

    tokens = jnp.zeros((32,), jnp.int32)
    _, dt_prep = timed("prepare (enc+prefill+BOS)", prep, weights, tokens, n=5)

    # full synth
    engine = MagpieEngine(weights, config, compute_dtype=DTYPE)
    r = engine.synthesize_codes(list(range(32)), temperature=0.7)
    t0 = time.perf_counter()
    r = engine.synthesize_codes(list(range(32)), temperature=0.7)
    dt_all = time.perf_counter() - t0
    print(f"{'full synth':32s} {dt_all * 1e3:8.1f} ms for {r.n_frames} frames "
          f"-> {r.n_frames / dt_all:.0f} fps")
    per_frame = dt_all / r.n_frames
    print(f"  per-frame {per_frame * 1e3:.3f} ms vs step+lt {(dt_step + dt_lt) * 1e3:.3f} ms")

    # codec
    codec_config = CodecConfig()
    codec = CodecEngine(random_codec_weights(codec_config, seed=1), codec_config,
                        compute_dtype=DTYPE)
    _ = codec.decode(r.codes)
    t0 = time.perf_counter()
    _ = codec.decode(r.codes)
    print(f"{'codec decode':32s} {(time.perf_counter() - t0) * 1e3:8.1f} ms "
          f"for {r.n_frames} frames")


if __name__ == "__main__":
    main()
