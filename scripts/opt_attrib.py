#!/usr/bin/env python3
"""Attribute decode vs codec time with current code."""

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
from magpie_tts_tpu.runtime.engine import CodecEngine, MagpieEngine

DTYPE = jnp.bfloat16
N = 300


def main():
    config = dataclasses.replace(MagpieConfig(), max_dec_steps=N,
                                 min_generated_frames=N)
    weights = random_magpie_weights(config, seed=0)
    engine = MagpieEngine(weights, config, compute_dtype=DTYPE)
    tokens = list(range(30))

    r = engine.synthesize_codes(tokens, temperature=0.7)
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        r = engine.synthesize_codes(tokens, temperature=0.7, seed=i)
        best = min(best, time.perf_counter() - t0)
    print(f"decode-only: {N} frames in {best:.3f}s = {N / best:.0f} fps "
          f"({best / N * 1e3:.3f} ms/frame)")

    ccfg = CodecConfig()
    codec = CodecEngine(random_codec_weights(ccfg, seed=1), ccfg,
                        compute_dtype=DTYPE)
    _ = codec.decode(r.codes)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = codec.decode(r.codes)
        best = min(best, time.perf_counter() - t0)
    print(f"codec-only: {N} frames in {best:.3f}s = {best / N * 1e3:.3f} ms/frame")

    # codec per-piece at production shape T=300
    cw = codec.weights
    latent = jnp.zeros((1, 384, 32), DTYPE)

    def time_fn(label, fn, *args, n=5):
        out = fn(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:40s} {best * 1e3:8.2f} ms")
        return out

    x = time_fn("pre_conv", jax.jit(
        lambda l: codec_mod.causal_conv1d(l, cw.pre_conv_w, cw.pre_conv_b)), latent)
    for i, (stage, stride) in enumerate(zip(cw.stages, ccfg.up_sample_rates)):
        up = jax.jit(lambda xx, st=stage, s=stride: codec_mod.grouped_conv_transpose1d(
            codec_mod.half_snake(xx, st.act_alpha, ccfg.leaky_slope),
            st.convt_w, st.convt_b, s))
        x = time_fn(f"stage{i} upsample T={x.shape[1]}", up, x)
        res = jax.jit(lambda xx, st=stage: codec_mod.res_layer(
            xx, st.resblocks, ccfg.resblock_dilations, ccfg.leaky_slope))
        x = time_fn(f"stage{i} res_layer T={x.shape[1]}", res, x)


if __name__ == "__main__":
    main()
