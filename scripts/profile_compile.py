#!/usr/bin/env python3
"""Per-program compile-time attribution for cold start (VERDICT r2 item 8).

Times, with a FRESH compilation cache (tmp dir), each compiled program a cold
CLI/serve process pays for, in the order the product surfaces trigger them:

  1. prepare (prefill) per token bucket
  2. synthesize_audio_fused (generate -> vocode -> PCM16, one program)
  3. fused streaming chunk program
  4. codec per-frame-bucket decode programs
  5. batched serving program (B=32)

Usage: python scripts/profile_compile.py [--buckets 64] [--skip-batched]
"""

import argparse
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      tempfile.mkdtemp(prefix="cold_cache_"))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out) if out is not None else None
    dt = time.perf_counter() - t0
    print(f"{label:52s} {dt:7.1f} s", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--buckets", type=int, nargs="*", default=[64])
    p.add_argument("--frame-buckets", type=int, nargs="*", default=None)
    p.add_argument("--skip-batched", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from magpie_tts_tpu.config import CodecConfig, MagpieConfig
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
    from magpie_tts_tpu.runtime.engine import (CodecEngine, MagpieEngine,
                                               synthesize_audio_fused)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    config = dataclasses.replace(MagpieConfig(), max_dec_steps=32,
                                 min_generated_frames=32)
    weights = random_magpie_weights(config, seed=0)
    codec_weights = random_codec_weights(CodecConfig(), seed=1)

    total0 = time.perf_counter()
    engine = MagpieEngine(weights, config, compute_dtype=dtype)
    codec_kw = {}
    if args.frame_buckets:
        codec_kw["frame_buckets"] = tuple(args.frame_buckets)
    codec = CodecEngine(codec_weights, CodecConfig(), compute_dtype=dtype,
                        **codec_kw)

    total = 0.0
    tokens = {b: [config.text_bos_id] + [2] * (b - 2) + [config.text_eos_id]
              for b in args.buckets}

    for b in args.buckets:
        total += timed(f"prepare/prefill bucket={b}",
                       lambda b=b: engine.begin_stream(tokens[b])["xa_k"])

    for b in args.buckets:
        total += timed(
            f"synthesize_audio_fused bucket={b}",
            lambda b=b: jnp.asarray(synthesize_audio_fused(
                engine, codec, tokens[b], temperature=0.7, top_k=80,
                seed=0)[0]))

    from magpie_tts_tpu.runtime.streaming import (StreamParams,
                                                  warmup_streaming)

    params = StreamParams(temperature=0.7, top_k=80, frames_per_chunk=4)
    total += timed(
        f"fused streaming chunk bucket={args.buckets[0]}",
        lambda: warmup_streaming(engine, codec, params,
                                 token_buckets=[args.buckets[0]]))

    for fb in codec.frame_buckets:
        total += timed(
            f"codec decode frame_bucket={fb}",
            lambda fb=fb: codec._decode_fn(fb)(
                codec.weights,
                jnp.zeros((config.num_codebooks, fb), jnp.int32)))

    if not args.skip_batched:
        from magpie_tts_tpu.parallel.serving import BatchedMagpieEngine

        bengine = BatchedMagpieEngine(weights, config, batch_size=32,
                                      mesh=None, compute_dtype=dtype,
                                      token_buckets=(args.buckets[0],))
        total += timed(
            "batched serving program B=32",
            lambda: bengine.synthesize_batch(
                [tokens[args.buckets[0]]] * 32, temperature=0.7,
                top_k=80)[0].shape)

    print(f"{'TOTAL (attributed)':52s} {total:7.1f} s")
    print(f"{'TOTAL (wall incl. weight init)':52s} "
          f"{time.perf_counter() - total0:7.1f} s")


if __name__ == "__main__":
    main()
