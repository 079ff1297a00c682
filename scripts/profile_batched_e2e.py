#!/usr/bin/env python3
"""Attribute the batched-serving wall time at bench shapes (B=64, 300 frames).

The kernel slope probes say the fused batched step costs ~1.2-2.0 ms at B=64
across positions 110..410, i.e. ~450 ms of device time for a full 300-step
run — yet bench.py measures ~775 ms wall for the same call. This script
splits the gap: compiled-program device time (timed via block_until_ready on
the raw jitted fn, inputs varied per rep to defeat tunnel memoization) vs the
synthesize_batch wrapper (adds host prep + D2H of [B, 300, 8] codes + python
trimming).
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compilation")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magpie_tts_tpu.config import MagpieConfig
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.parallel.serving import BatchedMagpieEngine

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# One source of truth for the shapes/sampling knobs timed in BOTH the
# public-API section and the raw-program section below — editing one without
# the other would silently time two different compiled programs.
BUCKET = 64
TOP_K = 80
TEMPERATURE = 0.7


def main():
    B = int(os.environ.get("B", "64"))
    n_frames = int(os.environ.get("FRAMES", "300"))
    config = dataclasses.replace(MagpieConfig(), max_dec_steps=n_frames,
                                 min_generated_frames=n_frames)
    weights = random_magpie_weights(config, seed=0)
    engine = BatchedMagpieEngine(weights, config, batch_size=B, mesh=None,
                                 compute_dtype=jnp.bfloat16,
                                 token_buckets=(BUCKET,))

    tokens = list(np.random.default_rng(0).integers(2, 90, size=30))
    tokens = [config.text_bos_id] + tokens + [config.text_eos_id]
    tl = [tokens] * B

    # Warm/compile via the public API.
    t0 = time.perf_counter()
    engine.synthesize_batch(tl, temperature=TEMPERATURE, top_k=TOP_K, seed=0)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # (a) full public API wall time
    for i in range(3):
        t0 = time.perf_counter()
        outs = engine.synthesize_batch(tl, temperature=TEMPERATURE,
                                       top_k=TOP_K, seed=i + 1)
        dt = time.perf_counter() - t0
        total = sum(o.shape[0] for o in outs)
        print(f"synthesize_batch rep{i}: {dt * 1e3:.1f} ms "
              f"({total / dt:.0f} agg fps)", file=sys.stderr)

    # (b) raw compiled program: dispatch -> block_until_ready, no D2H of codes
    fn = engine._fn(BUCKET, TOP_K)
    tok = np.zeros((B, BUCKET), np.int32)
    for i in range(B):
        tok[i, : len(tokens)] = tokens
    enc_lengths = jnp.full((B,), len(tokens), jnp.int32)
    spk = jnp.zeros((B,), jnp.int32)
    tok = jnp.asarray(tok)
    for i in range(3):
        keys = jax.vmap(lambda s: jax.random.fold_in(
            jax.random.PRNGKey(100 + i), s))(jnp.arange(B))
        jax.block_until_ready(keys)
        t0 = time.perf_counter()
        codes, nf = fn(engine.weights, tok, enc_lengths, spk, keys,
                       jnp.float32(TEMPERATURE))
        jax.block_until_ready((codes, nf))
        dt = time.perf_counter() - t0
        print(f"raw program rep{i}: {dt * 1e3:.1f} ms "
              f"({B * n_frames / dt:.0f} agg fps)", file=sys.stderr)

    # (c) D2H cost of the codes alone
    t0 = time.perf_counter()
    _ = np.asarray(codes)
    print(f"codes D2H [{B},{codes.shape[1]},8]: "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
