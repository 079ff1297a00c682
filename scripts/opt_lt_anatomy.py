#!/usr/bin/env python3
"""Per-stage cost attribution for the batched LT sampler kernel.

Compiles the kernel with cumulative trace-time ablations
(lt_sampler_batched._ABLATE) and times each variant with the chained
fori_loop probe. Differences between variants attribute the ~40us/phase cost
the round-3 K/V caching did not remove. OUTPUTS ARE WRONG under ablation —
timing only.

Usage: python scripts/opt_lt_anatomy.py [B]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from magpie_tts_tpu.config import MagpieConfig
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.ops.pallas_kernels import lt_sampler_batched as ltb

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = 100
DTYPE = jnp.bfloat16

VARIANTS = [
    ("full", ""),
    ("-sampling (code=amax)", "nosample"),
    ("-out_proj too", "nosample,noproj"),
    ("-LT layer too", "nosample,noproj,nolayer"),
    ("-feedback too (shell)", "nosample,noproj,nolayer,nofeedback"),
]


def main():
    c = MagpieConfig()
    w = random_magpie_weights(c, seed=0).astype(DTYPE)
    w = jax.device_put(w)
    rng = np.random.default_rng(0)
    hidden0 = jnp.asarray(rng.normal(0, 0.5, size=(B, c.d_model)), DTYPE)
    temp = jnp.float32(0.7)
    forbid = jnp.zeros((B,), bool)
    print(f"device={jax.devices()[0].device_kind} B={B} iters={ITERS}",
          file=sys.stderr)

    results = {}
    for label, ablate in VARIANTS:
        ltb._ABLATE = ablate

        def run(init):
            def body(i, h):
                seeds = (jnp.full((B,), i, jnp.int32)
                         + jnp.arange(B, dtype=jnp.int32))
                s, a = ltb.sample_frame_codes_batched_pallas(
                    h, w, c, seeds, temp, 80, forbid)
                return h + (s.astype(DTYPE) @ jnp.zeros((8, c.d_model),
                                                        DTYPE)) * 0
            return jax.lax.fori_loop(0, ITERS, body, init)

        fn = jax.jit(run)
        out = fn(hidden0)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(hidden0))
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS * 1e6
        results[label] = per
        print(f"{label:28s} {per:8.1f} us/iter", flush=True)

    ltb._ABLATE = ""
    labels = [l for l, _ in VARIANTS]
    for prev, cur in zip(labels, labels[1:]):
        print(f"delta {prev!r} -> {cur!r}: "
              f"{results[prev] - results[cur]:+.1f} us")


if __name__ == "__main__":
    main()
