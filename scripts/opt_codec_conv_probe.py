#!/usr/bin/env python3
"""Attribute the in-kernel cost of the codec snake+conv Pallas kernel.

Slope timing (two row counts, varied inputs) of single packed-layout convs at
the production stage-4 shape class ([rows, 128] bf16), toggling:
  - snake activation on/off
  - tap count (k=11 d=5 packed -> 14 taps, vs k=3 d=1 packed -> taps ~2)
  - im2col vs per-tap dots
Plus a pure jnp.sin / half_snake XLA elementwise baseline for the same
element count, to bound what the activation alone costs.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from magpie_tts_tpu.ops.pallas_kernels import codec_conv as cc


def slope(fn, shape_of, r1, r2, reps=8):
    f = jax.jit(fn)

    def run(rows):
        def mk(seed):
            r = np.random.default_rng(seed)
            return jnp.asarray(r.standard_normal(shape_of(rows)) * 0.1,
                               jnp.bfloat16)
        out = f(mk(0))
        jax.block_until_ready(out)
        best = 1e9
        for rep in range(reps):
            a = mk(rep + 1)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            jax.block_until_ready(f(a))
            best = min(best, time.perf_counter() - t0)
        return best

    ta, tb = run(r1), run(r2)
    return (tb - ta) / (r2 - r1)


def main():
    r1, r2 = 163840, 655360   # rows (packed stage-4 at ~640/2560 frames)
    C, p = 27, 4

    rng = np.random.default_rng(0)

    def mkw(k):
        return jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, jnp.bfloat16)

    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.bfloat16)
    alpha = jnp.asarray(np.abs(rng.standard_normal((13,))) + 0.5, jnp.float32)

    cases = []
    for k, d in ((11, 5), (3, 1)):
        w = mkw(k)
        for use_snake in (True, False):
            a = alpha if use_snake else None
            label = f"packed conv k={k} d={d} snake={use_snake}"
            cases.append((label, (lambda x, w=w, a=a, k=k, d=d:
                                  cc.snake_causal_conv_packed(
                                      x, w, b, a, C, p, dilation=d)),
                          lambda rows: (rows, 128)))

    # Elementwise baselines at the same element count (lane width sweep: does
    # a wider minor dim stream faster per element?)
    for width in (128, 512, 2048):
        scale = width // 128
        cases.append((f"xla sin(f32)+where w={width}",
                      lambda x: jnp.where(x > 0, jnp.sin(x.astype(jnp.float32)),
                                          0.01 * x.astype(jnp.float32)).astype(x.dtype),
                      lambda rows, w=width, s=scale: (rows // s, w)))
        cases.append((f"xla copy *2 w={width}",
                      lambda x: x * 2,
                      lambda rows, w=width, s=scale: (rows // s, w)))

    print(f"device={jax.devices()[0].device_kind} rows {r1}/{r2}",
          file=sys.stderr)
    for label, fn, shape_of in cases:
        s = slope(fn, shape_of, r1, r2)
        # normalize to per-128-lane-row: elements = rows*128 regardless of width
        gbs = (2 * 128 * 2) / s / 1e9 if s > 0 else float("inf")
        print(f"{label:40s}: {s*1e9:7.2f} ns/128elem  ({gbs:6.0f} GB/s eff)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
