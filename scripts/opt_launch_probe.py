#!/usr/bin/env python3
"""Pallas launch/grid overhead reference probe.

Times, inside the chained fori harness:
  1. a MINIMAL pallas kernel (copy [B, 768]) at grid=(1,) and grid=(8,) and
     grid=(20,) — isolates per-launch and per-grid-step fixed cost;
  2. the batched LT shell (all stages ablated) at B=8/16/32 — how the
     residual cost scales with batch;
  3. minimal kernel with an extra pair of 1MB per-step streamed blocks —
     the per-phase block-DMA cost.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magpie_tts_tpu.config import MagpieConfig
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.ops.pallas_kernels import lt_sampler_batched as ltb

ITERS = 100
DTYPE = jnp.bfloat16


def timed(label, fn, init):
    out = fn(init)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(init))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best / ITERS * 1e6:8.1f} us/iter", flush=True)


def minimal_probe(B, grid_n, streamed_mb=0):
    """Copy kernel: out = in + i. Optionally streams a [grid_n, 512, 1024]
    bf16 weight block per grid step (1MB each)."""
    x0 = jnp.zeros((B, 768), DTYPE)
    big = (jnp.zeros((grid_n, 512, 1024), DTYPE) if streamed_mb else None)

    def kernel(*refs):
        if streamed_mb:
            x_ref, w_ref, o_ref = refs
            o_ref[...] = x_ref[...] + w_ref[0, :1, :1].astype(
                jnp.float32)[0, 0].astype(DTYPE)
        else:
            x_ref, o_ref = refs
            i = pl.program_id(0)
            o_ref[...] = x_ref[...] + jnp.asarray(i, DTYPE)

    in_specs = [pl.BlockSpec((B, 768), lambda i: (0, 0))]
    args = []
    if streamed_mb:
        in_specs.append(pl.BlockSpec((1, 512, 1024), lambda i: (i, 0, 0)))

    def call(x):
        ops = [x] + ([big] if streamed_mb else [])
        return pl.pallas_call(
            kernel, grid=(grid_n,),
            out_shape=jax.ShapeDtypeStruct((B, 768), DTYPE),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B, 768), lambda i: (0, 0)),
        )(*ops)

    def run(init):
        def body(i, h):
            return call(h + jnp.asarray(i, DTYPE) * 0)
        return jax.lax.fori_loop(0, ITERS, body, init)

    return jax.jit(run), x0


def main():
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    for grid_n in (1, 8, 20):
        fn, x0 = minimal_probe(32, grid_n)
        timed(f"minimal copy kernel grid=({grid_n},)", fn, x0)

    fn, x0 = minimal_probe(32, 8, streamed_mb=1)
    timed("minimal + 1MB streamed block/step grid=(8,)", fn, x0)

    c = MagpieConfig()
    w = jax.device_put(random_magpie_weights(c, seed=0).astype(DTYPE))
    rng = np.random.default_rng(0)
    ltb._ABLATE = "nosample,noproj,nolayer,nofeedback"
    for B in (8, 16, 32):
        hidden0 = jnp.asarray(rng.normal(0, 0.5, size=(B, c.d_model)), DTYPE)
        forbid = jnp.zeros((B,), bool)

        def run(init, B=B, forbid=forbid):
            def body(i, h):
                seeds = (jnp.full((B,), i, jnp.int32)
                         + jnp.arange(B, dtype=jnp.int32))
                s, a = ltb.sample_frame_codes_batched_pallas(
                    h, w, c, seeds, jnp.float32(0.7), 80, forbid)
                return h + (s.astype(DTYPE) @ jnp.zeros((8, c.d_model),
                                                        DTYPE)) * 0
            return jax.lax.fori_loop(0, ITERS, body, init)

        timed(f"LT shell (all ablated) B={B}", jax.jit(run), hidden0)
    ltb._ABLATE = ""


if __name__ == "__main__":
    main()
