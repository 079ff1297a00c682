#!/usr/bin/env python3
"""Probe per-iteration overhead inside fori_loop on this TPU setup."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed_loop(label, body, init, iters, n=3):
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
    print(f"{label:52s} {best / iters * 1e6:9.1f} us/iter  (total {best*1e3:.1f} ms)")


def main():
    rng = np.random.default_rng(0)

    # scalar-carry trivial body at different iteration counts
    for iters in (100, 1000):
        timed_loop(f"scalar add (iters={iters})",
                   lambda c: c + 1.0, jnp.float32(0.0), iters)

    # body with 10 chained argmaxes (op count scaling)
    logits = jnp.asarray(rng.normal(size=(2024,)).astype(np.float32))

    def ten_argmax(c):
        for _ in range(10):
            c = c + jnp.argmax(logits + c).astype(jnp.float32) * 1e-9
        return c

    timed_loop("10 chained argmax(2024)", ten_argmax, jnp.float32(0.0), 100)

    # big matmul: compute-bound reference point
    a = jnp.asarray(rng.normal(size=(2048, 2048)).astype(np.float32)).astype(jnp.bfloat16)

    def mm_body(c):
        return (c @ a) * 1e-3

    timed_loop("matmul 2048x2048x2048 bf16", mm_body, a, 50)

    # small matmul similar to codec conv tap
    b = jnp.asarray(rng.normal(size=(512, 432)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(432, 432)).astype(np.float32)).astype(jnp.bfloat16)

    def smm_body(c):
        return (c @ w) * 0.5 + b * 0.5

    timed_loop("matmul 512x432x432 bf16", smm_body, b, 200)

    # 3 chained small matmuls per iteration
    def smm3_body(c):
        for _ in range(3):
            c = (c @ w) * 0.5 + b * 0.5
        return c

    timed_loop("3x matmul 512x432x432", smm3_body, b, 100)

    # single conv op outside loop, many sequential convs inside ONE jit (no loop)
    x = jnp.asarray(rng.normal(size=(1, 512, 432)).astype(np.float32)).astype(jnp.bfloat16)
    wc = jnp.asarray(rng.normal(0, 0.1, size=(3, 432, 432)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def conv20(x, wc):
        for _ in range(20):
            y = jax.lax.conv_general_dilated(
                x, wc, (1,), [(2, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            x = y * 0.5 + x * 0.5
        return x

    out = conv20(x, wc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = conv20(x, wc)
    jax.block_until_ready(out)
    print(f"{'conv unrolled x20 (no loop)':52s} {(time.perf_counter()-t0)/3/20*1e6:9.1f} us/conv")

    # same conv inside fori_loop
    def conv_body(c):
        y = jax.lax.conv_general_dilated(
            c, wc, (1,), [(2, 0)], dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32).astype(c.dtype)
        return y * 0.5 + x * 0.5

    timed_loop("conv inside fori_loop", conv_body, x, 100)


if __name__ == "__main__":
    main()
