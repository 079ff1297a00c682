#!/usr/bin/env python3
"""Probe: does Mosaic support int4 weight streaming on this TPU/jax version?

Tries, in order:
  A. native jnp.int4 HBM array -> manual DMA into int4 VMEM scratch ->
     astype(bf16) -> dot;
  B. packed-int8 nibbles -> in-kernel shift/mask unpack -> dot
     (the always-available fallback);
and times both against a plain bf16-weight matmul of the same logical shape,
plus raw DMA bandwidth for each representation.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return out, best


IN, OUT = 768, 3072


def probe_native_int4():
    def kernel(x_ref, w_hbm, o_ref, wbuf, sem):
        cp = pltpu.make_async_copy(w_hbm, wbuf, sem)
        cp.start()
        cp.wait()
        w = wbuf[...].astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(x_ref[...], w,
                             preferred_element_type=jnp.float32)

    x = jnp.ones((8, IN), jnp.bfloat16)
    w4 = jnp.asarray(
        np.random.default_rng(0).integers(-8, 8, size=(IN, OUT)),
        jnp.int4)

    fn = jax.jit(lambda x, w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, OUT), jnp.float32),
        in_specs=[pl.BlockSpec((8, IN), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, OUT), lambda: (0, 0)),
        scratch_shapes=[pltpu.VMEM((IN, OUT), jnp.int4),
                        pltpu.SemaphoreType.DMA],
    )(x, w))
    out, dt = timed(fn, x, w4)
    ref = np.asarray(x, np.float32) @ np.asarray(w4, np.float32)
    err = np.abs(np.asarray(out) - ref).max()
    return dt, err


def probe_packed_int8():
    half = IN // 2

    def kernel(x_ref, p_hbm, o_ref, pbuf, sem):
        cp = pltpu.make_async_copy(p_hbm, pbuf, sem)
        cp.start()
        cp.wait()
        p = pbuf[...].astype(jnp.int32)
        lo = ((p & 15) ^ 8) - 8          # rows [0, half)
        hi = (((p >> 4) & 15) ^ 8) - 8   # rows [half, IN)
        wlo = lo.astype(jnp.bfloat16)
        whi = hi.astype(jnp.bfloat16)
        acc = jnp.dot(x_ref[:, :half], wlo,
                      preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(x_ref[:, half:], whi,
                            preferred_element_type=jnp.float32)
        o_ref[...] = acc

    x = jnp.ones((8, IN), jnp.bfloat16)
    r = np.random.default_rng(0)
    w = r.integers(-8, 8, size=(IN, OUT)).astype(np.int32)
    packed = ((w[half:] & 15) << 4 | (w[:half] & 15)).astype(np.int8)
    p = jnp.asarray(packed)

    fn = jax.jit(lambda x, p: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, OUT), jnp.float32),
        in_specs=[pl.BlockSpec((8, IN), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, OUT), lambda: (0, 0)),
        scratch_shapes=[pltpu.VMEM((half, OUT), jnp.int8),
                        pltpu.SemaphoreType.DMA],
    )(x, p))
    out, dt = timed(fn, x, p)
    ref = np.ones((8, IN), np.float32) @ w.astype(np.float32)
    err = np.abs(np.asarray(out) - ref).max()
    return dt, err


def probe_bf16():
    def kernel(x_ref, w_hbm, o_ref, wbuf, sem):
        cp = pltpu.make_async_copy(w_hbm, wbuf, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.dot(x_ref[...], wbuf[...],
                             preferred_element_type=jnp.float32)

    x = jnp.ones((8, IN), jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(0).normal(size=(IN, OUT)),
                    jnp.bfloat16)
    fn = jax.jit(lambda x, w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, OUT), jnp.float32),
        in_specs=[pl.BlockSpec((8, IN), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, OUT), lambda: (0, 0)),
        scratch_shapes=[pltpu.VMEM((IN, OUT), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x, w))
    _, dt = timed(fn, x, w)
    return dt


def main():
    print(f"device={jax.devices()[0].device_kind} "
          f"[{IN}x{OUT} weight, dma+dot]", file=sys.stderr)
    dt_bf16 = probe_bf16()
    print(f"bf16      : {dt_bf16*1e6:8.1f} us")
    try:
        dt, err = probe_native_int4()
        print(f"native i4 : {dt*1e6:8.1f} us  (max err {err})")
    except Exception as e:
        print(f"native i4 : FAILED — {type(e).__name__}: {str(e)[:200]}")
    try:
        dt, err = probe_packed_int8()
        print(f"packed i8 : {dt*1e6:8.1f} us  (max err {err})")
    except Exception as e:
        print(f"packed i8 : FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
