#!/usr/bin/env python3
"""MXU orientation probe for the per-slot attend dots.

Times, inside a minimal pallas kernel over a [gb, S, D] cache buffer:
  A) current form:  scores = kb[S,D] @ qseg[D,128pad]   (M=S, N=128)
  B) transposed:    scoresT = qh[H,D] . kb[S,D] contracted on dim1/dim1
                    (M=H=12, N=S)  -- stationary transposed load
plus the full attend (scores+softmax+pv+out) in both forms, to see the real
per-slot cost. Slope timing over repeat counts via grid iterations.
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

D, H, S, GB = 768, 12, 640, 8
DH = D // H


def _mk_kernel(mode: str, rows: int):
    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        seg_l = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // DH ==
                 jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
                 ).astype(jnp.float32)
        seg_t = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // DH ==
                 jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
                 ).astype(jnp.float32)
        inv = 1.0 / jnp.sqrt(jnp.float32(DH))
        out_rows = []
        for b in range(GB):
            qb = q_ref[b: b + 1, :].astype(jnp.float32)          # [1, D]
            kb = k_ref[b, pl.ds(0, rows)]
            vb = v_ref[b, pl.ds(0, rows)]
            if mode == "cur":
                qseg = (qb.T * seg_l).astype(kb.dtype)           # [D, H]
                scores = jnp.dot(kb, qseg,
                                 preferred_element_type=jnp.float32) * inv
                m = jnp.max(scores, axis=0, keepdims=True)
                p = jnp.exp(scores - m)
                probs = (p / jnp.sum(p, axis=0, keepdims=True)).astype(kb.dtype)
                pv = jax.lax.dot_general(
                    probs, vb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [H, D]
                row = jnp.dot(jnp.ones((1, H), jnp.float32), pv * seg_t,
                              preferred_element_type=jnp.float32)
            else:
                qh = (qb * seg_t.reshape(H, D)).astype(kb.dtype)  # [H, D]
                scores = jax.lax.dot_general(
                    qh, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * inv    # [H, rows]
                m = jnp.max(scores, axis=1, keepdims=True)
                p = jnp.exp(scores - m)
                probs = (p / jnp.sum(p, axis=1, keepdims=True)).astype(kb.dtype)
                pv = jnp.dot(probs, vb,
                             preferred_element_type=jnp.float32)  # [H, D]
                row = jnp.dot(jnp.ones((1, H), jnp.float32), pv * seg_t,
                              preferred_element_type=jnp.float32)
            out_rows.append(row)
        acc_ref[...] += jnp.concatenate(out_rows, axis=0)

        @pl.when(g == pl.num_programs(0) - 1)
        def _emit():
            o_ref[...] = acc_ref[...]

    return kernel


@functools.lru_cache(maxsize=None)
def build(mode, rows, iters):
    f = pl.pallas_call(
        _mk_kernel(mode, rows),
        grid=(iters,),
        out_shape=jax.ShapeDtypeStruct((GB, D), jnp.float32),
        in_specs=[pl.BlockSpec((GB, D), lambda g: (0, 0)),
                  pl.BlockSpec((GB, S, D), lambda g: (0, 0, 0)),
                  pl.BlockSpec((GB, S, D), lambda g: (0, 0, 0))],
        out_specs=pl.BlockSpec((GB, D), lambda g: (0, 0)),
        scratch_shapes=[pltpu.VMEM((GB, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(f)


def run(mode, rows, iters, q, k, v):
    return build(mode, rows, iters)(q, k, v)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((GB, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((GB, S, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((GB, S, D)) * 0.1, jnp.bfloat16)

    # numeric agreement first
    a = np.asarray(run("cur", 320, 1, q, k, v))
    b = np.asarray(run("tr", 320, 1, q, k, v))
    print("cur-vs-tr max abs diff:", np.abs(a - b).max(), file=sys.stderr)

    for mode in ("cur", "tr"):
        for rows in (320, 640):
            ts = {}
            i1, i2 = 64, 1024
            for iters in (i1, i2):
                jax.block_until_ready(run(mode, rows, iters, q, k, v))
                best = 1e9
                for rep in range(6):
                    qq = jnp.asarray(
                        rng.standard_normal((GB, D)), jnp.bfloat16)
                    jax.block_until_ready(qq)
                    t0 = time.perf_counter()
                    jax.block_until_ready(run(mode, rows, iters, qq, k, v))
                    best = min(best, time.perf_counter() - t0)
                ts[iters] = best
            per = (ts[i2] - ts[i1]) / (i2 - i1) / GB * 1e9
            print(f"{mode:3s} rows={rows}: {per:8.1f} ns/slot-attend",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
