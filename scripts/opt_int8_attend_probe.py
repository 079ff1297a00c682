#!/usr/bin/env python3
"""int8 KV-cache attend probe: is the mixed bf16 x int8 MXU dot free?

The batched step at late positions is cache-DMA-bound (~1 GB/step at B=64,
pos 450). An int8 K/V cache halves that traffic, but only if the attend can
consume int8 blocks WITHOUT a dequantization pass over [rows, D] (a VPU
cast of the full cache volume costs more than the DMA it saves — measured
on the int8 weight stream, whose per-layer cast is affordable only because
weights are B-shared while the cache is per-slot).

The scale algebra that avoids any [rows, D] elementwise work:
  scoresT[H, r] = dot(q_h bf16, Kq[r, :] int8) * s_k[r]        (fold after)
  pv[H, d]     = dot(probs*s_v -> bf16, Vq int8)               (fold before)

Modes, all transposed (head-major) attends over a [GB, S, D] VMEM buffer:
  bf16    — shipped form, bf16 K/V (baseline)
  i8mixed — int8 K/V, mixed-dtype dots, scales folded into [H, rows] ops
  i8cast  — int8 K/V dequantized to bf16 upfront (the naive pass, for scale)

Slope timing over grid iterations (compute-only; DMA saving is arithmetic).
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

from magpie_tts_tpu.runtime.platform import enable_compilation_cache

enable_compilation_cache()

D, H, S, GB = 768, 12, 640, 8
DH = D // H


def _mk_kernel(mode: str, rows: int):
    def kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, acc_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        seg_t = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // DH ==
                 jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
                 ).astype(jnp.float32)
        inv = 1.0 / jnp.sqrt(jnp.float32(DH))
        out_rows = []
        for b in range(GB):
            qb = q_ref[b: b + 1, :].astype(jnp.float32)          # [1, D]
            qh = (qb * seg_t).astype(jnp.bfloat16)               # [H, D]
            if mode == "bf16":
                kb = k_ref[b, pl.ds(0, rows)]
                vb = v_ref[b, pl.ds(0, rows)]
                scores = jax.lax.dot_general(
                    qh, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * inv    # [H, rows]
            elif mode == "i8cast":
                sk = ks_ref[b: b + 1, pl.ds(0, rows)]            # [1, rows]
                sv = vs_ref[b: b + 1, pl.ds(0, rows)]
                kb = (k_ref[b, pl.ds(0, rows)].astype(jnp.float32)
                      * sk.T).astype(jnp.bfloat16)
                vb = (v_ref[b, pl.ds(0, rows)].astype(jnp.float32)
                      * sv.T).astype(jnp.bfloat16)
                scores = jax.lax.dot_general(
                    qh, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * inv
            else:  # i8mixed
                kb = k_ref[b, pl.ds(0, rows)]                    # int8
                vb = v_ref[b, pl.ds(0, rows)]
                sk = ks_ref[b: b + 1, pl.ds(0, rows)]            # [1, rows]
                scores = jax.lax.dot_general(
                    qh, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                scores = scores * (sk * inv)                     # fold s_k
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            probs = p / jnp.sum(p, axis=1, keepdims=True)        # [H, rows]
            if mode == "i8mixed":
                sv = vs_ref[b: b + 1, pl.ds(0, rows)]
                probs_w = (probs * sv).astype(jnp.bfloat16)      # fold s_v
            else:
                probs_w = probs.astype(jnp.bfloat16)
            pv = jnp.dot(probs_w, vb,
                         preferred_element_type=jnp.float32)     # [H, D]
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
    cdt = jnp.bfloat16 if mode == "bf16" else jnp.int8
    f = pl.pallas_call(
        _mk_kernel(mode, rows),
        grid=(iters,),
        out_shape=jax.ShapeDtypeStruct((GB, D), jnp.float32),
        in_specs=[pl.BlockSpec((GB, D), lambda g: (0, 0)),
                  pl.BlockSpec((GB, S, D), lambda g: (0, 0, 0)),
                  pl.BlockSpec((GB, S, D), lambda g: (0, 0, 0)),
                  pl.BlockSpec((GB, S), lambda g: (0, 0)),
                  pl.BlockSpec((GB, S), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((GB, D), lambda g: (0, 0)),
        scratch_shapes=[pltpu.VMEM((GB, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((GB, D)), jnp.bfloat16)
    kf = rng.standard_normal((GB, S, D)).astype(np.float32) * 0.1
    vf = rng.standard_normal((GB, S, D)).astype(np.float32) * 0.1
    ks = (np.abs(kf).max(axis=2) / 127.0).astype(np.float32)     # [GB, S]
    vs = (np.abs(vf).max(axis=2) / 127.0).astype(np.float32)
    kq = np.clip(np.rint(kf / ks[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.rint(vf / vs[..., None]), -127, 127).astype(np.int8)
    k16 = jnp.asarray(kq * ks[..., None], jnp.bfloat16)   # dequant, for bf16
    v16 = jnp.asarray(vq * vs[..., None], jnp.bfloat16)
    kq, vq = jnp.asarray(kq), jnp.asarray(vq)
    ks_j, vs_j = jnp.asarray(ks), jnp.asarray(vs)
    zs = jnp.zeros((GB, S), jnp.float32)

    # numeric agreement: mixed-dot folded scales vs dequantized bf16 attend
    a = np.asarray(run("bf16", 320, 1, q, k16, v16, zs, zs))
    b = np.asarray(run("i8mixed", 320, 1, q, kq, vq, ks_j, vs_j))
    print("bf16(dequant)-vs-i8mixed max abs diff:",
          np.abs(a - b).max(), "of scale", np.abs(a).max(), file=sys.stderr)

    for mode in ("bf16", "i8mixed", "i8cast"):
        args = ((k16, v16, zs, zs) if mode == "bf16"
                else (kq, vq, ks_j, vs_j))
        for rows in (320, 640):
            ts = {}
            i1, i2 = 64, 1024
            for iters in (i1, i2):
                jax.block_until_ready(run(mode, rows, iters, q, *args))
                best = 1e9
                for rep in range(6):
                    qq = jnp.asarray(
                        rng.standard_normal((GB, D)), jnp.bfloat16)
                    jax.block_until_ready(qq)
                    t0 = time.perf_counter()
                    jax.block_until_ready(run(mode, rows, iters, qq, *args))
                    best = min(best, time.perf_counter() - t0)
                ts[iters] = best
            per = (ts[i2] - ts[i1]) / (i2 - i1) / GB * 1e9
            print(f"{mode:8s} rows={rows}: {per:8.1f} ns/slot-attend",
                  file=sys.stderr)


def run(mode, rows, iters, q, k, v, ks, vs):
    return build(mode, rows, iters)(q, k, v, ks, vs)


if __name__ == "__main__":
    main()
