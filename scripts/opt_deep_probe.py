#!/usr/bin/env python3
"""Slope A/B of batched fused-frame variants: cache-buffer depth + top-k loop.

Variants probed (one process, data staged to HBM once):
  nbuf2        — shipped double-buffered cache streaming (baseline)
  nbuf4        — MAGPIE_CACHE_BUFS=4 "deep" mode: one VMEM buffer per cache
                 group, a full layer of DMA lookahead (layer 0 streams under
                 the LT phases, layer l+1 streams while layer l computes)
  nbuf4+while  — deep mode + MAGPIE_TOPK_WHILE=1 early-exit bisection

Methodology is opt_slope_probe.py's (two iteration counts, per-iter = slope,
inputs varied per timed execution so the tunnel can't replay), with two
adaptations to THIS round's environment (1 host CPU, ~340 s Mosaic compiles,
~300 ms dispatch):
  - the iteration count is a TRACED argument (dynamic-trip fori_loop), so each
    variant costs ONE compile instead of two;
  - the span is widened (50 vs 2050 iters) so ~50 ms dispatch jitter
    contributes <30 us of slope error.

Usage: python scripts/opt_deep_probe.py [pos_off ...]   (default: 40)
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from magpie_tts_tpu.config import MagpieConfig
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.runtime.platform import enable_compilation_cache

enable_compilation_cache()

B = int(os.environ.get("MAGPIE_PROBE_B", "32"))
DT = jnp.bfloat16
N_LO, N_HI = 50, 2050
REPS = 5
TEMP = float(os.environ.get("MAGPIE_PROBE_TEMP", "0.7"))

VARIANTS = [
    ("nbuf2       ", 2, False),
    ("nbuf4       ", 4, False),
    ("nbuf4+while ", 4, True),
    ("nbuf2+while ", 2, True),
]


def main():
    pos_offs = [int(a) for a in sys.argv[1:]] or [40]
    c = MagpieConfig()
    rng = np.random.default_rng(0)
    w = jax.device_put(random_magpie_weights(c, seed=0).astype(DT))
    E, S, D, L = 64, c.max_seq, c.d_model, c.dec_layers
    xa_k = jnp.asarray(rng.normal(0, 0.3, (B, L, E, c.d_xa)), DT)
    xa_v = jnp.asarray(rng.normal(0, 0.3, (B, L, E, c.d_xa)), DT)
    kc0 = jnp.asarray(rng.normal(0, 0.3, (B, L, S, D)), DT)
    vc0 = jnp.asarray(rng.normal(0, 0.3, (B, L, S, D)), DT)
    enc = jnp.full((B,), 50, jnp.int32)
    temp = jnp.float32(TEMP)
    forbid = jnp.zeros((B,), bool)
    maycont = jnp.ones((B,), bool)
    jax.block_until_ready((xa_k, xa_v, kc0, vc0))
    print(f"device={jax.devices()[0].device_kind} B={B} temp={TEMP}",
          flush=True)

    from magpie_tts_tpu.ops.pallas_kernels import frame_step_batched as fsb

    def build(pos_off):
        pos = jnp.int32(c.context_frames + pos_off)
        valid = (jnp.arange(S)[None, :] <= pos) & jnp.ones((B, 1), bool)
        posemb = jnp.broadcast_to(
            w.decoder.pos_emb[c.context_frames + pos_off][None, :].astype(DT),
            (B, c.d_model))

        def run(n, seed0, h, kc, vc):
            def body(i, carry):
                h, kc, vc = carry
                seeds = seed0 + i + jnp.arange(B, dtype=jnp.int32)
                s, a, h2, kc, vc = fsb.frame_step_batched_pallas(
                    h, pos, valid, maycont, posemb, xa_k, xa_v, kc, vc,
                    w, c, enc, seeds, temp, 80, forbid)
                return (h2.astype(DT), kc, vc)
            return jax.lax.fori_loop(0, n, body, (h, kc, vc))[0]

        return jax.jit(run, donate_argnums=(3, 4))

    for pos_off in pos_offs:
        for label, nbuf, use_while in VARIANTS:
            fsb._NBUF = nbuf
            os.environ["MAGPIE_TOPK_WHILE"] = "1" if use_while else "0"
            fn = build(pos_off)
            t0 = time.time()
            jax.block_until_ready(
                fn(jnp.int32(2), jnp.int32(99), jnp.full((B, D), 0.5, DT),
                   kc0 + 0, vc0 + 0))
            compile_s = time.time() - t0
            times = {}
            for n in (N_LO, N_HI):
                best = 1e9
                for rep in range(REPS):
                    h = jnp.full((B, D), 0.5 + rep * 1e-3, DT)
                    kc, vc = kc0 + 0, vc0 + 0
                    jax.block_until_ready((h, kc, vc))
                    t0 = time.perf_counter()
                    jax.block_until_ready(
                        fn(jnp.int32(n), jnp.int32(rep), h, kc, vc))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            per = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e6
            print(f"pos_off={pos_off:3d} {label} {per:8.1f} us/step   "
                  f"(T{N_LO}={times[N_LO]*1e3:7.1f}ms "
                  f"T{N_HI}={times[N_HI]*1e3:7.1f}ms compile={compile_s:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
