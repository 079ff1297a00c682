#!/usr/bin/env python3
"""Slope A/B: early-exit (while-loop) top-k bisection in the SINGLE-stream
fused frame kernel. Methodology = opt_deep_probe.py (dynamic-trip fori_loop,
wide span, varied inputs). Usage: opt_ss_while_probe.py [pos_off ...]"""

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

DT = jnp.bfloat16
N_LO, N_HI = 50, 2050
REPS = 5
TEMP = float(os.environ.get("MAGPIE_PROBE_TEMP", "0.7"))


def main():
    pos_offs = [int(a) for a in sys.argv[1:]] or [40]
    c = MagpieConfig()
    rng = np.random.default_rng(0)
    w = jax.device_put(random_magpie_weights(c, seed=0).astype(DT))
    E, S, D, L = 64, c.max_seq, c.d_model, c.dec_layers
    xa_k = jnp.asarray(rng.normal(0, 0.3, (L, E, c.d_xa)), DT)
    xa_v = jnp.asarray(rng.normal(0, 0.3, (L, E, c.d_xa)), DT)
    kc0 = jnp.asarray(rng.normal(0, 0.3, (L, S, D)), DT)
    vc0 = jnp.asarray(rng.normal(0, 0.3, (L, S, D)), DT)
    temp = jnp.float32(TEMP)
    jax.block_until_ready((xa_k, xa_v, kc0, vc0))
    print(f"device={jax.devices()[0].device_kind} temp={TEMP}", flush=True)

    from magpie_tts_tpu.ops.pallas_kernels import frame_step as fs

    def build(pos_off):
        pos = jnp.int32(c.context_frames + pos_off)

        def run(n, seed0, h, kc, vc):
            def body(i, carry):
                h, kc, vc = carry
                s, a, h2, kc, vc = fs.frame_step_pallas(
                    h, pos, xa_k, xa_v, kc, vc, w, c, seed0 + i, temp, 80,
                    jnp.bool_(False), enc_length=jnp.int32(50))
                return (h2.astype(DT), kc, vc)
            return jax.lax.fori_loop(0, n, body, (h, kc, vc))[0]

        return jax.jit(run, donate_argnums=(3, 4))

    for pos_off in pos_offs:
        for label, knob in (("fixed32", "0"), ("while  ", "1")):
            os.environ["MAGPIE_TOPK_WHILE"] = knob
            fn = build(pos_off)
            t0 = time.time()
            jax.block_until_ready(
                fn(jnp.int32(2), jnp.int32(99), jnp.full((1, D), 0.5, DT)[0],
                   kc0 + 0, vc0 + 0))
            compile_s = time.time() - t0
            times = {}
            for n in (N_LO, N_HI):
                best = 1e9
                for rep in range(REPS):
                    h = jnp.full((D,), 0.5 + rep * 1e-3, DT)
                    kc, vc = kc0 + 0, vc0 + 0
                    jax.block_until_ready((h, kc, vc))
                    t0 = time.perf_counter()
                    jax.block_until_ready(
                        fn(jnp.int32(n), jnp.int32(rep), h, kc, vc))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            per = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e6
            print(f"pos_off={pos_off:3d} ss {label} {per:8.1f} us/frame   "
                  f"(compile={compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
