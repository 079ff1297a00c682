#!/usr/bin/env python3
"""Per-step cost breakdown of the lockstep batched decode loop on TPU.

Times synthesize_codes_batched_program at two step budgets; the slope
(t(N2)-t(N1))/(N2-N1) is the marginal per-step cost net of prefill and
dispatch. Variants toggle the two pallas kernels to expose the XLA glue.
Inputs vary per run (the axon tunnel memoizes identical executions).
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from magpie_tts_tpu.config import MagpieConfig
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.models import magpie as magpie_mod

DTYPE = jnp.bfloat16
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N1, N2 = 64, 128


def main():
    config = MagpieConfig()
    weights = random_magpie_weights(config, seed=0).astype(DTYPE)
    weights = jax.device_put(weights)

    rng = np.random.default_rng(0)
    T = 64

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        tokens = np.zeros((B, T), np.int32)
        lens = r.integers(16, T - 2, size=B).astype(np.int32)
        for i in range(B):
            tokens[i, 0] = config.text_bos_id
            tokens[i, 1:lens[i] - 1] = r.integers(2, 90, size=lens[i] - 2)
            tokens[i, lens[i] - 1] = config.text_eos_id
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(jnp.arange(B))
        return (jnp.asarray(tokens), jnp.asarray(lens),
                jnp.zeros((B,), jnp.int32), keys)

    def build(n_steps, lt, dec):
        cfg = dataclasses.replace(config, max_dec_steps=n_steps,
                                  min_generated_frames=n_steps)

        def prog(w, tokens, lens, spk, keys, temp):
            import magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched as ltb
            orig = ltb.batched_shapes_ok
            ltb.batched_shapes_ok = (lambda b: lt and orig(b))
            try:
                return magpie_mod.synthesize_codes_batched_program(
                    tokens, lens, spk, keys, temp, w, cfg, top_k=80,
                    use_pallas_decoder=dec)
            finally:
                ltb.batched_shapes_ok = orig
        return jax.jit(prog)

    temp = jnp.float32(0.7)
    for name, lt, dec in [("pallas LT + pallas dec", True, True),
                          ("XLA LT   + pallas dec", False, True),
                          ("pallas LT + XLA dec  ", True, False),
                          ("XLA LT   + XLA dec  ", False, False)]:
        ts = {}
        for n_steps in (N1, N2):
            fn = build(n_steps, lt, dec)
            inp = make_inputs(0)
            out = fn(weights, *inp, temp)
            jax.block_until_ready(out)
            best = 1e9
            for rep in range(3):
                inp = make_inputs(100 + rep)
                t0 = time.perf_counter()
                out = fn(weights, *inp, temp)
                np.asarray(out[1])  # D2H sync
                best = min(best, time.perf_counter() - t0)
            ts[n_steps] = best
        slope = (ts[N2] - ts[N1]) / (N2 - N1)
        print(f"{name}: t({N1})={ts[N1]*1e3:7.1f}ms t({N2})={ts[N2]*1e3:7.1f}ms"
              f"  -> {slope*1e3:6.3f} ms/step  "
              f"({B/slope:7.0f} aggregate fps)")


if __name__ == "__main__":
    main()
