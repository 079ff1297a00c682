#!/usr/bin/env python3
"""Batched greedy-parity + throughput: fused frame kernel vs XLA batched path.

Verifies on real TPU that the fused batched frame kernel
(ops/pallas_kernels/frame_step_batched.py) produces IDENTICAL temp=0 codes to
the pure-XLA lockstep loop for every slot, then times the fused loop
(profile slope between two step budgets, inputs varied per run).

Usage: python scripts/parity_batched.py [--batch 32] [--frames 100]
                                        [--dtype float32]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--temp", type=float, default=0.0,
                    help="sampling temperature for the parity check (0 = "
                         "greedy; >0 exercises the in-kernel draw, still "
                         "expected IDENTICAL at f32 via the shared "
                         "deterministic sampling core)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from magpie_tts_tpu.config import MagpieConfig
    from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
    from magpie_tts_tpu.models import magpie as magpie_mod

    B = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    config = dataclasses.replace(MagpieConfig(), max_dec_steps=args.frames,
                                 min_generated_frames=args.frames)
    weights = random_magpie_weights(config, seed=0).astype(dtype)
    weights = jax.device_put(weights)
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

    def build(fused, pallas_dec):
        import magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched as ltb
        import os

        def prog(w, tokens, lens, spk, keys, temp):
            if not fused:
                os.environ["MAGPIE_NO_FUSED"] = "1"
            else:
                os.environ.pop("MAGPIE_NO_FUSED", None)
            try:
                return magpie_mod.synthesize_codes_batched_program(
                    tokens, lens, spk, keys, temp, w, config, top_k=80,
                    use_pallas_decoder=pallas_dec)
            finally:
                os.environ.pop("MAGPIE_NO_FUSED", None)
        return jax.jit(prog)

    dev = jax.devices()[0]
    print(f"device={dev.device_kind} B={B} frames={args.frames} "
          f"dtype={args.dtype}", file=sys.stderr)

    if not args.skip_parity:
        inp = make_inputs(0)
        zero = jnp.float32(args.temp)
        fused_fn = build(True, True)
        c_f, n_f = fused_fn(weights, *inp, zero)
        c_f, n_f = np.asarray(c_f), np.asarray(n_f)
        # XLA oracle: no pallas at all
        import magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched as ltb
        orig = ltb.batched_shapes_ok
        ltb.batched_shapes_ok = lambda b: False
        try:
            xla_fn = build(False, False)
            c_x, n_x = xla_fn(weights, *inp, zero)
        finally:
            ltb.batched_shapes_ok = orig
        c_x, n_x = np.asarray(c_x), np.asarray(n_x)
        ok = True
        for b in range(B):
            n = min(n_f[b], n_x[b])
            same = (c_f[b, :n] == c_x[b, :n]).all() and n_f[b] == n_x[b]
            if not same:
                bad = np.argwhere(c_f[b, :n] != c_x[b, :n])
                print(f"slot {b}: MISMATCH n_f={n_f[b]} n_x={n_x[b]} "
                      f"first_bad={bad[:3].tolist()}")
                ok = False
        mode = "greedy" if args.temp < 0.01 else f"temp={args.temp}"
        print(f"parity: {'IDENTICAL' if ok else 'FAILED'} over {B} slots x "
              f"{int(n_x.min())}+ {mode} frames")
        if not ok:
            sys.exit(1)

    # ---- throughput (slope between two budgets, varied inputs) ----
    N1, N2 = args.frames // 2, args.frames
    temp = jnp.float32(0.7)
    ts = {}
    for n_steps in (N1, N2):
        cfg = dataclasses.replace(config, max_dec_steps=n_steps,
                                  min_generated_frames=n_steps)
        def prog(w, tokens, lens, spk, keys, t):
            return magpie_mod.synthesize_codes_batched_program(
                tokens, lens, spk, keys, t, w, cfg, top_k=80)
        fn = jax.jit(prog)
        out = fn(weights, *make_inputs(1), temp)
        jax.block_until_ready(out)
        best = 1e9
        for rep in range(3):
            t0 = time.perf_counter()
            out = fn(weights, *make_inputs(100 + rep), temp)
            np.asarray(out[1])
            best = min(best, time.perf_counter() - t0)
        ts[n_steps] = best
    slope = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"fused batched loop: t({N1})={ts[N1]*1e3:.1f}ms "
          f"t({N2})={ts[N2]*1e3:.1f}ms -> {slope*1e3:.3f} ms/step "
          f"({B/slope:.0f} aggregate fps)")


if __name__ == "__main__":
    main()
