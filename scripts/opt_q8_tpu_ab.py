#!/usr/bin/env python3
"""On-TPU A/B: Q8_0-native streaming vs dequantize-at-load, compiled Mosaic.

Round-5 question (VERDICT weak #1): the interpret-mode (XLA CPU) runs of the
fused frame kernel show a ~1-ulp hidden divergence between the two paths
because XLA's CPU backend fuses the in-kernel dequant multiply INTO the dot
(loop-emitter, strict-order reduction) for the q8 path while the dense path's
dot stays a standalone vectorized gemm — the dequantized tiles themselves are
bit-identical. This script answers what the DEPLOYMENT platform does: compile
both variants with Mosaic on the real chip and compare outputs bitwise over a
multi-frame greedy + sampled decode.

Usage: python scripts/opt_q8_tpu_ab.py [--frames 40] [--dtype float32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from magpie_tts_tpu.runtime.platform import enable_compilation_cache

    enable_compilation_cache()

    from magpie_tts_tpu.config import MagpieConfig
    from magpie_tts_tpu.io.magpie_weights import (q8_dequantized_decoder,
                                                  q8_stream_from_arrays,
                                                  random_magpie_weights)
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.frame_step import frame_step_pallas

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    c = MagpieConfig()
    w = random_magpie_weights(c, seed=0)
    q8 = q8_stream_from_arrays(w.decoder)
    w_deq = w.replace(decoder=q8_dequantized_decoder(w.decoder, q8))
    if dtype != jnp.float32:
        w_deq = w_deq.astype(dtype)
    print(f"device={jax.devices()[0].device_kind} dtype={args.dtype} "
          f"frames={args.frames}", file=sys.stderr)

    rng = np.random.default_rng(7)
    tokens = jnp.asarray([c.text_bos_id] + list(rng.integers(2, 90, size=24)) +
                         [c.text_eos_id], jnp.int32)
    enc_len = jnp.int32(tokens.shape[0])
    xa_k, xa_v, state0 = magpie_mod.prepare(tokens, enc_len, jnp.int32(0),
                                            w_deq, c)

    # temp is a TRACED jit argument so one compile per path covers both
    # temperatures (the Mosaic compile of the 20-phase kernel is minutes);
    # weights are jit ARGUMENTS, not closures (constants would ship the full
    # 357M model through the remote-compile tunnel).
    steps = {}

    def run(q8_stream, temp):
        t0 = time.time()
        key = q8_stream is not None
        if key not in steps:
            steps[key] = jax.jit(
                lambda w, q8s, xk, xv, h, p, kc, vc, seed, tmp:
                frame_step_pallas(
                    h, p, xk, xv, kc, vc, w, c, seed,
                    tmp, 80, jnp.bool_(False),
                    enc_length=enc_len, q8_stream=q8s),
                donate_argnums=(6, 7))
        base_step = steps[key]
        tmp = jnp.float32(temp)
        step = lambda h, p, kc, vc, seed: base_step(
            w_deq, q8_stream, xa_k, xa_v, h, p, kc, vc, seed, tmp)
        h, p = state0.hidden, state0.pos
        # Fresh copies: the step donates the caches, and state0's are reused
        # by every (path, temp) run.
        kc, vc = jnp.copy(state0.k_cache), jnp.copy(state0.v_cache)
        outs = []
        for i in range(args.frames):
            s, a, h, kc, vc = step(h, p, kc, vc, jnp.int32(i))
            p = p + 1
            outs.append((np.asarray(s), np.asarray(a)))
        h = np.asarray(h)
        kc, vc = np.asarray(kc), np.asarray(vc)
        print(f"  path temp={temp} q8={q8_stream is not None}: "
              f"{time.time()-t0:.1f}s total", file=sys.stderr)
        return outs, h, kc, vc

    for temp in (0.0, 0.8):
        o_d, h_d, kc_d, vc_d = run(None, temp)
        o_q, h_q, kc_q, vc_q = run(q8, temp)
        codes_eq = all(np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
                       for a, b in zip(o_d, o_q))
        h_eq = np.array_equal(h_d, h_q)
        kc_eq = np.array_equal(kc_d, kc_q)
        vc_eq = np.array_equal(vc_d, vc_q)
        hd = np.abs(h_d.astype(np.float64) - h_q.astype(np.float64)).max()
        kd = np.abs(kc_d.astype(np.float64) - kc_q.astype(np.float64)).max()
        print(f"temp={temp}: codes_equal={codes_eq} hidden_equal={h_eq} "
              f"(maxdiff {hd:.3g}) k_cache_equal={kc_eq} (maxdiff {kd:.3g}) "
              f"v_cache_equal={vc_eq}")


if __name__ == "__main__":
    main()
