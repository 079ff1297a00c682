#!/usr/bin/env python3
"""Greedy-parity check: Pallas decode kernels vs the XLA oracle path on TPU.

The round-1 gap was ~1e-2 hidden drift (DEFAULT matmul precision truncates f32
to bf16 differently per backend); after the DOT_PRECISION/rounding-point
alignment this verifies the VERDICT bar: >=3 texts x >=300 greedy frames with
IDENTICAL codes between the fused Pallas path, the split-kernel path and the
XLA path, plus fps for each path.

Usage: python scripts/parity_decode.py [--frames 300] [--dtype float32]
                                       [--texts 3] [--skip-split]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--texts", type=int, default=3)
    ap.add_argument("--skip-split", action="store_true",
                    help="skip the separate-kernels (non-fused) path")
    ap.add_argument("--temp", type=float, default=0.0,
                    help="sampling temperature; temp>0 exercises the shared "
                         "deterministic counter-based sampler (exact top-k + "
                         "seeded Gumbel), which must also be bit-equal across "
                         "paths at f32 (docs/PARITY.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from magpie_tts_tpu.config import MagpieConfig
    from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
    from magpie_tts_tpu.runtime.engine import MagpieEngine

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    config = dataclasses.replace(MagpieConfig(), max_dec_steps=args.frames,
                                 min_generated_frames=args.frames)
    weights = random_magpie_weights(config, seed=0)
    print(f"parity: device={jax.devices()[0].device_kind} dtype={args.dtype} "
          f"frames={args.frames} texts={args.texts}", file=sys.stderr)

    rng = np.random.default_rng(7)
    token_lists = []
    for i in range(args.texts):
        n = int(rng.integers(20, 45))
        toks = [config.text_bos_id] + list(rng.integers(2, 90, size=n)) + \
            [config.text_eos_id]
        token_lists.append(toks)

    paths = {
        "xla": dict(use_pallas_lt=False, use_pallas_decoder=False),
        "fused": dict(),
        "split": dict(use_fused=False),
    }
    if args.skip_split:
        paths.pop("split")

    codes = {}
    for name, kw in paths.items():
        engine = MagpieEngine(weights, config, compute_dtype=dtype, **kw)
        outs = []
        t_compile = time.perf_counter()
        engine.synthesize_codes(token_lists[0], temperature=args.temp)
        print(f"parity: {name} compile {time.perf_counter()-t_compile:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        total = 0
        for toks in token_lists:
            r = engine.synthesize_codes(toks, temperature=args.temp,
                                         seed=17)
            outs.append(np.asarray(r.codes))
            total += r.n_frames
        dt = time.perf_counter() - t0
        codes[name] = outs
        print(f"parity: {name}: {total} frames in {dt:.2f}s = "
              f"{total/dt:.0f} fps", file=sys.stderr)

    ok = True
    for name in codes:
        if name == "xla":
            continue
        for i, (a, b) in enumerate(zip(codes["xla"], codes[name])):
            n = min(len(a), len(b))
            frames_eq = int(np.sum(np.all(a[:n] == b[:n], axis=1)))
            exact = len(a) == len(b) and frames_eq == n
            status = "EXACT" if exact else "MISMATCH"
            print(f"parity: xla vs {name}, text {i}: {status} "
                  f"({frames_eq}/{n} frames equal, lens {len(a)}/{len(b)})")
            if not exact:
                ok = False
                diff = np.where(~np.all(a[:n] == b[:n], axis=1))[0]
                print(f"  first mismatched frame: {diff[0] if len(diff) else n}"
                      f"  a={a[diff[0]] if len(diff) else '-'}"
                      f"  b={b[diff[0]] if len(diff) else '-'}")
    print("parity:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
