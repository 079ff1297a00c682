#!/usr/bin/env python3
"""Steady-state A/B for the codec cold-start levers (round 5).

Arms: baseline (static dilation, unrolled), DYNDIL (traced-dilation merged
Mosaic modules), DYNDIL+SCAN (lax.scan over the dilated blocks). All three
are bitwise-identical in output (tests pin it); this measures whether the
dynamic tap offsets / scan loop cost anything steady-state on real hardware.

Usage: python scripts/opt_codec_scan_ab.py [T]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 304
    dtype = jnp.bfloat16

    from magpie_tts_tpu.config import CodecConfig
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.models import codec as cm

    cfg = CodecConfig()
    cw = random_codec_weights(cfg, seed=1)
    cw = jax.tree.map(lambda a: a.astype(dtype)
                      if a.dtype == jnp.float32 else a, cw)

    def make_codes(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.integers(0, cfg.codebook_size, size=(8, T)),
                           jnp.int32)

    print(f"device={jax.devices()[0].device_kind} T={T} frames", flush=True)

    ref_audio = None
    for label, dyndil, scan in (("baseline (static, unrolled)", "0", "0"),
                                ("dyndil  (merged modules)", "1", "0"),
                                ("dyndil+scan", "1", "1")):
        os.environ["MAGPIE_CODEC_DYNDIL"] = dyndil
        os.environ["MAGPIE_CODEC_SCAN"] = scan
        fn = jax.jit(lambda codes, _arm=label: cm.codec_decode(
            codes, cw, cfg, use_pallas=True))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(make_codes(0)))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for rep in range(6):
            codes = make_codes(10 + rep)
            t0 = time.perf_counter()
            np.asarray(fn(codes)[:8])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:28s}: {best * 1e3:8.2f} ms/decode "
              f"({best / T * 1e6:6.1f} us/frame)  "
              f"[in-process compile+first {compile_s:.1f} s]", flush=True)
        audio = np.asarray(fn(make_codes(99)))
        if ref_audio is None:
            ref_audio = audio
        else:
            n_diff = int(np.sum(audio != ref_audio))
            print(f"  compiled-TPU parity vs baseline: "
                  f"{'BITWISE EQUAL' if n_diff == 0 else f'{n_diff} DIFFER'} "
                  f"(max abs diff {np.max(np.abs(audio - ref_audio)):.3e})",
                  flush=True)


if __name__ == "__main__":
    main()
