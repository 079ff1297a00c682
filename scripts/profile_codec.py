#!/usr/bin/env python3
"""Codec decode timing: fused res-layer kernel vs per-conv pallas vs XLA.

Times full codec decode of a T-frame code sequence (single utterance) per
path, plus compile time for each, on the current device.
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
    rng = np.random.default_rng(0)

    def make_codes(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.integers(0, cfg.codebook_size, size=(8, T)),
                           jnp.int32)

    print(f"device={jax.devices()[0].device_kind} T={T} frames", file=sys.stderr)

    for label, env, use_pallas in (
            ("fused res-layer", None, True),
            ("per-conv pallas", "MAGPIE_NO_FUSED_CODEC", True),
            ("xla", None, False)):
        if env:
            os.environ[env] = "1"
        try:
            fn = jax.jit(lambda codes: cm.codec_decode(
                codes, cw, cfg, use_pallas=use_pallas))
            t0 = time.perf_counter()
            out = fn(make_codes(0))
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            best = 1e9
            for rep in range(4):
                codes = make_codes(10 + rep)
                t0 = time.perf_counter()
                out = fn(codes)
                np.asarray(out[:8])
                best = min(best, time.perf_counter() - t0)
            print(f"{label:18s}: {best*1e3:8.2f} ms/decode "
                  f"({T/best:7.0f} fps)  compile {compile_s:.1f}s")
        finally:
            if env:
                os.environ.pop(env, None)


if __name__ == "__main__":
    main()
