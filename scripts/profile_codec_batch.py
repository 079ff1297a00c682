#!/usr/bin/env python3
"""Batched vocoder cost: per-frame-per-slot cost of CodecEngine.decode_batch.

Timing notes (see docs/KERNELS.md "Measurement discipline"): inputs vary per
rep (the tunnel memoizes identical executions); completion is forced with a
tiny D2H fetch (block_until_ready does not await through the tunnel); the
program runs ~seconds so the ~30 ms dispatch RTT is noise, and we subtract a
measured empty-dispatch estimate anyway via min-of-reps deltas at two frame
buckets (a coarse slope: (T_hi - T_lo) / (frames_hi - frames_lo)).

Usage: python scripts/profile_codec_batch.py [B ...]   (default: 1 8 32 64)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from magpie_tts_tpu.config import CodecConfig
from magpie_tts_tpu.io.codec_weights import random_codec_weights
from magpie_tts_tpu.runtime.engine import CodecEngine

BUCKETS = (128, 384)
REPS = 4


def main():
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    c = CodecConfig()
    w = random_codec_weights(c, seed=1)
    eng = CodecEngine(w, c, compute_dtype=jnp.bfloat16,
                      frame_buckets=BUCKETS)
    rng = np.random.default_rng(0)

    for B in [int(a) for a in sys.argv[1:]] or [1, 8, 32, 64]:
        times = {}
        for bucket in BUCKETS:
            # build + compile once via the public API path
            fn_key = (B, bucket)
            codes0 = [rng.integers(0, 2016, (bucket, c.num_codebooks))
                      for _ in range(B)]
            eng.decode_batch(codes0)          # compile (and D2H, untimed)
            fn = eng._decode_batch_cache[fn_key]
            best = 1e9
            for rep in range(REPS):
                padded = rng.integers(
                    0, 2016, (B, c.num_codebooks, bucket)).astype(np.int32)
                x = jax.device_put(jnp.asarray(padded))
                jax.block_until_ready(x)
                t0 = time.perf_counter()
                audio = fn(eng.weights, x)
                np.asarray(audio[0, :8])      # force completion, tiny D2H
                best = min(best, time.perf_counter() - t0)
            times[bucket] = best
        d_frames = BUCKETS[1] - BUCKETS[0]
        per_frame = (times[BUCKETS[1]] - times[BUCKETS[0]]) / d_frames
        per_slot = per_frame / B * 1e6
        print(f"B={B:3d}: T{BUCKETS[0]}={times[BUCKETS[0]]*1e3:7.1f}ms "
              f"T{BUCKETS[1]}={times[BUCKETS[1]]*1e3:7.1f}ms  "
              f"slope {per_frame*1e6:8.1f} us/frame-batch = "
              f"{per_slot:7.2f} us/frame/slot", flush=True)


if __name__ == "__main__":
    main()
