#!/usr/bin/env python3
"""Per-stage codec decode timing on the current device.

Times (via the slope method: two T values, per-frame cost = slope) each
pipeline piece of codec_decode_latent separately: pre-conv, then per stage
(half_snake+convT, res_layer), then post-conv+tanh. Inputs are varied per
timed call so the axon tunnel cannot memoize.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from magpie_tts_tpu.config import CodecConfig
from magpie_tts_tpu.io.codec_weights import random_codec_weights
from magpie_tts_tpu.models import codec as cm


def time_fn(fn, make_arg, reps=4):
    out = fn(make_arg(0))
    jax.block_until_ready(out)
    best = 1e9
    for rep in range(reps):
        a = make_arg(rep + 1)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    T1 = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    T2 = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    use_pallas = "--xla" not in sys.argv
    dtype = jnp.bfloat16
    cfg = CodecConfig()
    cw = random_codec_weights(cfg, seed=1)
    cw = jax.tree.map(lambda a: a.astype(dtype)
                      if a.dtype == jnp.float32 else a, cw)

    print(f"device={jax.devices()[0].device_kind} T={T1}/{T2} "
          f"pallas={use_pallas}", file=sys.stderr)

    # Stage boundaries: latent [1, T, 32] -> pre [1, T, 864]
    # stage i consumes [1, T*prod(strides[:i]), ch_in] -> [.., *stride, ch_out]
    strides = list(cfg.up_sample_rates)
    chans = [864, 432, 216, 108, 54, 27]

    rows = []

    def bench(label, fn, shape_of):
        # slope timing: same jitted fn at T1 and T2 rows; per-frame = slope.
        f = jax.jit(fn)

        def run(T):
            def mk(seed):
                r = np.random.default_rng(seed)
                return jnp.asarray(r.standard_normal(shape_of(T)) * 0.1, dtype)
            return time_fn(f, mk)

        ta, tb = run(T1), run(T2)
        us = (tb - ta) * 1e6 / (T2 - T1)
        rows.append((label, us))
        print(f"{label:28s}: {us:7.1f} us/frame  "
              f"(t({T1})={ta*1e3:.1f}ms t({T2})={tb*1e3:.1f}ms)",
              file=sys.stderr)

    bench("pre-conv 32->864 k7",
          lambda x: cm._snake_conv(x, cw.pre_conv_w, cw.pre_conv_b, None, 1,
                                   cfg.leaky_slope, use_pallas),
          lambda T: (1, T, 32))

    up = 1
    for i, (stage, stride) in enumerate(zip(cw.stages, strides)):
        c_in, c_out = chans[i], chans[i + 1]
        bench(f"s{i} snake+convT {c_in}->{c_out} x{stride}",
              lambda x, stage=stage, stride=stride: cm.grouped_conv_transpose1d(
                  cm.half_snake(x, stage.act_alpha, cfg.leaky_slope),
                  stage.convt_w, stage.convt_b, stride),
              lambda T, up=up: (1, T * up, c_in))
        up *= stride
        bench(f"s{i} res_layer C={c_out} x{up}",
              lambda x, stage=stage: cm.res_layer(
                  x, stage.resblocks, cfg.resblock_dilations,
                  cfg.leaky_slope, use_pallas),
              lambda T, up=up: (1, T * up, c_out))

    bench("post-conv+tanh 27->1 k3",
          lambda x: jnp.tanh(cm._snake_conv(
              x, cw.post_conv_w, cw.post_conv_b, cw.post_alpha, 1,
              cfg.leaky_slope, use_pallas)),
          lambda T, up=up: (1, T * up, 27))

    total = sum(r[1] for r in rows)
    print(f"{'TOTAL (sum of slopes)':28s}: {total:7.1f} us/frame",
          file=sys.stderr)


if __name__ == "__main__":
    main()
