#!/usr/bin/env python3
"""Compile-time attribution INSIDE synthesize_audio_fused (VERDICT r4 item 4).

The round-2 table (scripts/profile_compile.py) pinned the whale: the
one-dispatch synthesize_audio_fused program costs ~135 s cold. This script
splits that cost: with a FRESH compilation cache each, times

  1. the decode program alone (prepare + jitted while_loop over the fused
     frame kernel, NO codec) — isolates the Mosaic frame-kernel compile,
  2. the codec decode alone at the same frame count — isolates the codec
     stage kernels' compiles,
  3. codec with use_pallas=False (pure XLA codec) as a reference arm,
  4. the full fused program (should ~= 1 + 2 + XLA-link overhead).

Each arm runs in a SUBPROCESS with its own cache dir so arms cannot warm each
other (in-process Mosaic kernel caches would).

Usage: python scripts/opt_compile_attrib.py [arm ...]
  arms: decode codec codec_xla fused   (default: all)
"""

import os
import subprocess
import sys
import tempfile
import time

ARMS = ("decode", "codec", "codec_xla", "fused")

INNER = r"""
import dataclasses, os, sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from magpie_tts_tpu.config import CodecConfig, MagpieConfig
from magpie_tts_tpu.io.codec_weights import random_codec_weights
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights

arm = os.environ["ATTRIB_ARM"]
N_FRAMES = int(os.environ.get("ATTRIB_FRAMES", "32"))
dtype = jnp.bfloat16

config = dataclasses.replace(MagpieConfig(), max_dec_steps=N_FRAMES,
                             min_generated_frames=N_FRAMES)
weights = random_magpie_weights(config, seed=0).astype(dtype)
tokens = list(np.random.default_rng(0).integers(2, 90, size=30))
tokens = [config.text_bos_id] + tokens + [config.text_eos_id]

t0 = time.perf_counter()
if arm == "decode":
    from magpie_tts_tpu.runtime.engine import MagpieEngine

    engine = MagpieEngine(weights, config, compute_dtype=dtype)
    r = engine.synthesize_codes(tokens, temperature=0.7, top_k=80, seed=0)
    jax.block_until_ready(r.codes)
elif arm in ("codec", "codec_xla"):
    from magpie_tts_tpu.models import codec as codec_mod

    cw = random_codec_weights(CodecConfig(), seed=1).astype(dtype)
    codes = jnp.asarray(
        np.random.default_rng(0).integers(0, 2016, size=(8, N_FRAMES)),
        jnp.int32)
    fn = jax.jit(lambda w, c: codec_mod.codec_decode(
        c, w, CodecConfig(), use_pallas=(arm == "codec")))
    jax.block_until_ready(fn(cw, codes))
elif arm == "fused":
    from magpie_tts_tpu.runtime.engine import (CodecEngine, MagpieEngine,
                                               synthesize_audio_fused)

    engine = MagpieEngine(weights, config, compute_dtype=dtype)
    codec = CodecEngine(random_codec_weights(CodecConfig(), seed=1),
                        CodecConfig(), compute_dtype=dtype)
    audio, nf = synthesize_audio_fused(engine, codec, tokens,
                                       temperature=0.7, top_k=80, seed=0)
print(f"ATTRIB {arm}: compile+first-run "
      f"{time.perf_counter() - t0:.1f} s", flush=True)
"""


def main():
    arms = sys.argv[1:] or list(ARMS)
    for arm in arms:
        env = dict(os.environ)
        env["ATTRIB_ARM"] = arm
        env["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix=f"attrib_{arm}_")
        env["MAGPIE_COMPILATION_CACHE"] = env["JAX_COMPILATION_CACHE_DIR"]
        env["PYTHONUNBUFFERED"] = "1"
        t0 = time.time()
        proc = subprocess.run([sys.executable, "-c", INNER], env=env,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))) or ".")
        print(f"[arm {arm}: rc={proc.returncode}, "
              f"wall {time.time() - t0:.1f} s incl. process start]",
              flush=True)


if __name__ == "__main__":
    main()
