#!/usr/bin/env python3
"""Slope-based kernel timing: the ONLY trustworthy per-iter probe here.

The axon tunnel (a) memoizes repeated executions with byte-identical inputs
(sub-dispatch "0.3us/iter" readings are replays) and (b) adds ~25-35ms of
dispatch latency per execution (flat "~350us/iter" readings at ITERS=100 are
just RTT/100). Neither a single chained loop nor min-of-reps fixes this.

Methodology here:
  - every timed execution gets a DIFFERENT input (init varies per rep), so
    the tunnel can never replay;
  - each variant is compiled at two iteration counts (N_LO, N_HI); the
    per-iteration cost is the SLOPE (T_hi - T_lo) / (N_HI - N_LO), which
    cancels dispatch latency and any fixed per-execution overhead.

Usage: python scripts/opt_slope_probe.py [probe ...]
  probes: minimal constblk dec lt fused split
"""

import functools
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magpie_tts_tpu.config import MagpieConfig
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.ops import sampling
from magpie_tts_tpu.runtime.platform import enable_compilation_cache

# Only compile time is cached — the timed quantity is execution (slope), so
# the persistent cache cannot affect measurements, only probe turnaround.
enable_compilation_cache()

N_LO, N_HI = 50, 450
REPS = 5
B = int(os.environ.get("MAGPIE_PROBE_B", "32"))   # slots; must be % MAGPIE_GB
DT = jnp.bfloat16


def slope(label, make_run, init_fn, *args):
    """make_run(n_iters) -> jitted fn(init, *args); init_fn(rep) -> fresh init."""
    times = {}
    for n in (N_LO, N_HI):
        fn = make_run(n)
        jax.block_until_ready(fn(init_fn(1000), *args))   # compile
        best = 1e9
        for rep in range(REPS):
            x = init_fn(rep)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x, *args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e6
    print(f"{label:46s} {per:8.1f} us/iter   "
          f"(T{N_LO}={times[N_LO]*1e3:6.1f}ms T{N_HI}={times[N_HI]*1e3:6.1f}ms)",
          flush=True)
    return per


def probe_minimal():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.asarray(pl.program_id(0), DT)

    cs = pl.BlockSpec((B, 768), lambda i: (0, 0))

    def make_run(n):
        def run(init):
            def body(i, h):
                return pl.pallas_call(
                    kernel, grid=(8,),
                    out_shape=jax.ShapeDtypeStruct((B, 768), DT),
                    in_specs=[cs], out_specs=cs)(h + jnp.asarray(i, DT) * 0)
            return jax.lax.fori_loop(0, n, body, init)
        return jax.jit(run)

    slope("minimal copy kernel grid=(8,)", make_run,
          lambda rep: jnp.full((B, 768), rep * 1e-3, DT))


def probe_constblk():
    WSHAPES = [(768, 256), (8, 256), (16, 256), (8, 256), (256, 768),
               (256, 256), (8, 256), (256, 1024), (1024, 256), (8, 2048)]
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(0, 0.1, s), DT) for s in WSHAPES]
    const = lambda *blk: pl.BlockSpec(blk, lambda i: tuple(0 for _ in blk))

    def kernel(*refs):
        x_ref, o_ref = refs[0], refs[-1]
        o_ref[...] = x_ref[...] + jnp.asarray(pl.program_id(0), DT)

    def make_run(n):
        def run(init):
            def body(i, h):
                return pl.pallas_call(
                    kernel, grid=(8,),
                    out_shape=jax.ShapeDtypeStruct((B, 768), DT),
                    in_specs=[const(B, 768)] + [const(*s) for s in WSHAPES],
                    out_specs=const(B, 768))(h + jnp.asarray(i, DT) * 0, *ws)
            return jax.lax.fori_loop(0, n, body, init)
        return jax.jit(run)

    slope("+10 const blocks (2.4MB) grid=(8,)", make_run,
          lambda rep: jnp.full((B, 768), rep * 1e-3, DT))


def _setup(c):
    rng = np.random.default_rng(0)
    w = jax.device_put(random_magpie_weights(c, seed=0).astype(DT))
    E, S, D, L = 64, c.max_seq, c.d_model, c.dec_layers
    data = dict(
        xa_k=jnp.asarray(rng.normal(0, 0.3, (B, L, E, c.d_xa)), DT),
        xa_v=jnp.asarray(rng.normal(0, 0.3, (B, L, E, c.d_xa)), DT),
        k_cache=jnp.asarray(rng.normal(0, 0.3, (B, L, S, D)), DT),
        v_cache=jnp.asarray(rng.normal(0, 0.3, (B, L, S, D)), DT),
        enc_lens=jnp.full((B,), 50, jnp.int32),
    )
    return w, data


def probe_dec(pos_off=40):
    c = MagpieConfig()
    w, d = _setup(c)
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)
    pos = jnp.int32(c.context_frames + pos_off)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)

    def make_run(n):
        def run(init, kc, vc):
            def body(i, carry):
                h, kc, vc = carry
                h2, kc, vc = decode_step_batched_pallas(
                    h, pos, valid, d["xa_k"], d["xa_v"], kc, vc, w, c,
                    d["enc_lens"])
                return (h2.astype(DT), kc, vc)
            return jax.lax.fori_loop(0, n, body, (init, kc, vc))[0]
        return jax.jit(run)

    slope(f"decoder kernel (pos_off={pos_off})", make_run,
          lambda rep: jnp.full((B, c.d_model), 0.5 + rep * 1e-3, DT),
          d["k_cache"], d["v_cache"])


def probe_lt():
    c = MagpieConfig()
    w, _ = _setup(c)
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)
    temp = jnp.float32(0.7)
    forbid = jnp.zeros((B,), bool)

    def make_run(n):
        def run(init):
            def body(i, h):
                seeds = (jnp.full((B,), i, jnp.int32)
                         + jnp.arange(B, dtype=jnp.int32))
                s, a = sample_frame_codes_batched_pallas(
                    h, w, c, seeds, temp, 80, forbid)
                return h + (s.astype(DT) @ jnp.zeros((8, c.d_model), DT)) * 0
            return jax.lax.fori_loop(0, n, body, init)
        return jax.jit(run)

    slope("LT sampler kernel", make_run,
          lambda rep: jnp.full((B, c.d_model), 0.5 + rep * 1e-3, DT))


def probe_fused(pos_off=40):
    c = MagpieConfig()
    w, d = _setup(c)
    from magpie_tts_tpu.ops.pallas_kernels.frame_step_batched import (
        frame_step_batched_pallas)
    pos = jnp.int32(c.context_frames + pos_off)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)
    posemb = jnp.broadcast_to(
        w.decoder.pos_emb[pos][None, :].astype(DT), (B, c.d_model))
    probe_temp = float(os.environ.get("MAGPIE_PROBE_TEMP", "0.7"))
    temp = jnp.float32(probe_temp)
    forbid = jnp.zeros((B,), bool)
    maycont = jnp.ones((B,), bool)

    def make_run(n):
        def run(init, kc, vc):
            def body(i, carry):
                h, kc, vc = carry
                seeds = (jnp.full((B,), i, jnp.int32)
                         + jnp.arange(B, dtype=jnp.int32))
                s, a, h2, kc, vc = frame_step_batched_pallas(
                    h, pos, valid, maycont, posemb, d["xa_k"], d["xa_v"],
                    kc, vc, w, c, d["enc_lens"], seeds, temp, 80, forbid)
                return (h2.astype(DT), kc, vc)
            return jax.lax.fori_loop(0, n, body, (init, kc, vc))[0]
        return jax.jit(run)

    slope(f"fused frame kernel (pos_off={pos_off}, temp={probe_temp})",
          make_run,
          lambda rep: jnp.full((B, c.d_model), 0.5 + rep * 1e-3, DT),
          d["k_cache"], d["v_cache"])


def probe_split(pos_off=40):
    c = MagpieConfig()
    w, d = _setup(c)
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)
    pos = jnp.int32(c.context_frames + pos_off)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)
    temp = jnp.float32(0.7)
    forbid = jnp.zeros((B,), bool)

    def make_run(n):
        def run(init, kc, vc):
            def body(i, carry):
                h, kc, vc = carry
                seeds = (jnp.full((B,), i, jnp.int32)
                         + jnp.arange(B, dtype=jnp.int32))
                s, a = sample_frame_codes_batched_pallas(
                    h, w, c, seeds, temp, 80, forbid)
                emb = magpie_mod.audio_frame_embedding(s, w, c).astype(DT)
                x_pe = emb + w.decoder.pos_emb[pos][None, :].astype(DT)
                h2, kc, vc = decode_step_batched_pallas(
                    x_pe, pos, valid, d["xa_k"], d["xa_v"], kc, vc, w, c,
                    d["enc_lens"])
                return (h2.astype(DT), kc, vc)
            return jax.lax.fori_loop(0, n, body, (init, kc, vc))[0]
        return jax.jit(run)

    slope(f"split kernels + glue (pos_off={pos_off})", make_run,
          lambda rep: jnp.full((B, c.d_model), 0.5 + rep * 1e-3, DT),
          d["k_cache"], d["v_cache"])


def probe_anatomy(pos_off=40):
    """Cumulative trace-time ablation of the fused batched frame kernel,
    each variant timed with the slope method. OUTPUTS ARE WRONG under
    ablation — timing only."""
    from magpie_tts_tpu.ops.pallas_kernels import frame_step_batched as fsb

    c = MagpieConfig()
    w, d = _setup(c)
    pos = jnp.int32(c.context_frames + pos_off)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)
    posemb = jnp.broadcast_to(
        w.decoder.pos_emb[pos][None, :].astype(DT), (B, c.d_model))
    temp = jnp.float32(0.7)
    forbid = jnp.zeros((B,), bool)
    maycont = jnp.ones((B,), bool)

    variants = [
        ("full", ""),
        ("-lt", "nolt"),
        ("-xa too", "nolt,noxa"),
        ("-attend too", "nolt,noxa,noattend"),
        ("-weights too", "nolt,noxa,noattend,noweights"),
        ("-cache too (shell)", "nolt,noxa,noattend,noweights,nocache"),
    ]
    for label, ablate in variants:
        fsb._ABLATE = ablate

        def make_run(n):
            def run(init, kc, vc):
                def body(i, carry):
                    h, kc, vc = carry
                    seeds = (jnp.full((B,), i, jnp.int32)
                             + jnp.arange(B, dtype=jnp.int32))
                    s, a, h2, kc, vc = fsb.frame_step_batched_pallas(
                        h, pos, valid, maycont, posemb, d["xa_k"], d["xa_v"],
                        kc, vc, w, c, d["enc_lens"], seeds, temp, 80, forbid)
                    return (h2.astype(DT), kc, vc)
                return jax.lax.fori_loop(0, n, body, (init, kc, vc))[0]
            return jax.jit(run)

        slope(f"fused {label} (pos_off={pos_off})", make_run,
              lambda rep: jnp.full((B, c.d_model), 0.5 + rep * 1e-3, DT),
              d["k_cache"], d["v_cache"])
    fsb._ABLATE = ""


def probe_lockstep():
    """Product-level lockstep batched loop (models.magpie), pallas-fused vs
    pure-XLA step, slope over max_steps: the honest per-frame cost of each
    path INCLUDING all loop glue. Grounds the tp-vs-dp serving decision
    (under tp>1 meshes the XLA path runs; see parallel/serving.py)."""
    from magpie_tts_tpu.models import magpie as magpie_mod

    c = MagpieConfig()
    w, _ = _setup(c)
    T = 64
    toks = np.full((B, T), 2, np.int32)
    toks[:, 0] = c.text_bos_id
    toks[:, -1] = c.text_eos_id
    tokens = jnp.asarray(toks)
    enc_lens = jnp.full((B,), T, jnp.int32)
    spk = jnp.zeros((B,), jnp.int32)
    temp = jnp.float32(0.7)

    # Weights are threaded as a jit ARGUMENT: closed-over arrays are inlined
    # as HLO literals, and the pure-XLA program's serialized compile request
    # then exceeds the tunnel's body limit (HTTP 413).
    for label, use_pallas in [("pallas fused", True), ("pure XLA", False)]:
        def make_run(n, use_pallas=use_pallas):
            def run(keys, weights):
                codes, nf = magpie_mod.synthesize_codes_batched_program(
                    tokens, enc_lens, spk, keys, temp, weights, c, top_k=80,
                    max_steps=n, use_pallas_decoder=use_pallas)
                return nf
            return jax.jit(run)

        slope(f"lockstep loop [{label}]", make_run,
              lambda rep: jax.random.split(
                  jax.random.PRNGKey(rep), B), w)

    import os
    os.environ["MAGPIE_NO_FUSED"] = "1"
    try:
        def make_run(n):
            def run(keys, weights):
                codes, nf = magpie_mod.synthesize_codes_batched_program(
                    tokens, enc_lens, spk, keys, temp, weights, c, top_k=80,
                    max_steps=n, use_pallas_decoder=True)
                return nf
            return jax.jit(run)
        slope("lockstep loop [split kernels]", make_run,
              lambda rep: jax.random.split(jax.random.PRNGKey(rep), B), w)
    finally:
        del os.environ["MAGPIE_NO_FUSED"]


def probe_single(pos_off=40):
    """Single-stream fused frame kernel (frame_step.py) — the honest
    us/frame for VERDICT r2 item 4 (single-stream floor)."""
    c = MagpieConfig()
    rng = np.random.default_rng(0)
    w = jax.device_put(random_magpie_weights(c, seed=0).astype(DT))
    E, S, D, L = 64, c.max_seq, c.d_model, c.dec_layers
    from magpie_tts_tpu.ops.pallas_kernels.frame_step import frame_step_pallas
    xa_k = jnp.asarray(rng.normal(0, 0.3, (L, E, c.d_xa)), DT)
    xa_v = jnp.asarray(rng.normal(0, 0.3, (L, E, c.d_xa)), DT)
    kc0 = jnp.asarray(rng.normal(0, 0.3, (L, S, D)), DT)
    vc0 = jnp.asarray(rng.normal(0, 0.3, (L, S, D)), DT)
    pos = jnp.int32(c.context_frames + pos_off)
    temp = jnp.float32(0.7)
    forbid = jnp.bool_(False)

    def make_run(n):
        def run(init, kc, vc):
            def body(i, carry):
                h, kc, vc = carry
                s, a, h2, kc, vc = frame_step_pallas(
                    h, pos, xa_k, xa_v, kc, vc, w, c,
                    i.astype(jnp.int32), temp, 80, forbid,
                    enc_length=jnp.int32(50))
                return (h2.astype(DT), kc, vc)
            return jax.lax.fori_loop(0, n, body, (init, kc, vc))[0]
        return jax.jit(run)

    slope(f"single-stream frame kernel (pos_off={pos_off})", make_run,
          lambda rep: jnp.full((c.d_model,), 0.5 + rep * 1e-3, DT),
          kc0, vc0)


def probe_q8():
    """Weight-stream A/B for the fused kernels: dense bf16 vs int8-column vs
    q8-native blocks, single-stream and B=32, pos 150/450 (pos is a traced
    argument so each variant compiles once). The measured table lives in
    docs/KERNELS.md "Quantized weight streaming"."""
    from magpie_tts_tpu.io.magpie_weights import (q8_stream_from_arrays,
                                                  quantize_decoder_stream)
    from magpie_tts_tpu.ops.pallas_kernels.frame_step import frame_step_pallas
    from magpie_tts_tpu.ops.pallas_kernels.frame_step_batched import (
        frame_step_batched_pallas)

    c = MagpieConfig()
    rng = np.random.default_rng(0)
    w = jax.device_put(random_magpie_weights(c, seed=0).astype(DT))
    int8 = jax.device_put(quantize_decoder_stream(w.decoder))
    q8 = jax.device_put(q8_stream_from_arrays(w.decoder))
    E, S, D, L = 64, c.max_seq, c.d_model, c.dec_layers
    temp = jnp.float32(0.7)
    streams = [("dense", None), ("int8-col", int8), ("q8-native", q8)]

    # ---- single-stream ----
    xa_k = jnp.asarray(rng.normal(0, 0.3, (L, E, c.d_xa)), DT)
    xa_v = jnp.asarray(rng.normal(0, 0.3, (L, E, c.d_xa)), DT)
    kc0 = jnp.asarray(rng.normal(0, 0.3, (L, S, D)), DT)
    vc0 = jnp.asarray(rng.normal(0, 0.3, (L, S, D)), DT)
    for label, stream in streams:
        def make_run(n, stream=stream):
            def run(init, pos, kc, vc):
                def body(i, carry):
                    h, kc, vc = carry
                    s, a, h2, kc, vc = frame_step_pallas(
                        h, pos, xa_k, xa_v, kc, vc, w, c,
                        i.astype(jnp.int32), temp, 80, jnp.bool_(False),
                        enc_length=jnp.int32(50), int8_stream=stream)
                    return (h2.astype(DT), kc, vc)
                return jax.lax.fori_loop(0, n, body, (init, kc, vc))[0]
            return jax.jit(run)

        for pos_off in (40, 340):
            slope(f"single [{label}] (pos_off={pos_off})", make_run,
                  lambda rep: jnp.full((c.d_model,), 0.5 + rep * 1e-3, DT),
                  jnp.int32(c.context_frames + pos_off), kc0, vc0)

    # ---- batched B=32 ----
    _, d = _setup(c)
    posemb0 = w.decoder.pos_emb[0][None, :].astype(DT)
    posemb = jnp.broadcast_to(posemb0, (B, c.d_model))
    maycont = jnp.ones((B,), bool)
    forbid = jnp.zeros((B,), bool)
    for label, stream in streams:
        def make_run(n, stream=stream):
            def run(init, pos, kc, vc):
                valid = ((jnp.arange(c.max_seq)[None, :] <= pos)
                         & jnp.ones((B, 1), bool))
                def body(i, carry):
                    h, kc, vc = carry
                    seeds = (jnp.full((B,), i, jnp.int32)
                             + jnp.arange(B, dtype=jnp.int32))
                    s, a, h2, kc, vc = frame_step_batched_pallas(
                        h, pos, valid, maycont, posemb, d["xa_k"], d["xa_v"],
                        kc, vc, w, c, d["enc_lens"], seeds, temp, 80, forbid,
                        int8_stream=stream)
                    return (h2.astype(DT), kc, vc)
                return jax.lax.fori_loop(0, n, body, (init, kc, vc))[0]
            return jax.jit(run)

        for pos_off in (40, 340):
            slope(f"batched B={B} [{label}] (pos_off={pos_off})", make_run,
                  lambda rep: jnp.full((B, c.d_model), 0.5 + rep * 1e-3, DT),
                  jnp.int32(c.context_frames + pos_off),
                  d["k_cache"], d["v_cache"])


PROBES = {"minimal": probe_minimal, "constblk": probe_constblk,
          "dec": probe_dec, "lt": probe_lt, "fused": probe_fused,
          "split": probe_split, "anatomy": probe_anatomy,
          "lockstep": probe_lockstep, "single": probe_single,
          "q8": probe_q8}


def main():
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    names = sys.argv[1:] or ["minimal", "constblk", "lt", "fused"]
    for nm in names:
        if ":" in nm:   # e.g. fused:340 -> probe_fused(pos_off=340)
            nm, arg = nm.split(":", 1)
            PROBES[nm](int(arg))
        else:
            PROBES[nm]()


if __name__ == "__main__":
    main()
