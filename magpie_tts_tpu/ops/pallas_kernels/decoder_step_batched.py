"""Batched decoder step: all 12 layers for B slots in one Pallas kernel.

The XLA batched step costs 1.6ms (B=8) / 6.0ms (B=32) per frame on v5e while
its memory floor (weights once + per-slot KV cache blocks) is ~0.23/0.93ms.
This kernel runs grid=(L,) like the single-stream megakernel
(decoder_step.py), with:

- weight streams shared across the batch (one-phase-ahead prefetch);
- the KV cache [B, L, S, D] streamed per layer in GROUPS of <= 8 slots
  (a full 32-slot cache block would not fit VMEM), double-buffered so group
  g+1's DMA overlaps group g's attention;
- attention flattened to [Gb*S, d_model] so the per-head score/context
  contractions stay single large MXU matmuls (segment-matrix trick, no head
  reshapes), with per-slot softmax via a [Gb, S, H] reshape;
- a SHARED scalar write row for the new K/V of every slot. Lockstep serving
  passes row == pos; the continuous-batching ring cache passes its global
  ring pointer. Per-slot attention membership comes from a [B, S] validity
  mask input, so the same kernel serves both engines;
- optional per-column int8 weight streaming (Int8DecoderStream), as in the
  single-stream kernel;
- VALID-LENGTH-AWARE cache streaming: when every slot's last valid cache row
  sits below a static half-point (320 of 626 rows — true for the first ~200
  generated frames of every utterance), only that prefix is DMAed and
  attended over, halving both the HBM traffic (the kernel's floor) and the
  per-slot attention compute. The variant is picked by one runtime scalar
  derived from the validity mask, so ring caches degrade gracefully to the
  full path.

Position embeddings are added by the CALLER (they are per-slot logical
positions, a trivial XLA gather).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dot_hi, gelu_kernel

_NEG = -1e30


def _ln(x, w, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return (c / jnp.sqrt(var + eps)) * w.astype(jnp.float32)


def _kernel(x_in_ref, norms_ref, final_norm_ref, xa_q_ref, xa_out_ref,
            xa_k_ref, xa_v_ref, valid_ref, enc_len_ref, scal_ref,
            qkv_s_ref, sao_s_ref, ffp_s_ref, ffo_s_ref,
            qkv_hbm, sao_hbm, ffp_hbm, ffo_hbm, kc_hbm, vc_hbm,
            hidden_ref, kc_out, vc_out,
            x_ref, attn_ref, qkv_sc, sao_buf, ffp_buf, ffo_buf,
            kbufs, vbufs, sems, *,
            n_layers: int, n_batch: int, gb: int, d_model: int, n_heads: int,
            d_xa: int, max_seq: int, enc_pad: int, eps: float, s_half: int,
            gelu_tanh: bool = False, q8_blocks: bool = False):
    l = pl.program_id(0)
    pos = scal_ref[0]
    d_head = d_model // n_heads
    wdt = x_in_ref.dtype
    n_groups = n_batch // gb

    def stream_w(buf_ref, s_ref):
        # Q8_0-native: s (f16-valued f32, one per 32 input rows) x int8 q is
        # EXACT in f32 -> tile bit-identical to load-time dequant (see
        # frame_step.py / io.magpie_weights.Q8DecoderStream).
        if not q8_blocks:
            return buf_ref[...].astype(wdt)
        s = jnp.repeat(s_ref[0].astype(jnp.float32), 32, axis=0)
        return (s * buf_ref[...].astype(jnp.float32)).astype(wdt)

    def out_scale(v, s_ref):
        if q8_blocks:  # scales already consumed by stream_w
            return v
        return v * s_ref[0].astype(jnp.float32)
    S = max_seq
    cascade = 0 < s_half < S
    variants = (s_half, S) if cascade else (S,)

    def in_variant(rows):
        if not cascade:
            return None
        half = scal_ref[1] > 0
        return half if rows == s_half else ~half

    def when_variant(rows):
        cond = in_variant(rows)
        if cond is None:
            return lambda f: f()  # single variant: run unconditionally
        return pl.when(cond)

    def dma(src, dst, sem_idx):
        return pltpu.make_async_copy(src, dst, sems.at[sem_idx])

    def cache_dma(g, buf_idx, sem_base, rows, layer):
        lo = g * gb
        if rows == S:
            return (dma(kc_hbm.at[pl.ds(lo, gb), layer], kbufs.at[buf_idx],
                        sem_base),
                    dma(vc_hbm.at[pl.ds(lo, gb), layer], vbufs.at[buf_idx],
                        sem_base + 1))
        return (dma(kc_hbm.at[pl.ds(lo, gb), layer, pl.ds(0, rows)],
                    kbufs.at[buf_idx, :, pl.ds(0, rows)], sem_base),
                dma(vc_hbm.at[pl.ds(lo, gb), layer, pl.ds(0, rows)],
                    vbufs.at[buf_idx, :, pl.ds(0, rows)], sem_base + 1))

    def cache_start(g, buf_idx, sem_base, layer=None):
        for rows in variants:
            @when_variant(rows)
            def _start():
                for c in cache_dma(g, buf_idx, sem_base, rows,
                                   l if layer is None else layer):
                    c.start()

    def cache_wait(g, buf_idx, sem_base):
        for rows in variants:
            @when_variant(rows)
            def _wait():
                for c in cache_dma(g, buf_idx, sem_base, rows, l):
                    c.wait()

    @pl.when(l == 0)
    def _prologue():
        x_ref[...] = x_in_ref[...].astype(jnp.float32)
        dma(qkv_hbm.at[0], qkv_sc, 0).start()
        dma(sao_hbm.at[0], sao_buf, 3).start()
        dma(ffp_hbm.at[0], ffp_buf, 6).start()
        dma(ffo_hbm.at[0], ffo_buf, 7).start()
        cache_start(0, 0, 8)

    x = x_ref[...]  # [B, D] f32

    # ---- self-attention ----
    h = _ln(x, norms_ref[0, 0], eps).astype(wdt)
    dma(qkv_hbm.at[l], qkv_sc, 0).wait()
    qkv = dot_hi(h, stream_w(qkv_sc, qkv_s_ref))                # [B, 3D]
    qkv = out_scale(qkv, qkv_s_ref).astype(wdt)

    @pl.when(l < n_layers - 1)
    def _prefetch_qkv():
        dma(qkv_hbm.at[l + 1], qkv_sc, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 0)
    seg_t = (lane // d_head == head).astype(jnp.float32)        # [H, D]
    inv_sqrt = 1.0 / jnp.sqrt(jnp.float32(d_head))
    wrows = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)

    base = (pos // 16) * 16
    for g in range(n_groups):
        buf = g % 2
        lo = g * gb
        if g + 1 < n_groups:
            cache_start(g + 1, (g + 1) % 2, 8 + 2 * ((g + 1) % 2))
        cache_wait(g, buf, 8 + 2 * buf)

        k_new = qkv[lo:lo + gb, d_model:2 * d_model].astype(kbufs.dtype)
        v_new = qkv[lo:lo + gb, 2 * d_model:].astype(vbufs.dtype)
        kbufs[buf, :, pl.ds(base, 16), :] = jnp.where(
            wrows + base == pos, k_new[:, None, :],
            kbufs[buf, :, pl.ds(base, 16), :])
        vbufs[buf, :, pl.ds(base, 16), :] = jnp.where(
            wrows + base == pos, v_new[:, None, :],
            vbufs[buf, :, pl.ds(base, 16), :])
        dma(kbufs.at[buf, :, pl.ds(base, 16)],
            kc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)], 12).start()
        dma(vbufs.at[buf, :, pl.ds(base, 16)],
            vc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)], 13).start()

        # Per-slot attention in the TRANSPOSED (head-major) orientation:
        # scoresT[H, rows] = (q (.) segT) . K contracted on the model dim, so
        # the score matmul is M=H(pad 8)xN=rows instead of M=rowsxN=H(pad 128)
        # — ~2x less slot-attend time measured (scripts/opt_attend_probe.py:
        # 922->527 ns/slot at 320 rows, 1784->725 at 640, bf16), and the
        # per-slot q transpose relayout disappears. The big per-slot
        # elementwise ops stay algebraically removed (seg is 0/1):
        #   (q (.) segT) . K       ==  per-head scores       -- [H,D] mul
        #   ones_H @ ((pT V) (.) segT)  ==  head-concat of p@V
        # Only the DMAed row prefix is touched, so the half variant also
        # halves the score/weight compute.
        # Operands stay in the cache dtype: for bf16 caches the products are
        # exact in the f32 MXU accumulator, so single-pass bf16 dots are
        # BIT-IDENTICAL to the 6-pass f32-HIGHEST dots of f32-upcast
        # operands — at ~6x less MXU time. (f32 caches keep HIGHEST via
        # dot_hi's dtype dispatch.)
        for rows in variants:
            @when_variant(rows)
            def _attend(rows=rows):
                ones_h = jnp.ones((1, n_heads), jnp.float32)
                cdt = kbufs.dtype
                hi = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None
                for b in range(gb):
                    q_b = qkv[lo + b: lo + b + 1, :d_model].astype(jnp.float32)
                    kb = kbufs[buf, b, pl.ds(0, rows)]
                    qh = (q_b * seg_t).astype(cdt)              # [H, D] exact
                    scores = jax.lax.dot_general(
                        qh, kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=hi)
                    scores = scores * inv_sqrt                  # [H, rows]
                    vmask = valid_ref[lo + b: lo + b + 1,
                                      pl.ds(0, rows)] > 0       # [1, rows]
                    scores = jnp.where(vmask, scores, _NEG)
                    m = jnp.max(scores, axis=1, keepdims=True)
                    p = jnp.exp(scores - m)
                    probs = p / jnp.sum(p, axis=1, keepdims=True)
                    probs_w = probs.astype(wdt).astype(cdt)     # round like XLA
                    vb = vbufs[buf, b, pl.ds(0, rows)]
                    pv = jnp.dot(probs_w, vb,
                                 preferred_element_type=jnp.float32,
                                 precision=hi)                  # [H, D]
                    attn_ref[lo + b: lo + b + 1, :] = dot_hi(
                        ones_h, pv * seg_t)

        dma(kbufs.at[buf, :, pl.ds(base, 16)],
            kc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)], 12).wait()
        dma(vbufs.at[buf, :, pl.ds(base, 16)],
            vc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)], 13).wait()

    dma(sao_hbm.at[l], sao_buf, 3).wait()
    x = x + out_scale(dot_hi(attn_ref[...].astype(wdt),
                              stream_w(sao_buf, sao_s_ref)), sao_s_ref)

    @pl.when(l < n_layers - 1)
    def _prefetch_sao():
        dma(sao_hbm.at[l + 1], sao_buf, 3).start()

    @pl.when(l < n_layers - 1)
    def _prefetch_cache0():
        cache_start(0, 0, 8, layer=l + 1)

    # ---- cross-attention (1 head, per-slot K/V, full batch at once) ----
    hq = _ln(x, norms_ref[0, 1], eps).astype(wdt)
    q2 = dot_hi(hq, xa_q_ref[0]).astype(wdt).astype(jnp.float32)  # [B, dxa]
    zx = (xa_k_ref[:, 0].astype(jnp.float32) * q2[:, None, :])  # [B, E, dxa]
    sx = jnp.sum(zx, axis=2) * (1.0 / jnp.sqrt(jnp.float32(d_xa)))  # [B, E]
    erow = jax.lax.broadcasted_iota(jnp.int32, (1, enc_pad), 1)
    sx = jnp.where(erow < enc_len_ref[...], sx, _NEG)   # [B,1] vs [1,E] -> [B,E]
    mx = jnp.max(sx, axis=1, keepdims=True)
    px = jnp.exp(sx - mx)
    px = px / jnp.sum(px, axis=1, keepdims=True)                 # [B, E]
    px_w = px.astype(wdt).astype(jnp.float32)                    # round like XLA
    wv = px_w[:, :, None] * xa_v_ref[:, 0].astype(jnp.float32)   # [B, E, dxa]
    xa = jnp.sum(wv, axis=1).astype(wdt)                         # [B, dxa]
    x = x + dot_hi(xa, xa_out_ref[0])

    # ---- FFN (pointwise) ----
    hf = _ln(x, norms_ref[0, 2], eps).astype(wdt)
    dma(ffp_hbm.at[l], ffp_buf, 6).wait()
    f = out_scale(dot_hi(hf, stream_w(ffp_buf, ffp_s_ref)), ffp_s_ref)

    @pl.when(l < n_layers - 1)
    def _prefetch_ffp():
        dma(ffp_hbm.at[l + 1], ffp_buf, 6).start()

    f = gelu_kernel(f, approximate=gelu_tanh).astype(wdt)
    dma(ffo_hbm.at[l], ffo_buf, 7).wait()
    x = x + out_scale(dot_hi(f, stream_w(ffo_buf, ffo_s_ref)), ffo_s_ref)

    @pl.when(l < n_layers - 1)
    def _prefetch_ffo():
        dma(ffo_hbm.at[l + 1], ffo_buf, 7).start()

    x_ref[...] = x

    @pl.when(l == n_layers - 1)
    def _emit():
        hidden_ref[...] = _ln(x, final_norm_ref[0], eps).astype(hidden_ref.dtype)


def decode_step_batched_pallas(
        x: jnp.ndarray, write_row: jnp.ndarray, valid: jnp.ndarray,
        xa_k: jnp.ndarray, xa_v: jnp.ndarray,
        k_cache: jnp.ndarray, v_cache: jnp.ndarray,
        weights, config, enc_lengths: jnp.ndarray,
        int8_stream=None, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched decoder step for B slots sharing one physical cache write row.

    x: [B, d_model] frame embeddings WITH position embeddings already added;
    write_row: scalar i32 cache row for every slot's new K/V;
    valid: [B, max_seq] bool attention membership (must include write_row for
    live slots; per-slot rows slice directly into the head-major attend's
    [1, rows] lane mask); caches: [B, L, max_seq, d_model] (aliased).
    Returns (hidden [B, d_model], k_cache, v_cache).
    """
    dec = weights.decoder
    c = config
    dtype = weights.text_emb.dtype
    B, L, S, D = k_cache.shape
    E = xa_k.shape[2]
    gb = min(B, 8)
    assert B % gb == 0, (B, gb)

    from ...io.magpie_weights import Q8DecoderStream

    q8_blocks = isinstance(int8_stream, Q8DecoderStream)
    if q8_blocks:
        s = int8_stream
        qkv_w, sao_w, ffp_w, ffo_w = s.qkv_q, s.sa_out_q, s.ff_proj_q, s.ff_out_q
        qkv_s, sao_s = s.qkv_bs, s.sa_out_bs
        ffp_s, ffo_s = s.ff_proj_bs, s.ff_out_bs
        stream_dtype = jnp.int8
    elif int8_stream is None:
        qkv_w, sao_w = dec.qkv.astype(dtype), dec.sa_out.astype(dtype)
        ffp_w, ffo_w = dec.ff_proj.astype(dtype), dec.ff_out.astype(dtype)
        ones = lambda n: jnp.ones((c.dec_layers, 1, n), jnp.float32)
        qkv_s, sao_s = ones(3 * D), ones(D)
        ffp_s, ffo_s = ones(c.d_ffn), ones(D)
        stream_dtype = dtype
    else:
        s = int8_stream
        qkv_w, sao_w, ffp_w, ffo_w = s.qkv_q, s.sa_out_q, s.ff_proj_q, s.ff_out_q
        qkv_s = s.qkv_s[:, None, :]
        sao_s = s.sa_out_s[:, None, :]
        ffp_s = s.ff_proj_s[:, None, :]
        ffo_s = s.ff_out_s[:, None, :]
        stream_dtype = jnp.int8

    norms = jnp.stack([dec.norm_self, dec.norm_xa_q, dec.norm_ff],
                      axis=1).astype(jnp.float32)

    # Half-prefix cache streaming: when every slot's last valid row (and the
    # write row) sits below s_half, DMA/attend only rows [0, s_half). The
    # boundary must be a 16-row multiple >= the largest usable window base.
    s_half = 320 if S >= 512 else 0
    if s_half:
        last_valid = jnp.max(
            jnp.where(valid, jnp.arange(S, dtype=jnp.int32)[None, :], -1))
        rows_needed = jnp.maximum(last_valid, write_row.astype(jnp.int32)) + 1
        half_flag = (rows_needed <= s_half).astype(jnp.int32)
    else:
        half_flag = jnp.int32(0)
    scal = jnp.stack([write_row.astype(jnp.int32), half_flag])

    kernel = functools.partial(
        _kernel, n_layers=c.dec_layers, n_batch=B, gb=gb, d_model=D,
        n_heads=c.dec_sa_heads, d_xa=c.d_xa, max_seq=S, enc_pad=E, eps=c.eps,
        s_half=s_half, gelu_tanh=c.gelu_tanh, q8_blocks=q8_blocks)

    const = lambda *blk: pl.BlockSpec(blk, lambda l: tuple(0 for _ in blk))
    per_l = lambda *blk: pl.BlockSpec(
        blk, lambda l: (l,) + tuple(0 for _ in blk[1:]))

    hidden, k_out, v_out = pl.pallas_call(
        kernel,
        grid=(c.dec_layers,),
        out_shape=(jax.ShapeDtypeStruct((B, D), dtype),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)),
        in_specs=[
            const(B, D),                                     # x_in
            per_l(1, 3, D),                                  # norms
            const(1, D),                                     # final norm
            per_l(1, D, c.d_xa),                             # xa_q
            per_l(1, c.d_xa, D),                             # xa_out
            pl.BlockSpec((B, 1, E, c.d_xa), lambda l: (0, l, 0, 0)),  # xa_k
            pl.BlockSpec((B, 1, E, c.d_xa), lambda l: (0, l, 0, 0)),  # xa_v
            const(B, S),                                     # valid (i32)
            const(B, 1),                                     # enc_lengths
            pl.BlockSpec(memory_space=pltpu.SMEM),           # scal
            per_l(1, *qkv_s.shape[1:]),           # qkv scales (cols/q8)
            per_l(1, *sao_s.shape[1:]),           # sa_out scales
            per_l(1, *ffp_s.shape[1:]),           # ff_proj scales
            per_l(1, *ffo_s.shape[1:]),           # ff_out scales
            pl.BlockSpec(memory_space=pltpu.HBM),            # qkv
            pl.BlockSpec(memory_space=pltpu.HBM),            # sao
            pl.BlockSpec(memory_space=pltpu.HBM),            # ffp
            pl.BlockSpec(memory_space=pltpu.HBM),            # ffo
            pl.BlockSpec(memory_space=pltpu.HBM),            # k cache in
            pl.BlockSpec(memory_space=pltpu.HBM),            # v cache in
        ],
        out_specs=(const(B, D),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        input_output_aliases={18: 1, 19: 2},
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),                 # x carry
            pltpu.VMEM((B, D), jnp.float32),                 # attention out
            pltpu.VMEM((D, 3 * D), stream_dtype),            # qkv weights
            pltpu.VMEM((D, D), stream_dtype),                # sa_out
            pltpu.VMEM((D, c.d_ffn), stream_dtype),          # ff_proj
            pltpu.VMEM((c.d_ffn, D), stream_dtype),          # ff_out
            pltpu.VMEM((2, gb, S, D), k_cache.dtype),        # k group bufs
            pltpu.VMEM((2, gb, S, D), v_cache.dtype),        # v group bufs
            pltpu.SemaphoreType.DMA((14,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x.astype(dtype), norms, dec.norm_out.astype(jnp.float32).reshape(1, D),
      dec.xa_q.astype(dtype), dec.xa_out.astype(dtype),
      xa_k.astype(dtype), xa_v.astype(dtype),
      valid.astype(jnp.int32), enc_lengths.astype(jnp.int32).reshape(B, 1),
      scal,
      qkv_s, sao_s, ffp_s, ffo_s,
      qkv_w, sao_w, ffp_w, ffo_w, k_cache, v_cache)

    return hidden, k_out, v_out
