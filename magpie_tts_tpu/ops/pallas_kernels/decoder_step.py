"""Fused autoregressive decoder step: all 12 layers in one Pallas kernel.

The per-frame decoder step is op-count-bound under XLA (~180 small ops: 12
layers x (norms, QKV, cache update, attention, XA, FFN)). This kernel runs the
whole step as grid=(12,) with the large weight matrices streamed HBM->VMEM by
manual async DMA, overlapped with compute (the next layer's QKV weights prefetch
during this layer's FFN). The KV cache stays in HBM (aliased in/out); each step
reads the layer's cache block once for attention and DMA-writes only the new
row — the functional analog of the reference's flat-cache `ggml_cpy` pattern
(magpie.cpp:3393-3480) at memory-bound speed.

Attention avoids head-reshapes entirely: with a constant segment matrix
SEG[d, h] = 1{d // d_head == h}, per-head scores are (K * q) @ SEG and the
context sum is ones @ ((probs @ SEG^T) * V) — everything stays on the MXU in
[seq, d_model] layout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dot_hi

_NEG = -1e30


def _ln(x, w, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return (c / jnp.sqrt(var + eps)) * w.astype(jnp.float32)


def _kernel(x_in_ref, norms_ref, final_norm_ref, xa_q_ref, xa_out_ref,
            xa_k_ref, xa_v_ref, scal_ref,
            qkv_s_ref, sao_s_ref, ffp_s_ref, ffo_s_ref,
            qkv_hbm, sao_hbm, ffp_hbm, ffo_hbm, kc_hbm, vc_hbm,
            hidden_ref, kc_out, vc_out,
            x_ref, qkv_buf, sao_buf, ffp_buf, ffo_buf, kbuf, vbuf, sems, *,
            n_layers: int, d_model: int, n_heads: int, d_xa: int,
            max_seq: int, enc_pad: int, eps: float, gelu_tanh: bool,
            gelu_fn, q8_blocks: bool = False):
    l = pl.program_id(0)
    pos = scal_ref[0]
    enc_len = scal_ref[1]
    d_head = d_model // n_heads
    # Streamed weights may be serving-quantized int8 (dequant = scaling the
    # matmul OUTPUT by the per-column scale vectors) or the GGUF Q8_0 blocks
    # themselves (dequant in stream_w); compute stays in x dtype.
    wdt = x_in_ref.dtype

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

    def dma(src, dst, sem_idx):
        return pltpu.make_async_copy(src, dst, sems.at[sem_idx])

    # Prologue: start ALL of layer 0's streams; thereafter every stream runs
    # one phase ahead (wait -> single use -> start l+1) so DMA hides under
    # compute instead of serializing inside the phase.
    @pl.when(l == 0)
    def _prologue():
        x_ref[...] = x_in_ref[...].astype(jnp.float32)
        dma(qkv_hbm.at[0], qkv_buf, 0).start()
        dma(kc_hbm.at[0], kbuf, 1).start()
        dma(vc_hbm.at[0], vbuf, 2).start()
        dma(sao_hbm.at[0], sao_buf, 3).start()
        dma(ffp_hbm.at[0], ffp_buf, 6).start()
        dma(ffo_hbm.at[0], ffo_buf, 7).start()

    x = x_ref[...]  # (1, d_model) f32

    # ---- self-attention ----
    # Rounding points mirror models/decoder.decode_step_masked exactly (the
    # temp=0 parity bar): qkv rounds to the weight dtype, score/context
    # products are exact f32 of wdt-rounded operands, probabilities round to
    # wdt, residual adds stay f32.
    h = _ln(x, norms_ref[0, 0], eps).astype(wdt)
    dma(qkv_hbm.at[l], qkv_buf, 0).wait()
    qkv = dot_hi(h, stream_w(qkv_buf, qkv_s_ref))  # (1, 3d) f32
    qkv = out_scale(qkv, qkv_s_ref).astype(wdt)

    @pl.when(l < n_layers - 1)
    def _prefetch_qkv():
        dma(qkv_hbm.at[l + 1], qkv_buf, 0).start()

    q = qkv[:, :d_model].astype(jnp.float32)
    k_new = qkv[:, d_model:2 * d_model].astype(kbuf.dtype)
    v_new = qkv[:, 2 * d_model:].astype(vbuf.dtype)

    dma(kc_hbm.at[l], kbuf, 1).wait()
    dma(vc_hbm.at[l], vbuf, 2).wait()
    # Insert the new row via an aligned 16-row read-modify-write (a 1-row
    # store at a dynamic index is not provably aligned for bf16 tiles), then
    # write the window back to HBM (HBM slices along the sublane dim must be
    # tile-aligned; the extra rows are no-op rewrites).
    base = (pos // 16) * 16
    wrows = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) + base
    kwin = kbuf[pl.ds(base, 16), :]
    vwin = vbuf[pl.ds(base, 16), :]
    kbuf[pl.ds(base, 16), :] = jnp.where(wrows == pos, k_new, kwin)
    vbuf[pl.ds(base, 16), :] = jnp.where(wrows == pos, v_new, vwin)
    dma(kbuf.at[pl.ds(base, 16)], kc_out.at[l, pl.ds(base, 16)], 4).start()
    dma(vbuf.at[pl.ds(base, 16)], vc_out.at[l, pl.ds(base, 16)], 5).start()

    # Per-head scores via the segment matrix (no head reshapes), in the
    # bit-exact algebraic forms of the batched kernel
    # (decoder_step_batched.py): (K (.) q) @ seg == K @ (q (.) seg) and
    # ones @ ((p@segT) (.) V) == ones_H @ ((pT V) (.) segT), with CACHE-DTYPE
    # operands — single-pass bf16 dots are bit-identical to 6-pass
    # f32-HIGHEST on bf16-valued data (exact products, same accumulation).
    lane = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 1)
    seg = (lane // d_head == head).astype(jnp.float32)    # [d, H]
    cdt = kbuf.dtype
    hi_p = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None
    qseg = (q.T * seg).astype(cdt)                        # [d, H] exact
    scores = jnp.dot(kbuf[...], qseg,
                     preferred_element_type=jnp.float32,
                     precision=hi_p)                      # [S, H]
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(d_head)))
    row = jax.lax.broadcasted_iota(jnp.int32, (max_seq, n_heads), 0)
    scores = jnp.where(row <= pos, scores, _NEG)
    m = jnp.max(scores, axis=0, keepdims=True)
    p = jnp.exp(scores - m)
    probs = p / jnp.sum(p, axis=0, keepdims=True)          # [S, H]
    probs_w = probs.astype(wdt).astype(cdt)                # round like XLA
    pv = jax.lax.dot_general(
        probs_w, vbuf[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi_p)  # [H, d]
    ones_h = jnp.ones((1, n_heads), jnp.float32)
    attn = dot_hi(ones_h, pv * seg.T)                      # [1, d]

    dma(sao_hbm.at[l], sao_buf, 3).wait()
    x = x + out_scale(dot_hi(attn.astype(wdt),
                              stream_w(sao_buf, sao_s_ref)), sao_s_ref)

    @pl.when(l < n_layers - 1)
    def _prefetch_sao():
        dma(sao_hbm.at[l + 1], sao_buf, 3).start()

    # ---- cross-attention (1 head, precomputed K/V) ----
    # Same algebraic forms: (K (.) q) @ ones == K @ qT and
    # ones @ (p (.) V) == pT V, native-dtype operands (exact products).
    hq = _ln(x, norms_ref[0, 1], eps).astype(wdt)
    q2 = dot_hi(hq, xa_q_ref[0]).astype(wdt)                      # (1, d_xa)
    sx = jnp.dot(xa_k_ref[0], q2.T,
                 preferred_element_type=jnp.float32,
                 precision=hi_p)                                  # (E, 1)
    sx = sx * (1.0 / jnp.sqrt(jnp.float32(d_xa)))
    erow = jax.lax.broadcasted_iota(jnp.int32, (enc_pad, 1), 0)
    sx = jnp.where(erow < enc_len, sx, _NEG)
    mx = jnp.max(sx, axis=0, keepdims=True)
    px = jnp.exp(sx - mx)
    px = px / jnp.sum(px, axis=0, keepdims=True)                  # (E, 1)
    px_w = px.astype(wdt)
    xa = jax.lax.dot_general(
        px_w, xa_v_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi_p)       # (1, d_xa)
    x = x + dot_hi(xa.astype(wdt), xa_out_ref[0])

    # ---- FFN (pointwise) ----
    hf = _ln(x, norms_ref[0, 2], eps).astype(wdt)
    dma(ffp_hbm.at[l], ffp_buf, 6).wait()
    f = out_scale(dot_hi(hf, stream_w(ffp_buf, ffp_s_ref)), ffp_s_ref)

    @pl.when(l < n_layers - 1)
    def _prefetch_ffp():
        dma(ffp_hbm.at[l + 1], ffp_buf, 6).start()

    f = gelu_fn(f).astype(wdt)
    dma(ffo_hbm.at[l], ffo_buf, 7).wait()
    x = x + out_scale(dot_hi(f, stream_w(ffo_buf, ffo_s_ref)), ffo_s_ref)

    @pl.when(l < n_layers - 1)
    def _prefetch_ffo():
        dma(ffo_hbm.at[l + 1], ffo_buf, 7).start()

    x_ref[...] = x

    dma(kbuf.at[pl.ds(base, 16)], kc_out.at[l, pl.ds(base, 16)], 4).wait()
    dma(vbuf.at[pl.ds(base, 16)], vc_out.at[l, pl.ds(base, 16)], 5).wait()

    @pl.when(l < n_layers - 1)
    def _prefetch_cache():
        dma(kc_hbm.at[l + 1], kbuf, 1).start()
        dma(vc_hbm.at[l + 1], vbuf, 2).start()

    @pl.when(l == n_layers - 1)
    def _emit():
        hidden_ref[...] = _ln(x, final_norm_ref[0], eps).astype(hidden_ref.dtype)


def decode_step_pallas(x: jnp.ndarray, pos: jnp.ndarray,
                       xa_k: jnp.ndarray, xa_v: jnp.ndarray,
                       k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                       weights, config,
                       enc_length: Optional[jnp.ndarray] = None,
                       interpret: bool = False,
                       int8_stream=None):
    """Drop-in replacement for models.decoder.decode_step on TPU.

    x: [d_model] frame embedding (position embedding added here);
    caches: [L, max_seq, d_model] (aliased/donated). Returns
    (hidden [d_model], k_cache, v_cache).

    ``int8_stream`` (io.magpie_weights.Int8DecoderStream): stream the four big
    weight matrices as per-column int8 — halves the per-frame HBM weight
    traffic, which is the single-stream decode floor.
    """
    dec = weights.decoder
    c = config
    dtype = weights.text_emb.dtype
    L, S, D = k_cache.shape
    E = xa_k.shape[1]
    if enc_length is None:
        enc_length = jnp.int32(E)

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

    x_in = (x + dec.pos_emb[pos]).astype(dtype).reshape(1, D)
    norms = jnp.stack([dec.norm_self, dec.norm_xa_q, dec.norm_ff],
                      axis=1).astype(jnp.float32)          # [L, 3, D]
    scal = jnp.stack([pos.astype(jnp.int32), enc_length.astype(jnp.int32)])

    from .common import gelu_kernel

    gelu_tanh = c.gelu_tanh

    def gelu_fn(v):
        return gelu_kernel(v, approximate=gelu_tanh)

    kernel = functools.partial(
        _kernel, n_layers=c.dec_layers, d_model=D, n_heads=c.dec_sa_heads,
        d_xa=c.d_xa, max_seq=S, enc_pad=E, eps=c.eps, gelu_tanh=gelu_tanh,
        gelu_fn=gelu_fn, q8_blocks=q8_blocks)

    grid = (c.dec_layers,)
    vmem_block = lambda *blk, im=None: pl.BlockSpec(
        blk, im or (lambda l: tuple(0 for _ in blk)))

    hidden, k_out, v_out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((1, D), dtype),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)),
        in_specs=[
            vmem_block(1, D),                                   # x_in
            pl.BlockSpec((1, 3, D), lambda l: (l, 0, 0)),       # norms
            vmem_block(1, D),                                   # final norm
            pl.BlockSpec((1, D, c.d_xa), lambda l: (l, 0, 0)),  # xa_q
            pl.BlockSpec((1, c.d_xa, D), lambda l: (l, 0, 0)),  # xa_out
            pl.BlockSpec((1, E, c.d_xa), lambda l: (l, 0, 0)),  # xa_k
            pl.BlockSpec((1, E, c.d_xa), lambda l: (l, 0, 0)),  # xa_v
            pl.BlockSpec(memory_space=pltpu.SMEM),              # scalars
            pl.BlockSpec((1,) + qkv_s.shape[1:], lambda l: (l, 0, 0)),
            pl.BlockSpec((1,) + sao_s.shape[1:], lambda l: (l, 0, 0)),
            pl.BlockSpec((1,) + ffp_s.shape[1:], lambda l: (l, 0, 0)),
            pl.BlockSpec((1,) + ffo_s.shape[1:], lambda l: (l, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),               # qkv_hbm
            pl.BlockSpec(memory_space=pltpu.HBM),               # sao_hbm
            pl.BlockSpec(memory_space=pltpu.HBM),               # ffp_hbm
            pl.BlockSpec(memory_space=pltpu.HBM),               # ffo_hbm
            pl.BlockSpec(memory_space=pltpu.HBM),               # k cache in
            pl.BlockSpec(memory_space=pltpu.HBM),               # v cache in
        ],
        out_specs=(vmem_block(1, D),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        input_output_aliases={16: 1, 17: 2},  # caches update in place
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),          # x carry
            pltpu.VMEM((D, 3 * D), stream_dtype),     # qkv weights
            pltpu.VMEM((D, D), stream_dtype),         # sa_out
            pltpu.VMEM((D, c.d_ffn), stream_dtype),   # ff_proj
            pltpu.VMEM((c.d_ffn, D), stream_dtype),   # ff_out
            pltpu.VMEM((S, D), k_cache.dtype),        # k block
            pltpu.VMEM((S, D), v_cache.dtype),        # v block
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # f32 weight-streaming scratch (qkv + 2 ffn + sa_out + cache blocks)
            # is ~30MB — beyond the default 16MB scoped-vmem limit.
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x_in, norms, dec.norm_out.astype(jnp.float32).reshape(1, D),
      dec.xa_q.astype(dtype), dec.xa_out.astype(dtype),
      xa_k.astype(dtype), xa_v.astype(dtype), scal,
      qkv_s, sao_s, ffp_s, ffo_s,
      qkv_w, sao_w, ffp_w, ffo_w,
      k_cache, v_cache)

    return hidden[0], k_out, v_out
