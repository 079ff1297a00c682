"""Batched fused frame kernel: LT sampling + embedding + decoder, B slots.

The batched serving loops (lockstep `models/magpie.py` and continuous-batching
`parallel/continuous.py`) previously issued TWO pallas calls per frame
(lt_sampler_batched + decoder_step_batched) with ~0.6ms of XLA glue between
them per step at B=32: the 8-table embedding gather, the position-embedding
add, the validity-mask rebuild, plus two kernel launches that strictly
serialize on the TensorCore. This kernel runs the whole frame in ONE
pallas_call, grid = (8 LT codebook phases + 12 decoder layers,):

- the LT phases are `lt_sampler_batched`'s flat-buffer design ([B*16, lt_dim]
  sequence scratch, shared-weight MXU contractions, block-diagonal causal
  attention, bisection top-k, Gumbel-max) — while decoder layer-0's weight and
  KV-cache DMAs already stream underneath them (the fusion win: the ~60us of
  LT compute hides under the decoder's HBM floor);
- each phase also accumulates the sampled code's FULL d_model embedding row
  (one-hot matmul against the per-codebook table, exact) so the decoder seed
  `mean/8 + pos_emb` (reference magpie.cpp:1434 scale) is produced in-kernel —
  no XLA gather between sampling and decoding;
- the LT feedback row is the in-kernel projection of that embedding
  (`emb @ in_proj_w + b`, the single-stream frame_step.py formula) — the
  pre-projected table input of lt_sampler_batched is not needed;
- EOS is detected in-kernel (`argmax_or_multinomial_any`, magpie.cpp:2706-2715)
  to decide the NEW cache row's attention validity per slot:
  `may_continue & ~is_eos` — callers no longer pre-commit the new row into the
  validity mask (they re-derive it from the returned codes for loop state);
- the decoder phases are `decoder_step_batched`'s grouped double-buffered
  cache streaming, including the valid-length-aware half-prefix variant.

Greedy (temp=0) parity bar: bit-exact with the two-kernel path (which is
bit-exact with the vmapped XLA oracle) — pinned by
tests/test_pallas_kernels.py at production (357M) shapes in interpret mode.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dot_hi, gelu_kernel
from .lt_sampler import _pad_rows_to_16
from .lt_sampler_batched import _pos_row

_SEQ = 16       # padded per-slot LT sequence rows (9 used)
_NEG = -1e30

# PROBE-ONLY ablation knob (scripts/opt_slope_probe.py anatomy mode):
# trace-time removal of kernel stages to attribute per-step cost. Production
# never sets it; outputs are WRONG under any non-empty value. Recognized:
# "nolt" (skip LT phase bodies), "nosamp" (greedy-only: skip top-k bisection
# + Gumbel draw, keep everything else), "noattend" (skip per-slot attention
# loop), "nocache" (skip K/V cache group DMAs), "noweights" (skip
# qkv/sao/ffp/ffo HBM streams + their matmuls), "noxa" (skip cross-attention).
_ABLATE = ""

# Layer-weight buffer depth: 1 = classic single buffer (default). 2 gives a
# parity double-buffer that lets layer 1's 14MB (bf16) stream under the LT
# phases and keeps later layers one full layer ahead — MEASURED NEGATIVE on
# v5e (slope A/B, B=32 bf16 temp 0.7: 708.2/1208.7 vs 705.5/1192.6 us/step
# at pos 150/450): per-layer weight DMA (~17 us at 819GB/s) is already fully
# hidden under per-layer compute (~50 us), so the extra buffer only adds VMEM
# pressure and semaphore bookkeeping. Kept as a probe knob; outputs are
# bit-identical either way (pure DMA scheduling, pinned by interpret tests).
# The host clamps back to 1 when the doubled scratch would overflow VMEM
# next to the cache buffers (f32 streams).
_NWBUF = int(os.environ.get("MAGPIE_WEIGHT_BUFS", "1"))
# cache-group buffers + doubled weight scratch VMEM budget (the rest of the
# kernel needs ~20MB of the 126MB Mosaic limit).
_W2_BYTES_MAX = 100 * 1024 * 1024

# Cache-buffer depth: 2 = classic double-buffer (group g+1 streams while
# group g attends; layer l+1 group 0 starts after layer l's sa_out).
# n_groups (= "deep" mode) gives every group its own VMEM buffer and a full
# LAYER of DMA lookahead: layer l+1's group-g stream starts the moment layer
# l's group g finishes (and ALL of layer 0 streams under the LT phases, which
# are otherwise DMA-idle VPU time). Costs (n_groups-2)*2*gb*S*D*itemsize of
# VMEM, so the host clamps to the classic depth when the buffers don't fit
# (f32 caches, B=64). Measured (slope, v5e, B=32 bf16 temp 0.7, pos 150/450):
# deep 704/1199 vs classic 744/1264 us/step. Bit-identical outputs (DMA
# scheduling only); pinned by test_frame_step_batched_deep_buffers_bitexact.
_NBUF = int(os.environ.get("MAGPIE_CACHE_BUFS", "4"))
# K+V group-buffer VMEM budget for the deep mode (bf16 B=32 uses 63MB; the
# rest of the kernel's scratch + pipeline blocks needs ~45MB of the 128MB).
_DEEP_BYTES_MAX = 72 * 1024 * 1024


def _ln(x, w, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return (c / jnp.sqrt(var + eps)) * w.astype(jnp.float32)


def _kernel(hidden_ref, posemb_ref,
            # LT weights
            lt_inw_ref, lt_inb_ref, lt_pos_ref, lt_ns_ref, lt_qkv_ref,
            lt_sao_ref, lt_nf_ref, lt_ffp_ref, lt_ffo_ref, lt_ow_ref,
            lt_ob_ref, emb_tbl_ref, forbid_ref, maycont_ref,
            # decoder per-layer VMEM blocks
            norms_ref, final_norm_ref, xa_q_ref, xa_out_ref, xa_k_ref,
            xa_v_ref, valid_ref, enc_len_ref,
            # scalars / per-slot seeds
            temp_ref, seeds_ref, scal_ref,
            qkv_s_ref, sao_s_ref, ffp_s_ref, ffo_s_ref,
            # HBM
            qkv_hbm, sao_hbm, ffp_hbm, ffo_hbm, kc_hbm, vc_hbm,
            # outputs
            sampled_ref, argmax_ref, hidden_out_ref, kc_out, vc_out,
            # scratch
            kv_ref, xcur_ref, emb_acc, valid_sc, x_ref, attn_ref,
            qkv_sc, sao_buf, ffp_buf, ffo_buf, kbufs, vbufs, sems, *,
            n_cb: int, lt_dim: int, vocab: int, vocab_pad: int, top_k: int,
            audio_bos_id: int, audio_eos_id: int,
            n_layers: int, n_batch: int, gb: int, d_model: int, n_heads: int,
            d_xa: int, max_seq: int, enc_pad: int, eps: float, s_half: int,
            cache_chunk: int, gelu_tanh: bool = False, n_buf: int = 2,
            n_wbuf: int = 1, q8_blocks: bool = False):
    i = pl.program_id(0)
    pos = scal_ref[0]
    B = n_batch
    R = B * _SEQ
    wdt = hidden_ref.dtype
    n_groups = n_batch // gb
    deep = n_buf >= n_groups      # one buffer per group: full-layer lookahead
    wb0 = 8 + 2 * n_buf           # writeback semaphores sit past the cache ones

    def wsem(widx, p):
        """Semaphore for weight stream ``widx`` (0..3 = qkv/sao/ffp/ffo),
        buffer parity ``p``. Single-buffer mode keeps the classic static
        indices; parity mode uses a contiguous pair per stream past the
        writeback sems (``p`` may be traced)."""
        if n_wbuf == 1:
            return (0, 3, 6, 7)[widx]
        return wb0 + 2 + 2 * widx + p

    def stream_dec_w(wv, s_ref):
        # Q8_0-native: s (f16-valued f32, one per 32 input rows) x int8 q is
        # EXACT in f32 -> tile bit-identical to load-time dequant (see
        # frame_step.py / io.magpie_weights.Q8DecoderStream).
        if not q8_blocks:
            return wv.astype(wdt)
        s = jnp.repeat(s_ref[0].astype(jnp.float32), 32, axis=0)
        return (s * wv.astype(jnp.float32)).astype(wdt)

    def out_scale(v, s_ref):
        if q8_blocks:  # scales already consumed by stream_dec_w
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
            return lambda f: f()
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

    def cache_dma_chunk(g, buf_idx, sem_base, j, layer):
        lo = g * gb
        sl = pl.ds(j * cache_chunk, cache_chunk)
        return (dma(kc_hbm.at[pl.ds(lo, gb), layer, sl],
                    kbufs.at[buf_idx, :, sl], sem_base),
                dma(vc_hbm.at[pl.ds(lo, gb), layer, sl],
                    vbufs.at[buf_idx, :, sl], sem_base + 1))

    def cache_each(g, buf_idx, sem_base, layer, op):
        """Start or wait this group/layer's cache copies.

        Chunked mode streams only ceil(rows_needed / cache_chunk) chunks of
        the active variant's buffer (scal_ref[2]; rows beyond rows_needed are
        stale VMEM, masked out of attention by ``valid_sc``) — cache DMA bytes
        are position-proportional instead of a fixed 320/640-row cascade.
        Start/wait run the SAME scalar guards, so semaphore counts pair."""
        if cache_chunk:
            n_ch = scal_ref[2]
            for rows in variants:
                @when_variant(rows)
                def _io(rows=rows):
                    for j in range(rows // cache_chunk):
                        @pl.when(j < n_ch)
                        def _io_chunk(j=j):
                            for c in cache_dma_chunk(g, buf_idx, sem_base, j,
                                                     layer):
                                getattr(c, op)()
            return
        for rows in variants:
            @when_variant(rows)
            def _io(rows=rows):
                for c in cache_dma(g, buf_idx, sem_base, rows, layer):
                    getattr(c, op)()

    def cache_start(g, buf_idx, sem_base, layer):
        cache_each(g, buf_idx, sem_base, layer, "start")

    def cache_wait(g, buf_idx, sem_base, layer):
        cache_each(g, buf_idx, sem_base, layer, "wait")

    # ---- prologue: decoder layer-0 streams start UNDER the LT phases ----
    @pl.when(i == 0)
    def _prologue():
        emb_acc[...] = jnp.zeros_like(emb_acc)
        if cache_chunk:
            # Chunked mode leaves rows past rows_needed un-DMA'd; scratch is
            # uninitialized per call and a NaN bit-pattern there would poison
            # the probs @ V contraction (0 * NaN = NaN) even though attention
            # masks those rows. Zero everything BEFORE the first cache DMA.
            kbufs[...] = jnp.zeros_like(kbufs)
            vbufs[...] = jnp.zeros_like(vbufs)
        if "noweights" not in _ABLATE:                              # probe-only
            # n_wbuf=2: layer 1's weights stream under the LT phases too
            # (static j, so these DMAs carry static buffer/sem indices).
            for j in range(min(n_wbuf, n_layers)):
                dma(qkv_hbm.at[j], qkv_sc.at[j], wsem(0, j)).start()
                dma(sao_hbm.at[j], sao_buf.at[j], wsem(1, j)).start()
                dma(ffp_hbm.at[j], ffp_buf.at[j], wsem(2, j)).start()
                dma(ffo_hbm.at[j], ffo_buf.at[j], wsem(3, j)).start()
        if "nocache" not in _ABLATE:                                # probe-only
            if deep:
                # Deep mode: ALL of layer 0's cache streams under the LT
                # phases (each group owns a buffer, so nothing blocks).
                for g0 in range(n_groups):
                    cache_start(g0, g0, 8 + 2 * g0, 0)
            else:
                cache_start(0, 0, 8, 0)

    # ======================= LT phases (i in [0, n_cb)) =====================
    @pl.when(i < n_cb)
    def _lt_phase():
        cb = i
        if "nolt" in _ABLATE:                                       # probe-only
            @pl.when(cb == n_cb - 1)
            def _transition_ablated():
                newcol = maycont_ref[...]                           # [B, 1]
                scols = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
                valid_sc[...] = jnp.where(scols == pos, newcol, valid_ref[...])
                x_ref[...] = posemb_ref[...].astype(jnp.float32)
                out_row = jax.lax.broadcasted_iota(jnp.int32, (n_cb, B), 0)
                sampled_ref[...] = out_row
                argmax_ref[...] = out_row
            return
        in_b = lt_inb_ref[0, :].astype(jnp.float32)

        # Incremental K/V: each phase LayerNorms + projects ONLY the new row
        # (x lives in the [B, lt] ``xcur_ref`` scratch); its K/V lands in the
        # persistent ``kv_ref`` buffer that accumulates across phases. Rows
        # are immutable once written and LN/qkv are row-wise, so the cached
        # K/V rows are BIT-IDENTICAL to the old full-buffer recompute — at
        # 1/16th of the LN/qkv work per phase (VERDICT r2 item 3).
        @pl.when(cb == 0)
        def _init():
            kv_ref[...] = jnp.zeros_like(kv_ref)
            proj = dot_hi(hidden_ref[...], lt_inw_ref[...]) + in_b   # [B, lt]
            xcur_ref[...] = (proj.astype(wdt).astype(jnp.float32)
                             + _pos_row(lt_pos_ref, 0))

        x = xcur_ref[...]                                            # [B, lt]
        h = _ln(x, lt_ns_ref[0, :], eps).astype(wdt)
        qkv = dot_hi(h, lt_qkv_ref[...])                             # [B, 3lt]
        q = qkv[:, :lt_dim].astype(wdt)
        kv_new = qkv[:, lt_dim:].astype(wdt)                         # [B, 2lt]

        rws = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        scat = ((rws // _SEQ ==
                 jax.lax.broadcasted_iota(jnp.int32, (R, B), 1))
                & (rws % _SEQ == cb)).astype(jnp.float32)            # [R, B]
        upd = dot_hi(scat, kv_new.astype(jnp.float32)).astype(wdt)
        kv_ref[...] = jnp.where(rws % _SEQ == cb, upd, kv_ref[...])

        rows = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (B, R), 0)
        scale = 1.0 / jnp.sqrt(jnp.float32(lt_dim))
        scores = dot_hi(q, kv_ref[:, :lt_dim].T) * scale             # [B, R]
        visible = (rows // _SEQ == slot) & (rows % _SEQ <= cb)
        scores = jnp.where(visible, scores, _NEG)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)).astype(wdt)
        attn = dot_hi(probs, kv_ref[:, lt_dim:])
        x1 = x + dot_hi(attn.astype(wdt), lt_sao_ref[...])
        h2 = _ln(x1, lt_nf_ref[0, :], eps).astype(wdt)
        ff = dot_hi(h2, lt_ffp_ref[...])
        ff = gelu_kernel(ff, approximate=gelu_tanh).astype(wdt)
        x2 = x1 + dot_hi(ff, lt_ffo_ref[...])

        logits = dot_hi(x2.astype(wdt), lt_ow_ref[0])                # [B, vocab]
        logits = logits + lt_ob_ref[0].astype(jnp.float32)

        ids = jax.lax.broadcasted_iota(jnp.int32, (B, vocab), 1)
        forbidden = (ids == audio_bos_id) | \
                    ((ids >= audio_bos_id + 2) & (ids <= audio_bos_id + 7))
        forbid_eos = forbid_ref[...] > 0
        forbidden = forbidden | (forbid_eos & (ids == audio_eos_id))
        logits = jnp.where(forbidden, _NEG, logits)

        row_max = jnp.max(logits, axis=-1, keepdims=True)
        amax = jnp.min(jnp.where(logits == row_max, ids, vocab),
                       axis=-1).astype(jnp.int32)                    # [B]

        # EXACT top-k membership + per-slot counter-based Gumbel noise
        # (shared implementation, ops/sampling.py — backend-identical). The
        # whole draw sits under pl.when(~greedy): temp<0.01 runs (reference
        # greedy rule, magpie.cpp:1263) skip the 32-pass top-k bisection and
        # the double-log Gumbel transform entirely — measured 102 us/step at
        # B=32 (738 -> 636 us, nosamp ablation slope probe).
        from ...ops import sampling as _sampling

        temp = temp_ref[0]
        out_row = jax.lax.broadcasted_iota(jnp.int32, (n_cb, B), 0)
        sampled_ref[...] = jnp.where(out_row == cb, amax[None, :],
                                     sampled_ref[...])
        argmax_ref[...] = jnp.where(out_row == cb, amax[None, :],
                                    argmax_ref[...])

        if "nosamp" not in _ABLATE:                                 # probe knob
            @pl.when(temp >= 0.01)
            def _draw():
                in_topk = _sampling.exact_topk_mask(logits, top_k)
                base = _sampling.phase_seed(seeds_ref[...], cb)     # [B, 1]
                gumbel = _sampling.gumbel_from_seed(base, ids)
                safe_temp = jnp.maximum(temp, 0.01)
                z = jnp.where(in_topk, logits / safe_temp + gumbel, _NEG)
                z_max = jnp.max(z, axis=-1, keepdims=True)
                drawn = jnp.min(jnp.where(z == z_max, ids, vocab),
                                axis=-1).astype(jnp.int32)
                sampled_ref[...] = jnp.where(out_row == cb, drawn[None, :],
                                             sampled_ref[...])

        # The decided code (greedy or drawn) feeds the embedding/feedback.
        code = jnp.sum(jnp.where(out_row == cb, sampled_ref[...], 0),
                       axis=0).astype(jnp.int32)                     # [B]

        # Full-d_model embedding row of the sampled code (exact one-hot
        # gather — each output is a single 1.0 x value product), accumulated
        # for the decoder seed. Native-dtype operands: single-pass for bf16
        # tables, HIGHEST for f32 (default f32 dots truncate to bf16).
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, vocab_pad), 1)
        tdt = emb_tbl_ref.dtype
        tprec = jax.lax.Precision.HIGHEST if tdt == jnp.float32 else None
        onehot = (cols == code[:, None]).astype(tdt)
        emb = jnp.dot(onehot, emb_tbl_ref[0],
                      preferred_element_type=jnp.float32,
                      precision=tprec)                               # [B, D]
        emb_acc[...] += emb

        @pl.when(cb < n_cb - 1)
        def _feedback():
            proj = dot_hi(emb.astype(wdt), lt_inw_ref[...]) + in_b   # [B, lt]
            xcur_ref[...] = (proj.astype(wdt).astype(jnp.float32)
                             + _pos_row(lt_pos_ref, cb + 1))

        @pl.when(cb == n_cb - 1)
        def _transition():
            # In-kernel EOS (any codebook, sampled or argmax —
            # sampling.frame_has_eos) decides the new row's validity. The
            # per-slot hit count lands in [B, 1] orientation directly via a
            # dim0/dim0 contraction (no [1,B] -> [B,1] vector transpose).
            eos_hits = ((sampled_ref[...] == audio_eos_id)
                        | (argmax_ref[...] == audio_eos_id)
                        ).astype(jnp.float32)                        # [n_cb, B]
            eos_cnt = jax.lax.dot_general(
                eos_hits, jnp.ones((n_cb, 1), jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                  # [B, 1]
            eos_col = (eos_cnt > 0).astype(jnp.int32)                # [B, 1]
            newcol = maycont_ref[...] * (1 - eos_col)                # [B, 1]
            scols = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
            valid_sc[...] = jnp.where(scols == pos, newcol, valid_ref[...])

            # Decoder seed with the XLA path's rounding points:
            # mean rounds to wdt, the pos-emb add happens in wdt.
            mean = (emb_acc[...] * (1.0 / n_cb)).astype(wdt).astype(jnp.float32)
            x0 = mean + posemb_ref[...].astype(jnp.float32)
            x_ref[...] = x0.astype(wdt).astype(jnp.float32)

    # ==================== decoder phases (i in [n_cb, n_cb+L)) ==============
    @pl.when(i >= n_cb)
    def _decoder_phase():
        l = i - n_cb
        d_head = d_model // n_heads

        x = x_ref[...]  # [B, D] f32

        # Weight-buffer parity: layer l lives in buffer l % n_wbuf, and the
        # prefetch target is layer l + n_wbuf into the SAME buffer (classic
        # single-buffer behavior when n_wbuf == 1).
        wp = 0 if n_wbuf == 1 else l % n_wbuf

        h = _ln(x, norms_ref[0, 0], eps).astype(wdt)
        if "noweights" in _ABLATE:                                  # probe-only
            qkv = jnp.zeros((n_batch, 3 * d_model), wdt) + h[:, :1]
        else:
            dma(qkv_hbm.at[l], qkv_sc.at[wp], wsem(0, wp)).wait()
            qkv = dot_hi(h, stream_dec_w(qkv_sc[wp], qkv_s_ref))    # [B, 3D]
            qkv = out_scale(qkv, qkv_s_ref).astype(wdt)

            @pl.when(l + n_wbuf < n_layers)
            def _prefetch_qkv():
                dma(qkv_hbm.at[l + n_wbuf], qkv_sc.at[wp],
                    wsem(0, wp)).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 1)
        head = jax.lax.broadcasted_iota(jnp.int32, (n_heads, d_model), 0)
        seg_t = (lane // d_head == head).astype(jnp.float32)        # [H, D]
        inv_sqrt = 1.0 / jnp.sqrt(jnp.float32(d_head))
        wrows = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)

        base = (pos // 16) * 16
        for g in range(n_groups):
            buf = g % n_buf
            sem_base = 8 + 2 * buf
            lo = g * gb
            if "nocache" not in _ABLATE:                            # probe-only
                if not deep and g + 1 < n_groups:
                    cache_start(g + 1, (g + 1) % n_buf,
                                8 + 2 * ((g + 1) % n_buf), l)
                cache_wait(g, buf, sem_base, l)

                k_new = qkv[lo:lo + gb, d_model:2 * d_model].astype(kbufs.dtype)
                v_new = qkv[lo:lo + gb, 2 * d_model:].astype(vbufs.dtype)
                kbufs[buf, :, pl.ds(base, 16), :] = jnp.where(
                    wrows + base == pos, k_new[:, None, :],
                    kbufs[buf, :, pl.ds(base, 16), :])
                vbufs[buf, :, pl.ds(base, 16), :] = jnp.where(
                    wrows + base == pos, v_new[:, None, :],
                    vbufs[buf, :, pl.ds(base, 16), :])
                dma(kbufs.at[buf, :, pl.ds(base, 16)],
                    kc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)], wb0).start()
                dma(vbufs.at[buf, :, pl.ds(base, 16)],
                    vc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)],
                    wb0 + 1).start()

            if "noattend" in _ABLATE:                               # probe-only
                attn_ref[lo:lo + gb, :] = qkv[lo:lo + gb,
                                              :d_model].astype(jnp.float32)
                if "nocache" not in _ABLATE:
                    dma(kbufs.at[buf, :, pl.ds(base, 16)],
                        kc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)],
                        wb0).wait()
                    dma(vbufs.at[buf, :, pl.ds(base, 16)],
                        vc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)],
                        wb0 + 1).wait()
                    if deep:
                        @pl.when(l < n_layers - 1)
                        def _deep_next(g=g, buf=buf, sem_base=sem_base):
                            cache_start(g, buf, sem_base, l + 1)
                continue
            # Transposed (head-major) per-slot attention — see
            # decoder_step_batched.py: scoresT = (q(.)segT).K on the model
            # dim (M=H not M=rows), ones_H@((p V)(.)segT), native-dtype
            # operands (single-pass bf16 dots, exact products).
            for rows in variants:
                @when_variant(rows)
                def _attend(rows=rows):
                    ones_h = jnp.ones((1, n_heads), jnp.float32)
                    cdt = kbufs.dtype
                    hi = (jax.lax.Precision.HIGHEST
                          if cdt == jnp.float32 else None)
                    for b in range(gb):
                        q_b = qkv[lo + b: lo + b + 1,
                                  :d_model].astype(jnp.float32)
                        kb = kbufs[buf, b, pl.ds(0, rows)]
                        qh = (q_b * seg_t).astype(cdt)          # [H, D] exact
                        scores = jax.lax.dot_general(
                            qh, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=hi)
                        scores = scores * inv_sqrt                  # [H, rows]
                        vmask = valid_sc[lo + b: lo + b + 1,
                                         pl.ds(0, rows)] > 0
                        scores = jnp.where(vmask, scores, _NEG)
                        m = jnp.max(scores, axis=1, keepdims=True)
                        p = jnp.exp(scores - m)
                        probs = p / jnp.sum(p, axis=1, keepdims=True)
                        probs_w = probs.astype(wdt).astype(cdt)
                        vb = vbufs[buf, b, pl.ds(0, rows)]
                        pv = jnp.dot(probs_w, vb,
                                     preferred_element_type=jnp.float32,
                                     precision=hi)               # [H, D]
                        attn_ref[lo + b: lo + b + 1, :] = dot_hi(
                            ones_h, pv * seg_t)

            if "nocache" not in _ABLATE:                            # probe-only
                dma(kbufs.at[buf, :, pl.ds(base, 16)],
                    kc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)], wb0).wait()
                dma(vbufs.at[buf, :, pl.ds(base, 16)],
                    vc_out.at[pl.ds(lo, gb), l, pl.ds(base, 16)],
                    wb0 + 1).wait()
                if deep:
                    # Buffer g is free: stream layer l+1's group g NOW (a
                    # full layer of lookahead keeps the HBM pipes saturated
                    # while this layer's remaining groups attend).
                    @pl.when(l < n_layers - 1)
                    def _deep_next(g=g, buf=buf, sem_base=sem_base):
                        cache_start(g, buf, sem_base, l + 1)

        if "noweights" not in _ABLATE:                              # probe-only
            dma(sao_hbm.at[l], sao_buf.at[wp], wsem(1, wp)).wait()
            x = x + out_scale(dot_hi(attn_ref[...].astype(wdt),
                                     stream_dec_w(sao_buf[wp], sao_s_ref)),
                              sao_s_ref)

            @pl.when(l + n_wbuf < n_layers)
            def _prefetch_sao():
                dma(sao_hbm.at[l + n_wbuf], sao_buf.at[wp],
                    wsem(1, wp)).start()
        else:
            x = x + attn_ref[...] * 1e-9

        if "nocache" not in _ABLATE and not deep:                   # probe-only
            @pl.when(l < n_layers - 1)
            def _prefetch_cache0():
                cache_start(0, 0, 8, l + 1)

        if "noxa" not in _ABLATE:                                   # probe-only
            # ---- cross-attention (1 head, per-slot K/V) ----
            hq = _ln(x, norms_ref[0, 1], eps).astype(wdt)
            q2 = dot_hi(hq, xa_q_ref[0]).astype(wdt).astype(jnp.float32)
            zx = (xa_k_ref[:, 0].astype(jnp.float32) * q2[:, None, :])
            sx = jnp.sum(zx, axis=2) * (1.0 / jnp.sqrt(jnp.float32(d_xa)))
            erow = jax.lax.broadcasted_iota(jnp.int32, (1, enc_pad), 1)
            sx = jnp.where(erow < enc_len_ref[...], sx, _NEG)
            mx = jnp.max(sx, axis=1, keepdims=True)
            px = jnp.exp(sx - mx)
            px = px / jnp.sum(px, axis=1, keepdims=True)
            px_w = px.astype(wdt).astype(jnp.float32)
            wv = px_w[:, :, None] * xa_v_ref[:, 0].astype(jnp.float32)
            xa = jnp.sum(wv, axis=1).astype(wdt)
            x = x + dot_hi(xa, xa_out_ref[0])

        # ---- FFN ----
        hf = _ln(x, norms_ref[0, 2], eps).astype(wdt)
        if "noweights" not in _ABLATE:                              # probe-only
            dma(ffp_hbm.at[l], ffp_buf.at[wp], wsem(2, wp)).wait()
            f = out_scale(dot_hi(hf, stream_dec_w(ffp_buf[wp], ffp_s_ref)),
                          ffp_s_ref)

            @pl.when(l + n_wbuf < n_layers)
            def _prefetch_ffp():
                dma(ffp_hbm.at[l + n_wbuf], ffp_buf.at[wp],
                    wsem(2, wp)).start()

            f = gelu_kernel(f, approximate=gelu_tanh).astype(wdt)
            dma(ffo_hbm.at[l], ffo_buf.at[wp], wsem(3, wp)).wait()
            x = x + out_scale(dot_hi(f, stream_dec_w(ffo_buf[wp], ffo_s_ref)),
                              ffo_s_ref)

            @pl.when(l + n_wbuf < n_layers)
            def _prefetch_ffo():
                dma(ffo_hbm.at[l + n_wbuf], ffo_buf.at[wp],
                    wsem(3, wp)).start()
        else:
            x = x + hf.astype(jnp.float32) * 1e-9

        x_ref[...] = x

        @pl.when(l == n_layers - 1)
        def _emit():
            hidden_out_ref[...] = _ln(x, final_norm_ref[0], eps
                                      ).astype(hidden_out_ref.dtype)


def frame_step_batched_pallas(
        hidden: jnp.ndarray, write_row: jnp.ndarray, valid: jnp.ndarray,
        may_continue: jnp.ndarray, posemb: jnp.ndarray,
        xa_k: jnp.ndarray, xa_v: jnp.ndarray,
        k_cache: jnp.ndarray, v_cache: jnp.ndarray,
        weights, config, enc_lengths: jnp.ndarray,
        seeds: jnp.ndarray, temperature: jnp.ndarray, top_k: int,
        forbid_eos: jnp.ndarray,
        int8_stream=None, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One full batched frame: sample 8 codes per slot, embed, run the decoder.

    hidden: [B, d_model] previous decoder outputs; write_row: scalar i32 cache
    row every slot's new K/V lands in; valid: [B, max_seq] bool membership of
    EXISTING rows (the kernel sets column ``write_row`` itself to
    ``may_continue & ~is_eos`` per slot); may_continue: [B] bool (lockstep:
    ~done; continuous: alive & within budget); posemb: [B, d_model] per-slot
    position-embedding rows (compute dtype); forbid_eos: [B] bool;
    seeds: [B] int32 per-slot sampling seeds (sampling.seed_from_key).

    Returns (sampled [B, 8], argmax [B, 8], hidden [B, d_model],
    k_cache, v_cache); caches [B, L, max_seq, d_model] update in place.
    """
    dec = weights.decoder
    lt = weights.lt
    c = config
    dtype = weights.text_emb.dtype
    B, L, S, D = k_cache.shape
    E = xa_k.shape[2]
    # Cache-group width: slots whose K/V stream together per layer.
    # Env knob for probing group-size trade-offs (gb=16 fits VMEM at B=32).
    gb = min(B, int(os.environ.get("MAGPIE_GB", "8")))
    assert B % gb == 0, (B, gb)
    n_groups = B // gb
    n_buf = min(max(_NBUF, 2), n_groups)
    if n_buf < n_groups:
        # Intermediate depths (2 < n_buf < n_groups) allocate extra VMEM with
        # ZERO lookahead benefit — the non-deep schedule only ever prefetches
        # group g+1 — and can exceed the VMEM limit (f32 B=64). Classic depth.
        n_buf = min(2, n_groups)
    else:  # deep mode: every group resident — check VMEM fit
        deep_bytes = 2 * n_buf * gb * k_cache.shape[2] * \
            k_cache.shape[3] * k_cache.dtype.itemsize
        if deep_bytes > _DEEP_BYTES_MAX:
            n_buf = min(2, n_groups)
    top_k = min(top_k, c.vocab_per_cb)
    n_cb = c.num_codebooks
    cache_buf_bytes = 2 * n_buf * gb * S * D * k_cache.dtype.itemsize

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

    # Weight-buffer depth: 2 when the doubled scratch fits next to the cache
    # buffers (bf16/int8/q8 streams; f32 keeps the single buffer).
    w_bytes = (D * 3 * D + D * D + 2 * D * c.d_ffn) * \
        jnp.dtype(stream_dtype).itemsize
    n_wbuf = min(max(_NWBUF, 1), 2, c.dec_layers)
    if n_wbuf == 2 and cache_buf_bytes + 2 * w_bytes > _W2_BYTES_MAX:
        n_wbuf = 1

    emb_tbl = _pad_rows_to_16(weights.audio_emb.astype(dtype))
    vocab_pad = emb_tbl.shape[1]
    pos_pad = jnp.zeros((_SEQ, c.lt_dim), dtype).at[: c.lt_max_pos].set(
        lt.pos_emb.astype(dtype)[:_SEQ])

    norms = jnp.stack([dec.norm_self, dec.norm_xa_q, dec.norm_ff],
                      axis=1).astype(jnp.float32)

    # Half-prefix cache streaming (decoder_step_batched.py contract): valid
    # covers existing rows; the new row is write_row, already the max bound.
    # On top of the 320/640 COMPUTE cascade, cache DMA is chunked at
    # ``cache_chunk`` rows: only ceil(rows_needed / chunk) chunks stream per
    # group x layer, so cache traffic grows with position instead of jumping
    # between fixed 320/640-row transfers (rows past rows_needed are stale
    # VMEM, masked out of attention by the validity mask).
    s_half = 320 if S >= 512 else 0
    cache_chunk = 160 if (S % 160 == 0 and (not s_half or s_half % 160 == 0)) \
        else 0
    last_valid = jnp.max(
        jnp.where(valid, jnp.arange(S, dtype=jnp.int32)[None, :], -1))
    rows_needed = jnp.maximum(last_valid, write_row.astype(jnp.int32)) + 1
    if s_half:
        half_flag = (rows_needed <= s_half).astype(jnp.int32)
    else:
        half_flag = jnp.int32(0)
    n_chunks = ((rows_needed + cache_chunk - 1) // cache_chunk
                if cache_chunk else jnp.int32(0))
    scal = jnp.stack([write_row.astype(jnp.int32), half_flag,
                      jnp.int32(n_chunks)])
    temp_arr = temperature.astype(jnp.float32).reshape(1)
    seeds_col = seeds.astype(jnp.int32).reshape(B, 1)

    grid = (n_cb + c.dec_layers,)
    kernel = functools.partial(
        _kernel, n_cb=n_cb, lt_dim=c.lt_dim, vocab=c.vocab_per_cb,
        vocab_pad=vocab_pad, top_k=top_k, audio_bos_id=c.audio_bos_id,
        audio_eos_id=c.audio_eos_id, n_layers=c.dec_layers, n_batch=B, gb=gb,
        d_model=D, n_heads=c.dec_sa_heads, d_xa=c.d_xa, max_seq=S, enc_pad=E,
        eps=c.eps, s_half=s_half, cache_chunk=cache_chunk,
        gelu_tanh=c.gelu_tanh, n_buf=n_buf, n_wbuf=n_wbuf,
        q8_blocks=q8_blocks)

    const = lambda *blk: pl.BlockSpec(blk, lambda i: tuple(0 for _ in blk))
    lt_blk = lambda *blk: pl.BlockSpec(
        blk, lambda i: (jnp.minimum(i, n_cb - 1),) + tuple(0 for _ in blk[1:]))
    dec_blk = lambda *blk: pl.BlockSpec(
        blk, lambda i: (jnp.clip(i - n_cb, 0, c.dec_layers - 1),) +
        tuple(0 for _ in blk[1:]))

    sampled, argmax, hidden_out, k_out, v_out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((n_cb, B), jnp.int32),
                   jax.ShapeDtypeStruct((n_cb, B), jnp.int32),
                   jax.ShapeDtypeStruct((B, D), dtype),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)),
        in_specs=[
            const(B, D),                        # hidden
            const(B, D),                        # posemb rows
            const(D, c.lt_dim),                 # lt in_proj_w
            const(1, c.lt_dim),                 # lt in_proj_b
            const(_SEQ, c.lt_dim),              # lt pos emb rows
            const(1, c.lt_dim),                 # lt norm_self
            const(c.lt_dim, 3 * c.lt_dim),      # lt qkv
            const(c.lt_dim, c.lt_dim),          # lt sa_out
            const(1, c.lt_dim),                 # lt norm_ff
            const(c.lt_dim, c.lt_ffn_dim),      # lt ff_proj
            const(c.lt_ffn_dim, c.lt_dim),      # lt ff_out
            lt_blk(1, c.lt_dim, c.vocab_per_cb),    # lt out_proj_w
            lt_blk(1, 1, c.vocab_per_cb),           # lt out_proj_b
            lt_blk(1, vocab_pad, D),            # audio embedding table
            const(B, 1),                        # forbid_eos
            const(B, 1),                        # may_continue
            dec_blk(1, 3, D),                   # norms
            const(1, D),                        # final norm
            dec_blk(1, D, c.d_xa),              # xa_q
            dec_blk(1, c.d_xa, D),              # xa_out
            pl.BlockSpec((B, 1, E, c.d_xa),
                         lambda i: (0, jnp.clip(i - n_cb, 0,
                                                c.dec_layers - 1), 0, 0)),
            pl.BlockSpec((B, 1, E, c.d_xa),
                         lambda i: (0, jnp.clip(i - n_cb, 0,
                                                c.dec_layers - 1), 0, 0)),
            const(B, S),                        # valid (i32)
            const(B, 1),                        # enc_lengths
            pl.BlockSpec(memory_space=pltpu.SMEM),   # temperature
            const(B, 1),                        # per-slot seeds
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal [row, half, n_ch]
            dec_blk(1, *qkv_s.shape[1:]),       # qkv scales (cols/q8)
            dec_blk(1, *sao_s.shape[1:]),       # sa_out scales
            dec_blk(1, *ffp_s.shape[1:]),       # ff_proj scales
            dec_blk(1, *ffo_s.shape[1:]),       # ff_out scales
            pl.BlockSpec(memory_space=pltpu.HBM),    # qkv
            pl.BlockSpec(memory_space=pltpu.HBM),    # sao
            pl.BlockSpec(memory_space=pltpu.HBM),    # ffp
            pl.BlockSpec(memory_space=pltpu.HBM),    # ffo
            pl.BlockSpec(memory_space=pltpu.HBM),    # k cache in
            pl.BlockSpec(memory_space=pltpu.HBM),    # v cache in
        ],
        out_specs=(pl.BlockSpec((n_cb, B), lambda i: (0, 0)),
                   pl.BlockSpec((n_cb, B), lambda i: (0, 0)),
                   const(B, D),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        input_output_aliases={35: 3, 36: 4},
        scratch_shapes=[
            pltpu.VMEM((B * _SEQ, 2 * c.lt_dim), dtype),  # LT K/V rows
            pltpu.VMEM((B, c.lt_dim), jnp.float32),    # LT current-row x
            pltpu.VMEM((B, D), jnp.float32),           # embedding accumulator
            pltpu.VMEM((B, S), jnp.int32),             # valid incl. new row
            pltpu.VMEM((B, D), jnp.float32),           # x carry
            pltpu.VMEM((B, D), jnp.float32),           # attention out
            pltpu.VMEM((n_wbuf, D, 3 * D), stream_dtype),   # qkv weights
            pltpu.VMEM((n_wbuf, D, D), stream_dtype),       # sa_out
            pltpu.VMEM((n_wbuf, D, c.d_ffn), stream_dtype),  # ff_proj
            pltpu.VMEM((n_wbuf, c.d_ffn, D), stream_dtype),  # ff_out
            pltpu.VMEM((n_buf, gb, S, D), k_cache.dtype),  # k group bufs
            pltpu.VMEM((n_buf, gb, S, D), v_cache.dtype),  # v group bufs
            pltpu.SemaphoreType.DMA(
                (8 + 2 * n_buf + 2 + (8 if n_wbuf == 2 else 0),)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(110 if n_buf <= 2 else 126) * 1024 * 1024),
    )(hidden.astype(dtype), posemb.astype(dtype),
      lt.in_proj_w.astype(dtype), lt.in_proj_b.astype(dtype).reshape(1, -1),
      pos_pad, lt.norm_self.astype(dtype).reshape(1, -1),
      lt.qkv.astype(dtype), lt.sa_out.astype(dtype),
      lt.norm_ff.astype(dtype).reshape(1, -1),
      lt.ff_proj.astype(dtype), lt.ff_out.astype(dtype),
      lt.out_proj_w.astype(dtype),
      lt.out_proj_b.astype(jnp.float32).reshape(n_cb, 1, -1),
      emb_tbl, forbid_eos.astype(jnp.int32).reshape(B, 1),
      may_continue.astype(jnp.int32).reshape(B, 1),
      norms, dec.norm_out.astype(jnp.float32).reshape(1, D),
      dec.xa_q.astype(dtype), dec.xa_out.astype(dtype),
      xa_k.astype(dtype), xa_v.astype(dtype),
      valid.astype(jnp.int32), enc_lengths.astype(jnp.int32).reshape(B, 1),
      temp_arr, seeds_col, scal,
      qkv_s, sao_s, ffp_s, ffo_s,
      qkv_w, sao_w, ffp_w, ffo_w, k_cache, v_cache)

    return sampled.T, argmax.T, hidden_out, k_out, v_out
