"""Fused per-frame kernel: LT sampling + embedding + all 12 decoder layers.

One pallas_call per generated frame, grid = (8 LT codebook phases + 12 decoder
layers,). Fusing the two kernels (lt_sampler.py, decoder_step.py) buys what
separate launches cannot: the decoder's layer-0 weight/cache DMAs start in the
FIRST LT phase, so the ~60us of LT compute hides under the ~135us of decoder
HBM streaming that dominates the frame (the TensorCore runs one kernel at a
time, so separately launched kernels strictly serialize).

The frame embedding is also produced in-kernel: the LT feedback path already
fetches the sampled code's embedding row for codebooks 0..6; phase 7 fetches
the last row, and the running sum / 8 (+ position embedding, reference
magpie.cpp:1434 scale) seeds the decoder phases directly — no XLA gather
between the kernels.

Reference semantics: magpie.cpp:1113-1317 (LT sampling), 3484-3528 (cached
decoder step); parity oracle is the XLA path (models/local_transformer.py +
models/decoder.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dot_hi, gelu_kernel

_SEQ = 16       # padded LT sequence buffer rows (9 used)
_NEG = -1e30


def _ln(x, w, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return (c / jnp.sqrt(var + eps)) * w.astype(jnp.float32)


def _kernel(hidden_ref, posemb_ref,
            # LT weights
            lt_inw_ref, lt_inb_ref, lt_pos_ref, lt_ns_ref, lt_qkv_ref,
            lt_sao_ref, lt_nf_ref, lt_ffp_ref, lt_ffo_ref, lt_ow_ref, lt_ob_ref,
            # decoder per-layer VMEM blocks
            norms_ref, final_norm_ref, xa_q_ref, xa_out_ref, xa_k_ref, xa_v_ref,
            qkv_s_ref, sao_s_ref, ffp_s_ref, ffo_s_ref,
            # scalars
            temp_ref, flags_ref, scal_ref,
            # HBM
            emb_hbm, qkv_hbm, sao_hbm, ffp_hbm, ffo_hbm, kc_hbm, vc_hbm,
            # outputs
            sampled_ref, argmax_ref, hidden_out_ref, kc_out, vc_out,
            # scratch
            seq_ref, emb_win, emb_acc, code_smem, amax_smem,
            x_ref, qkv_buf, sao_buf, ffp_buf, ffo_buf, kbuf, vbuf, sems, *,
            n_cb: int, lt_dim: int, vocab: int, top_k: int,
            audio_bos_id: int, audio_eos_id: int,
            n_layers: int, d_model: int, n_heads: int, d_xa: int,
            max_seq: int, enc_pad: int, eps: float, cache_chunk: int,
            gelu_tanh: bool = False, q8_blocks: bool = False):
    i = pl.program_id(0)
    pos = scal_ref[0]
    enc_len = scal_ref[1]
    wdt = hidden_ref.dtype

    def stream_w(buf_ref, s_ref):
        """Weight tile for a streamed matmul. Q8_0-native mode dequantizes
        in-kernel: s (f16-valued f32, one per 32 input rows) x int8 q is
        EXACT in f32, so the tile is bit-identical to the load-time-dequant
        path's (io/magpie_weights.Q8DecoderStream). The dot CONSUMING the
        tile may still be compiled with a different reduction order when the
        backend fuses this multiply into it (docs/PARITY.md "Q8_0-native
        serving" has the full numerics contract).
        """
        if not q8_blocks:
            return buf_ref[...].astype(wdt)
        s = jnp.repeat(s_ref[0].astype(jnp.float32), 32, axis=0)
        return (s * buf_ref[...].astype(jnp.float32)).astype(wdt)

    def out_scale(x, s_ref):
        """Int8-column mode scales matmul OUTPUTS (dense mode's scales are
        ones — an exact multiply); Q8 mode's scales are already consumed by
        stream_w, so the f32 result passes through untouched."""
        if q8_blocks:
            return x
        return x * s_ref[0].astype(jnp.float32)

    def dma(src, dst, sem_idx):
        return pltpu.make_async_copy(src, dst, sems.at[sem_idx])

    def cache_io(layer, op):
        """Start or wait this layer's K/V cache copies.

        Chunked mode streams only ceil((pos+1)/cache_chunk) chunks
        (scal_ref[2]) — cache DMA bytes are position-proportional, mirroring
        frame_step_batched. Rows past the streamed extent are the prologue's
        zeros; attention masks them (row <= pos) so their contribution is an
        exact 0 either way — bit-identical to full streaming. The 16-row
        write-back window [base, base+16) always lies inside the extent
        (extent is a multiple of 160 >= pos+1 >= base+1, and multiples of
        160 are multiples of 16)."""
        if cache_chunk:
            n_ch = scal_ref[2]
            for j in range(max_seq // cache_chunk):
                @pl.when(j < n_ch)
                def _io(j=j):
                    sl = pl.ds(j * cache_chunk, cache_chunk)
                    getattr(dma(kc_hbm.at[layer, sl], kbuf.at[sl], 1), op)()
                    getattr(dma(vc_hbm.at[layer, sl], vbuf.at[sl], 2), op)()
        else:
            getattr(dma(kc_hbm.at[layer], kbuf, 1), op)()
            getattr(dma(vc_hbm.at[layer], vbuf, 2), op)()

    # ---- prologue: start decoder layer-0 streaming under the LT phases ----
    @pl.when(i == 0)
    def _prologue():
        emb_acc[...] = jnp.zeros_like(emb_acc)
        if cache_chunk:
            # Un-DMA'd rows must not hold NaN bit patterns (0 * NaN = NaN in
            # the probs @ V contraction even though attention masks them).
            kbuf[...] = jnp.zeros_like(kbuf)
            vbuf[...] = jnp.zeros_like(vbuf)
        dma(qkv_hbm.at[0], qkv_buf, 0).start()
        cache_io(0, "start")
        dma(sao_hbm.at[0], sao_buf, 3).start()
        dma(ffp_hbm.at[0], ffp_buf, 6).start()
        dma(ffo_hbm.at[0], ffo_buf, 7).start()

    # ======================= LT phases (i in [0, n_cb)) =====================
    @pl.when(i < n_cb)
    def _lt_phase():
        cb = i
        in_w = lt_inw_ref[...]
        in_b = lt_inb_ref[0, :].astype(jnp.float32)

        @pl.when(cb == 0)
        def _init():
            seq_ref[...] = jnp.zeros_like(seq_ref)
            proj = dot_hi(hidden_ref[...], in_w) + in_b
            seq_ref[0:1, :] = proj.astype(seq_ref.dtype)

        n = _SEQ
        x = (seq_ref[...].astype(jnp.float32) +
             lt_pos_ref[...].astype(jnp.float32))
        h = _ln(x, lt_ns_ref[0, :], eps).astype(seq_ref.dtype)
        qkv = dot_hi(h, lt_qkv_ref[...])
        q = qkv[:, :lt_dim].astype(seq_ref.dtype)
        k = qkv[:, lt_dim:2 * lt_dim].astype(seq_ref.dtype)
        v = qkv[:, 2 * lt_dim:].astype(seq_ref.dtype)
        scale = 1.0 / jnp.sqrt(jnp.float32(lt_dim))
        scores = dot_hi(q, k.T) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        scores = jnp.where(cols <= rows, scores, _NEG)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)
                 ).astype(seq_ref.dtype)
        attn = dot_hi(probs, v)
        x = x + dot_hi(attn.astype(seq_ref.dtype), lt_sao_ref[...])
        h2 = _ln(x, lt_nf_ref[0, :], eps).astype(seq_ref.dtype)
        ff = dot_hi(h2, lt_ffp_ref[...])
        ff = gelu_kernel(ff, approximate=gelu_tanh).astype(seq_ref.dtype)
        x = x + dot_hi(ff, lt_ffo_ref[...])

        row_mask = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == cb
        hid = jnp.sum(jnp.where(row_mask, x, 0.0), axis=0, keepdims=True)
        logits = dot_hi(hid.astype(seq_ref.dtype), lt_ow_ref[0])[0]
        logits = logits + lt_ob_ref[0, 0].astype(jnp.float32)

        ids = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)[0]
        forbidden = (ids == audio_bos_id) | \
                    ((ids >= audio_bos_id + 2) & (ids <= audio_bos_id + 7))
        forbid_eos = flags_ref[0] > 0
        forbidden = forbidden | (forbid_eos & (ids == audio_eos_id))
        logits = jnp.where(forbidden, _NEG, logits)

        amax = jnp.argmax(logits).astype(jnp.int32)

        # EXACT top-k membership + counter-based Gumbel noise — the shared
        # implementation in ops/sampling.py (pure jnp, backend-identical).
        from ...ops import sampling as _sampling

        temp = temp_ref[0]
        code_smem[cb] = amax
        amax_smem[cb] = amax

        # Greedy (temp < 0.01, reference rule magpie.cpp:1263) skips the
        # top-k bisection + Gumbel draw entirely (cf. frame_step_batched.py).
        @pl.when(temp >= 0.01)
        def _draw():
            in_topk = _sampling.exact_topk_mask(logits[None, :], top_k,
                                                early_exit=True)[0]
            base = _sampling.phase_seed(flags_ref[1], cb)
            cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
            gumbel = _sampling.gumbel_from_seed(base, cols2)[0]
            safe_temp = jnp.maximum(temp, 0.01)
            z = jnp.where(in_topk, logits / safe_temp + gumbel, _NEG)
            code_smem[cb] = jnp.argmax(z).astype(jnp.int32)

        code = code_smem[cb]

        # fetch this code's embedding row (16-aligned window), accumulate the
        # frame embedding, and (for cb < 7) feed the projection back into seq
        base = (code // 16) * 16
        copy = dma(emb_hbm.at[cb, pl.ds(base, 16), :], emb_win, 8)
        copy.start()
        copy.wait()
        rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        emb = jnp.sum(jnp.where(rows16 == code - base,
                                emb_win[...].astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)
        emb_acc[...] += emb

        @pl.when(cb < n_cb - 1)
        def _feedback():
            proj = dot_hi(emb.astype(in_w.dtype), in_w) + in_b
            srows = jax.lax.broadcasted_iota(jnp.int32, (_SEQ, 1), 0)
            seq_ref[...] = jnp.where(srows == cb + 1,
                                     proj.astype(jnp.float32),
                                     seq_ref[...].astype(jnp.float32)
                                     ).astype(seq_ref.dtype)

        @pl.when(cb == n_cb - 1)
        def _emit_codes():
            sampled_ref[0, :] = jnp.stack([code_smem[j] for j in range(n_cb)])
            argmax_ref[0, :] = jnp.stack([amax_smem[j] for j in range(n_cb)])
            # seed the decoder: mean embedding + position embedding, with
            # the XLA path's rounding points (mean rounds to wdt, the pos-emb
            # add happens in wdt) so both paths feed identical decoder inputs
            mean = (emb_acc[...] * (1.0 / n_cb)).astype(wdt).astype(jnp.float32)
            x0 = mean + posemb_ref[...].astype(jnp.float32)
            x_ref[...] = x0.astype(wdt).astype(jnp.float32)

    # ===================== decoder phases (i in [n_cb, n_cb+L)) ============
    @pl.when(i >= n_cb)
    def _decoder_phase():
        l = i - n_cb
        d_head = d_model // n_heads

        x = x_ref[...]  # (1, d_model) f32

        # Every stream runs one phase ahead: wait -> single use -> start l+1.
        # DMA is then fully hidden under compute (per-layer weight DMA ~9us
        # int8 vs ~10us compute; serial waits cost ~40% otherwise).
        h = _ln(x, norms_ref[0, 0], eps).astype(wdt)
        dma(qkv_hbm.at[l], qkv_buf, 0).wait()
        qkv = dot_hi(h, stream_w(qkv_buf, qkv_s_ref))
        qkv = out_scale(qkv, qkv_s_ref).astype(wdt)

        @pl.when(l < n_layers - 1)
        def _prefetch_qkv():
            dma(qkv_hbm.at[l + 1], qkv_buf, 0).start()

        q = qkv[:, :d_model].astype(jnp.float32)
        k_new = qkv[:, d_model:2 * d_model].astype(kbuf.dtype)
        v_new = qkv[:, 2 * d_model:].astype(vbuf.dtype)

        cache_io(l, "wait")
        base = (pos // 16) * 16
        wrows = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) + base
        kwin = kbuf[pl.ds(base, 16), :]
        vwin = vbuf[pl.ds(base, 16), :]
        kbuf[pl.ds(base, 16), :] = jnp.where(wrows == pos, k_new, kwin)
        vbuf[pl.ds(base, 16), :] = jnp.where(wrows == pos, v_new, vwin)
        dma(kbuf.at[pl.ds(base, 16)], kc_out.at[l, pl.ds(base, 16)], 4).start()
        dma(vbuf.at[pl.ds(base, 16)], vc_out.at[l, pl.ds(base, 16)], 5).start()

        # Bit-exact algebraic forms with cache-dtype operands — see
        # decoder_step.py (single-pass bf16 dots, exact products).
        lane = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 0)
        head = jax.lax.broadcasted_iota(jnp.int32, (d_model, n_heads), 1)
        seg = (lane // d_head == head).astype(jnp.float32)
        cdt = kbuf.dtype
        hi_p = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None
        qseg = (q.T * seg).astype(cdt)
        scores = jnp.dot(kbuf[...], qseg,
                         preferred_element_type=jnp.float32, precision=hi_p)
        scores = scores * (1.0 / jnp.sqrt(jnp.float32(d_head)))
        row = jax.lax.broadcasted_iota(jnp.int32, (max_seq, n_heads), 0)
        scores = jnp.where(row <= pos, scores, _NEG)
        m = jnp.max(scores, axis=0, keepdims=True)
        p = jnp.exp(scores - m)
        probs = p / jnp.sum(p, axis=0, keepdims=True)
        probs_w = probs.astype(wdt).astype(cdt)
        pv = jax.lax.dot_general(
            probs_w, vbuf[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi_p)
        ones_h = jnp.ones((1, n_heads), jnp.float32)
        attn = dot_hi(ones_h, pv * seg.T)

        dma(sao_hbm.at[l], sao_buf, 3).wait()
        x = x + out_scale(dot_hi(attn.astype(wdt),
                                 stream_w(sao_buf, sao_s_ref)), sao_s_ref)

        @pl.when(l < n_layers - 1)
        def _prefetch_sao():
            dma(sao_hbm.at[l + 1], sao_buf, 3).start()

        hq = _ln(x, norms_ref[0, 1], eps).astype(wdt)
        q2 = dot_hi(hq, xa_q_ref[0]).astype(wdt)
        sx = jnp.dot(xa_k_ref[0], q2.T,
                     preferred_element_type=jnp.float32, precision=hi_p)
        sx = sx * (1.0 / jnp.sqrt(jnp.float32(d_xa)))
        erow = jax.lax.broadcasted_iota(jnp.int32, (enc_pad, 1), 0)
        sx = jnp.where(erow < enc_len, sx, _NEG)
        mx = jnp.max(sx, axis=0, keepdims=True)
        px = jnp.exp(sx - mx)
        px = px / jnp.sum(px, axis=0, keepdims=True)
        px_w = px.astype(wdt)
        xa = jax.lax.dot_general(
            px_w, xa_v_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi_p)
        x = x + dot_hi(xa.astype(wdt), xa_out_ref[0])

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

        dma(kbuf.at[pl.ds(base, 16)], kc_out.at[l, pl.ds(base, 16)], 4).wait()
        dma(vbuf.at[pl.ds(base, 16)], vc_out.at[l, pl.ds(base, 16)], 5).wait()

        @pl.when(l < n_layers - 1)
        def _prefetch_cache():
            cache_io(l + 1, "start")

        @pl.when(l == n_layers - 1)
        def _emit():
            hidden_out_ref[...] = _ln(x, final_norm_ref[0], eps
                                      ).astype(hidden_out_ref.dtype)


def frame_step_pallas(hidden: jnp.ndarray, pos: jnp.ndarray,
                      xa_k: jnp.ndarray, xa_v: jnp.ndarray,
                      k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                      weights, config,
                      seed: jnp.ndarray, temperature: jnp.ndarray,
                      top_k: int, forbid_eos: jnp.ndarray,
                      enc_length: Optional[jnp.ndarray] = None,
                      int8_stream=None, q8_stream=None,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray, jnp.ndarray]:
    """One full frame: sample 8 codes from ``hidden``, embed, run the decoder.

    Returns (sampled [8], argmax [8], new_hidden [d_model], k_cache, v_cache).
    Caches update in place (aliased). ``pos`` is the cache slot the NEW frame's
    K/V are written to.
    """
    from ...io.magpie_weights import Q8DecoderStream
    from .lt_sampler import _pad_rows_to_16

    if q8_stream is None and isinstance(int8_stream, Q8DecoderStream):
        # Callers thread one "stream" slot; dispatch on its type.
        q8_stream, int8_stream = int8_stream, None

    dec = weights.decoder
    lt = weights.lt
    c = config
    dtype = weights.text_emb.dtype
    L, S, D = k_cache.shape
    E = xa_k.shape[1]
    if enc_length is None:
        enc_length = jnp.int32(E)
    top_k = min(top_k, c.vocab_per_cb)

    assert int8_stream is None or q8_stream is None, \
        "int8_stream and q8_stream are mutually exclusive"
    if q8_stream is not None:
        s = q8_stream
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

    posemb_row = jax.lax.dynamic_slice_in_dim(
        dec.pos_emb.astype(jnp.float32), pos, 1, 0)  # [1, D]
    norms = jnp.stack([dec.norm_self, dec.norm_xa_q, dec.norm_ff],
                      axis=1).astype(jnp.float32)
    # Position-proportional cache streaming (see cache_io in the kernel) is a
    # measured NEGATIVE for the single-stream kernel (same-session slope A/B:
    # chunked 279.9/291.1 vs full 282.6/281.6 us at pos 150/450): unlike the
    # batched kernel, this kernel's cache DMA is already fully hidden under
    # compute, and the 4 predicated chunk issues cost ~10 us at late
    # positions. Kept as a probe knob (MAGPIE_SS_CHUNK=1), default off.
    import os
    cache_chunk = 160 if (S % 160 == 0
                          and os.environ.get("MAGPIE_SS_CHUNK", "0") == "1"
                          ) else 0
    n_chunks = ((pos.astype(jnp.int32) + cache_chunk) // cache_chunk
                if cache_chunk else jnp.int32(0))
    scal = jnp.stack([pos.astype(jnp.int32), enc_length.astype(jnp.int32),
                      n_chunks])
    temp_arr = temperature.astype(jnp.float32).reshape(1)
    flags = jnp.stack([forbid_eos.astype(jnp.int32), seed.astype(jnp.int32)])
    lt_pos = jnp.zeros((_SEQ, c.lt_dim), dtype).at[: c.lt_max_pos].set(
        lt.pos_emb.astype(dtype)[:_SEQ])

    n_cb = c.num_codebooks
    grid = (n_cb + c.dec_layers,)

    kernel = functools.partial(
        _kernel, n_cb=n_cb, lt_dim=c.lt_dim, vocab=c.vocab_per_cb,
        top_k=top_k, audio_bos_id=c.audio_bos_id, audio_eos_id=c.audio_eos_id,
        n_layers=c.dec_layers, d_model=D, n_heads=c.dec_sa_heads,
        d_xa=c.d_xa, max_seq=S, enc_pad=E, eps=c.eps,
        cache_chunk=cache_chunk, gelu_tanh=c.gelu_tanh,
        q8_blocks=q8_stream is not None)

    const = lambda *blk: pl.BlockSpec(blk, lambda i: tuple(0 for _ in blk))
    lt_blk = lambda *blk: pl.BlockSpec(
        blk, lambda i: (jnp.minimum(i, n_cb - 1),) + tuple(0 for _ in blk[1:]))
    dec_blk = lambda *blk: pl.BlockSpec(
        blk, lambda i: (jnp.clip(i - n_cb, 0, c.dec_layers - 1),) +
        tuple(0 for _ in blk[1:]))

    sampled, argmax, hidden_out, k_out, v_out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((1, n_cb), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_cb), jnp.int32),
                   jax.ShapeDtypeStruct((1, D), dtype),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)),
        in_specs=[
            const(1, D),                       # hidden
            const(1, D),                       # posemb row
            const(D, c.lt_dim),                # lt in_proj_w
            const(1, c.lt_dim),                # lt in_proj_b
            const(_SEQ, c.lt_dim),             # lt pos emb
            const(1, c.lt_dim),                # lt norm_self
            const(c.lt_dim, 3 * c.lt_dim),     # lt qkv
            const(c.lt_dim, c.lt_dim),         # lt sa_out
            const(1, c.lt_dim),                # lt norm_ff
            const(c.lt_dim, c.lt_ffn_dim),     # lt ff_proj
            const(c.lt_ffn_dim, c.lt_dim),     # lt ff_out
            lt_blk(1, c.lt_dim, c.vocab_per_cb),   # lt out_proj_w
            lt_blk(1, 1, c.vocab_per_cb),          # lt out_proj_b
            dec_blk(1, 3, D),                  # norms
            const(1, D),                       # final norm
            dec_blk(1, D, c.d_xa),             # xa_q
            dec_blk(1, c.d_xa, D),             # xa_out
            dec_blk(1, E, c.d_xa),             # xa_k
            dec_blk(1, E, c.d_xa),             # xa_v
            dec_blk(1, *qkv_s.shape[1:]),      # qkv scales (cols or q8 blocks)
            dec_blk(1, *sao_s.shape[1:]),      # sa_out scales
            dec_blk(1, *ffp_s.shape[1:]),      # ff_proj scales
            dec_blk(1, *ffo_s.shape[1:]),      # ff_out scales
            pl.BlockSpec(memory_space=pltpu.SMEM),   # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),   # flags
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal
            pl.BlockSpec(memory_space=pltpu.HBM),    # audio emb
            pl.BlockSpec(memory_space=pltpu.HBM),    # qkv
            pl.BlockSpec(memory_space=pltpu.HBM),    # sao
            pl.BlockSpec(memory_space=pltpu.HBM),    # ffp
            pl.BlockSpec(memory_space=pltpu.HBM),    # ffo
            pl.BlockSpec(memory_space=pltpu.HBM),    # k cache in
            pl.BlockSpec(memory_space=pltpu.HBM),    # v cache in
        ],
        out_specs=(pl.BlockSpec((1, n_cb), lambda i: (0, 0)),
                   pl.BlockSpec((1, n_cb), lambda i: (0, 0)),
                   pl.BlockSpec((1, D), lambda i: (0, 0)),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        input_output_aliases={31: 3, 32: 4},   # caches update in place
        scratch_shapes=[
            pltpu.VMEM((_SEQ, c.lt_dim), dtype),       # LT seq buffer
            pltpu.VMEM((16, D), dtype),                # embedding window
            pltpu.VMEM((1, D), jnp.float32),           # embedding accumulator
            pltpu.SMEM((n_cb,), jnp.int32),            # sampled codes
            pltpu.SMEM((n_cb,), jnp.int32),            # argmax codes
            pltpu.VMEM((1, D), jnp.float32),           # x carry
            pltpu.VMEM((D, 3 * D), stream_dtype),      # qkv weights
            pltpu.VMEM((D, D), stream_dtype),          # sa_out
            pltpu.VMEM((D, c.d_ffn), stream_dtype),    # ff_proj
            pltpu.VMEM((c.d_ffn, D), stream_dtype),    # ff_out
            pltpu.VMEM((S, D), k_cache.dtype),         # k block
            pltpu.VMEM((S, D), v_cache.dtype),         # v block
            pltpu.SemaphoreType.DMA((9,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )(hidden.reshape(1, -1).astype(dtype), posemb_row,
      lt.in_proj_w.astype(dtype), lt.in_proj_b.astype(dtype).reshape(1, -1),
      lt_pos, lt.norm_self.astype(dtype).reshape(1, -1), lt.qkv.astype(dtype),
      lt.sa_out.astype(dtype), lt.norm_ff.astype(dtype).reshape(1, -1),
      lt.ff_proj.astype(dtype), lt.ff_out.astype(dtype),
      lt.out_proj_w.astype(dtype),
      lt.out_proj_b.astype(jnp.float32).reshape(-1, 1, lt.out_proj_b.shape[-1]),
      norms, dec.norm_out.astype(jnp.float32).reshape(1, D),
      dec.xa_q.astype(dtype), dec.xa_out.astype(dtype),
      xa_k.astype(dtype), xa_v.astype(dtype),
      qkv_s, sao_s, ffp_s, ffo_s,
      temp_arr, flags, scal,
      _pad_rows_to_16(weights.audio_emb.astype(dtype)),
      qkv_w, sao_w, ffp_w, ffo_w, k_cache, v_cache)

    return sampled[0], argmax[0], hidden_out[0], k_out, v_out
