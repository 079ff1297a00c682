"""Batched fused local-transformer sampler: all B slots, one Pallas kernel.

The lockstep / continuous-batching loops sampled frame codes by vmapping the
XLA path (models/local_transformer.py), which cost ~330us (~17%) of the batched
step at batch 32: 8 sequential codebook iterations of tiny per-slot matmuls
that never fill the MXU. This kernel runs the whole 8-codebook loop for the
full batch in one pallas_call:

- grid = (8,) over codebooks; the per-codebook output head [lt_dim, vocab] and
  a PRE-PROJECTED audio-embedding table [vocab, lt_dim] live in HBM and stream
  through a manual 2-deep VMEM ring, each phase's copy issued a phase ahead,
  so every phase's weights are already resident when its compute starts and
  the kernel does not depend on the block pipeline's scheduling. (Slope-probe
  measurement — scripts/opt_slope_probe.py, the only trustworthy timing
  method on the tunneled device — puts this kernel at ~76us/call at B=32;
  the manual ring and the auto-pipelined BlockSpec form measure the same, so
  the ring is kept for its explicit prefetch depth, not a measured win.)
- every slot's growing 16-row sequence buffer lives flattened in one
  [B*16, lt_dim] VMEM scratch, so the shared-weight matmuls (QKV, FFN, output
  head) are single large MXU contractions instead of B tiny ones;
- the LT layer output is only ever needed at row ``cb`` of each slot (the
  buffer stores raw projected embeddings and the layer is re-run each
  iteration, magpie.cpp:1015-1034), so after the full-buffer QKV only the B
  selected rows are carried forward — selection and scatter are 0/1 matmuls,
  exact in f32;
- attention for the selected rows is one [B, B*16] score matmul with a
  block-diagonal (same-slot) causal mask;
- sampling is vectorized over rows: forbidden-token masking, per-row argmax
  (EOS detection), EXACT top-k membership (integer bisection on the float
  bits, ops/sampling.exact_topk_mask — bit-identical to jax.lax.top_k
  membership modulo value ties), then Gumbel-max at the given temperature
  with per-slot counter-based noise (ops/sampling.gumbel_from_seed): each
  slot's draws depend only on its own seed, never on batch composition;
- the sampled codes' next-codebook embeddings come from the pre-projected
  table by a one-hot matmul gather (1.0/0.0 rows — exact), removing the
  in-kernel 768->lt_dim projection entirely.

Greedy (temp < 0.01) is bit-exact with jax.vmap of the XLA path at f32 (same
rounding points as models/local_transformer._lt_layer_f32). Reference
semantics: magpie.cpp:1072-1317 (host-side sampler it replaces).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dot_hi, gelu_kernel
from .lt_sampler import _pad_rows_to_16

_SEQ = 16       # padded per-slot sequence rows (9 used)
_NEG = -1e30

# PROBE-ONLY ablation knob (scripts/opt_lt_anatomy.py): trace-time removal of
# kernel stages to attribute per-phase cost. Production code never sets it;
# outputs are WRONG under any non-empty value.
_ABLATE = ""


def _pos_row(pos_ref, row) -> jnp.ndarray:
    """Row ``row`` of the [16, lt_dim] position table as [1, lt_dim] f32.

    One-hot matmul gather (exact: 0/1 rows at HIGHEST precision) — Mosaic
    cannot prove a dynamic sublane start like ``pos_ref[pl.ds(cb+1, 1)]`` is
    8-aligned, but a [1, 16] x [16, lt] dot has fully static shapes."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, _SEQ), 1)
           == row).astype(jnp.float32)
    return dot_hi(sel, pos_ref[...].astype(jnp.float32))


def _layer_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return (c / jnp.sqrt(var + eps)) * w.astype(jnp.float32)


def _kernel(hidden_ref, in_proj_w_ref, in_proj_b_ref, pos_ref,
            norm_self_ref, qkv_ref, sa_out_ref, norm_ff_ref, ff_proj_ref,
            ff_out_ref, out_b_ref, forbid_ref,
            seeds_ref, temp_ref, out_w_hbm, pe_hbm,
            sampled_ref, argmax_ref, kv_ref, xcur_ref,
            ow_ring, pe_ring, ring_sems, *,
            n_batch: int, lt_dim: int, vocab: int, vocab_pad: int,
            vocab_lane: int, top_k: int,
            audio_bos_id: int, audio_eos_id: int, eps: float,
            gelu_tanh: bool, n_cb: int):
    cb = pl.program_id(0)
    B = n_batch
    R = B * _SEQ
    wdt = kv_ref.dtype
    slot = cb % 2

    def ow_dma(i, s):
        return pltpu.make_async_copy(out_w_hbm.at[i], ow_ring.at[s],
                                     ring_sems.at[0, s])

    def pe_dma(i, s):
        return pltpu.make_async_copy(pe_hbm.at[i], pe_ring.at[s],
                                     ring_sems.at[1, s])

    in_b = in_proj_b_ref[0, :].astype(jnp.float32)

    # Incremental K/V: LayerNorm + qkv run ONLY on the new row per phase
    # ([B, lt] instead of [B*16, lt]); K/V rows persist in ``kv_ref`` across
    # phases. Rows are immutable once written and LN/qkv are row-wise, so the
    # cached rows are bit-identical to a full-buffer recompute.
    @pl.when(cb == 0)
    def _init():
        if "noproj" not in _ABLATE:                                 # probe-only
            ow_dma(0, 0).start()
            ow_dma(1, 1).start()
        if "nofeedback" not in _ABLATE:
            pe_dma(0, 0).start()
            pe_dma(1, 1).start()
        kv_ref[...] = jnp.zeros_like(kv_ref)
        proj = dot_hi(hidden_ref[...], in_proj_w_ref[...]) + in_b   # [B, lt]
        xcur_ref[...] = (proj.astype(wdt).astype(jnp.float32)
                         + _pos_row(pos_ref, 0))

    x = xcur_ref[...]                                               # [B, lt]
    if "nolayer" in _ABLATE:                                        # probe-only
        x2 = x
    else:
        h = _layer_norm(x, norm_self_ref[0, :], eps).astype(wdt)
        qkv = dot_hi(h, qkv_ref[...])                               # [B, 3lt]
        q = qkv[:, :lt_dim].astype(wdt)
        kv_new = qkv[:, lt_dim:].astype(wdt)                        # [B, 2lt]

        rws = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        scat = ((rws // _SEQ ==
                 jax.lax.broadcasted_iota(jnp.int32, (R, B), 1))
                & (rws % _SEQ == cb)).astype(jnp.float32)           # [R, B]
        upd = dot_hi(scat, kv_new.astype(jnp.float32)).astype(wdt)
        kv_ref[...] = jnp.where(rws % _SEQ == cb, upd, kv_ref[...])

        rows = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
        own = jax.lax.broadcasted_iota(jnp.int32, (B, R), 0)
        scale = 1.0 / jnp.sqrt(jnp.float32(lt_dim))  # 1 head, d_head = lt_dim
        scores = dot_hi(q, kv_ref[:, :lt_dim].T) * scale            # [B, R]
        visible = (rows // _SEQ == own) & (rows % _SEQ <= cb)
        scores = jnp.where(visible, scores, _NEG)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)).astype(wdt)
        attn = dot_hi(probs, kv_ref[:, lt_dim:])                    # [B, lt]
        x1 = x + dot_hi(attn.astype(wdt), sa_out_ref[...])
        h2 = _layer_norm(x1, norm_ff_ref[0, :], eps).astype(wdt)
        ff = dot_hi(h2, ff_proj_ref[...])
        ff = gelu_kernel(ff, approximate=gelu_tanh).astype(wdt)
        x2 = x1 + dot_hi(ff, ff_out_ref[...])                       # [B, lt]

    # Logits live at lane-padded width (out_proj_w columns padded to a 128
    # multiple so the HBM ring DMA slices are lane-aligned); pad columns are
    # forced to _NEG below so argmax/top-k/sampling never see them.
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, vocab_lane), 1)
    if "noproj" in _ABLATE:                                         # probe-only
        logits = jnp.zeros((B, vocab_lane), jnp.float32) + x2[:, :1]
    else:
        ow_dma(cb, slot).wait()
        logits = dot_hi(x2.astype(wdt), ow_ring[slot])           # [B, vlane]
        # out_b row via one-hot matmul (0/1 x f32 at HIGHEST — exact; dynamic
        # sublane starts are not provably aligned for Mosaic).
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, n_cb), 1)
               == cb).astype(jnp.float32)
        logits = logits + dot_hi(sel, out_b_ref[...].astype(jnp.float32))

    # ---- forbidden-token masking (magpie.cpp:1131-1248) + lane padding
    forbidden = (ids == audio_bos_id) | \
                ((ids >= audio_bos_id + 2) & (ids <= audio_bos_id + 7)) | \
                (ids >= vocab)
    forbid_eos = forbid_ref[...] > 0                                # [B, 1]
    forbidden = forbidden | (forbid_eos & (ids == audio_eos_id))
    logits = jnp.where(forbidden, _NEG, logits)

    # Per-row argmax with first-max tie-breaking (== jnp.argmax).
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    amax = jnp.min(jnp.where(logits == row_max, ids, vocab_lane),
                   axis=-1).astype(jnp.int32)                       # [B]

    # Masked full-array writes: a (1, B) block would violate Mosaic's 8-sublane
    # rule, so the whole [n_cb, B] output revolves in VMEM across grid steps.
    out_row = jax.lax.broadcasted_iota(jnp.int32, (n_cb, B), 0)
    sampled_ref[...] = jnp.where(out_row == cb, amax[None, :], sampled_ref[...])
    argmax_ref[...] = jnp.where(out_row == cb, amax[None, :], argmax_ref[...])

    if "nosample" not in _ABLATE:                                   # probe knob
        # ---- EXACT top-k membership + per-slot counter-based Gumbel noise
        # (shared implementation, ops/sampling.py — backend-identical), under
        # pl.when(~greedy): temp<0.01 skips the bisection + Gumbel entirely
        # (cf. frame_step_batched.py).
        from ...ops import sampling as _sampling

        temp = temp_ref[0]

        @pl.when(temp >= 0.01)
        def _draw():
            in_topk = _sampling.exact_topk_mask(logits, top_k)
            base = _sampling.phase_seed(seeds_ref[...], cb)         # [B, 1]
            gumbel = _sampling.gumbel_from_seed(base, ids)
            safe_temp = jnp.maximum(temp, 0.01)
            z = jnp.where(in_topk, logits / safe_temp + gumbel, _NEG)
            drawn = jnp.min(jnp.where(z == jnp.max(z, axis=-1, keepdims=True),
                                      ids, vocab_lane),
                            axis=-1).astype(jnp.int32)              # [B]
            sampled_ref[...] = jnp.where(out_row == cb, drawn[None, :],
                                         sampled_ref[...])

    # The decided code (greedy or drawn) feeds the embedding gather.
    code = jnp.sum(jnp.where(out_row == cb, sampled_ref[...], 0),
                   axis=0).astype(jnp.int32)                        # [B]

    # ---- feedback: one-hot gather from the pre-projected table into the
    # next phase's current-row x.
    @pl.when(cb < n_cb - 1)
    def _feedback():
        if "nofeedback" in _ABLATE:                                 # probe-only
            xcur_ref[...] = (xcur_ref[...]
                             + code[:, None].astype(jnp.float32) * 1e-9)
            return
        pe_dma(cb, slot).wait()
        pe = pe_ring[slot]
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, vocab_pad), 1)
        tdt = pe.dtype
        tprec = jax.lax.Precision.HIGHEST if tdt == jnp.float32 else None
        onehot = (cols == code[:, None]).astype(tdt)
        emb = jnp.dot(onehot, pe,
                      preferred_element_type=jnp.float32,
                      precision=tprec)                              # [B, lt]
        xcur_ref[...] = (emb.astype(wdt).astype(jnp.float32)
                         + _pos_row(pos_ref, cb + 1))

    # ---- ring prefetch: phase cb just released slot cb%2; start phase cb+2's
    # copies into it. Every started copy must be awaited: ow(i) is waited by
    # phase i for i <= n_cb-1; pe(i) only for i <= n_cb-2 (the last phase has
    # no feedback), so pe prefetch stops one phase earlier.
    if "noproj" not in _ABLATE:                                     # probe-only
        @pl.when(cb + 2 < n_cb)
        def _prefetch_ow():
            ow_dma(cb + 2, slot).start()
    if "nofeedback" not in _ABLATE:
        @pl.when(cb + 3 < n_cb)
        def _prefetch_pe():
            pe_dma(cb + 2, slot).start()


def batched_shapes_ok(n_batch: int) -> bool:
    """The flat [B*16, lt_dim] buffer is transposed for the score matmul;
    Mosaic needs its sublane count to be a 128-lane multiple post-transpose."""
    return n_batch % 8 == 0


def sample_frame_codes_batched_pallas(
        hidden: jnp.ndarray, weights, config,
        seeds: jnp.ndarray, temperature: jnp.ndarray, top_k: int,
        forbid_eos: jnp.ndarray, gelu_tanh: bool = None,
        interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """hidden: [B, d_model], forbid_eos: [B] bool -> (sampled, argmax) [B, 8].

    ``seeds``: int32 [B] per-slot seeds (sampling.seed_from_key of each slot's
    per-frame subkey); every slot's draws are a pure function of its own seed.
    ``gelu_tanh`` defaults to the config's gelu_flavor.
    """
    lt = weights.lt
    c = config
    if gelu_tanh is None:
        gelu_tanh = c.gelu_tanh
    B = hidden.shape[0]
    dtype = hidden.dtype
    top_k = min(top_k, c.vocab_per_cb)
    n_cb = c.num_codebooks

    # Pre-projected per-codebook embedding table: in_proj applied to every
    # audio-embedding row (bias included), rounded to the compute dtype exactly
    # like models/local_transformer._in_proj. Weights-only -> XLA hoists it out
    # of the decode while_loop; ~8 * vocab * lt_dim, a few MB.
    from ..precision import DOT_PRECISION

    proj_emb = (jnp.einsum("cvd,dl->cvl", weights.audio_emb.astype(dtype),
                           lt.in_proj_w.astype(dtype),
                           preferred_element_type=jnp.float32,
                           precision=DOT_PRECISION)
                + lt.in_proj_b.astype(jnp.float32)).astype(dtype)
    proj_emb = _pad_rows_to_16(proj_emb)
    vocab_pad = proj_emb.shape[1]

    # Lane-pad the output head so the HBM ring DMA slices [1, lt, vlane] are
    # 128-aligned in their minor dim (Mosaic rejects unaligned HBM slices).
    vocab_lane = -(-c.vocab_per_cb // 128) * 128
    ow_pad = jnp.zeros((n_cb, c.lt_dim, vocab_lane), dtype)
    ow_pad = ow_pad.at[:, :, : c.vocab_per_cb].set(lt.out_proj_w.astype(dtype))
    ob_pad = jnp.full((n_cb, vocab_lane), _NEG, jnp.float32).at[
        :, : c.vocab_per_cb].set(lt.out_proj_b.astype(jnp.float32))

    pos_pad = jnp.zeros((_SEQ, c.lt_dim), dtype).at[: c.lt_max_pos].set(
        lt.pos_emb.astype(dtype)[:_SEQ])

    temp_arr = temperature.astype(jnp.float32).reshape(1)
    seeds_col = seeds.astype(jnp.int32).reshape(B, 1)

    kernel = functools.partial(
        _kernel, n_batch=B, lt_dim=c.lt_dim, vocab=c.vocab_per_cb,
        vocab_pad=vocab_pad, vocab_lane=vocab_lane, top_k=top_k,
        audio_bos_id=c.audio_bos_id,
        audio_eos_id=c.audio_eos_id, eps=c.eps, gelu_tanh=gelu_tanh,
        n_cb=n_cb)

    def vm(*blk):
        return pl.BlockSpec(blk, lambda cb: tuple(0 for _ in blk))

    sampled, argmax = pl.pallas_call(
        kernel,
        grid=(n_cb,),
        out_shape=(jax.ShapeDtypeStruct((n_cb, B), jnp.int32),
                   jax.ShapeDtypeStruct((n_cb, B), jnp.int32)),
        in_specs=[
            vm(B, c.d_model),                 # hidden
            vm(c.d_model, c.lt_dim),          # in_proj_w
            vm(1, c.lt_dim),                  # in_proj_b
            vm(_SEQ, c.lt_dim),               # pos_emb rows
            vm(1, c.lt_dim),                  # norm_self
            vm(c.lt_dim, 3 * c.lt_dim),       # qkv
            vm(c.lt_dim, c.lt_dim),           # sa_out
            vm(1, c.lt_dim),                  # norm_ff
            vm(c.lt_dim, c.lt_ffn_dim),       # ff_proj
            vm(c.lt_ffn_dim, c.lt_dim),       # ff_out
            vm(n_cb, vocab_lane),             # out_proj biases (const stack)
            vm(B, 1),                         # forbid_eos per slot
            vm(B, 1),                         # per-slot seeds
            pl.BlockSpec(memory_space=pltpu.SMEM),     # temperature
            pl.BlockSpec(memory_space=pltpu.HBM),      # out_proj weights
            pl.BlockSpec(memory_space=pltpu.HBM),      # pre-projected emb
        ],
        out_specs=(pl.BlockSpec((n_cb, B), lambda cb: (0, 0)),
                   pl.BlockSpec((n_cb, B), lambda cb: (0, 0))),
        scratch_shapes=[
            pltpu.VMEM((B * _SEQ, 2 * c.lt_dim), dtype),  # persistent K/V rows
            pltpu.VMEM((B, c.lt_dim), jnp.float32),       # current-row x
            pltpu.VMEM((2, c.lt_dim, vocab_lane), dtype),       # out_w ring
            pltpu.VMEM((2, vocab_pad, c.lt_dim), dtype),        # proj_emb ring
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(hidden, lt.in_proj_w.astype(dtype),
      lt.in_proj_b.astype(dtype).reshape(1, -1), pos_pad,
      lt.norm_self.astype(dtype).reshape(1, -1), lt.qkv.astype(dtype),
      lt.sa_out.astype(dtype), lt.norm_ff.astype(dtype).reshape(1, -1),
      lt.ff_proj.astype(dtype), lt.ff_out.astype(dtype),
      ob_pad,
      forbid_eos.astype(jnp.int32).reshape(B, 1),
      seeds_col, temp_arr,
      ow_pad, proj_emb)

    return sampled.T, argmax.T
