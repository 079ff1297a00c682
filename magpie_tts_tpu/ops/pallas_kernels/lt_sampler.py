"""Fused local-transformer frame sampler: one Pallas kernel per frame.

Replaces ~200 XLA ops per generated frame (8 sequential codebook iterations of
LT layer + head projection + top-k sampling + embedding feedback,
models/local_transformer.py) with a single pallas_call:

- grid = (8,) over codebooks; the per-codebook output head [256, 2024] streams
  through VMEM via its BlockSpec (auto double-buffered);
- the growing projected sequence lives in a VMEM scratch that persists across
  grid steps;
- sampling happens in-kernel: forbidden-token masking, argmax (EOS detection),
  EXACT top-k membership (integer bisection on the float bits,
  ops/sampling.exact_topk_mask), then Gumbel-max over the top-k candidates at
  the given temperature (the same top-k + temperature softmax categorical
  distribution as the reference, magpie.cpp:1072-1109);
- the sampled code's audio embedding row is fetched by dynamic async DMA and
  re-projected for the next iteration.

Greedy (temp < 0.01) matches models/local_transformer.py exactly. temp > 0
uses the shared counter-based noise (ops/sampling.gumbel_from_seed), so the
draw is a pure function of (seed, codebook, logits) — the same formula the
XLA path and the batched kernels evaluate, testable in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import dot_hi

_SEQ = 16       # padded sequence buffer rows (9 used)
_NEG = -1e30


def _layer_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return (c / jnp.sqrt(var + eps)) * w.astype(jnp.float32)


def _kernel(hidden_ref, in_proj_w_ref, in_proj_b_ref, pos_emb_ref,
            norm_self_ref, qkv_ref, sa_out_ref, norm_ff_ref, ff_proj_ref,
            ff_out_ref, out_w_ref, out_b_ref, emb_hbm, temp_ref, flags_ref,
            sampled_ref, argmax_ref,
            seq_ref, emb_scratch, code_smem, amax_smem, dma_sem, *,
            lt_dim: int, vocab: int, top_k: int,
            audio_bos_id: int, audio_eos_id: int, eps: float,
            gelu_tanh: bool, n_cb: int):
    cb = pl.program_id(0)

    in_w = in_proj_w_ref[...]
    in_b = in_proj_b_ref[0, :].astype(jnp.float32)

    @pl.when(cb == 0)
    def _init():
        seq_ref[...] = jnp.zeros_like(seq_ref)
        proj = dot_hi(hidden_ref[...], in_w) + in_b
        seq_ref[0:1, :] = proj.astype(seq_ref.dtype)

    # --- LT layer over the padded buffer; the causal mask makes rows > cb inert.
    n = _SEQ
    x = seq_ref[...].astype(jnp.float32) + pos_emb_ref[...].astype(jnp.float32)
    h = _layer_norm(x, norm_self_ref[0, :], eps).astype(seq_ref.dtype)
    qkv = dot_hi(h, qkv_ref[...])
    q = qkv[:, :lt_dim].astype(seq_ref.dtype)
    k = qkv[:, lt_dim:2 * lt_dim].astype(seq_ref.dtype)
    v = qkv[:, 2 * lt_dim:].astype(seq_ref.dtype)
    scale = 1.0 / jnp.sqrt(jnp.float32(lt_dim))  # single head, d_head = lt_dim
    scores = dot_hi(q, k.T) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    scores = jnp.where(cols <= rows, scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)).astype(seq_ref.dtype)
    attn = dot_hi(probs, v)
    x = x + dot_hi(attn.astype(seq_ref.dtype), sa_out_ref[...])
    h2 = _layer_norm(x, norm_ff_ref[0, :], eps).astype(seq_ref.dtype)
    ff = dot_hi(h2, ff_proj_ref[...])
    from .common import gelu_kernel

    ff = gelu_kernel(ff, approximate=gelu_tanh).astype(seq_ref.dtype)
    x = x + dot_hi(ff, ff_out_ref[...])

    # row cb -> logits for this codebook
    row_mask = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == cb
    hid = jnp.sum(jnp.where(row_mask, x, 0.0), axis=0, keepdims=True)  # [1, D]
    logits = dot_hi(hid.astype(seq_ref.dtype), out_w_ref[0])[0]
    logits = logits + out_b_ref[0, 0].astype(jnp.float32)  # [vocab]

    # --- forbidden-token masking (magpie.cpp:1131-1248)
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)[0]
    forbidden = (ids == audio_bos_id) | \
                ((ids >= audio_bos_id + 2) & (ids <= audio_bos_id + 7))
    forbid_eos = flags_ref[0] > 0
    forbidden = forbidden | (forbid_eos & (ids == audio_eos_id))
    logits = jnp.where(forbidden, _NEG, logits)

    amax = jnp.argmax(logits).astype(jnp.int32)

    # --- EXACT top-k membership + counter-based Gumbel noise: the shared
    # implementation in ops/sampling.py (pure jnp — identical under Mosaic,
    # XLA and interpret mode; noise depends only on (seed, codebook, column)).
    from ...ops import sampling as _sampling

    temp = temp_ref[0]
    code_smem[cb] = amax
    amax_smem[cb] = amax

    # Greedy (temp < 0.01, magpie.cpp:1263) skips the top-k bisection +
    # Gumbel draw entirely (cf. frame_step_batched.py).
    @pl.when(temp >= 0.01)
    def _draw():
        in_topk = _sampling.exact_topk_mask(logits[None, :], top_k)[0]
        base = _sampling.phase_seed(flags_ref[1], cb)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
        gumbel = _sampling.gumbel_from_seed(base, cols2)[0]
        safe_temp = jnp.maximum(temp, 0.01)
        z = jnp.where(in_topk, logits / safe_temp + gumbel, _NEG)
        code_smem[cb] = jnp.argmax(z).astype(jnp.int32)

    code = code_smem[cb]

    @pl.when(cb == n_cb - 1)
    def _emit():
        sampled_ref[0, :] = jnp.stack([code_smem[i] for i in range(n_cb)])
        argmax_ref[0, :] = jnp.stack([amax_smem[i] for i in range(n_cb)])

    # --- feedback: embed sampled code with THIS codebook's table, re-project
    @pl.when(cb < n_cb - 1)
    def _feedback():
        # HBM slices along the sublane dim must be tile-aligned (8 rows f32 /
        # 16 rows bf16): fetch the aligned 16-row window containing the code
        # (the table is padded to a multiple of 16), mask-select the row in
        # VMEM, and insert into the seq buffer with a masked full write (a
        # 1-row store at a dynamic index is not provably aligned for bf16).
        code = code_smem[cb]
        base = (code // 16) * 16
        copy = pltpu.make_async_copy(
            emb_hbm.at[cb, pl.ds(base, 16), :], emb_scratch, dma_sem)
        copy.start()
        copy.wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        emb = jnp.sum(jnp.where(rows == code - base,
                                emb_scratch[...].astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)
        proj = dot_hi(emb.astype(in_w.dtype), in_w) + in_b
        srows = jax.lax.broadcasted_iota(jnp.int32, (_SEQ, 1), 0)
        seq_ref[...] = jnp.where(srows == cb + 1, proj.astype(jnp.float32),
                                 seq_ref[...].astype(jnp.float32)
                                 ).astype(seq_ref.dtype)


def _pad_rows_to_16(table: jnp.ndarray) -> jnp.ndarray:
    """Pad dim 1 to a multiple of 16 so any 16-row fetch window is in bounds.

    Loop-invariant (weights only): XLA hoists the pad out of the decode loop.
    """
    rows = table.shape[1]
    pad = (-rows) % 16
    if pad == 0:
        return table
    return jnp.pad(table, ((0, 0), (0, pad), (0, 0)))


def sample_frame_codes_pallas(hidden: jnp.ndarray, weights, config,
                              seed: jnp.ndarray, temperature: jnp.ndarray,
                              top_k: int, forbid_eos: jnp.ndarray,
                              gelu_tanh: bool = None,
                              interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """hidden: [d_model] -> (sampled [8], argmax [8]) int32.

    ``seed``: int32 scalar; fold the frame index in before calling.
    ``gelu_tanh`` defaults to the config's gelu_flavor.
    """
    lt = weights.lt
    c = config
    if gelu_tanh is None:
        gelu_tanh = c.gelu_tanh
    dtype = hidden.dtype
    top_k = min(top_k, c.vocab_per_cb)

    temp_arr = temperature.astype(jnp.float32).reshape(1)
    flags = jnp.stack([forbid_eos.astype(jnp.int32),
                       seed.astype(jnp.int32)])

    pos_emb = jnp.zeros((_SEQ, c.lt_dim), dtype).at[: c.lt_max_pos].set(
        lt.pos_emb.astype(dtype)[:_SEQ])

    kernel = functools.partial(
        _kernel, lt_dim=c.lt_dim, vocab=c.vocab_per_cb,
        top_k=top_k, audio_bos_id=c.audio_bos_id, audio_eos_id=c.audio_eos_id,
        eps=c.eps, gelu_tanh=gelu_tanh, n_cb=c.num_codebooks)

    n_cb = c.num_codebooks

    def vm(*blk):
        return pl.BlockSpec(blk, lambda cb: tuple(0 for _ in blk))

    sampled, argmax = pl.pallas_call(
        kernel,
        grid=(n_cb,),
        out_shape=(jax.ShapeDtypeStruct((1, n_cb), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_cb), jnp.int32)),
        in_specs=[
            vm(1, c.d_model),                 # hidden
            vm(c.d_model, c.lt_dim),          # in_proj_w
            vm(1, c.lt_dim),                  # in_proj_b
            vm(_SEQ, c.lt_dim),               # pos_emb (padded)
            vm(1, c.lt_dim),                  # norm_self
            vm(c.lt_dim, 3 * c.lt_dim),       # qkv
            vm(c.lt_dim, c.lt_dim),           # sa_out
            vm(1, c.lt_dim),                  # norm_ff
            vm(c.lt_dim, c.lt_ffn_dim),       # ff_proj
            vm(c.lt_ffn_dim, c.lt_dim),       # ff_out
            pl.BlockSpec((1, c.lt_dim, c.vocab_per_cb), lambda cb: (cb, 0, 0)),
            pl.BlockSpec((1, 1, c.vocab_per_cb), lambda cb: (cb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),      # audio_emb
            pl.BlockSpec(memory_space=pltpu.SMEM),     # temperature
            pl.BlockSpec(memory_space=pltpu.SMEM),     # flags [forbid_eos, seed]
        ],
        out_specs=(pl.BlockSpec((1, n_cb), lambda cb: (0, 0)),
                   pl.BlockSpec((1, n_cb), lambda cb: (0, 0))),
        scratch_shapes=[
            pltpu.VMEM((_SEQ, c.lt_dim), dtype),       # seq buffer
            pltpu.VMEM((16, c.d_model), dtype),        # aligned embedding window
            pltpu.SMEM((n_cb,), jnp.int32),            # sampled codes
            pltpu.SMEM((n_cb,), jnp.int32),            # argmax codes
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(hidden.reshape(1, -1), lt.in_proj_w.astype(dtype),
      lt.in_proj_b.astype(dtype).reshape(1, -1), pos_emb,
      lt.norm_self.astype(dtype).reshape(1, -1), lt.qkv.astype(dtype),
      lt.sa_out.astype(dtype), lt.norm_ff.astype(dtype).reshape(1, -1),
      lt.ff_proj.astype(dtype), lt.ff_out.astype(dtype),
      lt.out_proj_w.astype(dtype),
      lt.out_proj_b.astype(jnp.float32).reshape(-1, 1, lt.out_proj_b.shape[-1]),
      _pad_rows_to_16(weights.audio_emb.astype(dtype)), temp_arr, flags)

    return sampled[0], argmax[0]
