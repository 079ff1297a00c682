"""Fused codec res-layer: all 18 convs of a stage in ONE Pallas kernel.

`models/codec.res_layer` is 3 parallel branches x 3 residual blocks x 2 fused
snake-convs = 18 `snake_causal_conv` pallas calls per stage. Each call streams
the full [T, C] activation HBM->VMEM->HBM, so a mid-stage res layer moves
~36x its activation size in HBM traffic while its matmuls are only
[tile,128]x[128,128] — the measured ~23% MXU utilization of stages 2-4
(docs/STATUS.md). This kernel keeps one time tile resident in VMEM through
the WHOLE layer:

- the input window is (H + tile) raw rows, H = the layer's total causal halo
  (sum of every conv's (k-1)*dilation along the deepest branch, 120 rows for
  the k=11 branch) — fetched once from the previous time block;
- each conv consumes a shrinking valid region of the window: conv outputs are
  written back at the same row coordinates with `off += halo_conv` garbage
  head rows, which the next conv's taps never read;
- on the FIRST tile the head rows represent t < 0 and are re-zeroed after
  every conv (+bias), reproducing each conv's own causal zero padding exactly
  (snake/leaky activations preserve zeros);
- per-block residuals and the 3-branch mean happen in-register/VMEM;
- time-packed stages (C = 54/27 -> p = 2/4 lanes packing,
  codec_conv.pack_time) run the same kernel on `packed_conv_weights`
  (dilation-1 taps in the packed domain).

HBM traffic per layer: read (H+T)*C + write T*C — 18x less than the per-conv
path. Weights (~126 taps x 128x128) stay VMEM-resident for the whole grid.

Reference semantics: nano-codec.cpp res layers (mean of 3 branches of 3
dilated residual blocks); parity oracle `models/codec.res_layer` (XLA), bound
by tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import codec_conv as cc

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(prev_ref, cur_ref, bias_ref, alpha_ref, mask_ref, *rest,
            conv_meta, branch_starts, tile: int, H: int,
            leaky_slope: float, n_branches: int):
    """rest = 18 weight refs (one per conv, [k_c, cp, cp]) + o_ref + scratches.

    conv_meta: tuple of (n_taps, dilation) per conv, in branch-major order
    (branch 0 convs, branch 1 convs, ...); branch_starts: index of each
    branch's first conv in conv_meta.
    """
    n_convs = len(conv_meta)
    w_refs = rest[:n_convs]
    o_ref = rest[n_convs]
    win_ref, h_ref, r_ref, acc_ref = rest[n_convs + 1: n_convs + 5]
    i = pl.program_id(0)
    W = H + tile
    cp = win_ref.shape[1]
    dt = win_ref.dtype

    @pl.when(i == 0)
    def _zero_halo():
        win_ref[0:H, :] = jnp.zeros((H, cp), dt)

    @pl.when(i > 0)
    def _copy_halo():
        win_ref[0:H, :] = prev_ref[tile - H: tile, :]

    win_ref[H:, :] = cur_ref[...]

    def activate(x, c):
        xf = x.astype(jnp.float32)
        alpha = alpha_ref[c, :].astype(jnp.float32)
        mask = mask_ref[c, :]
        s = cc._fast_sin(alpha * xf)
        snake = xf + (s * s) * (1.0 / alpha)
        leaky = jnp.where(xf >= 0, xf, leaky_slope * xf)
        return jnp.where(mask > 0, snake, leaky).astype(dt)

    def conv(src_ref, dst_ref, c, off):
        """dst[t] = act(src)[t-halo..t] @ w  for t in [off+halo, W)."""
        n_taps, dil = conv_meta[c]
        halo_c = (n_taps - 1) * dil
        a = activate(src_ref[...], c)
        n = W - off - halo_c
        acc = jnp.dot(a[off: off + n], w_refs[c][0],
                      preferred_element_type=jnp.float32)
        for tap in range(1, n_taps):
            s = off + tap * dil
            acc = acc + jnp.dot(a[s: s + n], w_refs[c][tap],
                                preferred_element_type=jnp.float32)
        dst_ref[off + halo_c:, :] = (
            acc + bias_ref[c, :].astype(jnp.float32)).astype(dt)

        @pl.when(i == 0)
        def _rezero():   # t < 0 rows: each conv causally zero-pads its input
            dst_ref[0:H, :] = jnp.zeros((H, cp), dt)

        return off + halo_c

    n_blocks = (len(conv_meta) // n_branches) // 2
    for b in range(n_branches):
        h_ref[...] = win_ref[...]
        off = 0
        c = branch_starts[b]
        for blk in range(n_blocks):
            off_r = conv(h_ref, r_ref, c, off)
            off_r = conv(r_ref, r_ref, c + 1, off_r)
            c += 2
            h_ref[...] = h_ref[...] + r_ref[...]
            off = off_r
        if b == 0:
            acc_ref[...] = h_ref[H:, :]
        else:
            acc_ref[...] = acc_ref[...] + h_ref[H:, :]

    o_ref[...] = (acc_ref[...].astype(jnp.float32)
                  / n_branches).astype(dt)


def res_layer_fused(x: jnp.ndarray, branches, dilations: Sequence[int],
                    leaky_slope: float = 0.01, tile: Optional[int] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused res layer for one utterance. x: [T, C] -> [T, C].

    branches: sequence of 3 branch tuples of ResBlockWeights (in_conv_w
    [k, C, C] WIO, biases, HalfSnake alphas). Small-channel stages are run in
    the time-packed lane domain automatically (C*2 <= 128).
    """
    T, C = x.shape
    p = cc.pick_pack(C, C)

    convs = []      # (w [k, cp, cp], bias [cp], alpha [cp], mask [cp], dil)
    if p > 1:
        cp = LANE
        xw = cc.pack_time(x, p)
        for branch in branches:
            for blk, d in zip(branch, dilations):
                for (w, b, al, dil) in ((blk.in_conv_w, blk.in_conv_b,
                                         blk.in_alpha, d),
                                        (blk.sk_conv_w, blk.sk_conv_b,
                                         blk.sk_alpha, 1)):
                    w_hat = cc.packed_conv_weights(w, dil, p)
                    alpha_l, mask_l = cc.packed_lane_params(al, C, p)
                    convs.append((w_hat, cc.pack_bias(b, p), alpha_l,
                                  mask_l, 1))
    else:
        cp = _round_up(C, LANE)
        xw = jnp.pad(x, ((0, 0), (0, cp - C)))
        for branch in branches:
            for blk, d in zip(branch, dilations):
                for (w, b, al, dil) in ((blk.in_conv_w, blk.in_conv_b,
                                         blk.in_alpha, d),
                                        (blk.sk_conv_w, blk.sk_conv_b,
                                         blk.sk_alpha, 1)):
                    n_snake = al.shape[0]
                    alpha_l = jnp.ones((cp,), jnp.float32).at[:n_snake].set(
                        al.astype(jnp.float32))
                    mask_l = (jnp.arange(cp) < n_snake).astype(jnp.float32)
                    wp = jnp.pad(w, ((0, 0), (0, cp - C), (0, cp - C)))
                    bp = jnp.pad(b, (0, cp - C))
                    convs.append((wp, bp, alpha_l, mask_l, dil))

    n_branches = len(branches)
    per_branch = len(convs) // n_branches
    conv_meta = tuple((w.shape[0], dil) for (w, _, _, _, dil) in convs)
    branch_starts = tuple(b * per_branch for b in range(n_branches))
    halos = [sum((conv_meta[c][0] - 1) * conv_meta[c][1]
                 for c in range(s, s + per_branch))
             for s in branch_starts]
    H = _round_up(max(halos), 8)

    Tw = xw.shape[0]
    if tile is None:
        tile = 1024 if Tw >= 1024 else max(256, _round_up(Tw, 256))
    tile = max(tile, _round_up(H, 8))
    tp = _round_up(max(Tw, 1), tile)
    xp = jnp.pad(xw, ((0, tp - Tw), (0, 0)))

    bias_s = jnp.stack([
        jnp.asarray(b, jnp.float32).reshape(-1)[:cp] if b.shape[0] >= cp
        else jnp.pad(jnp.asarray(b, jnp.float32), (0, cp - b.shape[0]))
        for (_, b, _, _, _) in convs])
    alpha_s = jnp.stack([a for (_, _, a, _, _) in convs])
    mask_s = jnp.stack([m for (_, _, _, m, _) in convs])

    kernel = functools.partial(
        _kernel, conv_meta=conv_meta, branch_starts=branch_starts,
        tile=tile, H=H, leaky_slope=leaky_slope, n_branches=n_branches)

    grid = (tp // tile,)
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0, 0))
               for (w, _, _, _, _) in convs]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tp, cp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, cp), lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((tile, cp), lambda i: (i, 0)),
            pl.BlockSpec(bias_s.shape, lambda i: (0, 0)),
            pl.BlockSpec(alpha_s.shape, lambda i: (0, 0)),
            pl.BlockSpec(mask_s.shape, lambda i: (0, 0)),
        ] + w_specs,
        out_specs=pl.BlockSpec((tile, cp), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((H + tile, cp), x.dtype),    # raw x window
            pltpu.VMEM((H + tile, cp), x.dtype),    # branch carry h
            pltpu.VMEM((H + tile, cp), x.dtype),    # conv result r
            pltpu.VMEM((tile, cp), x.dtype),        # branch accumulator
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, xp, bias_s, alpha_s, mask_s,
      *[w.astype(x.dtype) for (w, _, _, _, _) in convs])

    if p > 1:
        return cc.unpack_time(out[: Tw], p, T, C)
    return out[:T, :C]
