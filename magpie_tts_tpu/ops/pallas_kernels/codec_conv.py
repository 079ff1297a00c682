"""Fused HalfSnake + causal dilated Conv1d Pallas kernel for the codec.

XLA's conv lowering for the nano-codec's shapes (channels 27..864, long time
axis) runs ~2 orders of magnitude off memory-bound on v5e. This kernel tiles
the time axis, keeps the conv weights and a (halo + tile) activation window in
VMEM, applies the HalfSnake activation while filling the window, and expresses
the conv as k static shifted matmuls accumulated on the MXU:

    out[t] = sum_i  snake(x)[t - (k-1)*d + i*d] @ W[i]        (causal)

The halo ((k-1)*dilation rows) comes from the previous time block — fetched by
double-indexing the input (two BlockSpecs on the same array), with tile 0's halo
zeroed (= causal left padding). Channels are zero-padded to the 128-lane width
by the wrapper; zero-padded weights keep pad lanes identically zero.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# Polynomial sine (see _fast_sin): odd minimax/Taylor coefficients to r^11.
_SIN_C = (-1.6666666e-01, 8.3333331e-03, -1.9841270e-04,
          2.7557319e-06, -2.5052108e-08)
_PI_HI = 3.14159274101257324   # float32(pi)
_PI_LO = -8.742277657347586e-08  # pi - _PI_HI
_INV_PI = 0.3183098861837907


def _fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial sin(x) for f32 VPU lanes: ~4x cheaper than the libm-grade
    jnp.sin lowering (measured ~8 -> ~2 ns/128 lanes on v5e), abs error
    <= ~1e-7 + |n|*6e-8 ulp-reduction error — orders of magnitude inside the
    codec parity tolerances (kernel-vs-XLA atol 1e-4, vocoder-vs-torch 5e-5).

    Cody-Waite reduction r = x - n*pi (two-term pi), degree-11 odd polynomial
    on [-pi/2, pi/2], sign flip for odd n.
    """
    n = jnp.round(x * _INV_PI)
    r = x - n * _PI_HI
    r = r - n * _PI_LO
    r2 = r * r
    p = _SIN_C[4]
    for c in (_SIN_C[3], _SIN_C[2], _SIN_C[1], _SIN_C[0]):
        p = p * r2 + c
    s = r + r * (r2 * p)
    # |x| >~ 1e8 defeats the two-term reduction (r leaves [-pi/2, pi/2] and
    # the polynomial can overflow where libm sin stays bounded); clamp to the
    # sine range so absurd activations degrade like jnp.sin instead of to inf.
    s = jnp.clip(s, -1.0, 1.0)
    odd = n - 2.0 * jnp.floor(n * 0.5)          # 0.0 or 1.0
    return jnp.where(odd > 0.5, -s, s)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(cur_ref, res_ref, w_ref, b_ref, alpha_ref, mask_ref, dil_ref,
            o_ref, win_ref, cat_ref, halo_sc, *, k: int,
            dilation: int, tile: int, halo: int, apply_snake: bool,
            leaky_slope: float, use_im2col: bool, fuse_residual: bool,
            traced_dil: bool):
    i = pl.program_id(0)
    # traced_dil: the dilation arrives as a runtime scalar and ``halo`` is the
    # static worst case ((k-1) * max_dilation) — one Mosaic module serves the
    # whole {1, 3, 5} dilation family of a (k, C) class (cold-start leverage).
    # Dynamic tap offsets cannot be vector loads (Mosaic requires sublane
    # starts provably 8-aligned) nor DMA slices (tiled-VMEM slices have the
    # same divisibility rule); the supported primitive is
    # ``tpu.dynamic_rotate`` — 32-bit lanes only, hence the window scratch is
    # f32 in traced mode. ``roll(win, W-off)[:tile]`` reads the identical
    # rows (out[j] = win[j+off]; j+off < tile+halo <= W, so no wraparound
    # contamination). The window stores the x.dtype-ROUNDED activation
    # upcast to f32 (exact round-trip), so tap tiles are bitwise equal to
    # the static path's (pinned by tests + the on-TPU A/B).
    if traced_dil:
        dil = dil_ref[0]
        tap0 = halo - (k - 1) * dil      # window row of out-row 0's first tap
    else:
        dil = dilation
        tap0 = 0

    def tap_rows(off):
        """[tile, cp] window rows starting at ``off`` (static or traced)."""
        if not traced_dil:
            return win_ref[off: off + tile, :]
        w_rows = win_ref.shape[0]
        shift = jnp.where(off == 0, 0, jnp.int32(w_rows) - off)
        return pltpu.roll(win_ref[...], shift, 0)[:tile, :].astype(
            cur_ref.dtype)

    def activate(x):
        if not apply_snake:
            return x
        xf = x.astype(jnp.float32)
        alpha = alpha_ref[0, :].astype(jnp.float32)
        mask = mask_ref[0, :]
        s = _fast_sin(alpha * xf)
        snake = xf + (s * s) * (1.0 / alpha)
        leaky = jnp.where(xf >= 0, xf, leaky_slope * xf)
        return jnp.where(mask > 0, snake, leaky).astype(x.dtype)

    # Assemble the activated (halo + tile) window: halo rows are the activated
    # tail of the previous block, carried in a scratch that persists across
    # the (sequential) grid — no second fetch of the previous input block and
    # no re-activation of halo rows. Block 0's halo is zeros (causal padding).
    if halo > 0:
        @pl.when(i == 0)
        def _zero_halo():
            win_ref[0:halo, :] = jnp.zeros((halo, win_ref.shape[1]), win_ref.dtype)

        @pl.when(i > 0)
        def _copy_halo():
            win_ref[0:halo, :] = halo_sc[...]

    win_ref[halo: halo + tile, :] = activate(cur_ref[:, :]).astype(
        win_ref.dtype)
    if halo > 0:
        halo_sc[...] = win_ref[tile: tile + halo, :]

    cp_in = win_ref.shape[1]
    if use_im2col:
        # Wide channels: im2col along lanes — one deep [tile, k*C] @ [k*C, C_out]
        # matmul pipelines the MXU better than k accumulated small dots.
        for tap in range(k):
            cat_ref[:, tap * cp_in:(tap + 1) * cp_in] = \
                tap_rows(tap0 + tap * dil)
        acc = jnp.dot(cat_ref[...], w_ref[...].reshape(k * cp_in, -1),
                      preferred_element_type=jnp.float32)
    else:
        # Narrow (128-lane) channels: accumulated per-tap dots measure equal
        # or better, without the im2col scratch traffic. (The traced path
        # keeps the same per-tap accumulation order, so static and traced
        # modules stay bitwise equal.)
        acc = jnp.dot(tap_rows(tap0), w_ref[0, :, :],
                      preferred_element_type=jnp.float32)
        for tap in range(1, k):
            acc = acc + jnp.dot(tap_rows(tap0 + tap * dil), w_ref[tap, :, :],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0, :].astype(jnp.float32)
    if fuse_residual:
        # Residual add fused into the output write (saves a full XLA
        # read-read-write pass over [T, C] per residual block).
        acc = acc + res_ref[...].astype(jnp.float32)
    o_ref[:, :] = acc.astype(o_ref.dtype)


def snake_causal_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      alpha: Optional[jnp.ndarray], dilation: int = 1,
                      leaky_slope: float = 0.01, tile: Optional[int] = None,
                      interpret: bool = False,
                      alpha_lanes: Optional[jnp.ndarray] = None,
                      mask_lanes: Optional[jnp.ndarray] = None,
                      residual: Optional[jnp.ndarray] = None,
                      max_dilation: Optional[int] = None) -> jnp.ndarray:
    """Fused (optional HalfSnake) -> causal dilated conv (-> + residual).

    x: [T, C_in]; w: [k, C_in, C_out] (WIO); b: [C_out];
    alpha: [n_snake] Snake coefficients for the first n_snake channels (None =
    no activation, plain conv). Returns [T, C_out].

    ``alpha_lanes``/``mask_lanes`` (both [C_in]) override the first-n-channels
    layout with explicit per-lane Snake coefficients / membership — used by the
    time-packed path where channels repeat across lane groups.

    ``residual`` ([T, C_out]) is added to the conv output inside the kernel.

    ``max_dilation`` (>= dilation) makes the dilation a RUNTIME scalar with a
    static worst-case halo, so every dilation of a (k, C) family compiles to
    the SAME Mosaic module — the HiFiGAN resblocks' d in {1, 3, 5} share one
    kernel compile per (k, C) instead of three. Numerics are unchanged
    (bitwise, pinned in interpret + on compiled TPU), but the mode is a
    measured NEGATIVE as a default on v5e — the rotate-based tap reads and
    f32 window cost more steady-state and compile time than the module
    dedup saves (docs/KERNELS.md "traced-dilation modules") — so only the
    probe knobs route here.
    """
    T, c_in = x.shape
    k, _, c_out = w.shape
    traced_dil = max_dilation is not None and k > 1
    if traced_dil:
        if isinstance(dilation, int):  # may be a traced scalar (lax.scan)
            assert dilation <= max_dilation, (dilation, max_dilation)
        halo = (k - 1) * max_dilation
    else:
        halo = (k - 1) * dilation

    cp_in = _round_up(c_in, LANE)
    cp_out = _round_up(c_out, LANE)
    if tile is None:
        # Budget VMEM: weights k*cp_in*cp_out + window (tile+halo)*cp_in +
        # im2col tile*k*cp_in + double-buffered in/out streams. Aim ~24 MB.
        it = x.dtype.itemsize
        weight_bytes = k * cp_in * cp_out * it
        budget = 24 * 1024 * 1024 - weight_bytes
        per_row = (cp_in * it * (k + 3) + cp_out * it * 2)
        tile = max(256, min(4096, _round_up(budget // max(per_row, 1) // 2, 256)))
    tile = max(tile, _round_up(halo, 8))
    tp = _round_up(max(T, 1), tile)

    xp = jnp.pad(x, ((0, tp - T), (0, cp_in - c_in)))
    wp = jnp.pad(w, ((0, 0), (0, cp_in - c_in), (0, cp_out - c_out)))
    bp = jnp.pad(b, (0, cp_out - c_out)).reshape(1, cp_out)

    apply_snake = alpha is not None or alpha_lanes is not None
    if alpha_lanes is not None:
        alpha_full = jnp.ones((cp_in,), jnp.float32).at[:c_in].set(
            alpha_lanes.astype(jnp.float32))
        mask = jnp.zeros((cp_in,), jnp.float32).at[:c_in].set(
            mask_lanes.astype(jnp.float32))
    elif apply_snake:
        n_snake = alpha.shape[0]
        alpha_full = jnp.ones((cp_in,), jnp.float32).at[:n_snake].set(
            alpha.astype(jnp.float32))
        mask = (jnp.arange(cp_in) < n_snake).astype(jnp.float32)
    else:
        alpha_full = jnp.ones((cp_in,), jnp.float32)
        mask = jnp.zeros((cp_in,), jnp.float32)
    alpha_full = alpha_full.reshape(1, cp_in)
    mask = mask.reshape(1, cp_in)

    use_im2col = cp_in >= 256 and k > 1
    fuse_residual = residual is not None
    if fuse_residual:
        rp = jnp.pad(residual, ((0, tp - T), (0, cp_out - c_out)))
    else:
        # tiny dummy (whole-array block); the kernel never reads it.
        rp = jnp.zeros((8, cp_out), x.dtype)
    # DYNAMIC time grid (default on): the grid count is passed as a traced
    # scalar, so the serialized Mosaic kernel module is IDENTICAL for every
    # frame bucket / utterance length — one kernel compile per (C, k, d)
    # shape class instead of one per (shape class x T). Cold-start leverage:
    # the codec compiles ~50 distinct conv kernels per bucket otherwise
    # (docs/STATUS.md cold-start table). The kernel body never reads T; the
    # tile/halo schedule is T-independent. MAGPIE_CODEC_DYNGRID=0 restores
    # static grids for A/B.
    import os as _os

    if _os.environ.get("MAGPIE_CODEC_DYNGRID", "1") == "1":
        grid = (jnp.asarray(tp // tile, jnp.int32),)
    else:
        grid = (tp // tile,)
    kernel = functools.partial(
        _kernel, k=k, dilation=0 if traced_dil else dilation, tile=tile,
        halo=halo, apply_snake=apply_snake, leaky_slope=leaky_slope,
        use_im2col=use_im2col, fuse_residual=fuse_residual,
        traced_dil=traced_dil)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tp, cp_out), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, cp_in), lambda i: (i, 0)),
            (pl.BlockSpec((tile, cp_out), lambda i: (i, 0)) if fuse_residual
             else pl.BlockSpec((8, cp_out), lambda i: (0, 0))),
            pl.BlockSpec((k, cp_in, cp_out), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, cp_out), lambda i: (0, 0)),
            pl.BlockSpec((1, cp_in), lambda i: (0, 0)),
            pl.BlockSpec((1, cp_in), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dilation (runtime scalar)
        ],
        out_specs=pl.BlockSpec((tile, cp_out), lambda i: (i, 0)),
        scratch_shapes=[
            # Window rows padded to a sublane multiple (pad rows are never
            # written; the traced-dil rotate requires an 8-aligned shape and
            # 32-bit lanes, hence f32 in traced mode — stored values are the
            # x.dtype-rounded activations upcast, an exact round-trip).
            pltpu.VMEM((_round_up(halo + tile, 8), cp_in),
                       jnp.float32 if traced_dil else x.dtype),
            pltpu.VMEM((tile, k * cp_in) if use_im2col else (8, 128),
                       x.dtype),                      # im2col window (or dummy)
            pltpu.VMEM((max(halo, 1), cp_in),
                       jnp.float32 if traced_dil else x.dtype),  # halo carry
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # window scratch + double-buffered in/out streams overshoot the
            # default 16MB scoped-vmem limit at large tiles
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp, rp, wp, bp, alpha_full, mask,
      jnp.full((1,), dilation, jnp.int32))

    return out[:T, :c_out]


# ---------------------------------------------------------------------------
# Time-packing: small-channel stages (C = 27/54 at huge T) pad 22x/5.6x of the
# 128-lane width away. Packing p consecutive time steps into the lane dim
# (p * Cp = 128) makes every matmul dense: a causal dilated conv over packed
# rows becomes a causal kernel-size-n_s dilation-1 conv with block-banded
# weights, so the SAME kernel above runs it — at 1/p the rows.
#
#   x_hat[tau, j*Cp + c] = x[tau*p + j, c]
#   y_hat[tau] = sum_sigma x_hat[tau - (n_s-1) + sigma] @ W_hat[sigma]
#   W_hat[sigma, m*Cp + c, j*Cp + o] = w[i, c, o]  where  u = j - Delta + i*d,
#       sigma = floor(u/p) + n_s - 1,  m = u mod p,  Delta = (k-1)*d,
#       n_s = ceil(Delta/p) + 1.
# ---------------------------------------------------------------------------


def pick_pack(c_in: int, c_out: int) -> int:
    """Largest p (power of two) with p * max(C) <= 128; 1 = no packing."""
    c = max(c_in, c_out)
    p = 1
    while p * 2 * c <= LANE:
        p *= 2
    return p


def pack_time(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[T, C] -> [ceil(T/p), p * (128//p)]; zero-pads T and channels."""
    T, c = x.shape
    cp = LANE // p
    tp = _round_up(T, p)
    xp = jnp.pad(x, ((0, tp - T), (0, cp - c)))
    return xp.reshape(tp // p, p * cp)


def unpack_time(y: jnp.ndarray, p: int, T: int, c: int) -> jnp.ndarray:
    """Inverse of pack_time: [T_p/p, p*(128//p)] -> [T, C]."""
    cp = LANE // p
    return y.reshape(y.shape[0] * p, cp)[:T, :c]


def packed_conv_weights(w: jnp.ndarray, dilation: int, p: int) -> jnp.ndarray:
    """w: [k, C_in, C_out] (WIO) -> W_hat [n_s, p*Cp, p*Cp] for the packed conv."""
    k, c_in, c_out = w.shape
    cp = LANE // p
    delta = (k - 1) * dilation
    n_s = -(-delta // p) + 1
    w_hat = jnp.zeros((n_s, p * cp, p * cp), w.dtype)
    for j in range(p):
        for i in range(k):
            u = j - delta + i * dilation
            sigma = (u // p) + n_s - 1       # python floordiv floors negatives
            m = u % p
            w_hat = w_hat.at[sigma,
                             m * cp: m * cp + c_in,
                             j * cp: j * cp + c_out].set(w[i])
    return w_hat


def packed_lane_params(alpha: Optional[jnp.ndarray], c: int, p: int):
    """(alpha_lanes, mask_lanes, bias_tiler) for the packed lane layout."""
    cp = LANE // p
    if alpha is None:
        alpha_lanes = None
        mask_lanes = None
    else:
        n_snake = alpha.shape[0]
        a = jnp.ones((cp,), jnp.float32).at[:n_snake].set(alpha.astype(jnp.float32))
        m = jnp.zeros((cp,), jnp.float32).at[:n_snake].set(1.0)
        alpha_lanes = jnp.tile(a, p)
        mask_lanes = jnp.tile(m, p)
    return alpha_lanes, mask_lanes


def pack_bias(b: jnp.ndarray, p: int) -> jnp.ndarray:
    cp = LANE // p
    return jnp.tile(jnp.pad(b, (0, cp - b.shape[0])), p)


def snake_causal_conv_packed(x_packed: jnp.ndarray, w: jnp.ndarray,
                             b: jnp.ndarray, alpha: Optional[jnp.ndarray],
                             c: int, p: int, dilation: int = 1,
                             leaky_slope: float = 0.01,
                             interpret: bool = False,
                             residual: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
    """Packed-domain fused (HalfSnake) -> causal conv: [T/p, 128] -> [T/p, 128].

    ``x_packed`` is pre-activation in pack_time layout; ``w``/``b``/``alpha``
    are the ORIGINAL conv parameters ([k, C, C] WIO, [C], [n_snake]);
    ``residual`` (packed layout) is added in-kernel."""
    w_hat = packed_conv_weights(w, dilation, p)
    alpha_lanes, mask_lanes = packed_lane_params(alpha, c, p)
    if alpha_lanes is None:
        # plain conv: still give explicit lane params so pad lanes stay inert
        alpha_lanes = jnp.ones((x_packed.shape[1],), jnp.float32)
        mask_lanes = jnp.zeros((x_packed.shape[1],), jnp.float32)
        if alpha is not None:
            raise AssertionError
    bp = pack_bias(b, p)
    return snake_causal_conv(
        x_packed, w_hat, bp, None, dilation=1, leaky_slope=leaky_slope,
        interpret=interpret,
        alpha_lanes=alpha_lanes if alpha is not None else None,
        mask_lanes=mask_lanes if alpha is not None else None,
        residual=residual)
