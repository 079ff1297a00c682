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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(prev_ref, cur_ref, w_ref, b_ref, alpha_ref, mask_ref, o_ref,
            win_ref, acc_ref, *, k: int, dilation: int, tile: int, halo: int,
            apply_snake: bool, leaky_slope: float):
    i = pl.program_id(0)

    def activate(x):
        if not apply_snake:
            return x
        xf = x.astype(jnp.float32)
        alpha = alpha_ref[0, :].astype(jnp.float32)
        mask = mask_ref[0, :]
        s = jnp.sin(alpha * xf)
        snake = xf + (s * s) / alpha
        leaky = jnp.where(xf >= 0, xf, leaky_slope * xf)
        return jnp.where(mask > 0, snake, leaky).astype(x.dtype)

    # Assemble the activated (halo + tile) window: halo rows from the previous
    # block (zeros on the first block = causal padding), then the current block.
    if halo > 0:
        @pl.when(i == 0)
        def _zero_halo():
            win_ref[0:halo, :] = jnp.zeros((halo, win_ref.shape[1]), win_ref.dtype)

        @pl.when(i > 0)
        def _copy_halo():
            win_ref[0:halo, :] = activate(prev_ref[tile - halo: tile, :])

    win_ref[halo:, :] = activate(cur_ref[:, :])

    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    for tap in range(k):
        off = tap * dilation
        acc_ref[:, :] += jnp.dot(win_ref[off: off + tile, :], w_ref[tap, :, :],
                                 preferred_element_type=jnp.float32)
    o_ref[:, :] = (acc_ref[:, :] + b_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def snake_causal_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      alpha: Optional[jnp.ndarray], dilation: int = 1,
                      leaky_slope: float = 0.01, tile: Optional[int] = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused (optional HalfSnake) -> causal dilated conv.

    x: [T, C_in]; w: [k, C_in, C_out] (WIO); b: [C_out];
    alpha: [n_snake] Snake coefficients for the first n_snake channels (None =
    no activation, plain conv). Returns [T, C_out].
    """
    T, c_in = x.shape
    k, _, c_out = w.shape
    halo = (k - 1) * dilation

    cp_in = _round_up(c_in, LANE)
    cp_out = _round_up(c_out, LANE)
    if tile is None:
        # Budget VMEM: weights k*cp_in*cp_out + window (tile+halo)*cp_in +
        # acc/out ~ 6 * tile * cp. Aim ~12 MB total.
        weight_bytes = k * cp_in * cp_out * x.dtype.itemsize
        budget = 12 * 1024 * 1024 - weight_bytes
        per_row = cp_in * x.dtype.itemsize * 2 + cp_out * (4 + x.dtype.itemsize) * 2
        tile = max(256, min(4096, _round_up(budget // max(per_row, 1) // 2, 256)))
    tile = max(tile, _round_up(halo, 8))
    tp = _round_up(max(T, 1), tile)

    xp = jnp.pad(x, ((0, tp - T), (0, cp_in - c_in)))
    wp = jnp.pad(w, ((0, 0), (0, cp_in - c_in), (0, cp_out - c_out)))
    bp = jnp.pad(b, (0, cp_out - c_out)).reshape(1, cp_out)

    apply_snake = alpha is not None
    if apply_snake:
        n_snake = alpha.shape[0]
        alpha_full = jnp.ones((cp_in,), jnp.float32).at[:n_snake].set(
            alpha.astype(jnp.float32))
        mask = (jnp.arange(cp_in) < n_snake).astype(jnp.float32)
    else:
        alpha_full = jnp.ones((cp_in,), jnp.float32)
        mask = jnp.zeros((cp_in,), jnp.float32)
    alpha_full = alpha_full.reshape(1, cp_in)
    mask = mask.reshape(1, cp_in)

    grid = (tp // tile,)
    kernel = functools.partial(
        _kernel, k=k, dilation=dilation, tile=tile, halo=halo,
        apply_snake=apply_snake, leaky_slope=leaky_slope)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tp, cp_out), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, cp_in), lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((tile, cp_in), lambda i: (i, 0)),
            pl.BlockSpec((k, cp_in, cp_out), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, cp_out), lambda i: (0, 0)),
            pl.BlockSpec((1, cp_in), lambda i: (0, 0)),
            pl.BlockSpec((1, cp_in), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, cp_out), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((halo + tile, cp_in), x.dtype),
            pltpu.VMEM((tile, cp_out), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, wp, bp, alpha_full, mask)

    return out[:T, :c_out]
