"""Nano-codec decoder: FSQ dequantization + causal HiFiGAN vocoder, NWC layout.

TPU-first restructuring of the reference (src/nano-codec.cpp):
- FSQ dequant is vectorized integer math on device (vs a CPU loop, :721-752);
- the grouped causal ConvTranspose1d (groups=out_ch, 2 in-channels per group)
  is a single ``conv_general_dilated`` with ``lhs_dilation`` + feature groups
  (vs a per-group loop of up to 432 conv calls, :481-565);
- all activations/convs operate on [batch, T, C] so channels sit on the TPU lane
  dimension and XLA fuses the pointwise chains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig
from ..io.codec_weights import CodecWeights, ResBlockWeights, UpsampleStageWeights

_DN = ("NWC", "WIO", "NWC")


def _use_pallas_default() -> bool:
    """Fused Pallas conv kernels on TPU-like backends, XLA convs elsewhere."""
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def fsq_dequantize(codes: jnp.ndarray, config: CodecConfig) -> jnp.ndarray:
    """codes: [..., 8, T] int32 -> latent [..., T, 32] float32.

    Per codebook, 4 dims: nonneg = (idx // base[d]) % L[d];
    value = (nonneg - L[d]//2) / (L[d]//2). Exact integer math (FSQ parity is
    bit-exact in the reference test suite).
    """
    base = jnp.asarray(config.fsq_dim_base, jnp.int32)      # [4]
    levels = jnp.asarray(config.fsq_levels, jnp.int32)      # [4]
    half = levels // 2
    idx = codes[..., :, :, None]                            # [..., 8, T, 1]
    nonneg = (idx // base) % levels                         # [..., 8, T, 4]
    vals = (nonneg - half).astype(jnp.float32) / half.astype(jnp.float32)
    # [..., 8, T, 4] -> [..., T, 8, 4] -> [..., T, 32]
    vals = jnp.moveaxis(vals, -3, -2)
    return vals.reshape(*vals.shape[:-2], vals.shape[-2] * vals.shape[-1])


def causal_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  dilation: int = 1) -> jnp.ndarray:
    """x: [N, T, C_in]; w: [K, C_in, C_out] (WIO); left-pad (K-1)*dilation."""
    k = w.shape[0]
    pad_left = (k - 1) * dilation
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad_left, 0)],
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        preferred_element_type=jnp.float32)
    return (out + b).astype(x.dtype)


def grouped_conv_transpose1d(x: jnp.ndarray, w_pt: jnp.ndarray, b: jnp.ndarray,
                             stride: int) -> jnp.ndarray:
    """Causal grouped ConvTranspose1d, groups = out_ch, in_ch = 2*out_ch.

    x: [N, T, in_ch]; w_pt: [in_ch, K] (PyTorch [in_ch, 1, K] squeezed);
    returns [N, T*stride, out_ch] (right-trimmed by K - stride for causality,
    matching nano-codec.cpp:500-505).

    When K is a multiple of stride (all production stages: K = 2*stride) this is
    computed as one einsum + overlap-add — each input frame contributes a length-K
    patch starting at t*stride; patches are summed with frame offsets. This
    avoids grouped-conv lowering entirely (>2x faster than
    feature_group_count=out_ch on TPU, vs a 432-iteration loop in the reference).
    """
    in_ch, k = w_pt.shape
    out_ch = in_ch // 2
    if k % stride == 0:
        n, T, _ = x.shape
        m = k // stride
        xp = x.reshape(n, T, out_ch, 2)
        wp = jnp.transpose(w_pt.reshape(out_ch, 2, k), (1, 2, 0))  # [2, k, out]
        # z[n, t, k, g]: input frame t's length-K patch for output channel g.
        # Pure broadcast multiply-add on the VPU (the "contraction" is only the
        # 2 input channels per group).
        z = (xp[:, :, None, :, 0] * wp[0][None, None] +
             xp[:, :, None, :, 1] * wp[1][None, None])  # [n, T, k, out]
        z = z.reshape(n, T, m, stride, out_ch)
        out = z[:, :, 0]
        for j in range(1, m):
            shifted = jnp.pad(z[:, :, j], ((0, 0), (j, 0), (0, 0), (0, 0)))[:, :T]
            out = out + shifted
        out = out.reshape(n, T * stride, out_ch)
        return (out + b).astype(x.dtype)

    # General fallback: ConvTranspose(x, w, s) == conv(dilate(x, s), flip_k(w))
    # with (K-1, K-1) padding and feature_group_count = out_ch.
    w = w_pt.reshape(out_ch, 2, k)[:, :, ::-1]
    w = jnp.transpose(w, (2, 1, 0))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DN,
        feature_group_count=out_ch, preferred_element_type=jnp.float32)
    out = out[:, : x.shape[1] * stride, :]
    return (out + b).astype(x.dtype)


def half_snake(x: jnp.ndarray, alpha: jnp.ndarray,
               leaky_slope: float = 0.01) -> jnp.ndarray:
    """Snake on the first len(alpha) channels, LeakyReLU on the rest.

    snake(x) = x + (1/alpha) * sin^2(alpha * x); handles odd splits (27 -> 13+14).
    """
    n_snake = alpha.shape[0]
    first, second = x[..., :n_snake], x[..., n_snake:]
    xf = first.astype(jnp.float32)
    af = alpha.astype(jnp.float32)
    s = jnp.sin(af * xf)
    snake = (xf + (s * s) / af).astype(x.dtype)
    leaky = jnp.where(second >= 0, second, leaky_slope * second)
    return jnp.concatenate([snake, leaky], axis=-1)


def _snake_conv(x, w, b, alpha, dilation, leaky_slope, use_pallas,
                residual=None, max_dilation=None):
    """(optional HalfSnake) -> causal conv (-> + residual), via the fused
    Pallas kernel on TPU or XLA conv elsewhere. x: [N, T, C].

    Small-channel convs (post-conv 27->1) run in the time-packed lane layout
    at 1/p the rows (see codec_conv.pack_time)."""
    if use_pallas:
        from ..ops.pallas_kernels import codec_conv as cc

        k, c_in, c_out = w.shape
        p = cc.pick_pack(c_in, c_out)
        if p > 1 and residual is None:
            n, T, _ = x.shape

            def one(xs):
                xp = cc.pack_time(xs, p)
                y = cc.snake_causal_conv_packed(
                    xp, w, b, alpha, c_in, p, dilation=dilation,
                    leaky_slope=leaky_slope)
                return cc.unpack_time(y, p, T, c_out)

            return jax.vmap(one)(x)
        if residual is not None:
            return jax.vmap(lambda xx, rr: cc.snake_causal_conv(
                xx, w, b, alpha, dilation=dilation, leaky_slope=leaky_slope,
                residual=rr))(x, residual)
        return jax.vmap(lambda xx: cc.snake_causal_conv(
            xx, w, b, alpha, dilation=dilation, leaky_slope=leaky_slope,
            max_dilation=max_dilation))(x)
    h = x if alpha is None else half_snake(x, alpha, leaky_slope)
    out = causal_conv1d(h, w, b, dilation)
    return out if residual is None else out + residual


def residual_block(x: jnp.ndarray, blk: ResBlockWeights, dilation: int,
                   leaky_slope: float, use_pallas: bool = False,
                   max_dilation: int = None) -> jnp.ndarray:
    # max_dilation merges the dilated in-convs' d in {1,3,5} into ONE Mosaic
    # module per (k, C) class — numerically inert; measured negative as a
    # default, kept for probing (ops/pallas_kernels/codec_conv.py).
    h = _snake_conv(x, blk.in_conv_w, blk.in_conv_b, blk.in_alpha, dilation,
                    leaky_slope, use_pallas, max_dilation=max_dilation)
    return _snake_conv(h, blk.sk_conv_w, blk.sk_conv_b, blk.sk_alpha, 1,
                       leaky_slope, use_pallas, residual=x)


def res_layer(x: jnp.ndarray, branches, dilations,
              leaky_slope: float, use_pallas: bool = False) -> jnp.ndarray:
    """Mean of 3 parallel kernel branches, each 3 sequential dilated blocks.

    On the pallas path, small-channel stages (C <= 64) run entirely in the
    time-packed lane layout (ops/pallas_kernels/codec_conv.py): pack once,
    all 18 convs at 1/p the rows with dense 128-lane matmuls, unpack once.
    (A merged feature-group variant exists below but measured slower under
    XLA's grouped-conv lowering.)
    """
    C = x.shape[-1]
    if use_pallas:
        from ..ops.pallas_kernels import codec_conv as cc

        import os

        p = cc.pick_pack(C, C)
        if C <= 128 and os.environ.get("MAGPIE_FUSED_CODEC"):
            # Whole-layer fused kernel (codec_res_fused.py): 18x less
            # activation HBM traffic, but MEASURED SLOWER on v5e (77 vs 71 ms
            # per 304-frame decode) with 11x the compile time (658 s vs 60 s)
            # — the 126-tap unrolled Mosaic program defeats the scheduler,
            # and the per-conv path's streaming already overlaps well.
            # Kept opt-in for bigger-VMEM parts; default is the per-conv path.
            from ..ops.pallas_kernels.codec_res_fused import res_layer_fused

            return jax.vmap(lambda xs: res_layer_fused(
                xs, branches, dilations, leaky_slope))(x)
        if p > 1:
            return _res_layer_packed(x, branches, dilations, leaky_slope, p)
        # Probe knobs, both MEASURED NEGATIVE on v5e (default off; see
        # docs/KERNELS.md "traced-dilation modules"): merging the d in
        # {1, 3, 5} in-convs into one Mosaic module (DYNDIL) and lax.scan
        # over the dilated blocks (SCAN, requires DYNDIL's traced kernel)
        # were built as cold-start levers, but the traced module needs
        # dynamic-rotate tap reads + an f32 window (Mosaic alignment/dtype
        # rules), which cost more steady-state (+23% decode wall) and show
        # no same-session compile win over the three static modules they
        # replace.
        if os.environ.get("MAGPIE_CODEC_SCAN", "0") == "1":
            return _res_layer_scanned(x, branches, dilations, leaky_slope)
    import os as _os
    md = (max(dilations)
          if use_pallas and _os.environ.get("MAGPIE_CODEC_DYNDIL", "0") == "1"
          else None)
    acc = None
    for branch in branches:
        h = x
        for blk, dilation in zip(branch, dilations):
            h = residual_block(h, blk, dilation, leaky_slope, use_pallas,
                               max_dilation=md)
        acc = h if acc is None else acc + h
    return acc / len(branches)


def _res_layer_scanned(x: jnp.ndarray, branches, dilations,
                       leaky_slope: float) -> jnp.ndarray:
    """Unpacked-pallas res_layer with each branch's dilated blocks as ONE
    ``lax.scan`` over stacked weights (probe knob ``MAGPIE_CODEC_SCAN=1``,
    default OFF — measured negative, see ``res_layer``).

    Built as a cold-start lever: the traced-dilation conv kernel
    (ops/pallas_kernels/codec_conv.py ``max_dilation=``) makes the scan body
    identical across the d in {1, 3, 5} blocks, so XLA traces ONE body per
    branch instead of three unrolled blocks. Numerically inert (pinned
    bitwise in tests, interpret + compiled TPU), but the traced kernel's
    rotate-based tap reads cost more than the dedup saves on v5e.
    """
    md = max(dilations)
    dil = jnp.asarray(dilations, jnp.int32)
    acc = None
    for branch in branches:
        blocks = list(branch)
        stacked = jax.tree_util.tree_map(
            lambda *ts: jnp.stack(ts), blocks[0], *blocks[1:])

        def body(h, wd):
            blk, d = wd
            h = residual_block(h, blk, d, leaky_slope, use_pallas=True,
                               max_dilation=md)
            return h, None

        h, _ = jax.lax.scan(body, x, (stacked, dil))
        acc = h if acc is None else acc + h
    return acc / len(branches)


def _res_layer_packed(x: jnp.ndarray, branches, dilations,
                      leaky_slope: float, p: int) -> jnp.ndarray:
    """res_layer in the time-packed lane layout. x: [N, T, C]."""
    from ..ops.pallas_kernels import codec_conv as cc

    n, T, C = x.shape

    def one(xs):
        xp = cc.pack_time(xs, p)
        acc = None
        for branch in branches:
            h = xp
            for blk, dilation in zip(branch, dilations):
                r = cc.snake_causal_conv_packed(
                    h, blk.in_conv_w, blk.in_conv_b, blk.in_alpha, C, p,
                    dilation=dilation, leaky_slope=leaky_slope)
                h = cc.snake_causal_conv_packed(
                    r, blk.sk_conv_w, blk.sk_conv_b, blk.sk_alpha, C, p,
                    dilation=1, leaky_slope=leaky_slope, residual=h)
            acc = h if acc is None else acc + h
        return cc.unpack_time(acc / len(branches), p, T, C)

    return jax.vmap(one)(x)


def _merged_half_snake(x: jnp.ndarray, alphas, C: int,
                       leaky_slope: float) -> jnp.ndarray:
    """HalfSnake over branch-concatenated channels [.., B*C].

    Channel b*C + c is snake with branch b's alpha when c < len(alpha), else
    LeakyReLU. One fused where() instead of B splits+concats.
    """
    a_full = jnp.concatenate([
        jnp.concatenate([a, jnp.ones((C - a.shape[0],), a.dtype)]) for a in alphas])
    mask = jnp.concatenate([
        (jnp.arange(C) < a.shape[0]) for a in alphas])
    xf = x.astype(jnp.float32)
    af = a_full.astype(jnp.float32)
    s = jnp.sin(af * xf)
    snake = xf + (s * s) / af
    leaky = jnp.where(xf >= 0, xf, leaky_slope * xf)
    return jnp.where(mask, snake, leaky).astype(x.dtype)


def _merged_conv_weight(ws, kmax: int) -> jnp.ndarray:
    """Per-branch WIO weights [k_b, C, C] -> grouped [kmax, C, B*C].

    Kernels are front-padded with zeros: with causal left padding of
    (kmax-1)*dilation, a front-padded kernel computes exactly the shorter
    branch's causal conv.
    """
    padded = [jnp.pad(w, ((kmax - w.shape[0], 0), (0, 0), (0, 0))) for w in ws]
    return jnp.concatenate(padded, axis=2)


def res_layer_merged(x: jnp.ndarray, branches, dilations, leaky_slope: float) -> jnp.ndarray:
    """Merged-branch res layer: the 3 kernel branches run as ONE chain of
    grouped convs over [N, T, 3C] (feature_group_count = 3).

    The branches are independent parallel chains with identical channel counts
    and dilation schedules; only kernel sizes differ (3/7/11), handled by
    front-zero-padding to the max kernel. 18 convs collapse to 6 per stage —
    a large win on TPU where per-op overhead dominates these small-channel convs.
    Exact (not approximate): verified against res_layer_reference and the torch
    oracle in tests.
    """
    n, T, C = x.shape
    B = len(branches)
    n_blocks = len(dilations)
    kmax = max(b[0].in_conv_w.shape[0] for b in branches)

    h = jnp.tile(x, (1, 1, B))
    for blk_idx, dilation in enumerate(dilations):
        blocks = [branch[blk_idx] for branch in branches]
        in_w = _merged_conv_weight([b.in_conv_w for b in blocks], kmax)
        sk_w = _merged_conv_weight([b.sk_conv_w for b in blocks], kmax)
        in_b = jnp.concatenate([b.in_conv_b for b in blocks])
        sk_b = jnp.concatenate([b.sk_conv_b for b in blocks])

        r = _merged_half_snake(h, [b.in_alpha for b in blocks], C, leaky_slope)
        r = jax.lax.conv_general_dilated(
            r, in_w, window_strides=(1,), padding=[((kmax - 1) * dilation, 0)],
            rhs_dilation=(dilation,), dimension_numbers=_DN,
            feature_group_count=B, preferred_element_type=jnp.float32)
        r = (r + in_b).astype(x.dtype)
        r = _merged_half_snake(r, [b.sk_alpha for b in blocks], C, leaky_slope)
        r = jax.lax.conv_general_dilated(
            r, sk_w, window_strides=(1,), padding=[(kmax - 1, 0)],
            dimension_numbers=_DN, feature_group_count=B,
            preferred_element_type=jnp.float32)
        r = (r + sk_b).astype(x.dtype)
        h = h + r

    return jnp.mean(h.reshape(n, T, B, C).astype(jnp.float32), axis=2).astype(x.dtype)


def codec_decode_latent(latent: jnp.ndarray, weights: CodecWeights,
                        config: CodecConfig,
                        use_pallas: bool = None) -> jnp.ndarray:
    """latent: [N, T, latent_dim] -> audio [N, T*1024]."""
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    x = _snake_conv(latent, weights.pre_conv_w, weights.pre_conv_b, None, 1,
                    config.leaky_slope, use_pallas)
    for stage, stride in zip(weights.stages, config.up_sample_rates):
        x = half_snake(x, stage.act_alpha, config.leaky_slope)
        x = grouped_conv_transpose1d(x, stage.convt_w, stage.convt_b, stride)
        x = res_layer(x, stage.resblocks, config.resblock_dilations,
                      config.leaky_slope, use_pallas)
    x = _snake_conv(x, weights.post_conv_w, weights.post_conv_b,
                    weights.post_alpha, 1, config.leaky_slope, use_pallas)
    x = jnp.tanh(x)
    return x[..., 0]


def codec_decode(codes: jnp.ndarray, weights: CodecWeights,
                 config: CodecConfig, use_pallas: bool = None) -> jnp.ndarray:
    """codes: [8, T] int32 -> waveform [T*1024] float32 (single utterance)."""
    latent = fsq_dequantize(codes, config).astype(weights.pre_conv_w.dtype)
    return codec_decode_latent(latent[None], weights, config,
                               use_pallas=use_pallas)[0]
