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

    Identity used: ConvTranspose(x, w, s) == conv(dilate(x, s), flip_k(w)) with
    (K-1, K-1) padding; with feature_group_count = out_ch the grouped structure
    (input channels [2g, 2g+1] -> output channel g) maps exactly onto XLA's
    channel-group convention.
    """
    in_ch, k = w_pt.shape
    out_ch = in_ch // 2
    # [in_ch, K] -> [out_ch, 2, K] -> flip K -> [K, 2, out_ch] (WIO, grouped)
    w = w_pt.reshape(out_ch, 2, k)[:, :, ::-1]
    w = jnp.transpose(w, (2, 1, 0))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DN,
        feature_group_count=out_ch, preferred_element_type=jnp.float32)
    # full output length (T-1)*s + K; causal trim to T*s
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


def residual_block(x: jnp.ndarray, blk: ResBlockWeights, dilation: int,
                   leaky_slope: float) -> jnp.ndarray:
    h = half_snake(x, blk.in_alpha, leaky_slope)
    h = causal_conv1d(h, blk.in_conv_w, blk.in_conv_b, dilation)
    h = half_snake(h, blk.sk_alpha, leaky_slope)
    h = causal_conv1d(h, blk.sk_conv_w, blk.sk_conv_b, 1)
    return x + h


def res_layer(x: jnp.ndarray, branches, dilations, leaky_slope: float) -> jnp.ndarray:
    """Mean of 3 parallel kernel branches, each 3 sequential dilated blocks."""
    acc = None
    for branch in branches:
        h = x
        for blk, dilation in zip(branch, dilations):
            h = residual_block(h, blk, dilation, leaky_slope)
        acc = h if acc is None else acc + h
    return acc / len(branches)


def codec_decode_latent(latent: jnp.ndarray, weights: CodecWeights,
                        config: CodecConfig) -> jnp.ndarray:
    """latent: [N, T, latent_dim] -> audio [N, T*1024]."""
    x = causal_conv1d(latent, weights.pre_conv_w, weights.pre_conv_b)
    for stage, stride in zip(weights.stages, config.up_sample_rates):
        x = half_snake(x, stage.act_alpha, config.leaky_slope)
        x = grouped_conv_transpose1d(x, stage.convt_w, stage.convt_b, stride)
        x = res_layer(x, stage.resblocks, config.resblock_dilations, config.leaky_slope)
    x = half_snake(x, weights.post_alpha, config.leaky_slope)
    x = causal_conv1d(x, weights.post_conv_w, weights.post_conv_b)
    x = jnp.tanh(x)
    return x[..., 0]


def codec_decode(codes: jnp.ndarray, weights: CodecWeights,
                 config: CodecConfig) -> jnp.ndarray:
    """codes: [8, T] int32 -> waveform [T*1024] float32 (single utterance)."""
    latent = fsq_dequantize(codes, config).astype(weights.pre_conv_w.dtype)
    return codec_decode_latent(latent[None], weights, config)[0]
