"""Independent PyTorch oracle for the nano-codec decoder.

Uses torch F.conv1d / F.conv_transpose1d (the primitives NeMo itself builds on)
in NCW layout against the JAX NWC implementation.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _np(x):
    return np.asarray(x)


def fsq_dequantize(codes: np.ndarray, config) -> np.ndarray:
    """codes [8, T] -> latent [32, T] (NCW)."""
    n_cb, T = codes.shape
    latent = np.zeros((config.latent_dim, T), np.float32)
    for cb in range(n_cb):
        for t in range(T):
            idx = int(codes[cb, t])
            for d in range(4):
                L = config.fsq_levels[d]
                nonneg = (idx // config.fsq_dim_base[d]) % L
                latent[cb * 4 + d, t] = (nonneg - L // 2) / (L // 2)
    return latent


def half_snake(x: torch.Tensor, alpha: torch.Tensor, slope: float) -> torch.Tensor:
    """x: [1, C, T]; alpha: [C_half]."""
    n = alpha.shape[0]
    first, second = x[:, :n], x[:, n:]
    a = alpha.view(1, n, 1)
    first = first + torch.sin(a * first) ** 2 / a
    second = F.leaky_relu(second, negative_slope=slope)
    return torch.cat([first, second], dim=1)


def causal_conv(x: torch.Tensor, w_wio, b, dilation: int = 1) -> torch.Tensor:
    """x: [1, C_in, T]; w_wio: JAX [K, in, out] -> torch [out, in, K]."""
    w = torch.from_numpy(np.transpose(_np(w_wio), (2, 1, 0)).copy()).float()
    bias = torch.from_numpy(_np(b).copy()).float()
    k = w.shape[-1]
    pad = (k - 1) * dilation
    return F.conv1d(F.pad(x, (pad, 0)), w, bias, dilation=dilation)


def grouped_convt(x: torch.Tensor, w_pt, b, stride: int) -> torch.Tensor:
    """x: [1, in_ch, T]; w_pt: [in_ch, K] (PyTorch convT weight [in_ch, 1, K]).

    groups = out_ch = in_ch // 2; causal right-trim K - stride.
    """
    w = torch.from_numpy(_np(w_pt).copy()).float().unsqueeze(1)  # [in_ch, 1, K]
    bias = torch.from_numpy(_np(b).copy()).float()
    in_ch, _, k = w.shape
    out_ch = in_ch // 2
    out = F.conv_transpose1d(x, w, bias, stride=stride, groups=out_ch)
    trim = k - stride
    return out[:, :, : out.shape[-1] - trim] if trim > 0 else out


def decode(codes: np.ndarray, weights, config) -> np.ndarray:
    """codes [8, T] -> waveform [T * hop_length]. `weights` is the JAX CodecWeights."""
    latent = torch.from_numpy(fsq_dequantize(codes, config)).unsqueeze(0)  # [1, 32, T]
    x = causal_conv(latent, weights.pre_conv_w, weights.pre_conv_b)
    slope = config.leaky_slope
    for stage, stride in zip(weights.stages, config.up_sample_rates):
        x = half_snake(x, torch.from_numpy(_np(stage.act_alpha).copy()).float(), slope)
        x = grouped_convt(x, stage.convt_w, stage.convt_b, stride)
        acc = None
        for branch, _k in zip(stage.resblocks, config.resblock_kernel_sizes):
            h = x
            for blk, dilation in zip(branch, config.resblock_dilations):
                r = half_snake(h, torch.from_numpy(_np(blk.in_alpha).copy()).float(), slope)
                r = causal_conv(r, blk.in_conv_w, blk.in_conv_b, dilation)
                r = half_snake(r, torch.from_numpy(_np(blk.sk_alpha).copy()).float(), slope)
                r = causal_conv(r, blk.sk_conv_w, blk.sk_conv_b, 1)
                h = h + r
            acc = h if acc is None else acc + h
        x = acc / len(stage.resblocks)
    x = half_snake(x, torch.from_numpy(_np(weights.post_alpha).copy()).float(), slope)
    x = causal_conv(x, weights.post_conv_w, weights.post_conv_b)
    x = torch.tanh(x)
    return x[0, 0].numpy()
