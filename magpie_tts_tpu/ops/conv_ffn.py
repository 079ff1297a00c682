"""Causal conv feed-forward network.

NeMo ``pos_ff``: causal Conv1d(k) -> GELU -> causal Conv1d(k), no biases
(reference src/magpie.cpp:1769-1918). kernel=1 is a plain MLP; kernel=3 (encoder)
is expressed as a sum of k shifted matmuls so that
``y[t] = sum_k x[t - (K-1) + k] @ W[k]`` — XLA fuses this into one conv-like op
and it keeps the MXU fed without im2col.

GELU flavor is selectable: the reference ggml engine uses the tanh approximation
(src/magpie.cpp:1791-1805 via ggml GELU); NeMo/PyTorch default is exact erf.
Exact-erf is the default here (matching the NeMo checkpoint the weights come
from); GELU always computes in float32 internally and rounds back — the same
rounding points as the Pallas kernels (ops/pallas_kernels/common.gelu_kernel).

All matmuls request DOT_PRECISION (full-f32 on TPU) so the XLA oracle path and
the Pallas kernels agree at f32 rounding level (see ops/precision.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .precision import DOT_PRECISION


def gelu(x: jnp.ndarray, approximate: bool = False) -> jnp.ndarray:
    """GELU with float32 internal math, rounded back to the input dtype.

    The tanh branch spells out the ggml formula (reference src/magpie.cpp:1791
    via ggml_gelu; same analytic form as jax.nn.gelu(approximate=True)) with
    the exact op order of ops/pallas_kernels/common.gelu_kernel so the XLA
    oracle and the Pallas kernels stay bit-identical at f32 under either
    flavor.
    """
    xf = x.astype(jnp.float32)
    if approximate:
        c = 0.7978845608028654  # sqrt(2/pi)
        inner = c * (xf + 0.044715 * xf * xf * xf)
        return (0.5 * xf * (1.0 + jnp.tanh(inner))).astype(x.dtype)
    return jax.nn.gelu(xf, approximate=False).astype(x.dtype)


def conv1d_causal_shifted(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Causal conv via shifted matmuls. x: [..., seq, in]; w: [k, in, out]."""
    k = w.shape[0]
    if k == 1:
        return jnp.einsum("...si,io->...so", x, w[0],
                          preferred_element_type=jnp.float32,
                          precision=DOT_PRECISION)
    seq = x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 2) + [(k - 1, 0), (0, 0)]
    xp = jnp.pad(x, pad)
    out = None
    for i in range(k):
        xi = jax.lax.slice_in_dim(xp, i, i + seq, axis=-2)
        term = jnp.einsum("...si,io->...so", xi, w[i],
                          preferred_element_type=jnp.float32,
                          precision=DOT_PRECISION)
        out = term if out is None else out + term
    return out


def conv_ffn(x: jnp.ndarray, proj_w: jnp.ndarray, out_w: jnp.ndarray,
             gelu_tanh: bool = False) -> jnp.ndarray:
    """x: [..., seq, d_model]; proj_w: [k, d_model, d_ffn] or [d_model, d_ffn];
    out_w: [k, d_ffn, d_model] or [d_ffn, d_model]."""
    if proj_w.ndim == 2:  # pointwise (decoder / local transformer)
        h = jnp.einsum("...si,io->...so", x, proj_w,
                       preferred_element_type=jnp.float32,
                       precision=DOT_PRECISION)
        h = gelu(h.astype(x.dtype), approximate=gelu_tanh)
        out = jnp.einsum("...si,io->...so", h, out_w,
                         preferred_element_type=jnp.float32,
                         precision=DOT_PRECISION)
        return out.astype(x.dtype)
    h = conv1d_causal_shifted(x, proj_w)
    h = gelu(h.astype(x.dtype), approximate=gelu_tanh)
    out = conv1d_causal_shifted(h, out_w)
    return out.astype(x.dtype)


def conv_ffn_step(x: jnp.ndarray, proj_w: jnp.ndarray, out_w: jnp.ndarray,
                  gelu_tanh: bool = False, out_dtype=None) -> jnp.ndarray:
    """Single-position pointwise FFN (decode step; decoder kernel is 1).

    Rounding points match the fused decode kernels: the projection stays f32
    into the GELU, the activation rounds to the weight dtype before the output
    matmul, and ``out_dtype`` (default: x's dtype) selects whether the final
    f32 accumulation is rounded (the f32-carry decode step passes float32).
    """
    h = jnp.dot(x, proj_w, preferred_element_type=jnp.float32,
                precision=DOT_PRECISION)
    h = gelu(h, approximate=gelu_tanh).astype(x.dtype)
    out = jnp.dot(h, out_w, preferred_element_type=jnp.float32,
                  precision=DOT_PRECISION)
    return out.astype(out_dtype or x.dtype)
