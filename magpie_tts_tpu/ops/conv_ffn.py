"""Causal conv feed-forward network.

NeMo ``pos_ff``: causal Conv1d(k) -> GELU -> causal Conv1d(k), no biases
(reference src/magpie.cpp:1769-1918). kernel=1 is a plain MLP; kernel=3 (encoder)
is expressed as a sum of k shifted matmuls so that
``y[t] = sum_k x[t - (K-1) + k] @ W[k]`` — XLA fuses this into one conv-like op
and it keeps the MXU fed without im2col.

GELU flavor is selectable: the reference ggml engine uses the tanh approximation,
NeMo/PyTorch default is exact erf. Exact-erf is the default here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray, approximate: bool = False) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=approximate)


def conv1d_causal_shifted(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Causal conv via shifted matmuls. x: [..., seq, in]; w: [k, in, out]."""
    k = w.shape[0]
    if k == 1:
        return jnp.einsum("...si,io->...so", x, w[0], preferred_element_type=jnp.float32)
    seq = x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 2) + [(k - 1, 0), (0, 0)]
    xp = jnp.pad(x, pad)
    out = None
    for i in range(k):
        xi = jax.lax.slice_in_dim(xp, i, i + seq, axis=-2)
        term = jnp.einsum("...si,io->...so", xi, w[i], preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    return out


def conv_ffn(x: jnp.ndarray, proj_w: jnp.ndarray, out_w: jnp.ndarray,
             gelu_tanh: bool = False) -> jnp.ndarray:
    """x: [..., seq, d_model]; proj_w: [k, d_model, d_ffn] or [d_model, d_ffn];
    out_w: [k, d_ffn, d_model] or [d_ffn, d_model]."""
    if proj_w.ndim == 2:  # pointwise (decoder / local transformer)
        h = jnp.einsum("...si,io->...so", x, proj_w, preferred_element_type=jnp.float32)
        h = gelu(h.astype(x.dtype), approximate=gelu_tanh)
        out = jnp.einsum("...si,io->...so", h, out_w, preferred_element_type=jnp.float32)
        return out.astype(x.dtype)
    h = conv1d_causal_shifted(x, proj_w)
    h = gelu(h.astype(x.dtype), approximate=gelu_tanh)
    out = conv1d_causal_shifted(h, out_w)
    return out.astype(x.dtype)


def conv_ffn_step(x: jnp.ndarray, proj_w: jnp.ndarray, out_w: jnp.ndarray,
                  gelu_tanh: bool = False) -> jnp.ndarray:
    """Single-position pointwise FFN (decode step; decoder kernel is 1)."""
    h = (x @ proj_w).astype(x.dtype)
    h = gelu(h, approximate=gelu_tanh)
    return (h @ out_w).astype(x.dtype)
