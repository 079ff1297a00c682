"""Normalization layers.

The model uses LayerNorm *without bias* (reference src/magpie.cpp:2237-2259;
it is LayerNorm, not RMSNorm — docs/STATUS.md:461). Statistics are computed in
float32 regardless of the activation dtype, then cast back.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """(x - mean) / sqrt(var + eps) * weight over the last axis. No bias."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered / jnp.sqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Legacy variant kept for completeness (reference src/magpie.cpp:2218-2235)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf / jnp.sqrt(ms + eps) * weight.astype(jnp.float32)).astype(x.dtype)
