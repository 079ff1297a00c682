"""Shared in-kernel math for Pallas TPU kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT_HALF = 0.7071067811865476


def dot_hi(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Matmul with f32 accumulation; full-f32 MXU precision for f32 operands.

    Mirrors the XLA paths' DOT_PRECISION policy (ops/precision.py) so the
    kernels and the XLA oracle agree at f32 rounding level. Mosaic rejects a
    contract_precision=fp32 attribute on non-f32 operands, so HIGHEST is
    requested only when both operands are float32 (bf16 inputs are single-pass
    exact either way).
    """
    hi = a.dtype == jnp.float32 and b.dtype == jnp.float32
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST if hi else None)


def erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| < 1.5e-7.

    Mosaic has no erf/erfc primitive; this matches float32 erf to ~1 ulp of
    bfloat16 activations and ~1e-7 of float32 ones.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return sign * y


def gelu_kernel(x: jnp.ndarray, approximate: bool = False) -> jnp.ndarray:
    """GELU usable inside Mosaic kernels.

    approximate=False uses the erf form via ``erf_approx`` (matching
    jax.nn.gelu(approximate=False) to ~1e-7); approximate=True is the tanh form.
    """
    xf = x.astype(jnp.float32)
    if approximate:
        c = 0.7978845608028654  # sqrt(2/pi)
        inner = c * (xf + 0.044715 * xf * xf * xf)
        return (0.5 * xf * (1.0 + jnp.tanh(inner))).astype(x.dtype)
    return (0.5 * xf * (1.0 + erf_approx(xf * _SQRT_HALF))).astype(x.dtype)
