"""Attention primitives.

Three shapes of attention cover the whole model (reference src/magpie.cpp:1477-1767,
3393-3480):

- ``mha_full``: full-sequence multi-head self-attention with an optional causal /
  length mask (encoder, full-seq decoder oracle path, local transformer).
- ``mha_cached_step``: single-query attention over a fixed-capacity KV buffer with a
  length mask — the jitted decode-step form of the reference's flat GPU cache.
- ``cross_attention``: query against precomputed K/V from encoder memory, with a
  key-validity mask for bucketed (padded) encoder sequences.

All softmax/score math runs in float32; matmuls request float32 accumulation.
Scaling is 1/sqrt(d_head), applied to the scores (magpie.cpp:1527).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .precision import DOT_PRECISION

_NEG_INF = -1e30


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[..., seq, n_heads*d_head] -> [..., n_heads, seq, d_head].

    Feature f maps to (head f // d_head, dim f % d_head) — the fused QKV layout of
    the checkpoint (magpie.cpp:1510 reshape semantics).
    """
    *batch, seq, d = x.shape
    x = x.reshape(*batch, seq, n_heads, d // n_heads)
    return jnp.swapaxes(x, -2, -3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., n_heads, seq, d_head] -> [..., seq, n_heads*d_head]."""
    x = jnp.swapaxes(x, -2, -3)
    *batch, seq, h, d = x.shape
    return x.reshape(*batch, seq, h * d)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [..., H, Tq, D], k/v: [..., H, Tk, D], mask: broadcastable to
    [..., H, Tq, Tk] (True = attend / additive float also accepted).
    """
    d_head = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d_head))
    scores = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32, precision=DOT_PRECISION) * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            scores = jnp.where(mask, scores, _NEG_INF)
        else:
            scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32, precision=DOT_PRECISION)
    return out.astype(v.dtype)


def mha_full(x: jnp.ndarray, qkv_w: jnp.ndarray, out_w: jnp.ndarray, n_heads: int,
             causal: bool = True, length: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full-sequence self-attention.

    x: [seq, d_model] (or batched [..., seq, d_model]);
    qkv_w: [d_model, 3*d_model]; out_w: [d_model, d_model].
    ``length``: optional valid-prefix length; key positions >= length are masked
    (bucketed sequences).
    """
    seq = x.shape[-2]
    qkv = jnp.einsum("...sd,df->...sf", x, qkv_w, preferred_element_type=jnp.float32, precision=DOT_PRECISION)
    qkv = qkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, n_heads) for t in (q, k, v))

    mask = None
    if causal:
        idx = jnp.arange(seq)
        mask = idx[None, :] <= idx[:, None]  # [Tq, Tk]
    if length is not None:
        key_ok = jnp.arange(seq)[None, :] < length
        mask = key_ok if mask is None else (mask & key_ok)
    if mask is not None:
        mask = mask[..., None, :, :] if mask.ndim == 2 else mask

    out = attend(q, k, v, mask)
    out = _merge_heads(out)
    return jnp.einsum("...sf,fd->...sd", out, out_w,
                      preferred_element_type=jnp.float32, precision=DOT_PRECISION).astype(x.dtype)


def mha_cached_step(x: jnp.ndarray, qkv_w: jnp.ndarray, out_w: jnp.ndarray,
                    k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                    pos: jnp.ndarray, n_heads: int):
    """Single-step self-attention against a fixed KV buffer.

    x: [d_model] current-step activation (already normed);
    k_cache/v_cache: [max_seq, d_model] for this layer;
    pos: scalar int32 — index to write the new K/V, also the number of valid
    entries before this step. Attends over positions [0, pos] (no mask needed
    beyond the length mask: causality is implicit, magpie.cpp:3467).

    Returns (attn_out [d_model], k_cache, v_cache) with the new K/V written.
    """
    qkv = jnp.dot(x, qkv_w, precision=DOT_PRECISION).astype(x.dtype)
    d_model = x.shape[-1]
    q, k_new, v_new = qkv[:d_model], qkv[d_model:2 * d_model], qkv[2 * d_model:]

    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new[None, :], (pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new[None, :], (pos, 0))

    max_seq = k_cache.shape[0]
    d_head = d_model // n_heads
    qh = q.reshape(n_heads, 1, d_head)
    kh = _split_heads(k_cache, n_heads)       # [H, max_seq, Dh]
    vh = _split_heads(v_cache, n_heads)

    length_mask = (jnp.arange(max_seq) <= pos)[None, None, :]  # [1, 1, max_seq]
    out = attend(qh, kh, vh, length_mask)     # [H, 1, Dh]
    out = out.reshape(d_model)
    return (jnp.dot(out, out_w, precision=DOT_PRECISION).astype(x.dtype),
            k_cache, v_cache)


def precompute_cross_attention_kv(memory_normed: jnp.ndarray, xa_kv_w: jnp.ndarray):
    """memory_normed: [enc_seq, d_model]; xa_kv_w: [d_model, 2*d_xa].

    Returns (k, v) each [enc_seq, d_xa]. K is the first half of the fused output
    (magpie.cpp:1696-1706 split).
    """
    kv = jnp.einsum("sd,df->sf", memory_normed, xa_kv_w,
                    preferred_element_type=jnp.float32, precision=DOT_PRECISION).astype(memory_normed.dtype)
    d_xa = xa_kv_w.shape[-1] // 2
    return kv[:, :d_xa], kv[:, d_xa:]


def cross_attention(query: jnp.ndarray, xa_k: jnp.ndarray, xa_v: jnp.ndarray,
                    q_w: jnp.ndarray, out_w: jnp.ndarray, n_heads: int,
                    enc_length: Optional[jnp.ndarray] = None,
                    out_dtype=None) -> jnp.ndarray:
    """query: [..., Tq, d_model] (already normed); xa_k/xa_v: [enc_seq, d_xa].

    ``enc_length`` masks padded encoder key positions in bucketed mode.
    ``out_dtype`` overrides the output dtype (the f32-carry decode step keeps
    the unrounded f32 accumulation; default rounds to the query dtype).
    """
    q = jnp.einsum("...sd,df->...sf", query, q_w,
                   preferred_element_type=jnp.float32, precision=DOT_PRECISION).astype(query.dtype)
    qh = _split_heads(q, n_heads)
    kh = _split_heads(xa_k, n_heads)
    vh = _split_heads(xa_v, n_heads)
    mask = None
    if enc_length is not None:
        mask = (jnp.arange(xa_k.shape[-2]) < enc_length)[None, None, :]
    out = _merge_heads(attend(qh, kh, vh, mask))
    return jnp.einsum(
        "...sf,fd->...sd", out, out_w, preferred_element_type=jnp.float32,
        precision=DOT_PRECISION).astype(out_dtype or query.dtype)
