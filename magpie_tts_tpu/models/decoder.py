"""Main decoder: 12 pre-norm layers (causal SA, 1-head XA, pointwise FFN).

Three entry points, mirroring the reference's roles but restructured for XLA:

- ``decode_full``     full-sequence forward (the "standard"-path oracle,
                      reference magpie.cpp:2421-2455).
- ``prefill``         batched pass over the speaker-context frames that fills the
                      KV cache in one call (reference magpie.cpp:4167-4241).
- ``decode_step``     one autoregressive position against the fixed-capacity cache
                      (reference magpie.cpp:3484-3528), unrolled over layers so
                      each layer's cache row updates in place under jit.

Cache layout: ``[n_layers, max_seq, d_model]`` for K and V, the functional analog of
the reference's flat GPU cache (magpie.cpp:3315-3376).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MagpieConfig
from ..io.magpie_weights import DecoderWeights, MagpieWeights
from ..ops.attention import (cross_attention, mha_full,
                             precompute_cross_attention_kv)
from ..ops.conv_ffn import conv_ffn, conv_ffn_step
from ..ops.norms import layer_norm
from ..ops.precision import DOT_PRECISION


def precompute_xa_kv(enc_out: jnp.ndarray, dec: DecoderWeights,
                     config: MagpieConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer cross-attention K/V from encoder output (once per utterance).

    enc_out: [enc_seq, d_model] -> (xa_k, xa_v) each [L, enc_seq, d_xa].
    The memory norm is folded into this precompute (magpie.cpp:1663-1711).
    """
    def per_layer(norm_mem_w, kv_w):
        mem = layer_norm(enc_out, norm_mem_w, config.eps)
        return precompute_cross_attention_kv(mem, kv_w)

    xa_k, xa_v = jax.vmap(per_layer)(dec.norm_xa_mem, dec.xa_kv)
    return xa_k, xa_v


def _layer_full(x, enc_out, lw, config: MagpieConfig, enc_length):
    (norm_self, qkv, sa_out, norm_xa_q, norm_xa_mem, xa_q, xa_kv, xa_out,
     norm_ff, ff_proj, ff_out) = lw
    h = layer_norm(x, norm_self, config.eps)
    x = x + mha_full(h, qkv, sa_out, config.dec_sa_heads, causal=True)

    q = layer_norm(x, norm_xa_q, config.eps)
    mem = layer_norm(enc_out, norm_xa_mem, config.eps)
    k, v = precompute_cross_attention_kv(mem, xa_kv)
    x = x + cross_attention(q, k, v, xa_q, xa_out, config.dec_xa_heads,
                            enc_length=enc_length)

    h = layer_norm(x, norm_ff, config.eps)
    x = x + conv_ffn(h, ff_proj, ff_out, gelu_tanh=config.gelu_tanh)
    return x


def decode_full(dec_input: jnp.ndarray, enc_out: jnp.ndarray,
                weights: MagpieWeights, config: MagpieConfig,
                enc_length: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full-sequence decoder. dec_input: [dec_seq, d_model] (context + audio embs).

    Position embeddings are added here at offset 0 (magpie.cpp:2432-2434).
    """
    dec = weights.decoder
    seq = dec_input.shape[-2]
    x = dec_input + dec.pos_emb[:seq]

    lw = (dec.norm_self, dec.qkv, dec.sa_out, dec.norm_xa_q, dec.norm_xa_mem,
          dec.xa_q, dec.xa_kv, dec.xa_out, dec.norm_ff, dec.ff_proj, dec.ff_out)

    def body(x, w):
        return _layer_full(x, enc_out, w, config, enc_length), None

    x, _ = jax.lax.scan(body, x, lw)
    return layer_norm(x, dec.norm_out, config.eps)


def prefill(context: jnp.ndarray, xa_k: jnp.ndarray, xa_v: jnp.ndarray,
            k_cache: jnp.ndarray, v_cache: jnp.ndarray,
            weights: MagpieWeights, config: MagpieConfig,
            enc_length: Optional[jnp.ndarray] = None):
    """Run the speaker-context frames through all layers, filling cache[:, :T_ctx].

    context: [T_ctx, d_model]; caches: [L, max_seq, d_model].
    Returns (k_cache, v_cache) updated. The hidden output is discarded — the pass
    exists to populate the cache (magpie.cpp:4167-4241).
    """
    dec = weights.decoder
    t_ctx = context.shape[0]
    x = context + dec.pos_emb[:t_ctx]

    lw = (dec.norm_self, dec.qkv, dec.sa_out, dec.norm_xa_q, dec.norm_xa_mem,
          dec.xa_q, dec.xa_kv, dec.xa_out, dec.norm_ff, dec.ff_proj, dec.ff_out, xa_k, xa_v)

    def body(x, w):
        (norm_self, qkv_w, sa_out, norm_xa_q, _norm_xa_mem, xa_q_w, _xa_kv_w, xa_out_w,
         norm_ff, ff_proj, ff_out, xk, xv) = w
        h = layer_norm(x, norm_self, config.eps)
        qkv = jnp.einsum("sd,df->sf", h, qkv_w,
                         preferred_element_type=jnp.float32,
                         precision=DOT_PRECISION).astype(x.dtype)
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)

        d_head = config.d_model // config.dec_sa_heads
        qh = jnp.swapaxes(q.reshape(t_ctx, config.dec_sa_heads, d_head), 0, 1)
        kh = jnp.swapaxes(k_new.reshape(t_ctx, config.dec_sa_heads, d_head), 0, 1)
        vh = jnp.swapaxes(v_new.reshape(t_ctx, config.dec_sa_heads, d_head), 0, 1)
        from ..ops.attention import attend
        idx = jnp.arange(t_ctx)
        mask = (idx[None, :] <= idx[:, None])[None]
        attn = attend(qh, kh, vh, mask)
        attn = jnp.swapaxes(attn, 0, 1).reshape(t_ctx, config.d_model)
        x = x + jnp.einsum("sf,fd->sd", attn, sa_out,
                           preferred_element_type=jnp.float32,
                           precision=DOT_PRECISION).astype(x.dtype)

        qn = layer_norm(x, norm_xa_q, config.eps)
        x = x + cross_attention(qn, xk, xv, xa_q_w, xa_out_w, config.dec_xa_heads,
                                enc_length=enc_length)

        h = layer_norm(x, norm_ff, config.eps)
        x = x + conv_ffn(h, ff_proj, ff_out, gelu_tanh=config.gelu_tanh)
        return x, (k_new, v_new)

    _, (k_all, v_all) = jax.lax.scan(body, x, lw)
    # k_all/v_all: [L, T_ctx, d_model] -> write into cache[:, 0:T_ctx]
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_all.astype(k_cache.dtype), (0, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_all.astype(v_cache.dtype), (0, 0, 0))
    return k_cache, v_cache


def decode_step(x: jnp.ndarray, pos: jnp.ndarray,
                xa_k: jnp.ndarray, xa_v: jnp.ndarray,
                k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                weights: MagpieWeights, config: MagpieConfig,
                enc_length: Optional[jnp.ndarray] = None):
    """One autoregressive decoder position.

    x: [d_model] frame embedding (audio-embedding sum, *without* position);
    pos: scalar int32 absolute position (also the cache write index);
    xa_k/xa_v: [L, enc_seq, d_xa]; caches: [L, max_seq, d_model].
    Returns (hidden [d_model], k_cache, v_cache).
    """
    max_seq = k_cache.shape[1]
    return decode_step_masked(x, pos, pos, jnp.arange(max_seq) <= pos,
                              xa_k, xa_v, k_cache, v_cache, weights, config,
                              enc_length=enc_length)


def decode_step_masked(x: jnp.ndarray, logical_pos: jnp.ndarray,
                       write_row: jnp.ndarray, valid_mask: jnp.ndarray,
                       xa_k: jnp.ndarray, xa_v: jnp.ndarray,
                       k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                       weights: MagpieWeights, config: MagpieConfig,
                       enc_length: Optional[jnp.ndarray] = None):
    """Generalized decoder step: cache slot, position embedding, and attention
    membership are decoupled.

    ``logical_pos`` indexes the learned position-embedding table; ``write_row``
    is the physical cache row the new K/V land in; ``valid_mask`` [max_seq]
    marks the rows this step may attend to (it must include ``write_row``).
    The standard path uses (pos, pos, arange <= pos); the continuous-batching
    ring cache (parallel/continuous.py) uses a globally shared write row with
    per-slot masks so batched cache updates stay dynamic_update_slice rather
    than scatters.

    Layers are unrolled so each layer's cache-row write lowers to an in-place
    dynamic-update-slice on the donated cache buffers.

    Numerics mirror the fused Pallas decode kernels exactly at every rounding
    point (the temp=0 parity bar): the residual carry stays float32, layer
    inputs round to the weight dtype before each matmul, matmuls accumulate in
    f32 at DOT_PRECISION, and attention probabilities round to the weight
    dtype (as the kernels' MXU layout does).
    """
    from ..ops.attention import attend, _split_heads

    dec = weights.decoder
    n_heads = config.dec_sa_heads
    d_model = config.d_model
    d_head = d_model // n_heads
    pos = write_row
    wdt = x.dtype
    xf = (x + dec.pos_emb[logical_pos]).astype(jnp.float32)

    length_mask = valid_mask[None, None, :]  # [1(H), 1(q), max_seq]

    for l in range(config.dec_layers):
        h = layer_norm(xf, dec.norm_self[l], config.eps).astype(wdt)
        qkv = jnp.dot(h, dec.qkv[l], preferred_element_type=jnp.float32,
                      precision=DOT_PRECISION).astype(wdt)
        q, k_new, v_new = qkv[:d_model], qkv[d_model:2 * d_model], qkv[2 * d_model:]

        # Single-row cache writes: lowered to in-place updates on donated buffers.
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype)[None, None, :], (l, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype)[None, None, :], (l, pos, 0))

        qh = q.reshape(n_heads, 1, d_head)
        kh = _split_heads(k_cache[l].astype(wdt), n_heads)  # [H, max_seq, Dh]
        vh = _split_heads(v_cache[l].astype(wdt), n_heads)
        attn = attend(qh, kh, vh, length_mask).reshape(d_model)
        xf = xf + jnp.dot(attn, dec.sa_out[l],
                          preferred_element_type=jnp.float32,
                          precision=DOT_PRECISION)

        q = layer_norm(xf, dec.norm_xa_q[l], config.eps).astype(wdt)
        xf = xf + cross_attention(q[None, :], xa_k[l], xa_v[l], dec.xa_q[l],
                                  dec.xa_out[l], config.dec_xa_heads,
                                  enc_length=enc_length,
                                  out_dtype=jnp.float32)[0]

        h = layer_norm(xf, dec.norm_ff[l], config.eps).astype(wdt)
        xf = xf + conv_ffn_step(h, dec.ff_proj[l], dec.ff_out[l],
                                gelu_tanh=config.gelu_tanh,
                                out_dtype=jnp.float32)

    return (layer_norm(xf, dec.norm_out, config.eps).astype(wdt),
            k_cache, v_cache)
