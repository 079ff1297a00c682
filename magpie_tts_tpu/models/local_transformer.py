"""Local transformer: per-frame autoregressive sampling of the 8 codebook codes.

The reference runs this on the host with ~25 fresh graphs and D2H round-trips per
frame (src/magpie.cpp:1113-1317). Here the whole thing is one traced function that
runs inside the jitted decode loop:

- the growing sequence lives in a fixed [9, lt_dim] buffer; because the single LT
  layer is causal, position ``cb`` only attends to the filled prefix, so no length
  masking is needed beyond the causal mask;
- position embeddings are added fresh on every inner step (the stored sequence is
  the raw projected embeddings, matching magpie.cpp:1028-1030);
- per-codebook output heads are stacked [8, lt_dim, vocab] and indexed inside the
  ``fori_loop``.

Returns sampled and argmax codes (EOS detection needs both).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import MagpieConfig
from ..io.magpie_weights import LocalTransformerWeights, MagpieWeights
from ..ops.attention import mha_full
from ..ops.conv_ffn import conv_ffn, gelu
from ..ops.norms import layer_norm
from ..ops.precision import DOT_PRECISION
from ..ops import sampling

_MAX_SEQ = 9  # decoder hidden + up to 8 code embeddings


def lt_layer(seq: jnp.ndarray, lt: LocalTransformerWeights,
             config: MagpieConfig) -> jnp.ndarray:
    """One causal pre-norm LT layer over [T, lt_dim] (magpie.cpp:946-976)."""
    h = layer_norm(seq, lt.norm_self, config.eps)
    seq = seq + mha_full(h, lt.qkv, lt.sa_out, config.lt_heads, causal=True)
    h = layer_norm(seq, lt.norm_ff, config.eps)
    seq = seq + conv_ffn(h, lt.ff_proj, lt.ff_out, gelu_tanh=config.gelu_tanh)
    return seq


def lt_hidden_for_position(seq_buf: jnp.ndarray, lt: LocalTransformerWeights,
                           config: MagpieConfig, position: jnp.ndarray) -> jnp.ndarray:
    """Run the LT layer over the full buffer (+pos emb) and read one row."""
    with_pos = seq_buf + lt.pos_emb[:_MAX_SEQ]
    out = lt_layer(with_pos, lt, config)
    return out[position]


def _in_proj(x: jnp.ndarray, lt: LocalTransformerWeights, wdt) -> jnp.ndarray:
    """768 -> lt_dim projection with f32 bias add, rounded to the weight dtype
    (the kernels' rounding point, ops/pallas_kernels/lt_sampler.py)."""
    p = jnp.dot(x, lt.in_proj_w, preferred_element_type=jnp.float32,
                precision=DOT_PRECISION) + lt.in_proj_b.astype(jnp.float32)
    return p.astype(wdt)


def _lt_layer_f32(seq_buf: jnp.ndarray, lt: LocalTransformerWeights,
                  config: MagpieConfig) -> jnp.ndarray:
    """The LT layer with the kernel's exact rounding points: float32 residual
    carry, inputs rounded to the weight dtype before each matmul, f32
    accumulation, probabilities rounded to the weight dtype.

    Mirrors ops/pallas_kernels/lt_sampler.py:_kernel so the XLA path and the
    fused kernel produce identical temp=0 codes.
    """
    wdt = seq_buf.dtype
    x = seq_buf.astype(jnp.float32) + lt.pos_emb[:_MAX_SEQ].astype(jnp.float32)
    h = layer_norm(x, lt.norm_self, config.eps).astype(wdt)
    qkv = jnp.dot(h, lt.qkv, preferred_element_type=jnp.float32,
                  precision=DOT_PRECISION)
    d = config.lt_dim
    q = qkv[:, :d].astype(wdt)
    k = qkv[:, d:2 * d].astype(wdt)
    v = qkv[:, 2 * d:].astype(wdt)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))  # single head, d_head = lt_dim
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                     precision=DOT_PRECISION) * scale
    idx = jnp.arange(_MAX_SEQ)
    scores = jnp.where(idx[None, :] <= idx[:, None], scores, sampling.NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)).astype(wdt)
    attn = jnp.dot(probs, v, preferred_element_type=jnp.float32,
                   precision=DOT_PRECISION)
    x = x + jnp.dot(attn.astype(wdt), lt.sa_out,
                    preferred_element_type=jnp.float32,
                    precision=DOT_PRECISION)
    h2 = layer_norm(x, lt.norm_ff, config.eps).astype(wdt)
    ff = jnp.dot(h2, lt.ff_proj, preferred_element_type=jnp.float32,
                 precision=DOT_PRECISION)
    ff = gelu(ff, approximate=config.gelu_tanh).astype(wdt)
    x = x + jnp.dot(ff, lt.ff_out, preferred_element_type=jnp.float32,
                    precision=DOT_PRECISION)
    return x  # float32 [_MAX_SEQ, lt_dim]


def sample_frame_codes(
    decoder_hidden: jnp.ndarray,
    weights: MagpieWeights,
    config: MagpieConfig,
    key: jax.Array,
    temperature: jnp.ndarray,
    top_k: int,
    forbid_eos: jnp.ndarray,
    static_forbidden_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """decoder_hidden: [d_model] -> (sampled [8], argmax [8]) int32 codes."""
    lt = weights.lt
    n_cb = config.num_codebooks
    wdt = decoder_hidden.dtype

    seq_buf = jnp.zeros((_MAX_SEQ, config.lt_dim), dtype=wdt)
    seq_buf = seq_buf.at[0].set(_in_proj(decoder_hidden, lt, wdt))

    # One canonical int32 seed per frame; each codebook phase derives its own
    # noise stream from (seed, cb) — the exact scheme the Pallas kernels use,
    # so XLA and kernel paths draw identical temp>0 codes from equal logits.
    seed = sampling.seed_from_key(key)

    # Statically unrolled over the 8 codebooks: all per-codebook weight indexing
    # (out_proj heads, audio embedding tables) resolves to static slices, which
    # measures meaningfully faster on TPU than a fori_loop with dynamic gathers.
    sampled = []
    argmaxed = []
    for cb in range(n_cb):
        hidden = _lt_layer_f32(seq_buf, lt, config)[cb]
        logits = jnp.dot(hidden.astype(wdt), lt.out_proj_w[cb],
                         preferred_element_type=jnp.float32,
                         precision=DOT_PRECISION
                         ) + lt.out_proj_b[cb].astype(jnp.float32)
        logits = sampling.mask_logits(logits, static_forbidden_mask, forbid_eos,
                                      config.audio_eos_id)
        code, amax = sampling.sample_top_k_deterministic(
            seed, cb, logits, temperature, top_k)
        sampled.append(code)
        argmaxed.append(amax)

        # Embed the sampled code with THIS codebook's embedding table, re-project,
        # and append (magpie.cpp:1274-1313).
        if cb < n_cb - 1:
            emb = weights.audio_emb[cb, code]
            seq_buf = seq_buf.at[cb + 1].set(_in_proj(emb, lt, wdt))

    return jnp.stack(sampled), jnp.stack(argmaxed)
