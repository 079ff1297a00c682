"""Text encoder: 6 pre-norm layers of causal self-attention + causal conv-FFN (k=3).

NB: despite the name, the NeMo Magpie text encoder attends **causally**
(reference src/magpie.cpp:1948, docs/STATUS.md:462). That makes right-padded
(bucketed) token sequences prefix-exact: outputs at valid positions are unaffected
by padding, so no length masking is needed inside the encoder itself.

Layer stack runs as ``lax.scan`` over stacked per-layer weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MagpieConfig
from ..io.magpie_weights import EncoderWeights, MagpieWeights
from ..ops.attention import mha_full
from ..ops.conv_ffn import conv_ffn
from ..ops.norms import layer_norm


def encoder_layer(x: jnp.ndarray, lw, config: MagpieConfig) -> jnp.ndarray:
    """One pre-norm encoder layer. x: [..., seq, d_model]."""
    norm_self, qkv, sa_out, norm_ff, ff_proj, ff_out = lw
    h = layer_norm(x, norm_self, config.eps)
    x = x + mha_full(h, qkv, sa_out, config.enc_heads, causal=True)
    h = layer_norm(x, norm_ff, config.eps)
    x = x + conv_ffn(h, ff_proj, ff_out, gelu_tanh=config.gelu_tanh)
    return x


def run_encoder(tokens: jnp.ndarray, weights: MagpieWeights,
                config: MagpieConfig) -> jnp.ndarray:
    """tokens: [seq] int32 (possibly right-padded) -> encoder output [seq, d_model]."""
    enc: EncoderWeights = weights.encoder
    seq = tokens.shape[-1]
    x = weights.text_emb[tokens] + enc.pos_emb[:seq]

    def body(x, lw):
        return encoder_layer(x, lw, config), None

    layer_weights = (enc.norm_self, enc.qkv, enc.sa_out, enc.norm_ff, enc.ff_proj, enc.ff_out)
    x, _ = jax.lax.scan(body, x, layer_weights)
    return layer_norm(x, enc.norm_out, config.eps)
