"""Per-layer forward tracing for golden-dump parity debugging.

The reference's golden discipline (scripts/dump_reference.py:21-42 plus the
per-layer dump_decoder_reference.py / dump_* scripts) localizes a numerical
divergence to one layer by dumping every intermediate. This module computes the
same intermediates from this framework's building blocks so
``tools/dump_golden.py`` can write them in the reference .bin layout and
``tools/verify_golden.py`` can diff two dump trees layer by layer.

All captures run the plain XLA paths (the parity oracle), full-sequence where
the reference dumps full sequences. Returned dicts map dump names (file stem)
to float32 numpy arrays in PyTorch [seq, features] / [T, C] order.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig, MagpieConfig
from ..io.codec_weights import CodecWeights
from ..io.magpie_weights import MagpieWeights
from ..models import codec as codec_mod
from ..models import local_transformer as lt_mod
from ..models.decoder import _layer_full, precompute_xa_kv
from ..models.encoder import encoder_layer
from ..models.magpie import audio_frame_embedding, speaker_context
from ..models.standard import final_projection
from ..ops import sampling
from ..ops.norms import layer_norm
from ..ops.precision import DOT_PRECISION


def trace_encoder(tokens: jnp.ndarray, weights: MagpieWeights,
                  config: MagpieConfig) -> Dict[str, np.ndarray]:
    """Per-layer encoder intermediates: embedding+pos, each layer, final LN."""
    enc = weights.encoder
    seq = tokens.shape[-1]
    out: Dict[str, np.ndarray] = {}
    x = weights.text_emb[tokens]
    out["text_embedding"] = np.asarray(x, np.float32)
    x = x + enc.pos_emb[:seq]
    out["encoder_input"] = np.asarray(x, np.float32)
    for l in range(config.enc_layers):
        lw = (enc.norm_self[l], enc.qkv[l], enc.sa_out[l], enc.norm_ff[l],
              enc.ff_proj[l], enc.ff_out[l])
        x = encoder_layer(x, lw, config)
        out[f"encoder_layer_{l}"] = np.asarray(x, np.float32)
    x = layer_norm(x, enc.norm_out, config.eps)
    out["encoder_output"] = np.asarray(x, np.float32)
    return out


def trace_decoder(enc_out: jnp.ndarray, weights: MagpieWeights,
                  config: MagpieConfig, speaker_id: int = 0,
                  frames: np.ndarray = None) -> Dict[str, np.ndarray]:
    """Full-sequence decoder intermediates over [context; BOS; frames...].

    ``frames``: optional [n, 8] generated codes to append after BOS (dump the
    decoder state mid-utterance). Mirrors the reference's full decoder dumps
    (build_full_decoder, magpie.cpp:2421-2455).
    """
    dec = weights.decoder
    out: Dict[str, np.ndarray] = {}
    context = speaker_context(weights, jnp.int32(speaker_id))
    bos = jnp.full((1, config.num_codebooks), config.audio_bos_id, jnp.int32)
    codes = bos if frames is None or not len(frames) else jnp.concatenate(
        [bos, jnp.asarray(frames, jnp.int32)], axis=0)
    emb = jax.vmap(lambda c: audio_frame_embedding(c, weights, config))(codes)
    dec_input = jnp.concatenate([context.astype(emb.dtype), emb], axis=0)
    out["decoder_input"] = np.asarray(dec_input, np.float32)

    seq = dec_input.shape[0]
    x = dec_input + dec.pos_emb[:seq]
    xa_k, xa_v = precompute_xa_kv(enc_out, dec, config)
    out["xa_k"] = np.asarray(xa_k, np.float32)
    out["xa_v"] = np.asarray(xa_v, np.float32)
    for l in range(config.dec_layers):
        lw = (dec.norm_self[l], dec.qkv[l], dec.sa_out[l], dec.norm_xa_q[l],
              dec.norm_xa_mem[l], dec.xa_q[l], dec.xa_kv[l], dec.xa_out[l],
              dec.norm_ff[l], dec.ff_proj[l], dec.ff_out[l])
        x = _layer_full(x, enc_out, lw, config, None)
        out[f"decoder_layer_{l}"] = np.asarray(x, np.float32)
    x = layer_norm(x, dec.norm_out, config.eps)
    out["decoder_output"] = np.asarray(x, np.float32)
    out["final_proj"] = np.asarray(final_projection(x[-1], weights), np.float32)
    return out


def trace_local_transformer(hidden: jnp.ndarray, weights: MagpieWeights,
                            config: MagpieConfig) -> Dict[str, np.ndarray]:
    """Greedy LT pass from one decoder hidden: per-codebook logits + codes.

    Mirrors the reference LT goldens (test_local_transformer.cpp exact-code
    check; logits let a divergence be localized to one codebook head).
    """
    lt = weights.lt
    out: Dict[str, np.ndarray] = {}
    wdt = hidden.dtype
    seq_buf = jnp.zeros((lt_mod._MAX_SEQ, config.lt_dim), dtype=wdt)
    seq_buf = seq_buf.at[0].set(lt_mod._in_proj(hidden, lt, wdt))
    static_mask = sampling.forbidden_token_mask(
        config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)
    codes: List[int] = []
    for cb in range(config.num_codebooks):
        h = lt_mod._lt_layer_f32(seq_buf, lt, config)[cb]
        logits = jnp.dot(h.astype(wdt), lt.out_proj_w[cb],
                         preferred_element_type=jnp.float32,
                         precision=DOT_PRECISION
                         ) + lt.out_proj_b[cb].astype(jnp.float32)
        out[f"lt_logits_cb{cb}"] = np.asarray(logits, np.float32)
        masked = sampling.mask_logits(logits, static_mask, jnp.bool_(False),
                                      config.audio_eos_id)
        code = int(jnp.argmax(masked))
        codes.append(code)
        if cb < config.num_codebooks - 1:
            emb = weights.audio_emb[cb, code]
            seq_buf = seq_buf.at[cb + 1].set(lt_mod._in_proj(emb, lt, wdt))
    out["lt_greedy_codes"] = np.asarray(codes, np.float32)
    return out


def trace_codec(codes: np.ndarray, weights: CodecWeights,
                config: CodecConfig) -> Dict[str, np.ndarray]:
    """Per-stage codec intermediates: FSQ latent, pre-conv, each upsample
    stage's output, post-conv audio (reference scripts/inspect_codec.py and
    the codec stage table, docs/CODEC_ARCHITECTURE.md:109-127)."""
    out: Dict[str, np.ndarray] = {}
    codes = jnp.asarray(codes, jnp.int32)
    if codes.shape[0] != config.num_codebooks:
        codes = codes.T  # accept [T, 8] too
    latent = codec_mod.fsq_dequantize(codes, config)
    # Dumped in the reference's [latent_dim, T] layout (fsq_dequantize_cpu,
    # nano-codec.cpp:721-752) so the .bin interoperates; compute is [T, C].
    out["codec_latent"] = np.asarray(latent, np.float32).T
    x = latent[None].astype(weights.pre_conv_w.dtype)
    x = codec_mod.causal_conv1d(x, weights.pre_conv_w, weights.pre_conv_b)
    out["codec_pre_conv"] = np.asarray(x[0], np.float32)
    for s, (stage, stride) in enumerate(zip(weights.stages,
                                            config.up_sample_rates)):
        x = codec_mod.half_snake(x, stage.act_alpha, config.leaky_slope)
        x = codec_mod.grouped_conv_transpose1d(x, stage.convt_w, stage.convt_b,
                                               stride)
        out[f"codec_stage{s}_upsample"] = np.asarray(x[0], np.float32)
        x = codec_mod.res_layer(x, stage.resblocks, config.resblock_dilations,
                                config.leaky_slope, use_pallas=False)
        out[f"codec_stage{s}"] = np.asarray(x[0], np.float32)
    x = codec_mod.half_snake(x, weights.post_alpha, config.leaky_slope)
    x = codec_mod.causal_conv1d(x, weights.post_conv_w, weights.post_conv_b)
    audio = jnp.tanh(x)[0, :, 0]
    out["codec_audio"] = np.asarray(audio, np.float32)
    return out
