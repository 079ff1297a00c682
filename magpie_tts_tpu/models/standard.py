"""The "standard" (uncached, full-sequence) synthesis path.

Product analog of the reference's ``magpie_synthesize_codes``
(src/magpie.cpp:2457-2743): rebuilds the full decoder over [context; audio] each
step — O(n^2) but maximally simple, kept as the verification oracle for the fast
cached path (the reference's own cached/uncached paths diverge numerically,
docs/STATUS.md:260-263; ours are required by tests to agree exactly at temp=0).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MagpieConfig
from ..io.magpie_weights import MagpieWeights
from ..ops import sampling
from . import local_transformer as lt_mod
from .decoder import decode_full
from .encoder import run_encoder
from .magpie import audio_frame_embedding, speaker_context


def synthesize_codes_standard(token_ids, weights: MagpieWeights,
                              config: MagpieConfig, *, speaker_id: int = 0,
                              temperature: float = 0.0, top_k: int = 80,
                              seed: int = 0,
                              max_steps: Optional[int] = None) -> np.ndarray:
    """Host-orchestrated full-sequence synthesis. Returns codes [n_frames, 8].

    Each step jit-compiles per sequence length the first time (slow); use the
    engine's cached program for production.
    """
    from ..io.magpie_weights import materialize_weights

    weights = materialize_weights(weights)  # q8-native blocks -> dense
    max_steps = max_steps or config.max_dec_steps
    tokens = jnp.asarray(np.asarray(token_ids, np.int32))
    enc_out = run_encoder(tokens, weights, config)
    context = speaker_context(weights, jnp.int32(speaker_id))
    static_mask = sampling.forbidden_token_mask(
        config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)

    @jax.jit
    def step_fn(weights, frames_emb, enc_out, key, forbid_eos):
        dec_input = jnp.concatenate([context.astype(frames_emb.dtype), frames_emb], axis=0)
        dec_out = decode_full(dec_input, enc_out, weights, config)
        hidden = dec_out[-1]
        return lt_mod.sample_frame_codes(
            hidden, weights, config, key, jnp.float32(temperature), top_k,
            forbid_eos, static_mask)

    frames = [np.full((config.num_codebooks,), config.audio_bos_id, np.int32)]
    out_frames = []
    key = jax.random.PRNGKey(seed)
    embed = jax.jit(lambda w, codes: audio_frame_embedding(codes, w, config))

    for step in range(max_steps):
        frames_emb = jnp.stack([embed(weights, jnp.asarray(f)) for f in frames])
        key, sub = jax.random.split(key)
        forbid = jnp.bool_(step < config.min_generated_frames)
        sampled, argmax = step_fn(weights, frames_emb, enc_out, sub, forbid)
        sampled = np.asarray(sampled)
        if bool(sampling.frame_has_eos(jnp.asarray(sampled), argmax,
                                       config.audio_eos_id)):
            break
        out_frames.append(sampled)
        frames.append(sampled)

    return (np.stack(out_frames) if out_frames
            else np.zeros((0, config.num_codebooks), np.int32))


def final_projection(hidden: jnp.ndarray, weights: MagpieWeights) -> jnp.ndarray:
    """Linear d_model -> 8*2024 logits + bias (reference magpie.cpp:2261-2282).

    Present for checkpoint parity and analysis; like the reference, the sampling
    path uses the local-transformer heads instead.
    """
    from ..io.magpie_weights import materialize_weights

    weights = materialize_weights(weights)  # q8-native blocks -> dense
    return (hidden @ weights.final_proj_w + weights.final_proj_b).astype(jnp.float32)
