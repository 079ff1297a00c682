"""On-device sampling.

Replaces the reference's host-side sampler (src/magpie.cpp:1072-1109, 1131-1268)
with fully traced ops so the whole autoregressive loop stays on device:

- forbidden special tokens are masked to -inf *before* anything else
  (AUDIO_BOS=2016, CONTEXT_BOS/EOS=2018/2019, MASK=2020, RESERVED=2021..2023;
  plus AUDIO_EOS=2017 while frame < min_generated_frames),
- argmax is always computed on the masked logits (EOS detection),
- temperature < 0.01 -> greedy, else top-k + temperature categorical with an
  explicit `jax.random` key (the reference's mt19937 is unseedable; threading a
  key gives deterministic sampling for free).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30
GREEDY_TEMP_THRESHOLD = 0.01


def forbidden_token_mask(vocab_size: int, audio_bos_id: int = 2016,
                         audio_eos_id: int = 2017) -> jnp.ndarray:
    """Static additive mask [vocab] for always-forbidden specials (EOS excluded)."""
    ids = jnp.arange(vocab_size)
    forbidden = (ids == audio_bos_id) | ((ids >= audio_bos_id + 2) & (ids <= audio_bos_id + 7))
    return jnp.where(forbidden, NEG_INF, 0.0).astype(jnp.float32)


def mask_logits(logits: jnp.ndarray, static_mask: jnp.ndarray,
                forbid_eos: jnp.ndarray, audio_eos_id: int) -> jnp.ndarray:
    """Apply the forbidden-token mask; optionally mask EOS (traced bool)."""
    logits = logits.astype(jnp.float32) + static_mask
    eos_penalty = jnp.where(forbid_eos, NEG_INF, 0.0)
    return logits.at[..., audio_eos_id].add(eos_penalty)


def sample_top_k(key: jax.Array, logits: jnp.ndarray, temperature: jnp.ndarray,
                 top_k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sampled_id, argmax_id) from masked logits [vocab].

    Greedy when temperature < 0.01 (matching magpie.cpp:1263). top_k is static.
    """
    argmax_id = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    top_k = min(top_k, logits.shape[-1])  # k = min(top_k, n), magpie.cpp:1082
    vals, idx = jax.lax.top_k(logits, top_k)
    safe_temp = jnp.maximum(temperature, GREEDY_TEMP_THRESHOLD)
    draw = jax.random.categorical(key, vals / safe_temp, axis=-1)
    sampled = jnp.take_along_axis(idx, draw[..., None], axis=-1)[..., 0].astype(jnp.int32)
    greedy = temperature < GREEDY_TEMP_THRESHOLD
    return jnp.where(greedy, argmax_id, sampled), argmax_id


def frame_has_eos(sampled: jnp.ndarray, argmax: jnp.ndarray, audio_eos_id: int) -> jnp.ndarray:
    """`argmax_or_multinomial_any` EOS rule (magpie.cpp:2706-2715): EOS if ANY
    codebook produced EOS in either the sampled or the argmax codes."""
    return jnp.any(sampled == audio_eos_id) | jnp.any(argmax == audio_eos_id)
