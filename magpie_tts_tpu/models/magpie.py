"""Magpie pipeline assembly: embeddings, prefill, and the on-device decode loop.

The full synthesis program (reference call stack magpie.cpp:4063-4432) becomes
three jittable stages:

1. ``prepare``      — encoder + XA-KV precompute + context prefill + BOS step.
2. ``decode_loop``  — the whole autoregressive loop as ``lax.while_loop``:
                      sample frame codes (local transformer, on device), EOS test,
                      embed, decoder step. Zero host round-trips.
3. plain helpers for the full-sequence oracle path.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MagpieConfig
from ..io.magpie_weights import MagpieWeights
from ..ops import sampling
from . import decoder as decoder_mod
from . import local_transformer as lt_mod
from .encoder import run_encoder


def pallas_shapes_ok(config: MagpieConfig) -> bool:
    """The decode kernels DMA weight slabs whose minor dims must be 128-lane
    multiples (Mosaic tiling). True for the production 357M config; tiny test
    configs fall back to the XLA paths."""
    return all(x % 128 == 0 for x in (config.d_model, config.d_ffn,
                                      config.d_xa, config.lt_dim,
                                      config.lt_ffn_dim))


def use_pallas_default(config: Optional[MagpieConfig] = None) -> bool:
    """Fused Pallas kernels on TPU-like backends (and kernel-compatible model
    shapes), plain XLA elsewhere."""
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False
    return on_tpu and (config is None or pallas_shapes_ok(config))


def audio_frame_embedding(codes: jnp.ndarray, weights: MagpieWeights,
                          config: MagpieConfig) -> jnp.ndarray:
    """codes: [..., 8] -> [..., d_model]: mean of the 8 per-codebook embeddings.

    The 1/8 scale is load-bearing (reference magpie.cpp:1434, STATUS.md:207-230).
    Accumulates in float32 (as the fused frame kernel does) and rounds back to
    the table dtype, so both paths feed identical decoder inputs.
    """
    per_cb = jax.vmap(lambda table, idx: table[idx], in_axes=(0, -1), out_axes=-2)(
        weights.audio_emb, codes)  # [..., 8, d_model]
    mean = jnp.sum(per_cb.astype(jnp.float32), axis=-2) / config.num_codebooks
    return mean.astype(per_cb.dtype)


def speaker_context(weights: MagpieWeights, speaker_id: jnp.ndarray) -> jnp.ndarray:
    """Baked speaker context frames [context_frames, d_model] (magpie.cpp:3280-3305)."""
    return weights.baked_context[speaker_id]


class DecodeState(NamedTuple):
    """Carry of the autoregressive while_loop. Donated across steps."""
    k_cache: jnp.ndarray       # [L, max_seq, d_model]
    v_cache: jnp.ndarray       # [L, max_seq, d_model]
    hidden: jnp.ndarray        # [d_model] decoder output for the current frame
    pos: jnp.ndarray           # i32: next cache position to write
    frame_idx: jnp.ndarray     # i32: number of completed frames
    codes: jnp.ndarray         # [max_dec_steps, 8] i32 (filled up to frame_idx)
    done: jnp.ndarray          # bool
    key: jax.Array             # PRNG key threaded through sampling


def prepare(tokens: jnp.ndarray, enc_length: jnp.ndarray, speaker_id: jnp.ndarray,
            weights: MagpieWeights, config: MagpieConfig,
            cache_dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray, DecodeState]:
    """Everything before the AR loop. tokens may be right-padded to a bucket.

    Returns (xa_k, xa_v, state) where state.hidden is the BOS-step decoder output.
    """
    from ..io.magpie_weights import materialize_weights

    # Q8-native serving: dequantize any block-stored tensors on device, at
    # program entry — dense copies are transient to this invocation (no-op on
    # dense pytrees; XLA CSE merges the duplicate with decode_loop's).
    weights = materialize_weights(weights)
    dtype = weights.text_emb.dtype
    cache_dtype = cache_dtype or dtype
    enc_out = run_encoder(tokens, weights, config)
    xa_k, xa_v = decoder_mod.precompute_xa_kv(enc_out, weights.decoder, config)

    k_cache = jnp.zeros((config.dec_layers, config.max_seq, config.d_model), cache_dtype)
    v_cache = jnp.zeros_like(k_cache)

    context = speaker_context(weights, speaker_id).astype(dtype)
    k_cache, v_cache = decoder_mod.prefill(
        context, xa_k, xa_v, k_cache, v_cache, weights, config, enc_length=enc_length)

    bos_codes = jnp.full((config.num_codebooks,), config.audio_bos_id, jnp.int32)
    bos_emb = audio_frame_embedding(bos_codes, weights, config).astype(dtype)
    hidden, k_cache, v_cache = decoder_mod.decode_step(
        bos_emb, jnp.int32(config.context_frames), xa_k, xa_v, k_cache, v_cache,
        weights, config, enc_length=enc_length)

    state = DecodeState(
        k_cache=k_cache, v_cache=v_cache, hidden=hidden,
        pos=jnp.int32(config.context_frames + 1),
        frame_idx=jnp.int32(0),
        codes=jnp.zeros((config.max_dec_steps, config.num_codebooks), jnp.int32),
        done=jnp.bool_(False),
        key=jax.random.PRNGKey(0),
    )
    return xa_k, xa_v, state


def decode_loop(xa_k: jnp.ndarray, xa_v: jnp.ndarray, state: DecodeState,
                enc_length: jnp.ndarray, weights: MagpieWeights, config: MagpieConfig,
                key: jax.Array, temperature: jnp.ndarray, top_k: int,
                max_steps: Optional[int] = None,
                target_frames: Optional[jnp.ndarray] = None,
                use_pallas_lt: Optional[bool] = None,
                use_pallas_decoder: Optional[bool] = None,
                use_fused: Optional[bool] = None,
                int8_stream=None) -> DecodeState:
    """Run the autoregressive loop fully on device.

    Per iteration (mirrors magpie.cpp:4321-4407): sample all 8 codes from the
    current hidden, stop on EOS (`argmax_or_multinomial_any`), else store the
    frame and run one decoder step on its embedding.

    ``target_frames`` (traced) bounds the loop for incremental/streaming decode:
    the loop stops once ``frame_idx`` reaches it, preserving all state so a later
    call can continue.

    ``use_fused`` selects the single fused frame megakernel when both pallas
    paths are enabled (default True; the MAGPIE_NO_FUSED env var flips the
    default for debugging, mirrored by the CLI --no-fused flag).
    """
    from ..io.magpie_weights import materialize_weights

    weights = materialize_weights(weights)  # q8-native: see prepare()
    max_steps = max_steps or config.max_dec_steps
    if use_pallas_lt is None:
        use_pallas_lt = use_pallas_default(config)
    if use_pallas_decoder is None:
        use_pallas_decoder = use_pallas_default(config)
    if use_fused is None:
        use_fused = not os.environ.get("MAGPIE_NO_FUSED")
    static_mask = sampling.forbidden_token_mask(
        config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)
    state = state._replace(key=key)
    dtype = weights.text_emb.dtype

    def cond(s: DecodeState):
        in_budget = s.frame_idx < max_steps
        if target_frames is not None:
            in_budget = in_budget & (s.frame_idx < target_frames)
        return (~s.done) & in_budget

    def body(s: DecodeState) -> DecodeState:
        forbid_eos = s.frame_idx < config.min_generated_frames
        key, subkey = jax.random.split(s.key)
        if use_pallas_lt and use_pallas_decoder and use_fused:
            # Fully fused frame: LT sampling + embedding + 12 decoder layers in
            # ONE kernel — the LT compute hides under the decoder weight DMAs.
            from ..ops.pallas_kernels.frame_step import frame_step_pallas

            seed = sampling.seed_from_key(subkey)
            sampled, argmax, hidden, k_cache, v_cache = frame_step_pallas(
                s.hidden, s.pos, xa_k, xa_v, s.k_cache, s.v_cache, weights,
                config, seed, temperature, top_k, forbid_eos,
                enc_length=enc_length, int8_stream=int8_stream)
            is_eos = sampling.frame_has_eos(sampled, argmax, config.audio_eos_id)
            codes = jax.lax.dynamic_update_slice(
                s.codes, sampled[None, :], (s.frame_idx, 0))
            frame_idx = jnp.where(is_eos, s.frame_idx, s.frame_idx + 1)
            return DecodeState(
                k_cache=k_cache, v_cache=v_cache, hidden=hidden,
                pos=s.pos + 1, frame_idx=frame_idx, codes=codes,
                done=is_eos, key=key)
        if use_pallas_lt:
            from ..ops.pallas_kernels.lt_sampler import sample_frame_codes_pallas

            seed = sampling.seed_from_key(subkey)
            sampled, argmax = sample_frame_codes_pallas(
                s.hidden, weights, config, seed, temperature, top_k, forbid_eos)
        else:
            sampled, argmax = lt_mod.sample_frame_codes(
                s.hidden, weights, config, subkey, temperature, top_k,
                forbid_eos, static_mask)

        is_eos = sampling.frame_has_eos(sampled, argmax, config.audio_eos_id)

        # Always write; the frame only "counts" if it wasn't EOS (consumers read
        # codes[:frame_idx], so an EOS frame written here is simply ignored).
        codes = jax.lax.dynamic_update_slice(s.codes, sampled[None, :], (s.frame_idx, 0))
        frame_idx = jnp.where(is_eos, s.frame_idx, s.frame_idx + 1)

        emb = audio_frame_embedding(sampled, weights, config).astype(dtype)
        if use_pallas_decoder:
            from ..ops.pallas_kernels.decoder_step import decode_step_pallas

            hidden, k_cache, v_cache = decode_step_pallas(
                emb, s.pos, xa_k, xa_v, s.k_cache, s.v_cache, weights, config,
                enc_length=enc_length, int8_stream=int8_stream)
        else:
            hidden, k_cache, v_cache = decoder_mod.decode_step(
                emb, s.pos, xa_k, xa_v, s.k_cache, s.v_cache, weights, config,
                enc_length=enc_length)

        return DecodeState(
            k_cache=k_cache, v_cache=v_cache, hidden=hidden,
            pos=s.pos + 1, frame_idx=frame_idx, codes=codes,
            done=is_eos, key=key)

    return jax.lax.while_loop(cond, body, state)


def synthesize_codes_program(tokens: jnp.ndarray, enc_length: jnp.ndarray,
                             speaker_id: jnp.ndarray, key: jax.Array,
                             temperature: jnp.ndarray, weights: MagpieWeights,
                             config: MagpieConfig, top_k: int,
                             max_steps: Optional[int] = None,
                             use_pallas_lt: Optional[bool] = None,
                             use_pallas_decoder: Optional[bool] = None,
                             use_fused: Optional[bool] = None,
                             int8_stream=None):
    """The full single-utterance synthesis program (jit target).

    Returns (codes [max_dec_steps, 8], n_frames scalar i32).
    """
    xa_k, xa_v, state = prepare(tokens, enc_length, speaker_id, weights, config)
    state = decode_loop(xa_k, xa_v, state, enc_length, weights, config,
                        key, temperature, top_k, max_steps,
                        use_pallas_lt=use_pallas_lt,
                        use_pallas_decoder=use_pallas_decoder,
                        use_fused=use_fused,
                        int8_stream=int8_stream)
    return state.codes, state.frame_idx


class BatchedDecodeState(NamedTuple):
    """Carry of the lockstep batched decode loop.

    Unlike ``vmap(decode_loop)``, the cache/codes write positions are SCALARS
    (all live streams advance in lockstep), so the per-step cache update stays
    a ``dynamic_update_slice`` instead of becoming a scatter under vmap —
    the difference between ~1ms and ~7ms per batched step on v5e.
    """
    k_cache: jnp.ndarray       # [B, L, max_seq, d_model]
    v_cache: jnp.ndarray       # [B, L, max_seq, d_model]
    hidden: jnp.ndarray        # [B, d_model]
    step: jnp.ndarray          # i32 scalar: frames attempted so far
    frame_idx: jnp.ndarray     # [B] i32: frames kept per stream (freezes at EOS)
    codes: jnp.ndarray         # [B, max_dec_steps, 8] i32
    done: jnp.ndarray          # [B] bool
    keys: jnp.ndarray          # [B] PRNG keys


def synthesize_codes_batched_program(
        tokens: jnp.ndarray, enc_lengths: jnp.ndarray, speaker_ids: jnp.ndarray,
        keys: jnp.ndarray, temperature: jnp.ndarray, weights: MagpieWeights,
        config: MagpieConfig, top_k: int,
        max_steps: Optional[int] = None,
        use_pallas_decoder: Optional[bool] = None,
        int8_stream=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lockstep batched synthesis: tokens [B, T] -> (codes [B, N, 8], n_frames [B]).

    Streams that hit EOS idle (their ``frame_idx``/``codes`` freeze) while the
    rest continue; the loop ends when every stream is done or at the budget.
    On TPU the decoder step runs as one batched Pallas kernel
    (ops/pallas_kernels/decoder_step_batched.py).
    """
    if use_pallas_decoder is None:
        use_pallas_decoder = use_pallas_default(config)
    max_steps = max_steps or config.max_dec_steps
    static_mask = sampling.forbidden_token_mask(
        config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)
    dtype = weights.text_emb.dtype
    from ..ops.pallas_kernels.lt_sampler_batched import batched_shapes_ok
    use_pallas_lt = (use_pallas_default(config)
                     and batched_shapes_ok(tokens.shape[0]))
    use_fused = (use_pallas_lt and use_pallas_decoder
                 and not os.environ.get("MAGPIE_NO_FUSED"))

    xa_k, xa_v, st = jax.vmap(
        lambda t, el, sp: prepare(t, el, sp, weights, config)
    )(tokens, enc_lengths, speaker_ids)

    state = BatchedDecodeState(
        k_cache=st.k_cache, v_cache=st.v_cache, hidden=st.hidden,
        step=jnp.int32(0), frame_idx=st.frame_idx, codes=st.codes,
        done=st.done, keys=keys)

    def sample_one(hidden, key, forbid_eos):
        return lt_mod.sample_frame_codes(
            hidden, weights, config, key, temperature, top_k, forbid_eos,
            static_mask)

    def step_one(emb, pos, xak, xav, kc, vc, el):
        return decoder_mod.decode_step(emb, pos, xak, xav, kc, vc,
                                       weights, config, enc_length=el)

    def cond(s: BatchedDecodeState):
        return (~jnp.all(s.done)) & (s.step < max_steps)

    def body(s: BatchedDecodeState) -> BatchedDecodeState:
        forbid_eos = s.frame_idx < config.min_generated_frames
        split = jax.vmap(jax.random.split, out_axes=1)(s.keys)
        keys, subkeys = split[0], split[1]
        if use_fused:
            # One pallas call per frame: LT sampling + embedding + decoder
            # (ops/pallas_kernels/frame_step_batched.py). The kernel decides
            # the new cache row's validity itself (may_continue & ~is_eos).
            from ..ops.pallas_kernels.frame_step_batched import (
                frame_step_batched_pallas)

            B = s.hidden.shape[0]
            pos = jnp.int32(config.context_frames + 1) + s.step
            seeds = sampling.seed_from_key(subkeys)
            valid = (jnp.arange(config.max_seq)[None, :] <= pos) & \
                jnp.ones((B, 1), bool)
            posemb = jnp.broadcast_to(
                weights.decoder.pos_emb[pos][None, :].astype(dtype),
                (B, config.d_model))
            sampled, argmax, hidden, k_cache, v_cache = \
                frame_step_batched_pallas(
                    s.hidden, pos, valid, ~s.done, posemb, xa_k, xa_v,
                    s.k_cache, s.v_cache, weights, config, enc_lengths,
                    seeds, temperature, top_k, forbid_eos,
                    int8_stream=int8_stream)
            is_eos = jax.vmap(
                lambda sm, am: sampling.frame_has_eos(
                    sm, am, config.audio_eos_id))(sampled, argmax)
            done = s.done | is_eos
            codes = jax.lax.dynamic_update_slice(
                s.codes, sampled[:, None, :], (0, s.step, 0))
            frame_idx = jnp.where(done, s.frame_idx, s.frame_idx + 1)
            return BatchedDecodeState(
                k_cache=k_cache, v_cache=v_cache, hidden=hidden,
                step=s.step + 1, frame_idx=frame_idx, codes=codes,
                done=done, keys=keys)
        if use_pallas_lt:
            from ..ops.pallas_kernels.lt_sampler_batched import (
                sample_frame_codes_batched_pallas)

            seeds = sampling.seed_from_key(subkeys)
            sampled, argmax = sample_frame_codes_batched_pallas(
                s.hidden, weights, config, seeds, temperature, top_k,
                forbid_eos)
        else:
            sampled, argmax = jax.vmap(sample_one)(s.hidden, subkeys,
                                                   forbid_eos)
        is_eos = jax.vmap(
            lambda sm, am: sampling.frame_has_eos(sm, am, config.audio_eos_id)
        )(sampled, argmax)
        done = s.done | is_eos

        codes = jax.lax.dynamic_update_slice(
            s.codes, sampled[:, None, :], (0, s.step, 0))
        frame_idx = jnp.where(done, s.frame_idx, s.frame_idx + 1)

        emb = audio_frame_embedding(sampled, weights, config).astype(dtype)
        pos = jnp.int32(config.context_frames + 1) + s.step
        if use_pallas_decoder:
            from ..ops.pallas_kernels.decoder_step_batched import (
                decode_step_batched_pallas)

            B = emb.shape[0]
            valid = (jnp.arange(config.max_seq)[None, :] <= pos) & \
                jnp.ones((B, 1), bool)
            x_pe = emb + weights.decoder.pos_emb[pos][None, :].astype(dtype)
            hidden, k_cache, v_cache = decode_step_batched_pallas(
                x_pe, pos, valid, xa_k, xa_v, s.k_cache, s.v_cache,
                weights, config, enc_lengths, int8_stream=int8_stream)
        else:
            hidden, k_cache, v_cache = jax.vmap(
                step_one, in_axes=(0, None, 0, 0, 0, 0, 0)
            )(emb, pos, xa_k, xa_v, s.k_cache, s.v_cache, enc_lengths)

        return BatchedDecodeState(
            k_cache=k_cache, v_cache=v_cache, hidden=hidden,
            step=s.step + 1, frame_idx=frame_idx, codes=codes,
            done=done, keys=keys)

    state = jax.lax.while_loop(cond, body, state)
    return state.codes, state.frame_idx
