"""Model-level parity: encoder/decoder/LT vs torch oracle; cached vs full paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.models import decoder as dec_mod
from magpie_tts_tpu.models import local_transformer as lt_mod
from magpie_tts_tpu.models import magpie as magpie_mod
from magpie_tts_tpu.models.encoder import run_encoder
from magpie_tts_tpu.ops import sampling
from tests.oracle import ref_magpie
from tests.utils import tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=11)
ORACLE = ref_magpie.TorchMagpieWeights.from_jax(WEIGHTS)


def test_encoder_vs_oracle(rng):
    tokens = rng.integers(0, CONFIG.text_vocab_size, size=(9,)).astype(np.int32)
    ours = np.asarray(run_encoder(jnp.asarray(tokens), WEIGHTS, CONFIG))
    theirs = ref_magpie.run_encoder(tokens, ORACLE, CONFIG).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.slow
def test_encoder_prefix_exact_under_padding(rng):
    """Causal encoder: right padding must not change the valid prefix (bucketing)."""
    tokens = rng.integers(0, CONFIG.text_vocab_size, size=(9,)).astype(np.int32)
    padded = np.concatenate([tokens, np.zeros(7, np.int32)])
    a = np.asarray(run_encoder(jnp.asarray(tokens), WEIGHTS, CONFIG))
    b = np.asarray(run_encoder(jnp.asarray(padded), WEIGHTS, CONFIG))
    np.testing.assert_allclose(a, b[:9], atol=1e-5)


def test_decoder_full_vs_oracle(rng):
    dec_seq, enc_seq = 8, 9
    dec_in = rng.normal(0, 0.5, size=(dec_seq, CONFIG.d_model)).astype(np.float32)
    enc_out = rng.normal(0, 0.5, size=(enc_seq, CONFIG.d_model)).astype(np.float32)
    ours = np.asarray(dec_mod.decode_full(jnp.asarray(dec_in), jnp.asarray(enc_out),
                                          WEIGHTS, CONFIG))
    theirs = ref_magpie.run_decoder_full(torch.from_numpy(dec_in),
                                         torch.from_numpy(enc_out),
                                         ORACLE, CONFIG).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.slow
def test_prefill_plus_steps_match_full_decoder(rng):
    """The jitted cached path (prefill + per-step) must reproduce the full-seq
    decoder's last-position hidden at every step."""
    c = CONFIG
    enc_seq = 7
    enc_out = jnp.asarray(rng.normal(0, 0.5, size=(enc_seq, c.d_model)).astype(np.float32))
    xa_k, xa_v = dec_mod.precompute_xa_kv(enc_out, WEIGHTS.decoder, c)

    context = jnp.asarray(rng.normal(0, 0.5, size=(c.context_frames, c.d_model)).astype(np.float32))
    k_cache = jnp.zeros((c.dec_layers, c.max_seq, c.d_model))
    v_cache = jnp.zeros_like(k_cache)
    k_cache, v_cache = dec_mod.prefill(context, xa_k, xa_v, k_cache, v_cache, WEIGHTS, c)

    frames = rng.normal(0, 0.5, size=(4, c.d_model)).astype(np.float32)
    for t in range(4):
        pos = c.context_frames + t
        hidden, k_cache, v_cache = dec_mod.decode_step(
            jnp.asarray(frames[t]), jnp.int32(pos), xa_k, xa_v, k_cache, v_cache,
            WEIGHTS, c)
        dec_input = jnp.concatenate([context, jnp.asarray(frames[: t + 1])], axis=0)
        full = dec_mod.decode_full(dec_input, enc_out, WEIGHTS, c)
        np.testing.assert_allclose(np.asarray(hidden), np.asarray(full[-1]),
                                   atol=2e-4, err_msg=f"step {t}")


@pytest.mark.slow
def test_lt_greedy_vs_oracle(rng):
    hidden = rng.normal(0, 0.5, size=(CONFIG.d_model,)).astype(np.float32)
    static_mask = sampling.forbidden_token_mask(
        CONFIG.vocab_per_cb, CONFIG.audio_bos_id, CONFIG.audio_eos_id)
    sampled, argmax = lt_mod.sample_frame_codes(
        jnp.asarray(hidden), WEIGHTS, CONFIG, jax.random.PRNGKey(0),
        jnp.float32(0.0), top_k=8, forbid_eos=jnp.bool_(False),
        static_forbidden_mask=static_mask)
    theirs = ref_magpie.lt_sample_greedy(torch.from_numpy(hidden), ORACLE, CONFIG,
                                         forbid_eos=False)
    np.testing.assert_array_equal(np.asarray(sampled), theirs)
    np.testing.assert_array_equal(np.asarray(argmax), theirs)


def test_audio_frame_embedding_scale(rng):
    codes = rng.integers(0, CONFIG.codebook_size, size=(8,)).astype(np.int32)
    ours = np.asarray(magpie_mod.audio_frame_embedding(jnp.asarray(codes), WEIGHTS, CONFIG))
    theirs = ref_magpie.audio_frame_embedding(codes, ORACLE, CONFIG).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.slow
def test_e2e_greedy_token_parity(rng):
    """The north-star parity test: the fully jitted cached program must produce
    the exact same greedy token codes as the independent full-sequence torch
    oracle (analog of the reference's exact greedy e2e check, STATUS.md:133-141)."""
    c = CONFIG
    tokens = np.array([c.text_bos_id, 5, 9, 17, 3, c.text_eos_id], np.int32)

    program = jax.jit(
        lambda t, el, spk, key, temp: magpie_mod.synthesize_codes_program(
            t, el, spk, key, temp, WEIGHTS, c, top_k=8, max_steps=8))
    codes, n_frames = program(jnp.asarray(tokens), jnp.int32(len(tokens)),
                              jnp.int32(0), jax.random.PRNGKey(0), jnp.float32(0.0))
    n = int(n_frames)
    ours = np.asarray(codes)[:n]

    theirs = ref_magpie.synthesize_greedy(tokens, ORACLE, CONFIG, speaker_id=0,
                                          max_steps=8)
    assert n == theirs.shape[0]
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.slow
def test_e2e_greedy_token_parity_tanh(rng):
    """The ggml tanh-GELU flavor (reference src/magpie.cpp:1791-1805; CLI
    --gelu tanh) flows through every FFN: the jitted cached program under a
    tanh config must reproduce the tanh-configured torch oracle's greedy codes
    exactly — this is the switch a vs-C++ A/B uses on real weights."""
    import dataclasses

    c = dataclasses.replace(CONFIG, gelu_flavor="tanh")
    tokens = np.array([c.text_bos_id, 5, 9, 17, 3, c.text_eos_id], np.int32)

    program = jax.jit(
        lambda t, el, spk, key, temp: magpie_mod.synthesize_codes_program(
            t, el, spk, key, temp, WEIGHTS, c, top_k=8, max_steps=8))
    codes, n_frames = program(jnp.asarray(tokens), jnp.int32(len(tokens)),
                              jnp.int32(0), jax.random.PRNGKey(0), jnp.float32(0.0))
    ours = np.asarray(codes)[: int(n_frames)]

    theirs = ref_magpie.synthesize_greedy(tokens, ORACLE, c, speaker_id=0,
                                          max_steps=8)
    assert int(n_frames) == theirs.shape[0]
    np.testing.assert_array_equal(ours, theirs)


def test_gelu_flavor_is_load_bearing(rng):
    """Guard against the flag silently not being threaded: the two flavors must
    produce different continuous outputs from the same weights."""
    import dataclasses

    tokens = np.array([CONFIG.text_bos_id, 5, 9, 17, 3, CONFIG.text_eos_id], np.int32)
    c_tanh = dataclasses.replace(CONFIG, gelu_flavor="tanh")
    enc_erf = np.asarray(run_encoder(jnp.asarray(tokens), WEIGHTS, CONFIG))
    enc_tanh = np.asarray(run_encoder(jnp.asarray(tokens), WEIGHTS, c_tanh))
    assert np.abs(enc_erf - enc_tanh).max() > 1e-6


@pytest.mark.slow
def test_e2e_bucketed_tokens_same_codes(rng):
    """Padding the token sequence to a bucket must not change generated codes."""
    c = CONFIG
    tokens = np.array([c.text_bos_id, 5, 9, 17, 3, c.text_eos_id], np.int32)
    padded = np.concatenate([tokens, np.zeros(6, np.int32)])

    def run(tok):
        codes, n = jax.jit(
            lambda t, el: magpie_mod.synthesize_codes_program(
                t, el, jnp.int32(0), jax.random.PRNGKey(0), jnp.float32(0.0),
                WEIGHTS, c, top_k=8, max_steps=6))(jnp.asarray(tok), jnp.int32(6))
        return np.asarray(codes)[: int(n)]

    np.testing.assert_array_equal(run(tokens), run(padded))
