"""The deterministic sampling core: exact top-k + counter-based Gumbel noise.

Closes the round-2 verdict's open question on in-kernel top-k: the admitted
candidate set is verified EQUAL to ``jax.lax.top_k`` membership (threshold at
the k-th largest value; all bit-exact ties of that value admitted — the same
tie class as the reference's partial sort, magpie.cpp:1072-1109) over
thousands of production-shaped logit vectors, including adversarially
clustered/tied ones. Also pins per-slot seed isolation (a slot's draws depend
only on its own seed) and bit-equality of temp>0 draws across every path:
XLA local transformer == single-stream kernel == batched kernel (interpret).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.models import local_transformer as lt_mod
from magpie_tts_tpu.ops import sampling
from tests.utils import tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=11)

PROD_VOCAB = 2024  # production vocab_per_cb


@pytest.mark.parametrize("k", [1, 5, 80, 500, 2016, 2024])
@pytest.mark.slow
def test_exact_topk_membership_vs_lax_topk(rng, k):
    """>=1000 random production-vocab logit vectors per k: the mask equals
    ``logits >= k-th largest`` exactly (which is lax.top_k membership modulo
    value ties), with zero over-admission beyond bit-exact ties."""
    N = 1200
    logits = rng.normal(0, 3, size=(N, PROD_VOCAB)).astype(np.float32)
    # Adversarial rows: heavy value clustering / exact ties.
    logits[::4] = np.round(logits[::4], 1)
    logits[1::7, : k] = logits[1::7, :1]  # k-wide exact tie blocks
    L = jnp.asarray(logits)

    mask = np.asarray(jax.jit(functools.partial(
        sampling.exact_topk_mask, k=k))(L))
    kth = np.asarray(jax.lax.top_k(L, k)[0])[:, -1:]
    np.testing.assert_array_equal(mask, logits >= kth)

    counts = mask.sum(axis=1)
    assert (counts >= k).all()
    # Over-admission happens ONLY through exact ties of the k-th value.
    ties = (logits == kth).sum(axis=1)
    untied = ties == 1
    assert (counts[untied] == k).all()


def test_exact_topk_extreme_values(rng):
    """Negative-heavy, masked (-1e30), and denormal-range logits."""
    rows = np.stack([
        np.linspace(-1e30, 1e3, PROD_VOCAB, dtype=np.float32),
        np.full(PROD_VOCAB, -5.0, np.float32),
        np.concatenate([np.full(8, sampling.NEG_INF, np.float32),
                        rng.normal(0, 1e-4, PROD_VOCAB - 8).astype(np.float32)]),
    ])
    for k in (1, 8, 100):
        mask = np.asarray(sampling.exact_topk_mask(jnp.asarray(rows), k))
        kth = np.asarray(jax.lax.top_k(jnp.asarray(rows), k)[0])[:, -1:]
        np.testing.assert_array_equal(mask, rows >= kth)


def test_deterministic_sampler_distribution(rng):
    """Draw frequencies over many seeds approximate the top-k softmax."""
    V, k, temp = 16, 4, 0.8
    logits = jnp.asarray(rng.normal(0, 1, size=V).astype(np.float32))
    fn = jax.jit(lambda s: sampling.sample_top_k_deterministic(
        s, 0, logits, jnp.float32(temp), k)[0])
    n = 4000
    draws = np.asarray(jax.vmap(fn)(jnp.arange(n, dtype=jnp.int32)))
    mask = np.asarray(sampling.exact_topk_mask(logits, k))
    assert mask[draws].all()
    z = np.where(mask, np.asarray(logits) / temp, -np.inf)
    probs = np.exp(z - z.max())
    probs /= probs.sum()
    freq = np.bincount(draws, minlength=V) / n
    np.testing.assert_allclose(freq, probs, atol=0.03)


def test_topk_dot_count_variant_exact(rng, monkeypatch):
    """The MXU dot-count probe variant (MAGPIE_TOPK_DOT=1) admits exactly the
    same set as the lane-reduction default."""
    logits = rng.normal(0, 3, size=(64, PROD_VOCAB)).astype(np.float32)
    logits[::3] = np.round(logits[::3], 1)  # tie-heavy rows
    for k in (1, 80, 500):
        base = np.asarray(sampling.exact_topk_mask(jnp.asarray(logits), k))
        monkeypatch.setenv("MAGPIE_TOPK_DOT", "1")
        dot = np.asarray(sampling.exact_topk_mask(jnp.asarray(logits), k))
        monkeypatch.delenv("MAGPIE_TOPK_DOT")
        np.testing.assert_array_equal(base, dot)


def test_fast_log_accuracy(rng):
    """``fast_log`` matches float64 log to ~1 ulp over both Gumbel log
    argument ranges: the clipped uniforms [1e-10, 1-1e-7] and the inner-log
    outputs [1e-7, 23.03]."""
    u = np.clip(rng.random(200_000).astype(np.float32), 1e-10, 1 - 1e-7)
    edge = np.array([1e-10, 1e-7, 1e-3, 0.5, 1 - 1e-7, 1.0, 2.0, 23.03],
                    np.float32)
    for x in (u, edge, -np.log(u).astype(np.float32)):
        got = np.asarray(sampling.fast_log(jnp.asarray(x)), np.float64)
        ref = np.log(x.astype(np.float64))
        # absolute error bounded by ~2 ulp of the largest output magnitude
        assert np.abs(got - ref).max() < 3e-6
        rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12)
        assert rel.max() < 1e-6


def test_gumbel_per_slot_isolation():
    """gumbel_from_seed: one slot's noise is independent of the others'."""
    cols = jnp.arange(PROD_VOCAB, dtype=jnp.int32)[None, :]
    seeds_a = jnp.asarray([[10], [20], [30]], jnp.int32)
    seeds_b = jnp.asarray([[10], [999], [30]], jnp.int32)
    ga = np.asarray(sampling.gumbel_from_seed(seeds_a, cols))
    gb = np.asarray(sampling.gumbel_from_seed(seeds_b, cols))
    np.testing.assert_array_equal(ga[0], gb[0])
    np.testing.assert_array_equal(ga[2], gb[2])
    assert not np.array_equal(ga[1], gb[1])


@pytest.mark.slow
def test_batched_kernel_per_slot_seed_isolation(rng):
    """Changing slot j's seed changes slot j's temp>0 codes ONLY (the round-2
    advisor finding: all slots previously rode slot 0's key)."""
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)

    c = CONFIG
    B = 8
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    forbid = jnp.zeros((B,), bool)
    seeds_a = jnp.arange(B, dtype=jnp.int32) * 17
    seeds_b = seeds_a.at[3].set(12345)
    s_a, _ = sample_frame_codes_batched_pallas(
        hidden, WEIGHTS, c, seeds_a, jnp.float32(0.9), 10, forbid,
        interpret=True)
    s_b, _ = sample_frame_codes_batched_pallas(
        hidden, WEIGHTS, c, seeds_b, jnp.float32(0.9), 10, forbid,
        interpret=True)
    s_a, s_b = np.asarray(s_a), np.asarray(s_b)
    others = [i for i in range(B) if i != 3]
    np.testing.assert_array_equal(s_a[others], s_b[others])
    # The LT is autoregressive over codebooks, so a changed first draw should
    # propagate; at minimum SOME codebook must differ for slot 3.
    assert not np.array_equal(s_a[3], s_b[3])


@pytest.mark.slow
def test_temp_sampling_parity_xla_vs_kernels(rng):
    """temp>0 codes are bit-equal across XLA path, single-stream kernel and
    batched kernel (interpret, f32) for equal seeds — the counter-based
    noise + exact top-k make sampling a pure function of (seed, logits)."""
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler import (
        sample_frame_codes_pallas)
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)

    c = CONFIG
    B = 8
    static_mask = sampling.forbidden_token_mask(
        c.vocab_per_cb, c.audio_bos_id, c.audio_eos_id)
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    seeds = (jnp.arange(B, dtype=jnp.int32) + 1) * 101
    temp, k = jnp.float32(0.7), 10

    s_bat, a_bat = sample_frame_codes_batched_pallas(
        hidden, WEIGHTS, c, seeds, temp, k, jnp.zeros((B,), bool),
        interpret=True)

    for i in range(B):
        s_one, a_one = sample_frame_codes_pallas(
            hidden[i], WEIGHTS, c, seeds[i], temp, k, jnp.bool_(False),
            interpret=True)
        np.testing.assert_array_equal(np.asarray(s_bat[i]), np.asarray(s_one))

        # XLA path: build a key whose canonical seed equals seeds[i].
        key = jnp.asarray([np.uint32(int(seeds[i])), np.uint32(0)])
        assert int(sampling.seed_from_key(key)) == int(seeds[i])
        s_xla, a_xla = lt_mod.sample_frame_codes(
            hidden[i], WEIGHTS, c, key, temp, k, jnp.bool_(False), static_mask)
        np.testing.assert_array_equal(np.asarray(s_bat[i]), np.asarray(s_xla))
        np.testing.assert_array_equal(np.asarray(a_bat[i]), np.asarray(a_xla))
