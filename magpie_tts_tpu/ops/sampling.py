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

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30
GREEDY_TEMP_THRESHOLD = 0.01

# Odd 32-bit mixing constants (murmur3 finalizer + a Weyl/phase increment),
# expressed as int32 two's-complement literals.
_MIX_A = -2048144789      # 0x85EBCA6B
_MIX_B = -1028477379      # 0xC2B2AE35
_GOLDEN = -1640531527     # 0x9E3779B9
_PHASE_C = 747796405      # 0x2C9277B5 (PCG increment; odd)


def seed_from_key(key: jax.Array) -> jnp.ndarray:
    """Canonical int32 seed from a raw uint32[2] PRNG key (both words mixed).

    Every sampling path (XLA and Pallas kernels) derives its counter-based
    noise from this seed, so a given (key, codebook-phase) pair draws the same
    noise no matter which path executes it.
    """
    folded = key[..., 0] ^ key[..., 1]
    return jax.lax.bitcast_convert_type(folded, jnp.int32)


def phase_seed(seed: jnp.ndarray, phase) -> jnp.ndarray:
    """Per-codebook-phase seed derivation (int32 wraparound)."""
    return seed + jnp.int32(phase) * jnp.int32(_PHASE_C)


def _fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: full avalanche on int32 (wraparound arithmetic)."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(_MIX_A)
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(_MIX_B)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951


def fast_log(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial natural log for positive, finite, normal f32 inputs.

    Mosaic/XLA lower ``jnp.log`` to a libm-grade routine; on the VPU that is
    the dominant cost of the Gumbel transform (two log passes over
    [B, vocab]). This is the same trade as the codec's ``_fast_sin``: a
    plain mul/add/bit-op evaluation that every backend lowers identically,
    so XLA and Pallas traces of the shared sampling core stay bit-identical
    per backend.

    Method: split ``x = 2^e * m`` with ``m`` centered into [1/sqrt2, sqrt2),
    then the atanh series ``ln m = 2t(1 + t^2/3 + ... + t^8/9)`` with
    ``t = (m-1)/(m+1)`` (|t| <= 0.1716; truncation < 1e-9 — below f32
    resolution). No inf/nan/denormal handling: callers guarantee normal
    positive inputs (the Gumbel uniforms are clipped to [1e-10, 1-1e-7]).
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = jax.lax.shift_right_logical(bits, 23) - jnp.int32(127)
    m = jax.lax.bitcast_convert_type(
        (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000), jnp.float32)
    big = m > _SQRT2
    m = jnp.where(big, m * 0.5, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    p = jnp.float32(1.0 / 9.0)
    p = p * t2 + jnp.float32(1.0 / 7.0)
    p = p * t2 + jnp.float32(1.0 / 5.0)
    p = p * t2 + jnp.float32(1.0 / 3.0)
    p = p * t2 + jnp.float32(1.0)
    return e * jnp.float32(_LN2) + (2.0 * t) * p


def gumbel_from_seed(base_seed: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Counter-based Gumbel(0,1) noise: ``-log(-log(hash(seed, col)))``.

    ``base_seed``: int32, broadcastable against ``cols`` (int32 column ids).
    Stateless — unlike ``pltpu.prng_random_bits`` it needs no on-chip PRNG, so
    it runs identically under jit, in Pallas kernels, and in interpret mode,
    and per-row seeds give every batch slot its own independent stream (a
    request's draws depend only on its own key, not on batch composition).
    ``MAGPIE_FAST_LOG=1`` swaps in the polynomial ``fast_log`` (~1 ulp of
    libm over the clipped range) — measured NO faster on v5e (slope A/B:
    batched B=32 754 vs 721 µs/step, single-stream 283.7 vs 282.5 — Mosaic's
    log is not a hot spot), so libm stays the default; knob kept for probing.
    """
    h = _fmix32(base_seed + cols * jnp.int32(_GOLDEN))
    # Top 24 bits -> exact f32 uniform in [0, 1).
    u = jax.lax.shift_right_logical(h, 8).astype(jnp.float32) * (1.0 / (1 << 24))
    u = jnp.clip(u, 1e-10, 1.0 - 1e-7)
    log = fast_log if os.environ.get("MAGPIE_FAST_LOG") == "1" else jnp.log
    return -log(-log(u))


def exact_topk_mask(logits: jnp.ndarray, k: int,
                    early_exit: bool = False) -> jnp.ndarray:
    """EXACT top-k membership mask over the last axis (no approximation).

    Finds the k-th largest logit VALUE by 32-iteration integer bisection on the
    monotone int32 transform of the float bits, then returns
    ``logits >= kth_value``. The admitted set equals ``jax.lax.top_k``
    membership exactly, except when several entries TIE the k-th value bit-for-
    bit (then all ties are admitted — same class of tie-freedom as the
    reference's partial sort, magpie.cpp:1072-1109). Integer compares only, so
    the result is identical on every backend (XLA CPU/TPU, Mosaic, interpret).

    ``early_exit=True`` runs the while-loop variant (``_while_topk_mask``) —
    the SAME admitted set in typically far fewer passes. Measured on v5e:
    -5/-6 us/frame in the single-stream fused kernel (282->277 at pos
    150/450, where sampling VPU time is exposed) but +6 in the deep-buffered
    batched kernel (whose LT phases overlap DMA and whose convergence gate
    spans 32 rows) — so the single-stream kernel opts in and the batched
    kernels stay on the fixed 32-pass loop. MAGPIE_TOPK_WHILE=1 forces it on
    everywhere for probing.
    """
    bits = jax.lax.bitcast_convert_type(logits.astype(jnp.float32), jnp.int32)
    # Monotone key: f1 < f2  <=>  key(f1) < key(f2) (signed int32; +/-0 equal).
    keys = jnp.where(bits >= 0, bits, jnp.int32(-2147483648) - bits)
    lo = jnp.min(keys, axis=-1, keepdims=True)        # count(>= lo) == n >= k
    hi = jnp.max(keys, axis=-1, keepdims=True) + 1    # count(>= hi) == 0 < k
    if os.environ.get("MAGPIE_TOPK_KARY") == "1":     # probe knob (see below)
        return _kary_topk_mask(keys, lo, hi, k)
    # MAGPIE_TOPK_WHILE overrides in BOTH directions: "1" forces the while
    # variant everywhere, "0" forces the fixed 32-pass loop even for callers
    # that opt in (so probe baselines against fixed32 are real).
    while_env = os.environ.get("MAGPIE_TOPK_WHILE")
    if while_env == "1" or (early_exit and while_env != "0"):
        return _while_topk_mask(keys, lo, hi, k)
    iters = int(os.environ.get("MAGPIE_TOPK_ITERS", "32"))  # probe knob only
    use_dot = os.environ.get("MAGPIE_TOPK_DOT") == "1"      # probe knob
    if use_dot:
        # Count via an MXU dot against ones instead of a VPU lane-reduction
        # (counts <= vocab are exact in f32). [..., V] @ [V, 8] keeps the
        # lane dim tile-friendly; column 0 is the count.
        ones = jnp.ones((keys.shape[-1], 8), jnp.float32)
    for _ in range(iters):
        # Overflow-safe midpoint (lo/hi may straddle the int32 range).
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        if use_dot:
            ge = (keys >= mid).astype(jnp.float32)
            cnt = jax.lax.dot_general(
                ge, ones, (((ge.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[..., :1].astype(jnp.int32)
        else:
            cnt = jnp.sum((keys >= mid).astype(jnp.int32), axis=-1,
                          keepdims=True)
        ok = cnt >= k
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
    return keys >= lo


def _kary_topk_mask(keys: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                    k: int) -> jnp.ndarray:
    """16-ary variant of the threshold search (same exact result, fewer
    sequential passes): 1 binary pass (makes hi-lo overflow-safe), 7 passes
    probing 15 midpoints at once (span /16 each), then 5 binary passes to
    close the <=31-wide residue the floored step leaves. 13 reduction passes
    total vs 32 — wins iff the per-pass cost is latency- not
    throughput-bound; measured on v5e it is NOT (see docs/KERNELS.md), so
    this stays a probe knob."""
    mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
    cnt = jnp.sum((keys >= mid).astype(jnp.int32), axis=-1, keepdims=True)
    ok = cnt >= k
    lo = jnp.where(ok, mid, lo)
    hi = jnp.where(ok, hi, mid)
    js = jnp.arange(1, 16, dtype=jnp.int32)           # [15]
    for _ in range(7):
        step = (hi - lo) >> 4                         # safe: hi-lo < 2^31
        mids = lo[..., None] + step[..., None] * js   # [..., 1, 15]
        cnts = jnp.sum((keys[..., :, None] >= mids).astype(jnp.int32),
                       axis=-2)                       # [..., 15]
        # counts are non-increasing in j; n_ok = #mids with count >= k.
        n_ok = jnp.sum((cnts >= k).astype(jnp.int32), axis=-1, keepdims=True)
        new_lo = lo + step * n_ok
        hi = jnp.where(n_ok < 15, lo + step * (n_ok + 1), hi)
        lo = new_lo
    for _ in range(5):
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        cnt = jnp.sum((keys >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        ok = cnt >= k
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
    return keys >= lo


def _while_topk_mask(keys: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                     k: int) -> jnp.ndarray:
    """Early-exit variant of the threshold bisection (same exact result).

    A row is SETTLED once (a) some probed midpoint admits exactly k elements —
    the admitted set is then THE top-k set and stays it under further bound
    updates (lo only moves to mids with count >= k, and any such mid above a
    count-k lo still admits exactly k) — or (b) the midpoint stops moving
    (``mid == lo`` <=> interval width <= 1: lo already IS the k-th key, the
    tie-admitting fixed point the 32-pass loop would return). The loop exits
    when every row is settled, capped at the same 32 passes. Worst case
    (bit-level ties straddling k) degenerates to exactly the fixed loop;
    typical logits settle in far fewer passes because adjacent order
    statistics sit many ulps apart. Exactness is pinned by
    tests/test_sampling_core.py with the knob forced on.
    """
    # The settled flag is carried as int32, not bool: Mosaic cannot carry
    # i1 vectors through an scf.while yield ("failed to legalize scf.yield").
    settled = jnp.zeros(lo.shape, jnp.int32)

    def cond(c):
        i, lo, hi, settled = c
        return (i < 32) & ~jnp.all(settled > 0)

    def body(c):
        i, lo, hi, settled = c
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        cnt = jnp.sum((keys >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        ok = cnt >= k
        settled = settled | ((cnt == k) | (mid == lo)).astype(jnp.int32)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
        return i + 1, lo, hi, settled

    _, lo, _, _ = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), lo, hi, settled))
    return keys >= lo


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


def sample_top_k_deterministic(seed: jnp.ndarray, phase, logits: jnp.ndarray,
                               temperature: jnp.ndarray, top_k: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sampled_id, argmax_id) from masked logits [vocab] via the shared
    counter-based scheme: EXACT top-k membership (``exact_topk_mask``) +
    Gumbel-max with ``gumbel_from_seed`` noise. The Pallas kernels implement
    the same formula on the same seeds, so a (seed, phase) pair draws the same
    candidate and noise everywhere; greedy (temp < 0.01) is pure argmax.
    """
    argmax_id = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    k = min(top_k, logits.shape[-1])
    in_topk = exact_topk_mask(logits, k)
    cols = jnp.arange(logits.shape[-1], dtype=jnp.int32)
    gumbel = gumbel_from_seed(phase_seed(seed, phase), cols)
    safe_temp = jnp.maximum(temperature, GREEDY_TEMP_THRESHOLD)
    z = jnp.where(in_topk, logits / safe_temp + gumbel, NEG_INF)
    drawn = jnp.argmax(z, axis=-1).astype(jnp.int32)
    greedy = temperature < GREEDY_TEMP_THRESHOLD
    return jnp.where(greedy, argmax_id, drawn), argmax_id


def frame_has_eos(sampled: jnp.ndarray, argmax: jnp.ndarray, audio_eos_id: int) -> jnp.ndarray:
    """`argmax_or_multinomial_any` EOS rule (magpie.cpp:2706-2715): EOS if ANY
    codebook produced EOS in either the sampled or the argmax codes."""
    return jnp.any(sampled == audio_eos_id) | jnp.any(argmax == audio_eos_id)
