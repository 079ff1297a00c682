"""Pallas kernel semantics tests (interpret mode on CPU).

Compiled-mode equivalence on real TPU is exercised by bench/validation scripts;
these tests pin the kernel math against the XLA reference paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.models import codec as cm
from magpie_tts_tpu.models import local_transformer as lt_mod
from magpie_tts_tpu.ops import sampling
from magpie_tts_tpu.ops.pallas_kernels.codec_conv import snake_causal_conv
from magpie_tts_tpu.ops.pallas_kernels.lt_sampler import sample_frame_codes_pallas
from tests.utils import tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=11)


@pytest.mark.parametrize("T,cin,cout,k,d,alpha_n", [
    (100, 27, 27, 11, 5, 13),
    (64, 32, 864, 7, 1, None),
    (1000, 54, 54, 3, 1, 27),
    (30, 432, 432, 7, 3, 216),
])
def test_snake_causal_conv_matches_xla(rng, T, cin, cout, k, d, alpha_n):
    x = jnp.asarray(rng.normal(0, 0.5, size=(T, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, size=(k, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    alpha = (None if alpha_n is None else
             jnp.asarray(rng.uniform(0.4, 1.4, size=(alpha_n,)).astype(np.float32)))
    got = snake_causal_conv(x, w, b, alpha, dilation=d, tile=128, interpret=True)
    ref_in = x if alpha is None else cm.half_snake(x[None], alpha, 0.01)[0]
    want = cm.causal_conv1d(ref_in[None], w, b, d)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("T,cin,cout,k,d,alpha_n", [
    (100, 27, 27, 11, 5, 13),      # d == max_dilation
    (300, 128, 128, 7, 3, 64),     # d < max_dilation, multi-tile
    (130, 432, 432, 3, 1, 216),    # undilated conv through the traced module
])
def test_snake_causal_conv_traced_dilation_inert(rng, T, cin, cout, k, d,
                                                 alpha_n):
    """max_dilation= (the shared-Mosaic-module cold-start lever) is
    numerically inert: the traced-dilation kernel's output is BITWISE equal
    to the static-dilation kernel's, because the tap reads hit the identical
    window rows — only their offsets become dynamic."""
    x = jnp.asarray(rng.normal(0, 0.5, size=(T, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, size=(k, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    alpha = jnp.asarray(
        rng.uniform(0.4, 1.4, size=(alpha_n,)).astype(np.float32))
    static = snake_causal_conv(x, w, b, alpha, dilation=d, tile=128,
                               interpret=True)
    traced = snake_causal_conv(x, w, b, alpha, dilation=d, tile=128,
                               interpret=True, max_dilation=5)
    np.testing.assert_array_equal(np.asarray(traced), np.asarray(static))


def test_fast_sin_accuracy():
    """In-kernel polynomial sine: abs error vs libm over the ranges Snake
    actually sees (alpha in ~[0.1, 3], activations up to ~1e2 -> args up to
    a few hundred), plus a wide tail to bound reduction-error growth."""
    from magpie_tts_tpu.ops.pallas_kernels.codec_conv import _fast_sin

    for lo, hi, tol in [(-4.0, 4.0, 3e-7), (-300.0, 300.0, 2e-5),
                        (-3e3, 3e3, 2e-4)]:
        x = np.linspace(lo, hi, 200_001, dtype=np.float32)
        got = np.asarray(jax.jit(_fast_sin)(jnp.asarray(x)))
        want = np.sin(x.astype(np.float64))
        assert np.max(np.abs(got - want)) < tol, (lo, hi)


@pytest.mark.parametrize("cin,cout,k,d", [(108, 108, 11, 5), (432, 432, 3, 1)])
@pytest.mark.slow
def test_snake_conv_fused_residual_exact(rng, cin, cout, k, d):
    """residual= fused into the kernel's f32 accumulator is bit-identical (at
    f32 output) to kernel-then-add, across tile boundaries."""
    T = 300
    x = jnp.asarray(rng.normal(0, 0.5, size=(T, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, size=(k, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.4, 1.4, size=(cin // 2,)).astype(np.float32))
    res = jnp.asarray(rng.normal(0, 0.5, size=(T, cout)).astype(np.float32))
    base = snake_causal_conv(x, w, b, alpha, dilation=d, tile=128,
                             interpret=True)
    fused = snake_causal_conv(x, w, b, alpha, dilation=d, tile=128,
                              interpret=True, residual=res)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(base + res))


@pytest.mark.slow
def test_packed_conv_fused_residual_exact(rng):
    """Packed-domain residual fusion (used by _res_layer_packed): identical
    to packed conv + add."""
    from magpie_tts_tpu.ops.pallas_kernels import codec_conv as cc

    C, k, d = 54, 11, 5
    p = cc.pick_pack(C, C)
    T = 259
    x = jnp.asarray(rng.normal(0, 0.5, size=(T, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, size=(k, C, C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.4, 1.4, size=(C // 2,)).astype(np.float32))
    res = jnp.asarray(rng.normal(0, 0.5, size=(T, C)).astype(np.float32))
    xp, rp = cc.pack_time(x, p), cc.pack_time(res, p)
    base = cc.snake_causal_conv_packed(xp, w, b, alpha, C, p, dilation=d,
                                       interpret=True)
    fused = cc.snake_causal_conv_packed(xp, w, b, alpha, C, p, dilation=d,
                                        interpret=True, residual=rp)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(base + rp))


@pytest.mark.slow
def test_lt_sampler_greedy_parity(rng):
    static_mask = sampling.forbidden_token_mask(
        CONFIG.vocab_per_cb, CONFIG.audio_bos_id, CONFIG.audio_eos_id)
    for trial in range(3):
        hidden = jnp.asarray(rng.normal(0, 0.5, size=(CONFIG.d_model,)).astype(np.float32))
        for forbid in (False, True):
            s_ref, a_ref = lt_mod.sample_frame_codes(
                hidden, WEIGHTS, CONFIG, jax.random.PRNGKey(0), jnp.float32(0.0),
                8, jnp.bool_(forbid), static_mask)
            s_pal, a_pal = sample_frame_codes_pallas(
                hidden, WEIGHTS, CONFIG, jnp.int32(trial), jnp.float32(0.0), 8,
                jnp.bool_(forbid), interpret=True)
            np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pal))
            np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_pal))


@pytest.mark.slow
def test_lt_sampler_greedy_parity_tanh(rng):
    """ggml tanh-GELU flavor: kernel and XLA path agree on greedy codes when
    the config selects tanh (the --gelu tanh A/B switch)."""
    import dataclasses

    cfg = dataclasses.replace(CONFIG, gelu_flavor="tanh")
    static_mask = sampling.forbidden_token_mask(
        cfg.vocab_per_cb, cfg.audio_bos_id, cfg.audio_eos_id)
    for trial in range(2):
        hidden = jnp.asarray(rng.normal(0, 0.5, size=(cfg.d_model,)).astype(np.float32))
        s_ref, a_ref = lt_mod.sample_frame_codes(
            hidden, WEIGHTS, cfg, jax.random.PRNGKey(0), jnp.float32(0.0),
            8, jnp.bool_(False), static_mask)
        s_pal, a_pal = sample_frame_codes_pallas(
            hidden, WEIGHTS, cfg, jnp.int32(trial), jnp.float32(0.0), 8,
            jnp.bool_(False), interpret=True)
        np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pal))
        np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_pal))


@pytest.mark.slow
def test_lt_sampler_topk_threshold_math(rng):
    """The histogram refinement must select ~the k-th largest logit: verify the
    candidate count is >= k and the threshold excludes low logits."""
    # direct refine check via the greedy path over controlled logits: the
    # sampled path with zero gumbel (interpret) takes argmax of thresholded
    # logits/temp — which equals the global argmax; so instead validate the
    # in-range property on random trials at temp>0.
    for trial in range(3):
        hidden = jnp.asarray(rng.normal(0, 0.5, size=(CONFIG.d_model,)).astype(np.float32))
        s, a = sample_frame_codes_pallas(
            hidden, WEIGHTS, CONFIG, jnp.int32(trial), jnp.float32(0.8), 5,
            jnp.bool_(False), interpret=True)
        s = np.asarray(s)
        assert np.all(s >= 0) and np.all(s < CONFIG.vocab_per_cb)
        forbidden = [CONFIG.audio_bos_id] + list(range(CONFIG.audio_bos_id + 2,
                                                       CONFIG.audio_bos_id + 8))
        assert not np.isin(s, forbidden).any()


@pytest.mark.parametrize("C,k,d", [
    (27, 3, 1), (27, 7, 3), (27, 11, 5), (27, 11, 1),
    (54, 7, 1), (54, 11, 5),
])
@pytest.mark.slow
def test_time_packed_conv_matches_unpacked(rng, C, k, d):
    from magpie_tts_tpu.ops.pallas_kernels import codec_conv as cc

    p = cc.pick_pack(C, C)
    assert p > 1
    T = 259  # not a multiple of p: exercises trailing-pad handling
    x = jnp.asarray(rng.normal(0, 0.5, size=(T, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, size=(k, C, C)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.4, 1.4, size=(C // 2,)).astype(np.float32))
    for a in (alpha, None):
        ref = snake_causal_conv(x, w, b, a, dilation=d, tile=128, interpret=True)
        got = cc.snake_causal_conv_packed(
            cc.pack_time(x, p), w, b, a, C, p, dilation=d, interpret=True)
        got = cc.unpack_time(got, p, T, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("stage_idx,C", [
    pytest.param(1, 216, marks=pytest.mark.slow), (2, 108)])
def test_scanned_res_layer_matches_unrolled_bitwise(rng, monkeypatch,
                                                    stage_idx, C):
    """The lax.scan res_layer (cold-start lever) is BITWISE equal to the
    python-unrolled pallas path: the scan body is the same residual_block the
    unrolled path runs, and nothing outside the kernels reassociates."""
    from magpie_tts_tpu.config import CodecConfig
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.ops.pallas_kernels import codec_conv as cc

    cfg = CodecConfig()
    cw = random_codec_weights(cfg, seed=3)
    stage = cw.stages[stage_idx]
    T = 70
    x = jnp.asarray(rng.normal(0, 0.5, size=(1, T, C)).astype(np.float32))
    orig = cc.snake_causal_conv
    monkeypatch.setattr(cc, "snake_causal_conv",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    monkeypatch.setenv("MAGPIE_CODEC_SCAN", "1")
    got = cm.res_layer(x, stage.resblocks, cfg.resblock_dilations, 0.01,
                       use_pallas=True)
    monkeypatch.setenv("MAGPIE_CODEC_SCAN", "0")
    want = cm.res_layer(x, stage.resblocks, cfg.resblock_dilations, 0.01,
                        use_pallas=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_packed_res_layer_matches_unpacked(rng):
    from magpie_tts_tpu.config import CodecConfig
    from magpie_tts_tpu.io.codec_weights import random_codec_weights

    cfg = CodecConfig()
    cw = random_codec_weights(cfg, seed=3)
    stage = cw.stages[-1]  # C=27 -> packed p=4
    T = 130
    x = jnp.asarray(rng.normal(0, 0.5, size=(1, T, 27)).astype(np.float32))
    # interpret-mode pallas path: patch the kernel entries to interpret
    from magpie_tts_tpu.ops.pallas_kernels import codec_conv as cc
    from magpie_tts_tpu.ops.pallas_kernels import codec_res_fused as crf
    orig = cc.snake_causal_conv
    orig_f = crf.res_layer_fused
    cc.snake_causal_conv = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    crf.res_layer_fused = lambda *a, **kw: orig_f(*a, **{**kw, "interpret": True})
    try:
        got = cm.res_layer(x, stage.resblocks, cfg.resblock_dilations, 0.01,
                           use_pallas=True)
    finally:
        cc.snake_causal_conv = orig
        crf.res_layer_fused = orig_f
    want = cm.res_layer(x, stage.resblocks, cfg.resblock_dilations, 0.01,
                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("stage_idx,C", [(2, 108), (3, 54), (4, 27)])
@pytest.mark.slow
def test_fused_res_layer_matches_xla(rng, stage_idx, C):
    """Fused whole-layer kernel (codec_res_fused) == XLA res_layer, for the
    unpacked (C=108) and time-packed (C=54/27) mid stages, across a tile
    boundary and a non-multiple T."""
    from magpie_tts_tpu.config import CodecConfig
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.ops.pallas_kernels.codec_res_fused import (
        res_layer_fused)

    cfg = CodecConfig()
    cw = random_codec_weights(cfg, seed=3)
    stage = cw.stages[stage_idx]
    T = 300  # > min tile 256 in the packed domain only for p=1; covers pads
    x = jnp.asarray(rng.normal(0, 0.5, size=(T, C)).astype(np.float32))

    got = res_layer_fused(x, stage.resblocks, cfg.resblock_dilations, 0.01,
                          tile=256, interpret=True)

    # Same tap order as the per-conv pallas composition (built from the
    # internal per-conv paths, since res_layer itself now routes to the fused
    # kernel): agreement to ~1 ulp.
    from magpie_tts_tpu.ops.pallas_kernels import codec_conv as cc
    orig = cc.snake_causal_conv
    cc.snake_causal_conv = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        p = cc.pick_pack(C, C)
        if p > 1:
            want_p = cm._res_layer_packed(x[None], stage.resblocks,
                                          cfg.resblock_dilations, 0.01, p)[0]
        else:
            acc = None
            for branch in stage.resblocks:
                h = x[None]
                for blk, d in zip(branch, cfg.resblock_dilations):
                    h = cm.residual_block(h, blk, d, 0.01, use_pallas=True)
                acc = h if acc is None else acc + h
            want_p = (acc / len(stage.resblocks))[0]
    finally:
        cc.snake_causal_conv = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_p), atol=1e-5)

    # ...and within conv-accumulation-order noise of the XLA oracle (the
    # same class of difference snake_causal_conv itself carries, compounded
    # over the 6-conv chain).
    want = cm.res_layer(x[None], stage.resblocks, cfg.resblock_dilations,
                        0.01, use_pallas=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.slow
def test_decoder_step_int8_stream_matches_dequant_oracle(rng):
    """Kernel with per-column int8 streaming == XLA step on dequantized weights."""
    from magpie_tts_tpu.io.magpie_weights import quantize_decoder_stream
    from magpie_tts_tpu.models import decoder as decoder_mod
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step import decode_step_pallas

    c = CONFIG
    w = WEIGHTS
    stream = quantize_decoder_stream(w.decoder)
    deq = w.decoder.replace(
        qkv=stream.qkv_q.astype(jnp.float32) * stream.qkv_s[:, None, :],
        sa_out=stream.sa_out_q.astype(jnp.float32) * stream.sa_out_s[:, None, :],
        ff_proj=stream.ff_proj_q.astype(jnp.float32) * stream.ff_proj_s[:, None, :],
        ff_out=stream.ff_out_q.astype(jnp.float32) * stream.ff_out_s[:, None, :])
    w_deq = w.replace(decoder=deq)

    enc_len = jnp.int32(6)
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=8), jnp.int32)
    xa_k, xa_v, state = magpie_mod.prepare(tokens, enc_len, jnp.int32(0), w, c)
    emb = magpie_mod.audio_frame_embedding(
        jnp.asarray(rng.integers(0, c.vocab_per_cb, size=(c.num_codebooks,)),
                    jnp.int32), w, c)

    got = decode_step_pallas(emb, state.pos, xa_k, xa_v, state.k_cache,
                             state.v_cache, w, c, enc_length=enc_len,
                             interpret=True, int8_stream=stream)[0]
    want = decoder_mod.decode_step(emb, state.pos, xa_k, xa_v, state.k_cache,
                                   state.v_cache, w_deq, c,
                                   enc_length=enc_len)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_fused_frame_step_matches_separate_kernels(rng):
    """frame_step_pallas == sample_frame_codes_pallas + decode_step_pallas."""
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step import decode_step_pallas
    from magpie_tts_tpu.ops.pallas_kernels.frame_step import frame_step_pallas

    c = CONFIG
    w = WEIGHTS
    enc_len = jnp.int32(6)
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=8), jnp.int32)
    xa_k, xa_v, state = magpie_mod.prepare(tokens, enc_len, jnp.int32(0), w, c)

    for forbid in (True, False):
        s_f, a_f, h_f, kc_f, vc_f = frame_step_pallas(
            state.hidden, state.pos, xa_k, xa_v, state.k_cache, state.v_cache,
            w, c, jnp.int32(3), jnp.float32(0.0), 8, jnp.bool_(forbid),
            enc_length=enc_len, interpret=True)
        s_r, a_r = sample_frame_codes_pallas(
            state.hidden, w, c, jnp.int32(3), jnp.float32(0.0), 8,
            jnp.bool_(forbid), interpret=True)
        emb = magpie_mod.audio_frame_embedding(s_r, w, c)
        h_r, kc_r, vc_r = decode_step_pallas(
            emb, state.pos, xa_k, xa_v, state.k_cache, state.v_cache, w, c,
            enc_length=enc_len, interpret=True)
        np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_r))
        np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_r))
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(kc_f), np.asarray(kc_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(vc_f), np.asarray(vc_r), atol=1e-4)


def test_frame_step_batched_deep_buffers_bitexact(rng, monkeypatch):
    """Deep cache-buffer mode (one VMEM buffer per group, full-layer DMA
    lookahead) is a SCHEDULING-only change: outputs must be bit-identical to
    the classic double-buffered schedule, at any temperature."""
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels import frame_step_batched as fsb

    c = CONFIG
    w = WEIGHTS
    B = 16
    monkeypatch.setenv("MAGPIE_GB", "4")  # 4 groups of 4 slots
    enc_len = jnp.int32(6)
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=(B, 8)),
                         jnp.int32)
    xa_k, xa_v, state = jax.vmap(
        lambda t: magpie_mod.prepare(t, enc_len, jnp.int32(0), w, c))(tokens)
    pos = jnp.int32(c.context_frames)
    valid = (jnp.arange(c.max_seq)[None, :] < pos) & jnp.ones((B, 1), bool)
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    posemb = jnp.broadcast_to(w.decoder.pos_emb[pos][None, :], (B, c.d_model))
    args = (hidden, pos, valid, jnp.ones((B,), bool), posemb, xa_k, xa_v,
            state.k_cache, state.v_cache, w, c, jnp.full((B,), 6, jnp.int32),
            jnp.arange(B, dtype=jnp.int32))
    for temp in (0.0, 0.9):
        outs = {}
        for nbuf in (2, 4):
            monkeypatch.setattr(fsb, "_NBUF", nbuf)
            outs[nbuf] = fsb.frame_step_batched_pallas(
                *args, jnp.float32(temp), 8, jnp.zeros((B,), bool),
                interpret=True)
        for g, r in zip(outs[2], outs[4]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_frame_step_batched_weight_double_buffer_bitexact(rng, monkeypatch):
    """MAGPIE_WEIGHT_BUFS=2 (layer-weight parity double-buffer; measured
    perf-neutral on v5e, kept as a probe knob) is a SCHEDULING-only change:
    outputs must be bit-identical to the single-buffer schedule."""
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels import frame_step_batched as fsb

    c = CONFIG
    w = WEIGHTS
    B = 8
    enc_len = jnp.int32(6)
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=(B, 8)),
                         jnp.int32)
    xa_k, xa_v, state = jax.vmap(
        lambda t: magpie_mod.prepare(t, enc_len, jnp.int32(0), w, c))(tokens)
    pos = jnp.int32(c.context_frames)
    valid = (jnp.arange(c.max_seq)[None, :] < pos) & jnp.ones((B, 1), bool)
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    posemb = jnp.broadcast_to(w.decoder.pos_emb[pos][None, :], (B, c.d_model))
    args = (hidden, pos, valid, jnp.ones((B,), bool), posemb, xa_k, xa_v,
            state.k_cache, state.v_cache, w, c, jnp.full((B,), 6, jnp.int32),
            jnp.arange(B, dtype=jnp.int32))
    outs = {}
    for nwbuf in (1, 2):
        monkeypatch.setattr(fsb, "_NWBUF", nwbuf)
        outs[nwbuf] = fsb.frame_step_batched_pallas(
            *args, jnp.float32(0.9), 8, jnp.zeros((B,), bool),
            interpret=True)
    for g, r in zip(outs[1], outs[2]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_q8_in_kernel_dequant_tile_bitexact(rng):
    """The in-kernel Q8_0 dequant (``repeat(s, 32, in-axis) * q`` — exactly
    frame_step's ``stream_w``) materializes weight tiles BIT-IDENTICAL to the
    load-time dequant path: an f16-valued f32 scale times an int8 value is
    exact in f32. This is the part of the Q8-native numerics contract
    (docs/PARITY.md "Q8_0-native serving") that holds on every backend; the
    dot CONSUMING the tile may be compiled with a different reduction order
    (see test_frame_step_q8_native_matches_dequant)."""
    from jax.experimental import pallas as pl

    In, Out = 64, 192
    q = jnp.asarray(rng.integers(-127, 128, size=(In, Out)).astype(np.int8))
    s = jnp.asarray(rng.normal(0, 0.01, size=(In // 32, Out))
                    .astype(np.float16).astype(np.float32))

    def kernel(q_ref, s_ref, o_ref):
        o_ref[...] = (jnp.repeat(s_ref[...].astype(jnp.float32), 32, axis=0)
                      * q_ref[...].astype(jnp.float32))

    tile = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((In, Out), jnp.float32),
        interpret=True)(q, s)
    want = np.repeat(np.asarray(s), 32, axis=0) * np.asarray(q, np.float32)
    np.testing.assert_array_equal(np.asarray(tile), want)


def test_frame_step_q8_native_matches_dequant(rng):
    """Q8_0-NATIVE streaming vs the dense kernel on dequantize-at-load weights
    (the Q8-native numerics contract, docs/PARITY.md):

    - sampled AND argmax codes are exactly equal (greedy and temp>0 — the
      product-level guarantee),
    - cache rows other than the newly written frame are untouched bit-for-bit,
    - hidden state / written K/V rows agree to float32 ulp-level (atol 4e-6).

    The two paths feed bit-identical weight tiles to the same matmuls (pinned
    by test_q8_in_kernel_dequant_tile_bitexact), but the compiler may fuse the
    in-kernel dequant multiply into the dot and pick a different reduction
    order for the fused dot (observed: XLA CPU's loop-fusion emitter under
    interpret mode; ~1 ulp on ~80% of elements). Codes, not floats, are the
    serving contract — exactly the reference's own cached-vs-uncached parity
    posture (reference docs/STATUS.md:260-263)."""
    from magpie_tts_tpu.io.magpie_weights import (q8_dequantized_decoder,
                                                  q8_stream_from_arrays)
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.frame_step import frame_step_pallas

    c = CONFIG
    w = WEIGHTS
    q8 = q8_stream_from_arrays(w.decoder)
    w_deq = w.replace(decoder=q8_dequantized_decoder(w.decoder, q8))

    enc_len = jnp.int32(6)
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=8),
                         jnp.int32)
    xa_k, xa_v, state = magpie_mod.prepare(tokens, enc_len, jnp.int32(0),
                                           w_deq, c)
    pos = int(state.pos)
    for temp in (0.0, 0.8):
        got = frame_step_pallas(
            state.hidden, state.pos, xa_k, xa_v, state.k_cache, state.v_cache,
            w_deq, c, jnp.int32(3), jnp.float32(temp), 8, jnp.bool_(False),
            enc_length=enc_len, interpret=True, q8_stream=q8)
        want = frame_step_pallas(
            state.hidden, state.pos, xa_k, xa_v, state.k_cache, state.v_cache,
            w_deq, c, jnp.int32(3), jnp.float32(temp), 8, jnp.bool_(False),
            enc_length=enc_len, interpret=True)
        s_g, a_g, h_g, kc_g, vc_g = (np.asarray(x) for x in got)
        s_r, a_r, h_r, kc_r, vc_r = (np.asarray(x) for x in want)
        np.testing.assert_array_equal(s_g, s_r)
        np.testing.assert_array_equal(a_g, a_r)
        np.testing.assert_allclose(h_g, h_r, atol=4e-6, rtol=0)
        # Rows != pos pass through the kernel untouched — bitwise equal.
        keep = np.arange(kc_g.shape[1]) != pos
        np.testing.assert_array_equal(kc_g[:, keep], kc_r[:, keep])
        np.testing.assert_array_equal(vc_g[:, keep], vc_r[:, keep])
        np.testing.assert_allclose(kc_g[:, pos], kc_r[:, pos], atol=4e-6,
                                   rtol=0)
        np.testing.assert_allclose(vc_g[:, pos], vc_r[:, pos], atol=4e-6,
                                   rtol=0)


def _q8_pair(dec):
    """(q8 stream, dequantized decoder) for parity tests."""
    from magpie_tts_tpu.io.magpie_weights import (q8_dequantized_decoder,
                                                  q8_stream_from_arrays)

    q8 = q8_stream_from_arrays(dec)
    return q8, q8_dequantized_decoder(dec, q8)


def test_frame_step_batched_q8_native_matches_dequant(rng):
    """Batched fused frame kernel, Q8_0-native vs dense-on-dequant weights:
    exact codes, ulp-level hidden/written rows, untouched rows bitwise (the
    same contract as the single-stream test above)."""
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.frame_step_batched import (
        frame_step_batched_pallas)

    c = CONFIG
    w = WEIGHTS
    q8, dec_deq = _q8_pair(w.decoder)
    w_deq = w.replace(decoder=dec_deq)
    B = 8
    enc_len = jnp.int32(6)
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=(B, 8)),
                         jnp.int32)
    xa_k, xa_v, state = jax.vmap(
        lambda t: magpie_mod.prepare(t, enc_len, jnp.int32(0), w_deq, c))(tokens)
    pos = jnp.int32(c.context_frames)
    valid = (jnp.arange(c.max_seq)[None, :] < pos) & jnp.ones((B, 1), bool)
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    posemb = jnp.broadcast_to(w.decoder.pos_emb[pos][None, :], (B, c.d_model))
    args = (hidden, pos, valid, jnp.ones((B,), bool), posemb, xa_k, xa_v,
            state.k_cache, state.v_cache)
    tail = (jnp.full((B,), 6, jnp.int32), jnp.arange(B, dtype=jnp.int32))
    for temp in (0.0, 0.8):
        got = frame_step_batched_pallas(
            *args, w_deq, c, *tail, jnp.float32(temp), 8,
            jnp.zeros((B,), bool), int8_stream=q8, interpret=True)
        want = frame_step_batched_pallas(
            *args, w_deq, c, *tail, jnp.float32(temp), 8,
            jnp.zeros((B,), bool), interpret=True)
        s_g, a_g, h_g, kc_g, vc_g = (np.asarray(x) for x in got)
        s_r, a_r, h_r, kc_r, vc_r = (np.asarray(x) for x in want)
        np.testing.assert_array_equal(s_g, s_r)
        np.testing.assert_array_equal(a_g, a_r)
        np.testing.assert_allclose(h_g, h_r, atol=4e-6, rtol=0)
        keep = np.arange(kc_g.shape[2]) != int(pos)
        np.testing.assert_array_equal(kc_g[:, :, keep], kc_r[:, :, keep])
        np.testing.assert_array_equal(vc_g[:, :, keep], vc_r[:, :, keep])
        np.testing.assert_allclose(kc_g[:, :, int(pos)], kc_r[:, :, int(pos)],
                                   atol=4e-6, rtol=0)
        np.testing.assert_allclose(vc_g[:, :, int(pos)], vc_r[:, :, int(pos)],
                                   atol=4e-6, rtol=0)


def test_decoder_step_batched_q8_native_matches_dequant(rng):
    """Batched decoder step kernel, Q8_0-native vs dense-on-dequant weights."""
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)

    c = CONFIG
    w = WEIGHTS
    q8, dec_deq = _q8_pair(w.decoder)
    w_deq = w.replace(decoder=dec_deq)
    B = 8
    E = 8
    xa_k = jnp.asarray(rng.normal(0, 0.3, size=(B, c.dec_layers, E, c.d_xa))
                       .astype(np.float32))
    xa_v = jnp.asarray(rng.normal(0, 0.3, size=(B, c.dec_layers, E, c.d_xa))
                       .astype(np.float32))
    k_cache = jnp.asarray(
        rng.normal(0, 0.3, size=(B, c.dec_layers, c.max_seq, c.d_model))
        .astype(np.float32))
    v_cache = jnp.asarray(
        rng.normal(0, 0.3, size=(B, c.dec_layers, c.max_seq, c.d_model))
        .astype(np.float32))
    pos = jnp.int32(c.context_frames + 3)
    enc_lens = jnp.full((B,), 6, jnp.int32)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)
    x = jnp.asarray(rng.normal(0, 0.3, size=(B, c.d_model)).astype(np.float32))
    x_pe = x + w.decoder.pos_emb[pos][None, :]

    got = decode_step_batched_pallas(
        x_pe, pos, valid, xa_k, xa_v, k_cache, v_cache, w_deq, c, enc_lens,
        int8_stream=q8, interpret=True)
    want = decode_step_batched_pallas(
        x_pe, pos, valid, xa_k, xa_v, k_cache, v_cache, w_deq, c, enc_lens,
        interpret=True)
    h_g, kc_g, vc_g = (np.asarray(x) for x in got)
    h_r, kc_r, vc_r = (np.asarray(x) for x in want)
    np.testing.assert_allclose(h_g, h_r, atol=4e-6, rtol=0)
    keep = np.arange(kc_g.shape[2]) != int(pos)
    np.testing.assert_array_equal(kc_g[:, :, keep], kc_r[:, :, keep])
    np.testing.assert_array_equal(vc_g[:, :, keep], vc_r[:, :, keep])
    np.testing.assert_allclose(kc_g[:, :, int(pos)], kc_r[:, :, int(pos)],
                               atol=4e-6, rtol=0)
    np.testing.assert_allclose(vc_g[:, :, int(pos)], vc_r[:, :, int(pos)],
                               atol=4e-6, rtol=0)


def test_q8_stream_from_gguf_matches_dequant_loader(tmp_path):
    """The native Q8 extractor's blocks dequantize to EXACTLY what the
    ordinary dequantize-at-load path reads from the same Q8_0 file."""
    from magpie_tts_tpu.io.gguf import GGUFReader
    from magpie_tts_tpu.io.magpie_weights import (load_magpie_weights,
                                                  q8_dequantized_decoder,
                                                  q8_stream_from_gguf)
    from tests import fixtures

    path = str(tmp_path / "m_q8.gguf")
    fixtures.write_tiny_magpie_gguf(path, quant="q8_0")
    reader = GGUFReader(path)
    config, w = load_magpie_weights(path, reader=reader)
    q8 = q8_stream_from_gguf(reader, config)
    deq = q8_dequantized_decoder(w.decoder, q8)
    for name in ("qkv", "sa_out", "ff_proj", "ff_out"):
        np.testing.assert_array_equal(np.asarray(getattr(deq, name)),
                                      np.asarray(getattr(w.decoder, name)),
                                      err_msg=name)

    # An f32 (unquantized) checkpoint must be rejected, not mis-parsed.
    path_f32 = str(tmp_path / "m_f32.gguf")
    fixtures.write_tiny_magpie_gguf(path_f32)
    reader_f32 = GGUFReader(path_f32)
    with pytest.raises(ValueError, match="Q8_0"):
        q8_stream_from_gguf(reader_f32, config)


# ---- production-shape (357M config) kernel tests ---------------------------
#
# The kernels' DMA slab layout and Mosaic tiling constraints are shape-
# dependent; tiny-config tests alone let a 357M-only lowering bug ship in
# round 1 (fixed in commit 361ea17). One interpret-mode step per kernel at
# the full production dims pins those code paths on CPU.


@pytest.fixture(scope="module")
def prod():
    from magpie_tts_tpu.config import MagpieConfig

    c = MagpieConfig()
    w = random_magpie_weights(c, seed=3)
    return c, w


def _prod_step_inputs(rng, c, batch=None):
    E = 64
    shape = lambda *s: s if batch is None else (batch,) + s
    xa_k = jnp.asarray(rng.normal(0, 0.3, size=shape(c.dec_layers, E, c.d_xa))
                       .astype(np.float32))
    xa_v = jnp.asarray(rng.normal(0, 0.3, size=shape(c.dec_layers, E, c.d_xa))
                       .astype(np.float32))
    k_cache = jnp.asarray(
        rng.normal(0, 0.3, size=shape(c.dec_layers, c.max_seq, c.d_model))
        .astype(np.float32))
    v_cache = jnp.asarray(
        rng.normal(0, 0.3, size=shape(c.dec_layers, c.max_seq, c.d_model))
        .astype(np.float32))
    enc_len = jnp.int32(50)
    pos = jnp.int32(c.context_frames + 40)
    return xa_k, xa_v, k_cache, v_cache, enc_len, pos


@pytest.mark.slow
def test_prod_decode_step_interpret(rng, prod):
    from magpie_tts_tpu.models import decoder as decoder_mod
    from magpie_tts_tpu.models.magpie import pallas_shapes_ok
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step import decode_step_pallas

    c, w = prod
    assert pallas_shapes_ok(c), "production config must take the pallas path"
    xa_k, xa_v, k_cache, v_cache, enc_len, pos = _prod_step_inputs(rng, c)
    emb = jnp.asarray(rng.normal(0, 0.3, size=(c.d_model,)).astype(np.float32))

    h_got, k_got, v_got = decode_step_pallas(
        emb, pos, xa_k, xa_v, k_cache, v_cache, w, c, enc_length=enc_len,
        interpret=True)
    h_ref, k_ref, v_ref = decoder_mod.decode_step(
        emb, pos, xa_k, xa_v, k_cache, v_cache, w, c, enc_length=enc_len)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref), atol=1e-3)


@pytest.mark.slow
def test_prod_decode_step_interpret_tanh(rng, prod):
    """ggml tanh-GELU threads into the fused decoder kernel (the --gelu tanh
    A/B switch): kernel == XLA step under a tanh config at production dims."""
    import dataclasses

    from magpie_tts_tpu.models import decoder as decoder_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step import decode_step_pallas

    c, w = prod
    c = dataclasses.replace(c, gelu_flavor="tanh")
    xa_k, xa_v, k_cache, v_cache, enc_len, pos = _prod_step_inputs(rng, c)
    emb = jnp.asarray(rng.normal(0, 0.3, size=(c.d_model,)).astype(np.float32))

    h_got, _, _ = decode_step_pallas(
        emb, pos, xa_k, xa_v, k_cache, v_cache, w, c, enc_length=enc_len,
        interpret=True)
    h_ref, _, _ = decoder_mod.decode_step(
        emb, pos, xa_k, xa_v, k_cache, v_cache, w, c, enc_length=enc_len)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               atol=2e-3, rtol=1e-2)
    # And the flavor changed the result relative to erf (flag is load-bearing).
    c_erf = dataclasses.replace(c, gelu_flavor="erf")
    h_erf, _, _ = decoder_mod.decode_step(
        emb, pos, xa_k, xa_v, k_cache, v_cache, w, c_erf, enc_length=enc_len)
    assert np.abs(np.asarray(h_ref) - np.asarray(h_erf)).max() > 1e-6


@pytest.mark.parametrize("pos_off,chunked", [(40, False), (40, True),
                                             (50, True), (340, True)])
@pytest.mark.slow
def test_prod_frame_step_interpret(rng, prod, pos_off, chunked,
                                   monkeypatch):
    """chunked=True exercises the MAGPIE_SS_CHUNK probe knob (a measured
    perf negative, default off — see frame_step.py): 40 -> 1 of 4 160-row
    chunks, 50 -> pos 160 exactly at a chunk boundary (write window
    [160,176) must lie inside the 2-chunk extent), 340 -> 3 chunks."""
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step import decode_step_pallas
    from magpie_tts_tpu.ops.pallas_kernels.frame_step import frame_step_pallas
    from magpie_tts_tpu.models import magpie as magpie_mod

    if chunked:
        monkeypatch.setenv("MAGPIE_SS_CHUNK", "1")
    c, w = prod
    xa_k, xa_v, k_cache, v_cache, enc_len, pos = _prod_step_inputs(rng, c)
    pos = jnp.int32(c.context_frames + pos_off)
    hidden = jnp.asarray(rng.normal(0, 0.5, size=(c.d_model,)).astype(np.float32))

    s_f, a_f, h_f, kc_f, vc_f = frame_step_pallas(
        hidden, pos, xa_k, xa_v, k_cache, v_cache, w, c,
        jnp.int32(7), jnp.float32(0.0), 80, jnp.bool_(False),
        enc_length=enc_len, interpret=True)
    s_r, a_r = sample_frame_codes_pallas(
        hidden, w, c, jnp.int32(7), jnp.float32(0.0), 80, jnp.bool_(False),
        interpret=True)
    emb = magpie_mod.audio_frame_embedding(s_r, w, c)
    h_r, kc_r, vc_r = decode_step_pallas(
        emb, pos, xa_k, xa_v, k_cache, v_cache, w, c, enc_length=enc_len,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_r))
    np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_r))
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(kc_f), np.asarray(kc_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(vc_f), np.asarray(vc_r), atol=1e-3)


@pytest.mark.slow
def test_prod_batched_decoder_step_interpret(rng, prod):
    from magpie_tts_tpu.models import decoder as decoder_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)

    c, w = prod
    B = 8
    xa_k, xa_v, k_cache, v_cache, enc_len, pos = _prod_step_inputs(rng, c,
                                                                   batch=B)
    enc_lens = jnp.full((B,), 50, jnp.int32)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)
    x = jnp.asarray(rng.normal(0, 0.3, size=(B, c.d_model)).astype(np.float32))
    x_pe = x + w.decoder.pos_emb[pos][None, :]

    h_got, k_got, v_got = decode_step_batched_pallas(
        x_pe, pos, valid, xa_k, xa_v, k_cache, v_cache, w, c, enc_lens,
        interpret=True)
    h_ref, k_ref, v_ref = jax.vmap(
        lambda xx, vm, xk, xv, kc, vc, el: decoder_mod.decode_step_masked(
            xx, pos, pos, vm, xk, xv, kc, vc, w, c, enc_length=el),
        in_axes=(0, 0, 0, 0, 0, 0, 0))(
        x, valid, xa_k, xa_v, k_cache, v_cache, enc_lens)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref), atol=1e-3)


@pytest.mark.parametrize("pos_off", [40, 120, 340])  # 1/2/3-chunk, half/full variants
@pytest.mark.slow
def test_prod_batched_decoder_step_variants_interpret(rng, prod, pos_off):
    """Both cache-streaming variants (rows<=320 half-prefix, full 626) against
    the vmapped XLA oracle at production shapes."""
    from magpie_tts_tpu.models import decoder as decoder_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)

    c, w = prod
    B = 8
    xa_k, xa_v, k_cache, v_cache, enc_len, _ = _prod_step_inputs(rng, c,
                                                                 batch=B)
    pos = jnp.int32(c.context_frames + pos_off)
    enc_lens = jnp.full((B,), 50, jnp.int32)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)
    x = jnp.asarray(rng.normal(0, 0.3, size=(B, c.d_model)).astype(np.float32))
    x_pe = x + w.decoder.pos_emb[pos][None, :]

    h_got, k_got, v_got = decode_step_batched_pallas(
        x_pe, pos, valid, xa_k, xa_v, k_cache, v_cache, w, c, enc_lens,
        interpret=True)
    h_ref, k_ref, v_ref = jax.vmap(
        lambda xx, vm, xk, xv, kc, vc, el: decoder_mod.decode_step_masked(
            xx, pos, pos, vm, xk, xv, kc, vc, w, c, enc_length=el),
        in_axes=(0, 0, 0, 0, 0, 0, 0))(
        x, valid, xa_k, xa_v, k_cache, v_cache, enc_lens)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref), atol=1e-3)


@pytest.mark.parametrize("pos_off", [40, 120, 340])  # 1/2/3-chunk, half/full variants
@pytest.mark.slow
def test_prod_frame_step_batched_interpret(rng, prod, pos_off):
    """Fused batched frame kernel == the two-kernel path (LT sampler +
    batched decoder step) at production shapes: bit-exact greedy codes, and
    the kernel's in-kernel EOS/new-row-validity decision must match the
    callers' XLA bookkeeping."""
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)
    from magpie_tts_tpu.ops.pallas_kernels.frame_step_batched import (
        frame_step_batched_pallas)
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)

    c, w = prod
    B = 8
    xa_k, xa_v, k_cache, v_cache, enc_len, _ = _prod_step_inputs(rng, c,
                                                                 batch=B)
    pos = jnp.int32(c.context_frames + pos_off)
    enc_lens = jnp.full((B,), 50, jnp.int32)
    valid = (jnp.arange(c.max_seq)[None, :] <= pos) & jnp.ones((B, 1), bool)
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    maycont = jnp.ones((B,), bool)
    forbid = jnp.zeros((B,), bool)
    posemb = jnp.broadcast_to(w.decoder.pos_emb[pos][None, :], (B, c.d_model))

    s_f, a_f, h_f, kc_f, vc_f = frame_step_batched_pallas(
        hidden, pos, valid, maycont, posemb, xa_k, xa_v, k_cache, v_cache,
        w, c, enc_lens, jnp.full((B,), 7, jnp.int32), jnp.float32(0.0), 80,
        forbid, interpret=True)

    s_r, a_r = sample_frame_codes_batched_pallas(
        hidden, w, c, jnp.full((B,), 7, jnp.int32), jnp.float32(0.0), 80,
        forbid, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_r))
    np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_r))

    is_eos = jax.vmap(lambda sm, am: sampling.frame_has_eos(
        sm, am, c.audio_eos_id))(s_r, a_r)
    newcol = maycont & ~is_eos
    valid_new = valid.at[:, pos].set(newcol)
    emb = magpie_mod.audio_frame_embedding(s_r, w, c)
    x_pe = emb + w.decoder.pos_emb[pos][None, :]
    h_r, kc_r, vc_r = decode_step_batched_pallas(
        x_pe, pos, valid_new, xa_k, xa_v, k_cache, v_cache, w, c, enc_lens,
        interpret=True)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(kc_f), np.asarray(kc_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(vc_f), np.asarray(vc_r), atol=1e-3)


@pytest.mark.slow
def test_batched_lt_sampler_greedy_parity(rng):
    """Batched fused LT sampler == vmapped XLA path at temp=0 (bit-exact)."""
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)

    c = CONFIG
    static_mask = sampling.forbidden_token_mask(
        c.vocab_per_cb, c.audio_bos_id, c.audio_eos_id)
    B = 8
    for trial in range(3):
        hidden = jnp.asarray(
            rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
        forbid = jnp.asarray(rng.integers(0, 2, size=(B,)).astype(bool))
        s_ref, a_ref = jax.vmap(
            lambda h, f: lt_mod.sample_frame_codes(
                h, WEIGHTS, c, jax.random.PRNGKey(0), jnp.float32(0.0), 8, f,
                static_mask))(hidden, forbid)
        s_p, a_p = sample_frame_codes_batched_pallas(
            hidden, WEIGHTS, c, jnp.full((B,), trial, jnp.int32),
            jnp.float32(0.0), 8, forbid, interpret=True)
        np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_p))
        np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_p))


def test_batched_lt_sampler_topk_range(rng):
    """Sampled codes stay in-vocab and off the forbidden list at temp>0."""
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)

    c = CONFIG
    B = 8
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    s, a = sample_frame_codes_batched_pallas(
        hidden, WEIGHTS, c, jnp.arange(B, dtype=jnp.int32), jnp.float32(0.8),
        5, jnp.zeros((B,), bool), interpret=True)
    s = np.asarray(s)
    assert s.shape == (B, c.num_codebooks)
    assert np.all(s >= 0) and np.all(s < c.vocab_per_cb)
    forbidden = [c.audio_bos_id] + list(range(c.audio_bos_id + 2,
                                              c.audio_bos_id + 8))
    assert not np.isin(s, forbidden).any()


@pytest.mark.slow
def test_prod_batched_lt_sampler_interpret(rng, prod):
    """Production 357M shapes through the batched LT sampler on CPU."""
    from magpie_tts_tpu.ops.pallas_kernels.lt_sampler_batched import (
        sample_frame_codes_batched_pallas)

    c, w = prod
    static_mask = sampling.forbidden_token_mask(
        c.vocab_per_cb, c.audio_bos_id, c.audio_eos_id)
    B = 8
    hidden = jnp.asarray(
        rng.normal(0, 0.5, size=(B, c.d_model)).astype(np.float32))
    forbid = jnp.asarray(rng.integers(0, 2, size=(B,)).astype(bool))
    s_ref, a_ref = jax.vmap(
        lambda h, f: lt_mod.sample_frame_codes(
            h, w, c, jax.random.PRNGKey(0), jnp.float32(0.0), 80, f,
            static_mask))(hidden, forbid)
    s_p, a_p = sample_frame_codes_batched_pallas(
        hidden, w, c, jnp.full((B,), 5, jnp.int32), jnp.float32(0.0), 80,
        forbid, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_p))
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_p))


@pytest.mark.slow
def test_batched_decoder_step_matches_vmapped_masked(rng):
    """Batched kernel (grouped cache streaming, shared write row, per-slot
    masks) == vmapped decode_step_masked."""
    from magpie_tts_tpu.models import decoder as decoder_mod
    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels.decoder_step_batched import (
        decode_step_batched_pallas)

    c = CONFIG
    w = WEIGHTS
    B = 16  # two groups of 8
    S = c.max_seq

    tokens = jnp.asarray(rng.integers(2, 90, size=(B, 8)), jnp.int32)
    enc_lens = jnp.asarray(rng.integers(4, 9, size=(B,)), jnp.int32)
    xa_k, xa_v, st = jax.vmap(
        lambda t, el: magpie_mod.prepare(t, el, jnp.int32(0), w, c))(
        tokens, enc_lens)

    pos = jnp.int32(c.context_frames + 1)
    # Ring-style masks: different validity per slot (staggered starts).
    starts = jnp.asarray(rng.integers(0, 3, size=(B, 1)), jnp.int32)
    valid = (jnp.arange(S)[None, :] >= starts) & (jnp.arange(S)[None, :] <= pos)
    x = jnp.asarray(rng.normal(0, 0.5, size=(B, c.d_model)), jnp.float32)
    x_pe = x + w.decoder.pos_emb[pos][None, :]

    h_ref, k_ref, v_ref = jax.vmap(
        lambda xx, vm, xk, xv, kc, vc, el: decoder_mod.decode_step_masked(
            xx, pos, pos, vm, xk, xv, kc, vc, w, c, enc_length=el),
        in_axes=(0, 0, 0, 0, 0, 0, 0))(
        x, valid, xa_k, xa_v, st.k_cache, st.v_cache, enc_lens)
    h_got, k_got, v_got = decode_step_batched_pallas(
        x_pe, pos, valid, xa_k, xa_v, st.k_cache, st.v_cache, w, c, enc_lens,
        interpret=True)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref), atol=2e-4)


@pytest.mark.parametrize("temp_v", [0.0, 0.7])
@pytest.mark.slow
def test_decode_loop_fused_matches_xla_greedy(rng, monkeypatch, temp_v):
    """Loop-LEVEL parity: decode_loop with the fused frame kernel (interpret)
    produces the same codes/frame count as the pure-XLA loop — greedy AND
    temp>0 (both paths share ops/sampling.py's deterministic draw, so equal
    f32 logits must give equal sampled codes). The fused branch carries its
    own EOS/codes/frame_idx glue inside the while_loop body
    (models/magpie.py), which step-level tests don't cover — this pins it on
    CPU (on-TPU analog: scripts/parity_decode.py)."""
    import functools

    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels import frame_step as fs_mod

    c = CONFIG
    w = WEIGHTS
    enc_len = jnp.int32(6)
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=8),
                         jnp.int32)
    xa_k, xa_v, state = magpie_mod.prepare(tokens, enc_len, jnp.int32(0), w, c)
    key = jax.random.PRNGKey(5)
    temp = jnp.float32(temp_v)

    monkeypatch.setattr(
        fs_mod, "frame_step_pallas",
        functools.partial(fs_mod.frame_step_pallas, interpret=True))

    out_fused = magpie_mod.decode_loop(
        xa_k, xa_v, state, enc_len, w, c, key, temp, 8, max_steps=6,
        use_pallas_lt=True, use_pallas_decoder=True, use_fused=True)
    out_xla = magpie_mod.decode_loop(
        xa_k, xa_v, state, enc_len, w, c, key, temp, 8, max_steps=6,
        use_pallas_lt=False, use_pallas_decoder=False, use_fused=False)

    nf_f = int(out_fused.frame_idx)
    nf_x = int(out_xla.frame_idx)
    assert nf_f == nf_x
    assert bool(out_fused.done) == bool(out_xla.done)
    np.testing.assert_array_equal(np.asarray(out_fused.codes[:nf_f]),
                                  np.asarray(out_xla.codes[:nf_x]))


@pytest.mark.parametrize("temp_v", [0.0, 0.7])
@pytest.mark.slow
def test_batched_program_fused_matches_xla_greedy(rng, monkeypatch, temp_v):
    """Loop-LEVEL batched parity on CPU: synthesize_codes_batched_program with
    the fused batched frame kernel (interpret) == the pure-XLA lockstep loop,
    greedy AND temp>0 (shared deterministic draw => equal codes from equal
    f32 logits; also pins the pl.when-gated draw region). Pins the fused
    branch's own EOS/codes/frame_idx glue in the batched while_loop body
    (on-TPU analog: scripts/parity_batched.py)."""
    import functools

    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels import frame_step_batched as fsb_mod
    from magpie_tts_tpu.ops.pallas_kernels import lt_sampler_batched as ltb_mod

    c = CONFIG
    w = WEIGHTS
    B = 8
    tokens = jnp.asarray(rng.integers(2, c.text_vocab_size - 2, size=(B, 8)),
                         jnp.int32)
    enc_lens = jnp.asarray(rng.integers(4, 9, size=(B,)), jnp.int32)
    spk = jnp.zeros((B,), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    temp = jnp.float32(temp_v)

    codes_x, nf_x = magpie_mod.synthesize_codes_batched_program(
        tokens, enc_lens, spk, keys, temp, w, c, top_k=8, max_steps=6,
        use_pallas_decoder=False)

    monkeypatch.setattr(magpie_mod, "use_pallas_default", lambda cfg: True)
    monkeypatch.setattr(ltb_mod, "batched_shapes_ok", lambda b: True)
    monkeypatch.setattr(
        fsb_mod, "frame_step_batched_pallas",
        functools.partial(fsb_mod.frame_step_batched_pallas, interpret=True))

    codes_f, nf_f = magpie_mod.synthesize_codes_batched_program(
        tokens, enc_lens, spk, keys, temp, w, c, top_k=8, max_steps=6,
        use_pallas_decoder=True)

    np.testing.assert_array_equal(np.asarray(nf_f), np.asarray(nf_x))
    for b in range(B):
        n = int(nf_x[b])
        np.testing.assert_array_equal(np.asarray(codes_f[b, :n]),
                                      np.asarray(codes_x[b, :n]))
