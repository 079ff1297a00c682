"""Codec parity vs the torch oracle (FSQ exact; vocoder within float tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from magpie_tts_tpu.config import CodecConfig
from magpie_tts_tpu.io.codec_weights import random_codec_weights
from magpie_tts_tpu.models import codec as jcodec
from tests.oracle import ref_codec
from tests.utils import tiny_codec_config


def test_fsq_dequantize_exact(rng):
    config = CodecConfig()
    codes = rng.integers(0, config.codebook_size, size=(8, 17)).astype(np.int32)
    ours = np.asarray(jcodec.fsq_dequantize(jnp.asarray(codes), config))  # [T, 32]
    theirs = ref_codec.fsq_dequantize(codes, config)  # [32, T]
    np.testing.assert_array_equal(ours, theirs.T)


def test_fsq_range():
    config = CodecConfig()
    codes = np.arange(2016, dtype=np.int32).reshape(8, 252)
    vals = np.asarray(jcodec.fsq_dequantize(jnp.asarray(codes), config))
    assert vals.min() >= -1.0 and vals.max() <= 1.0


def test_half_snake_vs_oracle(rng):
    import torch
    x = rng.normal(size=(1, 11, 27)).astype(np.float32)  # odd channels: 13+14
    alpha = rng.uniform(0.3, 1.5, size=(13,)).astype(np.float32)
    ours = np.asarray(jcodec.half_snake(jnp.asarray(x), jnp.asarray(alpha), 0.01))
    theirs = ref_codec.half_snake(
        torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()),
        torch.from_numpy(alpha), 0.01).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 1)), atol=1e-5)


def test_causal_conv_vs_oracle(rng):
    import torch
    T, cin, cout, k, dil = 13, 8, 6, 7, 3
    x = rng.normal(size=(1, T, cin)).astype(np.float32)
    w = rng.normal(0, 0.2, size=(k, cin, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    ours = np.asarray(jcodec.causal_conv1d(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b), dil))
    theirs = ref_codec.causal_conv(
        torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()), w, b, dil).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 1)), atol=1e-5)
    assert ours.shape == (1, T, cout)


def test_grouped_conv_transpose_vs_oracle(rng):
    import torch
    T, out_ch, k, stride = 7, 6, 8, 4
    in_ch = 2 * out_ch
    x = rng.normal(size=(1, T, in_ch)).astype(np.float32)
    w = rng.normal(0, 0.3, size=(in_ch, k)).astype(np.float32)
    b = rng.normal(size=(out_ch,)).astype(np.float32)
    ours = np.asarray(jcodec.grouped_conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride))
    theirs = ref_codec.grouped_convt(
        torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()), w, b, stride).numpy()
    assert ours.shape == (1, T * stride, out_ch)
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 1)), atol=1e-5)


@pytest.mark.slow
def test_full_codec_vs_oracle(rng):
    config = tiny_codec_config()
    weights = random_codec_weights(config, seed=7)
    codes = rng.integers(0, config.codebook_size, size=(8, 5)).astype(np.int32)
    ours = np.asarray(jcodec.codec_decode(jnp.asarray(codes), weights, config))
    theirs = ref_codec.decode(codes, weights, config)
    assert ours.shape == (5 * config.hop_length,)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


@pytest.mark.slow
def test_codec_prefix_exactness(rng):
    """Causality: decoding a padded code sequence must not change the prefix —
    the property the bucketed/streaming paths rely on."""
    config = tiny_codec_config()
    weights = random_codec_weights(config, seed=3)
    codes = rng.integers(0, config.codebook_size, size=(8, 6)).astype(np.int32)
    full = np.asarray(jcodec.codec_decode(jnp.asarray(codes), weights, config))
    padded = np.concatenate([codes, rng.integers(0, 32, size=(8, 4)).astype(np.int32)], axis=1)
    pad_out = np.asarray(jcodec.codec_decode(jnp.asarray(padded), weights, config))
    np.testing.assert_allclose(full, pad_out[: full.shape[0]], atol=1e-5)


@pytest.mark.slow
def test_merged_res_layer_matches_reference(rng):
    """The grouped merged-branch res layer must equal the per-branch form."""
    import jax.numpy as jnp
    config = tiny_codec_config()
    weights = random_codec_weights(config, seed=9)
    stage = weights.stages[1]
    C = config.up_channels[1]
    x = jnp.asarray(rng.normal(0, 0.5, size=(1, 13, C)).astype(np.float32))
    merged = np.asarray(jcodec.res_layer_merged(x, stage.resblocks,
                                                config.resblock_dilations,
                                                config.leaky_slope))
    ref = np.asarray(jcodec.res_layer(x, stage.resblocks,
                                      config.resblock_dilations,
                                      config.leaky_slope))
    np.testing.assert_allclose(merged, ref, atol=2e-5)


def test_overlap_add_convt_matches_fallback(rng):
    """Overlap-add path (K % stride == 0) vs the grouped-conv fallback."""
    import jax
    import jax.numpy as jnp
    T, out_ch, K, stride = 6, 5, 8, 4
    in_ch = 2 * out_ch
    x = jnp.asarray(rng.normal(size=(1, T, in_ch)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(in_ch, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(out_ch,)).astype(np.float32))
    fast = np.asarray(jcodec.grouped_conv_transpose1d(x, w, b, stride))
    # force fallback path by calling with a K not divisible by stride via direct
    # comparison against the torch oracle instead
    import torch
    from tests.oracle import ref_codec
    ref = ref_codec.grouped_convt(
        torch.from_numpy(np.transpose(np.asarray(x), (0, 2, 1)).copy()),
        np.asarray(w), np.asarray(b), stride).numpy()
    np.testing.assert_allclose(fast, np.transpose(ref, (0, 2, 1)), atol=1e-5)
