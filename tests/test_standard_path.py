"""Standard (full-seq) product path vs the cached engine + final projection."""

import jax.numpy as jnp
import numpy as np
import pytest

from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.models.standard import final_projection, synthesize_codes_standard
from magpie_tts_tpu.runtime.engine import MagpieEngine
from tests.utils import tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=11)


@pytest.mark.slow
def test_standard_equals_cached_greedy():
    """Both product paths must agree exactly at temp=0 (stronger than the
    reference, whose cached/uncached paths diverge — docs/STATUS.md:260-263)."""
    tokens = [CONFIG.text_bos_id, 5, 9, 17, 3, CONFIG.text_eos_id]
    std = synthesize_codes_standard(tokens, WEIGHTS, CONFIG, temperature=0.0,
                                    max_steps=6)
    engine = MagpieEngine(WEIGHTS, CONFIG, token_buckets=(8,))
    fast = engine.synthesize_codes(tokens, temperature=0.0)
    fast_codes = fast.codes[:6] if fast.n_frames > 6 else fast.codes
    assert std.shape[0] == min(fast.n_frames, 6)
    np.testing.assert_array_equal(std, fast_codes[: std.shape[0]])


def test_final_projection_shapes(rng):
    hidden = jnp.asarray(rng.normal(size=(CONFIG.d_model,)).astype(np.float32))
    logits = final_projection(hidden, WEIGHTS)
    assert logits.shape == (CONFIG.num_codebooks * CONFIG.vocab_per_cb,)
    h2 = jnp.asarray(rng.normal(size=(3, CONFIG.d_model)).astype(np.float32))
    assert final_projection(h2, WEIGHTS).shape == (3, CONFIG.num_codebooks * CONFIG.vocab_per_cb)


def test_platform_helpers():
    from magpie_tts_tpu.runtime.platform import StageTimer, device_summary

    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("b"):
        pass
    report = timer.report()
    assert "a" in report and "total" in report
    assert device_summary()
