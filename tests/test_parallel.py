"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel serving.

Tensor parallelism is retired (measured 4.4x slower than one chip running the
fused kernels; rationale in parallel/mesh.py) - make_mesh must refuse it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.parallel import mesh as mesh_mod
from magpie_tts_tpu.parallel.serving import BatchedMagpieEngine
from magpie_tts_tpu.runtime.engine import MagpieEngine
from tests.utils import tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=11)

# These tests exercise real multi-device shardings; skip (not fail) on any
# topology that doesn't expose the expected 8 devices.
pytestmark = pytest.mark.skipif(
    len(jax.devices()) != 8,
    reason="multi-device tests expect the 8-device virtual CPU platform")


def test_mesh_creation():
    mesh = mesh_mod.make_mesh(n_data=4)
    assert mesh.shape == {"data": 4, "model": 1}


def test_tensor_parallel_is_refused():
    with pytest.raises(ValueError, match="retired"):
        mesh_mod.make_mesh(n_data=4, n_model=2)


def test_shard_weights_replicates_on_mesh():
    mesh = mesh_mod.make_mesh(n_data=8)
    sharded = mesh_mod.shard_weights(WEIGHTS, mesh)
    # dp serving replicates weights: every chip runs whole utterances.
    assert sharded.decoder.ff_proj.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(sharded.decoder.ff_proj),
                                  np.asarray(WEIGHTS.decoder.ff_proj))


@pytest.mark.parametrize("n_data", [8, 4, 2])
@pytest.mark.slow
def test_batched_sharded_greedy_matches_single(n_data):
    """Data-parallel sharded batched decode must reproduce the single-device
    greedy codes exactly for every batch element (incl. meshes smaller than
    the device count)."""
    mesh = mesh_mod.make_mesh(n_data=n_data,
                              devices=jax.devices()[:n_data])
    batch = 8
    engine = BatchedMagpieEngine(WEIGHTS, CONFIG, batch_size=batch, mesh=mesh,
                                 token_buckets=(8, 16))
    single = MagpieEngine(WEIGHTS, CONFIG, token_buckets=(8, 16))

    token_lists = [
        [CONFIG.text_bos_id, 1, 2, 3, CONFIG.text_eos_id],
        [CONFIG.text_bos_id, 4, 5, CONFIG.text_eos_id],
        [CONFIG.text_bos_id, 9, 8, 7, 6, CONFIG.text_eos_id],
        [CONFIG.text_bos_id, 2, CONFIG.text_eos_id],
        [CONFIG.text_bos_id, 11, 12, CONFIG.text_eos_id],
        [CONFIG.text_bos_id, 3, 1, 4, CONFIG.text_eos_id],
        [CONFIG.text_bos_id, 5, 9, CONFIG.text_eos_id],
        [CONFIG.text_bos_id, 6, CONFIG.text_eos_id],
    ]
    results = engine.synthesize_batch(token_lists, temperature=0.0)
    for ids, got in zip(token_lists, results):
        want = single.synthesize_codes(ids, temperature=0.0)
        assert got.shape[0] == want.n_frames, f"{ids}"
        np.testing.assert_array_equal(got, want.codes, err_msg=f"{ids}")


@pytest.mark.slow
def test_batched_engine_single_device_no_mesh():
    engine = BatchedMagpieEngine(WEIGHTS, CONFIG, batch_size=2, mesh=None,
                                 token_buckets=(8,))
    out = engine.synthesize_batch(
        [[CONFIG.text_bos_id, 1, CONFIG.text_eos_id],
         [CONFIG.text_bos_id, 2, CONFIG.text_eos_id]], temperature=0.0)
    assert len(out) == 2
