"""Continuous batching engine: staggered admission parity with the
single-stream engine (greedy). The ring cache places every request's rows at
different physical offsets, so agreement here pins the mask/roll machinery."""

import numpy as np
import pytest

from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.parallel.continuous import ContinuousBatchingEngine
from magpie_tts_tpu.runtime.engine import MagpieEngine
from tests.utils import tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=7)


def _tokens(rng, n):
    return ([CONFIG.text_bos_id]
            + list(rng.integers(2, 30, size=n))
            + [CONFIG.text_eos_id])


@pytest.mark.slow
def test_staggered_requests_match_single_stream(rng):
    reference = MagpieEngine(WEIGHTS, CONFIG, token_buckets=(16, 32))
    engine = ContinuousBatchingEngine(
        WEIGHTS, CONFIG, n_slots=3, token_buckets=(16, 32), segment_frames=5)

    requests = [_tokens(rng, n) for n in (4, 9, 6, 12, 5)]
    want = [reference.synthesize_codes(t, temperature=0.0, top_k=1).codes
            for t in requests]

    # First wave fills the slots; later submissions join as slots free up —
    # and after a segment has already advanced the ring pointer.
    ids = [engine.submit(t) for t in requests[:3]]
    finished = dict(engine.step(temperature=0.0, top_k=1))
    ids += [engine.submit(t) for t in requests[3:]]
    while engine.pending:
        finished.update(engine.step(temperature=0.0, top_k=1))

    assert sorted(finished) == sorted(ids)
    for req_id, tokens, expect in zip(ids, requests, want):
        got = finished[req_id]
        np.testing.assert_array_equal(
            got, expect,
            err_msg=f"request {req_id} ({len(tokens)} tokens) diverged")


@pytest.mark.slow
def test_burst_admission_mixed_buckets(rng):
    """A burst that admits across two token buckets in one wave (grouped
    power-of-two batched-admission calls) matches single-stream greedy."""
    reference = MagpieEngine(WEIGHTS, CONFIG, token_buckets=(16, 32))
    engine = ContinuousBatchingEngine(
        WEIGHTS, CONFIG, n_slots=4, token_buckets=(16, 32), segment_frames=6)

    requests = [_tokens(rng, n) for n in (4, 20, 5, 25)]  # buckets 16/32/16/32
    want = [reference.synthesize_codes(t, temperature=0.0, top_k=1).codes
            for t in requests]
    ids = [engine.submit(t) for t in requests]
    finished = {}
    while engine.pending:
        finished.update(engine.step(temperature=0.0, top_k=1))
    assert sorted(finished) == sorted(ids)
    for req_id, expect in zip(ids, want):
        np.testing.assert_array_equal(finished[req_id], expect)


@pytest.mark.slow
def test_slot_reuse_is_clean(rng):
    """A retired slot's leftover cache/mask state must not leak into the next
    request admitted to the same slot."""
    reference = MagpieEngine(WEIGHTS, CONFIG, token_buckets=(16,))
    engine = ContinuousBatchingEngine(
        WEIGHTS, CONFIG, n_slots=1, token_buckets=(16,), segment_frames=7)

    reqs = [_tokens(rng, n) for n in (5, 8, 3)]
    for t in reqs:
        want = reference.synthesize_codes(t, temperature=0.0, top_k=1).codes
        rid = engine.submit(t)
        out = {}
        while engine.pending:
            out.update(engine.step(temperature=0.0, top_k=1))
        np.testing.assert_array_equal(out[rid], want)


@pytest.mark.slow
def test_staggered_requests_fused_kernels_interpret(rng, monkeypatch):
    """Same staggered-admission scenario, but through the PALLAS ring-variant
    kernels in interpret mode (fused batched frame + batched decoder step):
    the ring write_row/validity machinery inside the kernels must agree with
    the single-stream engine exactly (on-TPU analog: serve parity runs)."""
    import functools

    from magpie_tts_tpu.models import magpie as magpie_mod
    from magpie_tts_tpu.ops.pallas_kernels import (decoder_step_batched,
                                                   frame_step_batched,
                                                   lt_sampler_batched)

    # Reference codes FIRST — the single-stream engine must keep its XLA
    # path (non-interpret pallas cannot run on CPU).
    reference = MagpieEngine(WEIGHTS, CONFIG, token_buckets=(16, 32))
    requests = [_tokens(rng, n) for n in (4, 9, 6, 12)]
    want = [reference.synthesize_codes(t, temperature=0.0, top_k=1).codes
            for t in requests]

    monkeypatch.setattr(magpie_mod, "use_pallas_default", lambda cfg: True)
    monkeypatch.setattr(lt_sampler_batched, "batched_shapes_ok",
                        lambda b: True)
    for mod, name in ((frame_step_batched, "frame_step_batched_pallas"),
                      (lt_sampler_batched, "sample_frame_codes_batched_pallas"),
                      (decoder_step_batched, "decode_step_batched_pallas")):
        monkeypatch.setattr(mod, name, functools.partial(
            getattr(mod, name), interpret=True))

    engine = ContinuousBatchingEngine(
        WEIGHTS, CONFIG, n_slots=4, token_buckets=(16, 32), segment_frames=5)

    ids = [engine.submit(t) for t in requests[:3]]
    finished = dict(engine.step(temperature=0.0, top_k=1))
    ids += [engine.submit(t) for t in requests[3:]]
    while engine.pending:
        finished.update(engine.step(temperature=0.0, top_k=1))

    assert sorted(finished) == sorted(ids)
    for req_id, tokens, expect in zip(ids, requests, want):
        np.testing.assert_array_equal(
            finished[req_id], expect,
            err_msg=f"request {req_id} ({len(tokens)} tokens) diverged")


def test_single_request_smoke(rng):
    """Fast-tier continuous-batching coverage: one request admits, decodes in
    segments, and retires with plausibly-shaped codes (greedy parity with the
    single-stream engine is pinned by the slow-tier tests above)."""
    engine = ContinuousBatchingEngine(
        WEIGHTS, CONFIG, n_slots=2, token_buckets=(16,), segment_frames=4)
    rid = engine.submit(_tokens(rng, 5))
    assert engine.pending
    finished = {}
    while engine.pending:
        finished.update(engine.step(temperature=0.0, top_k=1))
    assert list(finished) == [rid]
    codes = finished[rid]
    assert codes.ndim == 2 and codes.shape[1] == CONFIG.num_codebooks
    assert (codes >= 0).all() and (codes < CONFIG.vocab_per_cb).all()


@pytest.mark.slow
def test_multichip_server_matches_single_engine(rng):
    """MultiChipContinuousServer over 4 virtual devices (2 slots each) with
    12 requests (over-capacity -> the shared queue holds the tail) produces
    the same greedy codes per request as the single-stream engine, with
    admission happening while earlier requests decode."""
    import jax

    from magpie_tts_tpu.parallel.continuous import MultiChipContinuousServer

    devices = jax.devices()[:4]
    assert len(devices) == 4, "conftest forces 8 virtual CPU devices"
    reference = MagpieEngine(WEIGHTS, CONFIG, token_buckets=(16, 32))
    server = MultiChipContinuousServer(
        WEIGHTS, CONFIG, devices=devices, slots_per_device=2,
        token_buckets=(16, 32), segment_frames=5)

    requests = [_tokens(rng, n) for n in (4, 9, 6, 12, 5, 7, 8, 3, 10, 4, 6, 5)]
    want = [reference.synthesize_codes(t, temperature=0.0, top_k=1).codes
            for t in requests]

    # 9 submitted up front (> 8 slots: one queues globally); the rest join
    # after the first segment has run on every engine.
    ids = [server.submit(t) for t in requests[:9]]
    finished = dict(server.step(temperature=0.0, top_k=1))
    ids += [server.submit(t) for t in requests[9:]]
    while server.pending:
        finished.update(server.step(temperature=0.0, top_k=1))

    assert set(finished) == set(ids)
    for rid, codes_want in zip(ids, want):
        np.testing.assert_array_equal(finished[rid], codes_want,
                                      err_msg=f"request {rid}")

    # Load actually spread across engines: with 12 requests on 4 engines of
    # 2 slots, every engine must have served something.
    assert all(e._next_id > 0 for e in server.engines)
