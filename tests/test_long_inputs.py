"""Arbitrary-length input handling: over-long inputs synthesize, never raise.

The reference sizes graphs per enc_seq so any input length runs
(magpie.cpp:2284-2374); with bucketed compiles, lengths beyond the largest
bucket map onto word-boundary chunks (text.tokenizer.chunk_token_ids) through
every surface: engine, fused audio path, streaming, continuous batching, CLI
serve. These tests pin the splitting rules and that each surface produces
audio for a 5x-over-bucket unpunctuated input.
"""

import numpy as np
import pytest

from magpie_tts_tpu.io.codec_weights import random_codec_weights
from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
from magpie_tts_tpu.parallel.continuous import ContinuousBatchingEngine
from magpie_tts_tpu.runtime import streaming
from magpie_tts_tpu.runtime.engine import (CodecEngine, MagpieEngine,
                                           split_to_buckets)
from magpie_tts_tpu.text.tokenizer import chunk_token_ids
from tests.utils import tiny_codec_config, tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=11)
TOKEN_BUCKETS = (8, 16)
BOS, EOS = CONFIG.text_bos_id, CONFIG.text_eos_id
SPACE = 9  # arbitrary id standing in for the tokenizer's space token


def make_long_tokens(n_words: int, word_len: int = 3):
    """[BOS, w w w, SPACE, w w w, SPACE, ..., EOS] with distinct word ids."""
    body = []
    for w in range(n_words):
        body.extend([1 + (w + j) % 7 for j in range(word_len)])
        if w != n_words - 1:
            body.append(SPACE)
    return [BOS] + body + [EOS]


@pytest.fixture(scope="module")
def engine():
    return MagpieEngine(WEIGHTS, CONFIG, token_buckets=TOKEN_BUCKETS,
                        split_token_id=SPACE)


@pytest.fixture(scope="module")
def codec_engine():
    config = tiny_codec_config()
    return CodecEngine(random_codec_weights(config, seed=7), config,
                       frame_buckets=(4, 8, 16, 32))


# ---- chunk_token_ids unit behavior ----------------------------------------

def test_chunk_passthrough_when_short():
    ids = [BOS, 1, 2, 3, EOS]
    assert chunk_token_ids(ids, 16, SPACE, BOS, EOS) == [ids]


def test_chunk_splits_at_word_boundaries():
    ids = make_long_tokens(10)  # 10 words x (3 + space) -> 41 tokens
    chunks = chunk_token_ids(ids, 16, SPACE, BOS, EOS)
    assert len(chunks) > 1
    for c in chunks:
        assert len(c) <= 16
        assert c[0] == BOS and c[-1] == EOS
        # Word-boundary split: no chunk starts or ends with a space token.
        assert c[1] != SPACE and c[-2] != SPACE
    # Nothing lost: concatenated bodies == original body minus the spaces
    # dropped at the cut points (one per boundary).
    body = ids[1:-1]
    joined = [t for c in chunks for t in c[1:-1]]
    assert [t for t in joined if t != SPACE] == [t for t in body if t != SPACE]
    n_boundary_spaces = len(chunks) - 1
    assert len(joined) == len(body) - n_boundary_spaces


def test_chunk_hard_cut_without_spaces():
    """One gigantic word: budget-sized hard cuts, still synthesizable."""
    ids = [BOS] + [5] * 50 + [EOS]
    chunks = chunk_token_ids(ids, 16, SPACE, BOS, EOS)
    assert all(len(c) <= 16 for c in chunks)
    assert sum(len(c) - 2 for c in chunks) == 50
    assert all(c[0] == BOS and c[-1] == EOS for c in chunks)


def test_split_to_buckets_uses_largest_bucket():
    ids = make_long_tokens(12)
    chunks = split_to_buckets(ids, TOKEN_BUCKETS, SPACE, BOS, EOS)
    assert all(len(c) <= TOKEN_BUCKETS[-1] for c in chunks)
    short = [BOS, 1, EOS]
    assert split_to_buckets(short, TOKEN_BUCKETS, SPACE, BOS, EOS) == [short]


# ---- engine ---------------------------------------------------------------

@pytest.mark.slow
def test_engine_long_input_synthesizes(engine):
    """A 40+-token input (largest bucket 16) produces frames, no ValueError."""
    ids = make_long_tokens(10)
    assert len(ids) > TOKEN_BUCKETS[-1]
    result = engine.synthesize_codes(ids, temperature=0.0)
    assert result.n_frames > 0
    assert result.codes.shape == (result.n_frames, CONFIG.num_codebooks)


def test_engine_long_equals_manual_chunks_greedy(engine):
    """Greedy chunked synthesis == synthesizing each chunk separately."""
    ids = make_long_tokens(10)
    whole = engine.synthesize_codes(ids, temperature=0.0)
    parts = [engine.synthesize_codes(c, temperature=0.0).codes
             for c in split_to_buckets(ids, TOKEN_BUCKETS, SPACE, BOS, EOS)]
    np.testing.assert_array_equal(whole.codes, np.concatenate(parts, axis=0))


def test_engine_short_input_unaffected(engine):
    """Inputs that fit a bucket take the original single-program path."""
    ids = [BOS, 1, 2, 3, EOS]
    r = engine.synthesize_codes(ids, temperature=0.7, seed=5)
    r2 = engine.synthesize_codes(ids, temperature=0.7, seed=5)
    np.testing.assert_array_equal(r.codes, r2.codes)


# ---- streaming -------------------------------------------------------------

class _StubTokenizer:
    def __init__(self, ids):
        self.ids = ids
        self.space_id = SPACE

    def encode(self, text):
        return list(self.ids)


@pytest.mark.slow
def test_streaming_long_unpunctuated_input(engine, codec_engine):
    ids = make_long_tokens(10)
    params = streaming.StreamParams(temperature=0.0, frames_per_chunk=4,
                                    codec_context_frames=4)
    chunks = list(streaming.stream_text(engine, codec_engine,
                                        _StubTokenizer(ids), "ignored", params))
    assert chunks, "long input must stream audio"
    total = np.concatenate([c.samples for c in chunks])
    assert total.shape[0] > 0
    hop = codec_engine.config.hop_length
    assert total.shape[0] % hop == 0


# ---- continuous batching ----------------------------------------------------

@pytest.mark.slow
def test_continuous_long_request_chunks_and_reassembles():
    eng = ContinuousBatchingEngine(WEIGHTS, CONFIG, n_slots=4,
                                   token_buckets=TOKEN_BUCKETS,
                                   segment_frames=4)
    eng.split_token_id = SPACE
    ids = make_long_tokens(10)
    rid = eng.submit(ids, seed=0)
    short_rid = eng.submit([BOS, 1, 2, EOS], seed=0)
    finished = {}
    for _ in range(200):
        finished.update(eng.step(temperature=0.0))
        if rid in finished and short_rid in finished:
            break
    assert rid in finished and short_rid in finished
    # Parent codes == concatenation of per-chunk lockstep results.
    chunks = split_to_buckets(ids, TOKEN_BUCKETS, SPACE, BOS, EOS)
    assert len(chunks) > 1
    eng2 = ContinuousBatchingEngine(WEIGHTS, CONFIG, n_slots=4,
                                    token_buckets=TOKEN_BUCKETS,
                                    segment_frames=4)
    parts = eng2.synthesize_all(chunks, temperature=0.0)
    np.testing.assert_array_equal(finished[rid], np.concatenate(parts, axis=0))


@pytest.mark.slow
def test_batched_engine_long_input_matches_single_stream(engine):
    """BatchedMagpieEngine chunks over-long requests into extra lockstep rows
    (waves of batch_size) and reassembles — greedy codes equal the
    single-stream engine's chunked result; short requests in the same batch
    are unaffected."""
    from magpie_tts_tpu.parallel.serving import BatchedMagpieEngine

    bengine = BatchedMagpieEngine(WEIGHTS, CONFIG, batch_size=2,
                                  token_buckets=TOKEN_BUCKETS,
                                  split_token_id=SPACE)
    long_ids = make_long_tokens(10)          # 41 tokens >> bucket 16
    short_ids = make_long_tokens(2)          # fits
    assert len(long_ids) > max(TOKEN_BUCKETS)

    got = bengine.synthesize_batch([long_ids, short_ids],
                                   temperature=0.0, top_k=1)
    want_long = engine.synthesize_codes(long_ids, temperature=0.0,
                                        top_k=1).codes
    want_short = engine.synthesize_codes(short_ids, temperature=0.0,
                                         top_k=1).codes
    np.testing.assert_array_equal(got[0], want_long)
    np.testing.assert_array_equal(got[1], want_short)
