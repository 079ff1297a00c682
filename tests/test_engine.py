"""Engine / pipeline / streaming tests on synthetic GGUF checkpoints."""

import numpy as np
import pytest

from magpie_tts_tpu.io.codec_weights import load_codec_weights, random_codec_weights
from magpie_tts_tpu.io.magpie_weights import load_magpie_weights, random_magpie_weights
from magpie_tts_tpu.io.wav import read_wav, write_wav
from magpie_tts_tpu.runtime.engine import CodecEngine, MagpieEngine, pick_bucket
from magpie_tts_tpu.runtime import streaming
from tests import fixtures
from tests.utils import tiny_codec_config, tiny_magpie_config

CONFIG = tiny_magpie_config()
WEIGHTS = random_magpie_weights(CONFIG, seed=11)
TOKEN_BUCKETS = (8, 16, 32)


@pytest.fixture(scope="module")
def engine():
    return MagpieEngine(WEIGHTS, CONFIG, token_buckets=TOKEN_BUCKETS)


@pytest.fixture(scope="module")
def codec_engine():
    config = tiny_codec_config()
    return CodecEngine(random_codec_weights(config, seed=7), config,
                       frame_buckets=(4, 8, 16, 32))


def test_pick_bucket():
    assert pick_bucket((8, 16, 32), 3) == 8
    assert pick_bucket((8, 16, 32), 8) == 8
    assert pick_bucket((8, 16, 32), 9) == 16
    with pytest.raises(ValueError):
        pick_bucket((8,), 9)


@pytest.mark.slow
def test_engine_synthesize_greedy_deterministic(engine):
    tokens = [CONFIG.text_bos_id, 1, 2, 3, CONFIG.text_eos_id]
    r1 = engine.synthesize_codes(tokens, temperature=0.0)
    r2 = engine.synthesize_codes(tokens, temperature=0.0)
    assert r1.n_frames == r2.n_frames
    np.testing.assert_array_equal(r1.codes, r2.codes)
    assert r1.codes.shape[1] == 8
    assert np.all(r1.codes >= 0) and np.all(r1.codes < CONFIG.vocab_per_cb)


def test_engine_sampled_seed_reproducible(engine):
    tokens = [CONFIG.text_bos_id, 4, 5, CONFIG.text_eos_id]
    a = engine.synthesize_codes(tokens, temperature=0.7, seed=123)
    b = engine.synthesize_codes(tokens, temperature=0.7, seed=123)
    np.testing.assert_array_equal(a.codes, b.codes)


@pytest.mark.slow
def test_chunked_decode_matches_one_shot_greedy(engine):
    """Incremental streaming decode must produce the same greedy codes as the
    one-shot program (temp=0 -> sampling key is irrelevant)."""
    tokens = [CONFIG.text_bos_id, 1, 2, 3, CONFIG.text_eos_id]
    full = engine.synthesize_codes(tokens, temperature=0.0)

    stream = engine.begin_stream(tokens)
    parts = []
    done = False
    while not done:
        part, done = engine.decode_chunk(stream, n_frames=3, temperature=0.0)
        parts.append(part)
    chunked = np.concatenate([p for p in parts if p.size], axis=0) \
        if any(p.size for p in parts) else np.zeros((0, 8), np.int32)
    assert chunked.shape[0] == full.n_frames
    np.testing.assert_array_equal(chunked, full.codes)


@pytest.mark.slow
def test_codec_engine_bucketing_consistent(codec_engine, rng):
    codes = rng.integers(0, 32, size=(5, 8)).astype(np.int32)
    a = codec_engine.decode(codes)           # bucket 8
    padded_run = codec_engine.decode(np.concatenate(
        [codes, rng.integers(0, 32, size=(6, 8)).astype(np.int32)]))  # bucket 16
    assert a.shape[0] == 5 * codec_engine.config.hop_length
    np.testing.assert_allclose(a, padded_run[: a.shape[0]], atol=1e-5)


@pytest.mark.slow
def test_streaming_chunks_concat_equals_full_decode(engine, codec_engine):
    """Streamed audio (context-primed chunked vocoding) must equal the offline
    decode of the same codes exactly — given context >= the receptive field."""
    tokens = [CONFIG.text_bos_id, 1, 2, 3, CONFIG.text_eos_id]
    params = streaming.StreamParams(temperature=0.0, frames_per_chunk=2,
                                    codec_context_frames=16)
    chunks = list(streaming.stream_sentence(engine, codec_engine, tokens, params))
    assert chunks, "no audio produced"
    streamed = np.concatenate([c.samples for c in chunks])

    full = engine.synthesize_codes(tokens, temperature=0.0)
    offline = codec_engine.decode(full.codes)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


@pytest.mark.slow
def test_warmup_streaming_compiles_fused_chunk_programs(codec_engine):
    """warmup_streaming must compile the PRODUCTION streaming programs (the
    fused prefill+first-chunk fn AND the steady-state fused chunk fn), so a
    first real request finds them cached — the round-2 gap was warmup
    compiling only the split decode_chunk program streaming never runs."""
    eng = MagpieEngine(WEIGHTS, CONFIG, token_buckets=TOKEN_BUCKETS)
    params = streaming.StreamParams(temperature=0.0, frames_per_chunk=2,
                                    codec_context_frames=4)
    streaming.warmup_streaming(eng, codec_engine, params,
                               token_buckets=[8, 16])
    k, ctx = params.frames_per_chunk, params.codec_context_frames
    for bucket in (8, 16):
        assert (codec_engine.uid, bucket, params.top_k, k, ctx) \
            in eng._fused_chunk_cache
        assert (codec_engine.uid, bucket, params.top_k, k, ctx, "first") \
            in eng._fused_chunk_cache
    # The warmed programs are the ones a real stream uses: no new cache
    # entries appear when streaming an in-bucket sentence.
    n_chunk = len(eng._fused_chunk_cache)
    tokens = [CONFIG.text_bos_id, 1, 2, 3, CONFIG.text_eos_id]
    list(streaming.stream_sentence(eng, codec_engine, tokens, params))
    assert len(eng._fused_chunk_cache) == n_chunk


def test_split_sentences():
    assert streaming.split_sentences("One. Two! Three?") == ["One.", "Two!", "Three?"]
    assert streaming.split_sentences("No terminator") == ["No terminator"]
    assert streaming.split_sentences("Dr. Smith went. Home.") == \
        ["Dr.", "Smith went.", "Home."]  # same naive rule as the reference
    assert streaming.split_sentences("") == []
    assert streaming.split_sentences("A.B ok.") == ["A.B ok."]  # '.' not followed by ws


def test_wav_roundtrip(tmp_path, rng):
    samples = np.clip(rng.normal(0, 0.3, size=4096), -1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, samples, 22050)
    loaded, sr = read_wav(path)
    assert sr == 22050
    np.testing.assert_allclose(loaded, samples, atol=1.0 / 32000)


@pytest.mark.slow
def test_gguf_fixture_loads_and_runs(tmp_path):
    """Full file-based path: synthetic GGUF pair -> pipeline -> wav."""
    from magpie_tts_tpu.pipeline import MagpiePipeline

    mpath = str(tmp_path / "magpie.gguf")
    cpath = str(tmp_path / "codec.gguf")
    fixtures.write_tiny_magpie_gguf(mpath)
    fixtures.write_tiny_codec_gguf(cpath)

    pipe = MagpiePipeline.from_gguf(mpath, cpath)
    assert pipe.config.d_model == CONFIG.d_model
    assert pipe.config.audio_bos_id == CONFIG.audio_bos_id
    pipe.engine.token_buckets = TOKEN_BUCKETS
    wav_path = str(tmp_path / "out.wav")
    n = pipe.synthesize_to_wav("hello world", wav_path, temperature=0.0)
    samples, sr = read_wav(wav_path)
    assert sr == pipe.config.sample_rate
    assert len(samples) == n
    assert n % pipe.codec.config.hop_length == 0


@pytest.mark.slow
def test_gguf_q8_weights_load(tmp_path):
    """Q8_0-quantized checkpoint loads and runs (dequant-at-load path)."""
    from magpie_tts_tpu.pipeline import MagpiePipeline

    mpath = str(tmp_path / "magpie_q8.gguf")
    fixtures.write_tiny_magpie_gguf(mpath, quant="q8_0")
    config, weights = load_magpie_weights(mpath)
    engine = MagpieEngine(weights, config, token_buckets=TOKEN_BUCKETS)
    tokens = [config.text_bos_id, 1, 2, config.text_eos_id]
    result = engine.synthesize_codes(tokens, temperature=0.0)
    assert result.codes.shape[1] == 8


@pytest.mark.slow
def test_pipeline_serve_q8_end_to_end(tmp_path):
    """MagpiePipeline.from_gguf(serve_q8=True) on a Q8_0 checkpoint: the
    stream is built from the file's own blocks, threads into the engine, and
    synthesis produces the same greedy codes as the dequantize-at-load path
    on the same file (the docs/PARITY.md Q8-native contract at pipeline
    level; kernel-level parity is pinned in test_pallas_kernels)."""
    from magpie_tts_tpu.io.magpie_weights import Q8DecoderStream
    from magpie_tts_tpu.pipeline import MagpiePipeline

    mpath = str(tmp_path / "magpie_q8.gguf")
    fixtures.write_tiny_magpie_gguf(mpath, quant="q8_0")

    codes = {}
    for serve_q8 in (True, False):
        pipe = MagpiePipeline.from_gguf(mpath, serve_q8=serve_q8)
        if serve_q8:
            assert isinstance(pipe.engine.int8_stream, Q8DecoderStream)
        pipe.engine.token_buckets = TOKEN_BUCKETS
        codes[serve_q8] = pipe.synthesize_codes("hello world",
                                                temperature=0.0)
    np.testing.assert_array_equal(codes[True], codes[False])

    # serve_int8 + q8_stream must be rejected with a ValueError, not assert.
    config, weights = load_magpie_weights(mpath)
    from magpie_tts_tpu.io.gguf import GGUFReader
    from magpie_tts_tpu.io.magpie_weights import q8_stream_from_gguf

    q8 = q8_stream_from_gguf(GGUFReader(mpath), config)
    with pytest.raises(ValueError, match="mutually exclusive"):
        MagpieEngine(weights, config, serve_int8=True, q8_stream=q8)


@pytest.mark.slow
def test_warmup_precompiles_buckets():
    from tests.utils import tiny_magpie_config, tiny_codec_config
    from magpie_tts_tpu.io.magpie_weights import random_magpie_weights
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.runtime.engine import CodecEngine, MagpieEngine

    config = tiny_magpie_config()
    eng = MagpieEngine(random_magpie_weights(config, seed=0), config,
                       token_buckets=(16, 32))
    eng.warmup()
    assert {b for (b, k) in eng._synth_cache} >= {16, 32}

    cc = tiny_codec_config()
    codec = CodecEngine(random_codec_weights(cc, seed=0), cc,
                        frame_buckets=(8, 16))
    codec.warmup()
    assert {b for (b, pcm16) in codec._decode_cache} == {8, 16}


@pytest.mark.slow
def test_synthesize_audio_fused_matches_two_call(engine, codec_engine):
    """The one-dispatch generate->vocode->PCM16 program == the two-call path
    (same seed; causal codec => prefix-exact under the step-cap padding)."""
    from magpie_tts_tpu.runtime.engine import synthesize_audio_fused

    tokens = [CONFIG.text_bos_id, 4, 5, 6, CONFIG.text_eos_id]
    pcm, n = synthesize_audio_fused(engine, codec_engine, tokens,
                                    temperature=0.0, top_k=8, seed=0)
    ref = engine.synthesize_codes(tokens, temperature=0.0, top_k=8, seed=0)
    ref_pcm = codec_engine.decode(ref.codes, pcm16=True)
    assert n == ref.n_frames
    assert pcm.dtype == np.int16
    np.testing.assert_array_equal(pcm, ref_pcm)


@pytest.mark.slow
def test_codec_decode_pcm16_matches_host_conversion():
    """On-device PCM16 == the WAV writer's host-side clip/scale/truncate."""
    from tests.utils import tiny_codec_config
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.runtime.engine import CodecEngine

    cc = tiny_codec_config()
    codec = CodecEngine(random_codec_weights(cc, seed=0), cc,
                        frame_buckets=(8, 16))
    rng = np.random.default_rng(5)
    codes = rng.integers(0, cc.codebook_size, size=(7, cc.num_codebooks))
    f32 = codec.decode(codes)
    i16 = codec.decode(codes, pcm16=True)
    assert i16.dtype == np.int16
    want = (np.clip(f32, -1.0, 1.0) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(i16, want)


@pytest.mark.slow
def test_codec_decode_batch_matches_single():
    from tests.utils import tiny_codec_config
    from magpie_tts_tpu.io.codec_weights import random_codec_weights
    from magpie_tts_tpu.runtime.engine import CodecEngine

    cc = tiny_codec_config()
    codec = CodecEngine(random_codec_weights(cc, seed=0), cc, frame_buckets=(8, 16))
    rng = np.random.default_rng(0)
    codes = [rng.integers(0, 4000, size=(n, cc.num_codebooks)).astype(np.int32)
             for n in (5, 9, 3)]
    batch = codec.decode_batch(codes)
    for c, got in zip(codes, batch):
        want = codec.decode(c)
        np.testing.assert_allclose(got, want, atol=2e-5)
