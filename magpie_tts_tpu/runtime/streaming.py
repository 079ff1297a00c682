"""Streaming synthesis: sentence chunking + incremental audio emission.

API surface mirrors the reference streaming contract (src/magpie.h:602-648):
audio callbacks every ``frames_per_chunk`` frames, a progress callback, abort by
returning False — expressed as a Python generator plus an optional callback
wrapper.

Improvement over the reference: the reference decodes each chunk's frames in
isolation, producing waveform discontinuities at chunk boundaries
(magpie.cpp:4482-4500). Here each chunk is decoded with ``context_frames`` of
already-emitted frames prepended; the vocoder is causal with a bounded left
receptive field, so emitted audio is bit-identical to a full offline decode once
the context covers that field (default 32 frames > the ~25-frame field of the
production codec).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, List, Optional

import numpy as np

from .engine import CodecEngine, MagpieEngine

_SENTENCE_ENDINGS = ".!?"
_WHITESPACE = " \t\n\r"


def split_sentences(text: str) -> List[str]:
    """Split on ./!/? followed by whitespace or end (magpie.cpp:4439-4479)."""
    sentences: List[str] = []
    current: List[str] = []
    for i, ch in enumerate(text):
        current.append(ch)
        nxt = text[i + 1] if i + 1 < len(text) else ""
        if ch in _SENTENCE_ENDINGS and (nxt == "" or nxt in _WHITESPACE):
            sentence = "".join(current).lstrip(_WHITESPACE)
            if sentence:
                sentences.append(sentence)
            current = []
    tail = "".join(current).lstrip(_WHITESPACE)
    if tail:
        sentences.append(tail)
    return sentences


@dataclasses.dataclass
class StreamParams:
    """Mirror of magpie_stream_params (magpie.h:619-628)."""
    temperature: float = 0.7
    top_k: int = 80
    speaker_id: int = 0
    frames_per_chunk: int = 4
    sentence_chunking: bool = True
    seed: int = 0
    codec_context_frames: int = 32  # left context for seamless chunked vocoding


@dataclasses.dataclass
class AudioChunk:
    samples: np.ndarray      # float32 mono at config.sample_rate
    sentence_index: int
    total_sentences: int
    frames_generated: int    # cumulative frames in this sentence
    is_sentence_end: bool


def _fused_chunk_fn(engine: MagpieEngine, codec: CodecEngine,
                    bucket: int, top_k: int, k: int, ctx: int):
    """One compiled program per (engines, bucket, top_k, k, ctx): advance the
    AR loop by up to ``k`` frames AND vocode the [ctx; new] window, returning
    a single flat array ``[window_audio..., frame_idx, done, start, base]``.

    One dispatch + one fetch per chunk: on a tunneled TPU the ~25ms dispatch
    and per-fetch round trips dominate small chunks (the split
    decode_chunk/decode_with_context path costs 4+ round trips per chunk and
    caps streaming RTF near 1x); folding the scalars into the audio array
    keeps it to exactly two.
    """
    key = (codec.uid, bucket, top_k, k, ctx)
    fn = engine._fused_chunk_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..models import codec as codec_mod
    from ..models import magpie as magpie_mod

    mc = engine.config
    ccfg = codec.config
    use_pallas_lt = engine.use_pallas_lt
    use_pallas_decoder = engine.use_pallas_decoder
    use_fused = engine.use_fused
    use_pallas_codec = codec.use_pallas
    win = min(ctx + k, mc.max_dec_steps)  # tiny-config guard

    def prog(m_weights, int8_stream, c_weights, xa_k, xa_v, state, enc_length,
             rng_key, temperature):
        start = state.frame_idx
        target = jnp.minimum(start + k, mc.max_dec_steps)
        state = magpie_mod.decode_loop(
            xa_k, xa_v, state, enc_length, m_weights, mc, rng_key,
            temperature, top_k, target_frames=target,
            use_pallas_lt=use_pallas_lt, use_pallas_decoder=use_pallas_decoder,
            use_fused=use_fused, int8_stream=int8_stream)
        base = jnp.clip(start - ctx, 0, mc.max_dec_steps - win)
        window = jax.lax.dynamic_slice(
            state.codes, (base, 0), (win, mc.num_codebooks))
        audio = codec_mod.codec_decode(window.T, c_weights, ccfg,
                                       use_pallas=use_pallas_codec)
        meta = jnp.stack([state.frame_idx.astype(jnp.float32),
                          state.done.astype(jnp.float32),
                          start.astype(jnp.float32),
                          base.astype(jnp.float32)])
        return state, jnp.concatenate([audio.astype(jnp.float32), meta])

    fn = jax.jit(prog, donate_argnums=(5,))
    engine._fused_chunk_cache[key] = fn
    return fn


def _fused_first_chunk_fn(engine: MagpieEngine, codec: CodecEngine,
                          bucket: int, top_k: int, k: int, ctx: int):
    """Prefill + first chunk in ONE compiled program.

    TTFA on a tunneled TPU is dominated by ~25ms dispatch round trips; folding
    ``prepare`` (encoder + XA precompute + context prefill) into the first
    decode+vocode chunk removes one of the two dispatches on the
    time-to-first-audio path. Returns (xa_k, xa_v, state, flat) so the caller
    can continue with the steady-state chunk program."""
    key = (codec.uid, bucket, top_k, k, ctx, "first")
    fn = engine._fused_chunk_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..models import codec as codec_mod
    from ..models import magpie as magpie_mod

    mc = engine.config
    ccfg = codec.config
    use_pallas_lt = engine.use_pallas_lt
    use_pallas_decoder = engine.use_pallas_decoder
    use_fused = engine.use_fused
    use_pallas_codec = codec.use_pallas
    win = min(ctx + k, mc.max_dec_steps)  # tiny-config guard

    def prog(m_weights, int8_stream, c_weights, tokens, enc_length,
             speaker_id, rng_key, temperature):
        xa_k, xa_v, state = magpie_mod.prepare(tokens, enc_length, speaker_id,
                                               m_weights, mc)
        start = state.frame_idx
        target = jnp.minimum(start + k, mc.max_dec_steps)
        state = magpie_mod.decode_loop(
            xa_k, xa_v, state, enc_length, m_weights, mc, rng_key,
            temperature, top_k, target_frames=target,
            use_pallas_lt=use_pallas_lt, use_pallas_decoder=use_pallas_decoder,
            use_fused=use_fused, int8_stream=int8_stream)
        base = jnp.clip(start - ctx, 0, mc.max_dec_steps - win)
        window = jax.lax.dynamic_slice(
            state.codes, (base, 0), (win, mc.num_codebooks))
        audio = codec_mod.codec_decode(window.T, c_weights, ccfg,
                                       use_pallas=use_pallas_codec)
        meta = jnp.stack([state.frame_idx.astype(jnp.float32),
                          state.done.astype(jnp.float32),
                          start.astype(jnp.float32),
                          base.astype(jnp.float32)])
        return xa_k, xa_v, state, jnp.concatenate([audio.astype(jnp.float32),
                                                   meta])

    fn = jax.jit(prog)
    engine._fused_chunk_cache[key] = fn
    return fn


def stream_sentence(engine: MagpieEngine, codec: CodecEngine,
                    token_ids, params: StreamParams,
                    sentence_index: int = 0, total_sentences: int = 1
                    ) -> Iterator[AudioChunk]:
    """Incrementally synthesize one tokenized sentence, yielding audio chunks.

    Emitted audio is bit-identical to a full offline decode (context-primed
    causal vocoding, see module docstring)."""
    import jax
    import jax.numpy as jnp

    tokens, enc_length, bucket = engine._pad_tokens(token_ids)
    k = params.frames_per_chunk
    ctx = params.codec_context_frames
    hop = codec.config.hop_length
    fn = _fused_chunk_fn(engine, codec, bucket, params.top_k, k, ctx)
    first_fn = _fused_first_chunk_fn(engine, codec, bucket, params.top_k, k,
                                     ctx)

    stream = None
    done = False
    chunk_idx = 0
    stalls = 0
    while not done:
        rng_key = jax.random.fold_in(jax.random.PRNGKey(params.seed), chunk_idx)
        if stream is None:
            # First chunk: prefill + decode + vocode, one dispatch.
            xa_k, xa_v, state, flat = first_fn(
                engine.weights, engine.int8_stream, codec.weights,
                tokens, enc_length, jnp.int32(params.speaker_id), rng_key,
                jnp.float32(params.temperature))
            stream = {"xa_k": xa_k, "xa_v": xa_v, "state": state,
                      "enc_length": enc_length}
        else:
            state, flat = fn(engine.weights, engine.int8_stream, codec.weights,
                             stream["xa_k"], stream["xa_v"], stream["state"],
                             stream["enc_length"], rng_key,
                             jnp.float32(params.temperature))
            stream["state"] = state
        flat = np.asarray(flat)
        audio, meta = flat[:-4], flat[-4:]
        end, done_f, start, base = (int(meta[0]), meta[1] > 0.5,
                                    int(meta[2]), int(meta[3]))
        done = bool(done_f) or end >= engine.config.max_dec_steps
        n_new = end - start
        chunk_idx += 1
        if n_new <= 0:
            if done:
                break
            # A live stream must advance every chunk; re-dispatching the same
            # chunk forever would hang the caller, so fail loudly instead.
            stalls += 1
            if stalls >= 2:
                raise RuntimeError(
                    "streaming decode made no progress (frame_idx stuck at "
                    f"{end}) — decode_loop returned neither frames nor EOS")
            continue
        stalls = 0
        off = start - base
        yield AudioChunk(
            samples=audio[off * hop: (off + n_new) * hop].astype(np.float32),
            sentence_index=sentence_index,
            total_sentences=total_sentences,
            frames_generated=end,
            is_sentence_end=done,
        )


def warmup_streaming(engine: MagpieEngine, codec: CodecEngine,
                     params: Optional[StreamParams] = None,
                     token_buckets=None) -> None:
    """Compile the REAL streaming path for each token bucket.

    Production streaming runs the fused prefill+decode+vocode FIRST-chunk
    program (``_fused_first_chunk_fn``) then the steady-state chunk program
    (``_fused_chunk_fn``) — not the split ``decode_chunk`` program that
    ``engine.warmup(streaming=True)`` compiles — so this is the warmup that
    makes a first streaming request's TTFA equal steady state. TWO chunks per
    bucket are pulled (compiling both programs), then the stream is abandoned.
    """
    params = params or StreamParams()
    for bucket in (token_buckets or engine.token_buckets):
        tokens = [engine.config.text_bos_id] + [2] * (bucket - 2) + \
            [engine.config.text_eos_id]
        for i, _ in enumerate(stream_sentence(engine, codec, tokens, params)):
            if i >= 1:
                break


def stream_text(engine: MagpieEngine, codec: CodecEngine, tokenizer,
                text: str, params: StreamParams) -> Iterator[AudioChunk]:
    """Sentence-chunked streaming over arbitrary text.

    A sentence longer than the engine's largest token bucket is further split
    at word boundaries (``split_to_buckets``), so arbitrarily long
    unpunctuated input streams instead of raising."""
    from .engine import split_to_buckets

    sentences = split_sentences(text) if params.sentence_chunking else [text]
    if not sentences:
        return
    for idx, sentence in enumerate(sentences):
        token_ids = tokenizer.encode(sentence)
        for piece in split_to_buckets(token_ids, engine.token_buckets,
                                      engine.split_token_id,
                                      engine.config.text_bos_id,
                                      engine.config.text_eos_id):
            yield from stream_sentence(engine, codec, piece, params,
                                       sentence_index=idx,
                                       total_sentences=len(sentences))


def synthesize_streaming(engine: MagpieEngine, codec: CodecEngine, tokenizer,
                         text: str, params: StreamParams,
                         on_audio: Callable[[np.ndarray], bool],
                         on_progress: Optional[Callable[[int, int, int], None]] = None
                         ) -> int:
    """Callback-style wrapper (reference magpie_synthesize_streaming semantics).

    ``on_audio`` returning False aborts generation. Returns total samples, or -1
    if aborted.
    """
    total = 0
    for chunk in stream_text(engine, codec, tokenizer, text, params):
        if on_progress is not None:
            on_progress(chunk.frames_generated, chunk.sentence_index,
                        chunk.total_sentences)
        if not on_audio(chunk.samples):
            return -1
        total += len(chunk.samples)
    return total
