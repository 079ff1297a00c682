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


def stream_sentence(engine: MagpieEngine, codec: CodecEngine,
                    token_ids, params: StreamParams,
                    sentence_index: int = 0, total_sentences: int = 1
                    ) -> Iterator[AudioChunk]:
    """Incrementally synthesize one tokenized sentence, yielding audio chunks."""
    stream = engine.begin_stream(token_ids, speaker_id=params.speaker_id)
    all_codes: Optional[np.ndarray] = None
    emitted_frames = 0
    done = False
    while not done:
        new_codes, done = engine.decode_chunk(
            stream, n_frames=params.frames_per_chunk,
            temperature=params.temperature, top_k=params.top_k, seed=params.seed)
        if new_codes.shape[0]:
            all_codes = (new_codes if all_codes is None
                         else np.concatenate([all_codes, new_codes], axis=0))
        if all_codes is None:
            continue
        pending = all_codes.shape[0] - emitted_frames
        if pending >= params.frames_per_chunk or (done and pending > 0):
            ctx = min(emitted_frames, params.codec_context_frames)
            window = all_codes[emitted_frames - ctx:]
            samples = codec.decode_with_context(window, ctx)
            emitted_frames = all_codes.shape[0]
            yield AudioChunk(
                samples=samples,
                sentence_index=sentence_index,
                total_sentences=total_sentences,
                frames_generated=emitted_frames,
                is_sentence_end=done,
            )


def stream_text(engine: MagpieEngine, codec: CodecEngine, tokenizer,
                text: str, params: StreamParams) -> Iterator[AudioChunk]:
    """Sentence-chunked streaming over arbitrary text."""
    sentences = split_sentences(text) if params.sentence_chunking else [text]
    if not sentences:
        return
    for idx, sentence in enumerate(sentences):
        token_ids = tokenizer.encode(sentence)
        yield from stream_sentence(engine, codec, token_ids, params,
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
