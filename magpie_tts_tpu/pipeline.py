"""MagpiePipeline: model files -> text -> waveform. The top-level user API."""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import CodecConfig, MagpieConfig
from .io.codec_weights import load_codec_weights, random_codec_weights
from .io.gguf import GGUFReader
from .io.magpie_weights import load_magpie_weights, random_magpie_weights
from .io.wav import write_wav
from .runtime.engine import CodecEngine, MagpieEngine
from .runtime import streaming
from .text.tokenizer import MagpieTokenizer


@dataclasses.dataclass
class MagpiePipeline:
    tokenizer: MagpieTokenizer
    engine: MagpieEngine
    codec: Optional[CodecEngine]
    config: MagpieConfig

    @classmethod
    def from_gguf(cls, model_path: str, codec_path: Optional[str] = None,
                  compute_dtype=jnp.float32,
                  serve_int8: bool = False,
                  serve_q8: bool = False,
                  use_fused: Optional[bool] = None,
                  gelu_flavor: Optional[str] = None) -> "MagpiePipeline":
        """``gelu_flavor``: "erf" (NeMo-exact, default) or "tanh" (the ggml
        approximation the reference C++ engine computes) — flips every FFN in
        every compiled path; None keeps the GGUF-metadata/config default."""
        from .io.native import open_gguf

        reader = open_gguf(model_path)
        config, weights = load_magpie_weights(model_path, reader=reader,
                                              q8_native=serve_q8)
        if gelu_flavor is not None:
            config = dataclasses.replace(config, gelu_flavor=gelu_flavor)
        tokenizer = MagpieTokenizer.from_gguf_metadata(reader.metadata)
        q8_stream = None
        if serve_q8:
            # Serve the file's OWN Q8_0 blocks (requires a Q8_0 checkpoint):
            # zero requantization error, exactly equal codes vs load-time
            # dequant (docs/PARITY.md contract). Two mechanisms: (a) the four
            # per-frame decoder matrices stream natively in-kernel
            # (Q8DecoderStream, ~53% of the bf16 weight traffic); (b) every
            # other allowlisted tensor stays as raw blocks in the weights
            # pytree (Q8Blocks, q8_native load above) and programs dequantize
            # at entry — persistent HBM holds no dense copy of any tensor the
            # converter quantized.
            from .io.magpie_weights import q8_stream_from_gguf

            q8_stream = q8_stream_from_gguf(reader, config)
        engine = MagpieEngine(weights, config, compute_dtype=compute_dtype,
                              serve_int8=serve_int8, q8_stream=q8_stream,
                              use_fused=use_fused,
                              split_token_id=tokenizer.space_id)
        codec = None
        if codec_path:
            codec_config, codec_weights = load_codec_weights(codec_path)
            codec = CodecEngine(codec_weights, codec_config, compute_dtype=compute_dtype)
        return cls(tokenizer=tokenizer, engine=engine, codec=codec, config=config)

    def synthesize_codes(self, text: str, *, speaker_id: int = 0,
                         temperature: float = 0.7, top_k: int = 80,
                         seed: int = 0) -> np.ndarray:
        token_ids = self.tokenizer.encode(text)
        result = self.engine.synthesize_codes(
            token_ids, speaker_id=speaker_id, temperature=temperature,
            top_k=top_k, seed=seed)
        return result.codes

    def synthesize(self, text: str, *, speaker_id: int = 0,
                   temperature: float = 0.7, top_k: int = 80,
                   seed: int = 0) -> np.ndarray:
        """text -> float32 waveform at config.sample_rate."""
        if self.codec is None:
            raise ValueError("no codec loaded; pass codec_path to from_gguf")
        codes = self.synthesize_codes(text, speaker_id=speaker_id,
                                      temperature=temperature, top_k=top_k,
                                      seed=seed)
        return self.codec.decode(codes)

    def synthesize_to_wav(self, text: str, output_path: str, **kwargs) -> int:
        """text -> 16-bit PCM WAV. PCM conversion happens ON DEVICE (int16
        transfer is half the float one — the dominant single-utterance
        device->host cost on tunneled links)."""
        if self.codec is None:
            raise ValueError("no codec loaded; pass codec_path to from_gguf")
        codes = self.synthesize_codes(text, **kwargs)
        samples = self.codec.decode(codes, pcm16=True)
        write_wav(output_path, samples, self.config.sample_rate)
        return len(samples)

    def warmup(self, *, streaming_path: bool = False, top_k: int = 80,
               token_buckets: Optional[Sequence[int]] = None,
               params: Optional[streaming.StreamParams] = None) -> None:
        """Pre-compile the offline path (and with ``streaming_path=True`` the
        REAL fused streaming chunk programs) so no request pays a compile."""
        if streaming_path:
            if self.codec is None:
                raise ValueError("no codec loaded; pass codec_path to from_gguf")
            streaming.warmup_streaming(self.engine, self.codec, params,
                                       token_buckets=token_buckets)
        else:
            self.engine.warmup(token_buckets=token_buckets, top_k=top_k)

    def stream(self, text: str,
               params: Optional[streaming.StreamParams] = None
               ) -> Iterator[streaming.AudioChunk]:
        if self.codec is None:
            raise ValueError("no codec loaded; pass codec_path to from_gguf")
        params = params or streaming.StreamParams()
        return streaming.stream_text(self.engine, self.codec, self.tokenizer,
                                     text, params)
