"""MagpieEngine: compiled synthesis with shape bucketing and persistent executables.

The reference's fastest path emulates compilation reuse with a persistent graph
allocator (magpie.cpp:4253-4311). Here reuse is structural: each (token-bucket,
top_k) pair compiles once into a single XLA executable that runs encoder, XA
precompute, context prefill and the entire autoregressive while_loop on device,
then is reused for every subsequent utterance. Codec decode compiles once per
frame bucket.

Bucketing is sound because the encoder is causal (pad tokens can't influence the
valid prefix) and the codec is causal (pad frames can't influence earlier samples);
cross-attention masks padded encoder keys via ``enc_length``.
"""

from __future__ import annotations

import bisect
import dataclasses
import itertools
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig, MagpieConfig
from ..io.codec_weights import CodecWeights
from ..io.magpie_weights import MagpieWeights
from ..models import codec as codec_mod
from ..models import magpie as magpie_mod

# Monotone engine ids for compiled-program cache keys: unlike id(), a uid is
# never reused after garbage collection, so a new engine can't hit a stale
# closure compiled against a dead instance's constants.
_ENGINE_UIDS = itertools.count()

DEFAULT_TOKEN_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512)
# Minimum 32: vocoding a padded 32-frame bucket costs ~4ms on device, while
# every extra bucket costs a full vocoder compile (tens of seconds cold).
DEFAULT_FRAME_BUCKETS = (32, 64, 128, 256, 384, 512)


def pick_bucket(buckets: Sequence[int], n: int) -> int:
    idx = bisect.bisect_left(buckets, n)
    if idx == len(buckets):
        raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")
    return buckets[idx]


def split_to_buckets(token_ids: Sequence[int], buckets: Sequence[int],
                     split_id: int, bos_id: int, eos_id: int):
    """Token lists longer than the largest bucket become several <=bucket
    chunks split at word boundaries (``chunk_token_ids``); shorter ones pass
    through whole. The intra-sentence analog of sentence chunking — the
    reference sizes graphs per enc_seq so ANY length runs
    (magpie.cpp:2284-2374); with bucketed compiles, unbounded input maps to
    bounded shapes by chunking instead of crashing."""
    from ..text.tokenizer import chunk_token_ids

    return chunk_token_ids(list(token_ids), buckets[-1], split_id,
                           bos_id, eos_id)


@dataclasses.dataclass
class SynthesisResult:
    codes: np.ndarray       # [n_frames, 8] int32
    n_frames: int


class MagpieEngine:
    """Compiled TTS code generation for one model instance."""

    def __init__(
        self,
        weights: MagpieWeights,
        config: MagpieConfig,
        compute_dtype=jnp.float32,
        token_buckets: Sequence[int] = DEFAULT_TOKEN_BUCKETS,
        use_pallas_lt: bool = None,
        use_pallas_decoder: bool = None,
        use_fused: bool = None,
        serve_int8: bool = False,
        q8_stream=None,
        split_token_id: int = 93,
    ):
        self.config = config
        # Inter-word space token used to split over-long inputs into bucket-
        # sized chunks (pipeline overrides with the tokenizer's actual id).
        self.split_token_id = split_token_id
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.weights = (weights if weights.text_emb.dtype == self.compute_dtype
                        else weights.astype(self.compute_dtype))
        self.token_buckets = tuple(token_buckets)
        self.use_pallas_lt = use_pallas_lt
        self.use_pallas_decoder = use_pallas_decoder
        # None -> fused frame megakernel when both pallas paths are on
        # (debug override: MAGPIE_NO_FUSED env var / CLI --no-fused).
        self.use_fused = use_fused
        # Serving-quantized int8 copies of the streamed decoder matrices (half
        # the per-frame HBM weight traffic; pallas decoder path only) — OR the
        # checkpoint's own Q8_0 blocks (io.magpie_weights.Q8DecoderStream,
        # from q8_stream_from_gguf): zero-requantization serving — exactly
        # equal codes vs dequantize-at-load, ulp-level float parity
        # (docs/PARITY.md "Q8_0-native serving"). Both flow through the same
        # stream slot; the kernels dispatch on the pytree type.
        if serve_int8 and q8_stream is not None:
            raise ValueError("serve_int8 and q8_stream are mutually exclusive")
        self.int8_stream = None
        if q8_stream is not None:
            self.int8_stream = q8_stream
        elif serve_int8:
            from ..io.magpie_weights import quantize_decoder_stream

            self.int8_stream = quantize_decoder_stream(self.weights.decoder)
        self.uid = next(_ENGINE_UIDS)
        self._synth_cache: Dict[Tuple[int, int], object] = {}
        self._prepare_cache: Dict[int, object] = {}
        self._chunk_cache: Dict[Tuple[int, int], object] = {}
        # Fused cross-engine programs (codes+vocode in one dispatch) live on
        # the instance so they die with it; keyed by the codec's uid.
        self._fused_audio_cache: Dict[Tuple, object] = {}
        self._fused_chunk_cache: Dict[Tuple, object] = {}

    # ---- compiled program management -------------------------------------

    def _synth_fn(self, bucket: int, top_k: int):
        key = (bucket, top_k)
        fn = self._synth_cache.get(key)
        if fn is None:
            config = self.config

            # Weights are a jit argument (not a closure) so they are NOT inlined
            # as constants into the compiled program.
            use_pallas_lt = self.use_pallas_lt
            use_pallas_decoder = self.use_pallas_decoder
            use_fused = self.use_fused

            def program(weights, int8_stream, tokens, enc_length, speaker_id,
                        rng_key, temperature):
                return magpie_mod.synthesize_codes_program(
                    tokens, enc_length, speaker_id, rng_key, temperature,
                    weights, config, top_k=top_k, use_pallas_lt=use_pallas_lt,
                    use_pallas_decoder=use_pallas_decoder, use_fused=use_fused,
                    int8_stream=int8_stream)

            fn = jax.jit(program)
            self._synth_cache[key] = fn
        return fn

    def _prepare_fn(self, bucket: int):
        fn = self._prepare_cache.get(bucket)
        if fn is None:
            config = self.config

            def program(weights, tokens, enc_length, speaker_id):
                return magpie_mod.prepare(tokens, enc_length, speaker_id,
                                          weights, config)

            fn = jax.jit(program)
            self._prepare_cache[bucket] = fn
        return fn

    def _chunk_fn(self, bucket: int, top_k: int):
        key = (bucket, top_k)
        fn = self._chunk_cache.get(key)
        if fn is None:
            config = self.config

            use_pallas_lt = self.use_pallas_lt
            use_pallas_decoder = self.use_pallas_decoder
            use_fused = self.use_fused

            def program(weights, int8_stream, xa_k, xa_v, state, enc_length,
                        rng_key, temperature, target_frames):
                return magpie_mod.decode_loop(
                    xa_k, xa_v, state, enc_length, weights, config,
                    rng_key, temperature, top_k, target_frames=target_frames,
                    use_pallas_lt=use_pallas_lt,
                    use_pallas_decoder=use_pallas_decoder, use_fused=use_fused,
                    int8_stream=int8_stream)

            fn = jax.jit(program, donate_argnums=(4,))
            self._chunk_cache[key] = fn
        return fn

    def _pad_tokens(self, token_ids: Sequence[int]):
        n = len(token_ids)
        bucket = pick_bucket(self.token_buckets, n)
        padded = np.zeros(bucket, np.int32)
        padded[:n] = np.asarray(token_ids, np.int32)
        return jnp.asarray(padded), jnp.int32(n), bucket

    # ---- public API -------------------------------------------------------

    def synthesize_codes(self, token_ids: Sequence[int], *, speaker_id: int = 0,
                         temperature: float = 0.7, top_k: int = 80,
                         seed: int = 0) -> SynthesisResult:
        """Generate audio codes for one tokenized utterance (blocking).

        Inputs longer than the largest token bucket are split at word
        boundaries and synthesized chunk by chunk (decoder state resets per
        chunk, like the reference's per-sentence loop); the code streams are
        concatenated. Arbitrary lengths synthesize — never a shape error.
        """
        chunks = split_to_buckets(token_ids, self.token_buckets,
                                  self.split_token_id, self.config.text_bos_id,
                                  self.config.text_eos_id)
        parts = []
        for i, chunk in enumerate(chunks):
            tokens, enc_length, bucket = self._pad_tokens(chunk)
            fn = self._synth_fn(bucket, top_k)
            # Chunk 0 keeps the exact key the unchunked path always used
            # (bit-compat); later chunks fold in their index.
            key = (jax.random.PRNGKey(seed) if i == 0
                   else jax.random.fold_in(jax.random.PRNGKey(seed), i))
            codes, n_frames = fn(self.weights, self.int8_stream, tokens,
                                 enc_length, jnp.int32(speaker_id), key,
                                 jnp.float32(temperature))
            parts.append(np.asarray(codes[: int(n_frames)]))
        codes = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
        return SynthesisResult(codes=codes, n_frames=codes.shape[0])

    def warmup(self, *, token_buckets: Sequence[int] = None, top_k: int = 80,
               streaming: bool = False, codec=None,
               split_stream: bool = False) -> None:
        """Pre-compile synthesis programs for the given (default: all) token
        buckets so no request pays a compile.

        ``streaming=True`` warms the REAL production streaming path — the
        fused decode+vocode chunk programs ``runtime.streaming
        .stream_sentence`` dispatches — and therefore needs the ``codec``
        engine (raises ValueError without one, rather than silently warming
        the wrong programs). ``split_stream=True`` warms the SPLIT incremental
        path (prepare + decode_chunk) for callers that drive ``decode_chunk``
        directly."""
        if streaming:
            if codec is None:
                raise ValueError(
                    "warmup(streaming=True) warms the fused decode+vocode "
                    "chunk programs, which need the codec: pass codec=<"
                    "CodecEngine> (or call MagpiePipeline.warmup("
                    "streaming_path=True)). To warm only the split "
                    "prepare/decode_chunk programs, use split_stream=True.")
            from . import streaming as streaming_mod

            streaming_mod.warmup_streaming(self, codec,
                                           token_buckets=token_buckets)
            return
        for bucket in (token_buckets or self.token_buckets):
            tokens = [self.config.text_bos_id, self.config.text_eos_id]
            tokens += [2] * (bucket - len(tokens))
            if split_stream:
                stream = self.begin_stream(tokens)
                self.decode_chunk(stream, n_frames=1, top_k=top_k)
            else:
                self.synthesize_codes(tokens, top_k=top_k, temperature=0.0)

    def begin_stream(self, token_ids: Sequence[int], *, speaker_id: int = 0):
        """Prefill for incremental decoding. Returns an opaque stream context."""
        tokens, enc_length, bucket = self._pad_tokens(token_ids)
        xa_k, xa_v, state = self._prepare_fn(bucket)(
            self.weights, tokens, enc_length, jnp.int32(speaker_id))
        return {"xa_k": xa_k, "xa_v": xa_v, "state": state,
                "enc_length": enc_length, "bucket": bucket, "chunk_idx": 0}

    def decode_chunk(self, stream, *, n_frames: int, temperature: float = 0.7,
                     top_k: int = 80, seed: int = 0) -> Tuple[np.ndarray, bool]:
        """Advance the AR loop by up to ``n_frames`` new frames.

        Returns (new_codes [m, 8], done) where m <= n_frames; done is True once
        EOS fired or max steps reached.
        """
        state = stream["state"]
        start = int(state.frame_idx)
        target = min(start + n_frames, self.config.max_dec_steps)
        fn = self._chunk_fn(stream["bucket"], top_k)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), stream["chunk_idx"])
        state = fn(self.weights, self.int8_stream, stream["xa_k"],
                   stream["xa_v"], state, stream["enc_length"], key,
                   jnp.float32(temperature), jnp.int32(target))
        stream["state"] = state
        stream["chunk_idx"] += 1
        end = int(state.frame_idx)
        done = bool(state.done) or end >= self.config.max_dec_steps
        new_codes = np.asarray(state.codes[start:end])
        return new_codes, done


def synthesize_audio_fused(engine: "MagpieEngine", codec: "CodecEngine",
                           token_ids: Sequence[int], *, speaker_id: int = 0,
                           temperature: float = 0.7, top_k: int = 80,
                           seed: int = 0) -> Tuple[np.ndarray, int]:
    """tokens -> 16-bit PCM waveform in ONE compiled program.

    Generation, vocoding of the full ``max_dec_steps`` code window, and the
    PCM16 conversion all run in a single dispatch; the host trims to
    ``n_frames * hop`` samples. This is the latency-optimal path when
    dispatch round trips dominate (tunneled/remote TPUs) or utterances run
    near the step cap — the two-call path (synthesize_codes + decode) skips
    the wasted vocode tail for EOS-early workloads instead. Audio equals the
    two-call path exactly (causal codec => prefix-exact under padding).

    Returns (int16 samples [n_frames * hop], n_frames).
    """
    import jax

    chunks = split_to_buckets(token_ids, engine.token_buckets,
                              engine.split_token_id, engine.config.text_bos_id,
                              engine.config.text_eos_id)
    if len(chunks) > 1:
        # Over-long input: synthesize word-boundary chunks and concatenate
        # their PCM (decoder state resets per chunk, like per-sentence).
        parts = [synthesize_audio_fused(engine, codec, c,
                                        speaker_id=speaker_id,
                                        temperature=temperature, top_k=top_k,
                                        seed=seed + i)
                 for i, c in enumerate(chunks)]
        pcm = np.concatenate([p[0] for p in parts])
        return pcm, sum(p[1] for p in parts)

    tokens, enc_length, bucket = engine._pad_tokens(token_ids)
    key = (codec.uid, bucket, top_k)
    fn = engine._fused_audio_cache.get(key)
    if fn is None:
        mc = engine.config
        ccfg = codec.config
        use_pallas_lt = engine.use_pallas_lt
        use_pallas_decoder = engine.use_pallas_decoder
        use_fused = engine.use_fused
        use_pallas_codec = codec.use_pallas

        def program(m_weights, int8_stream, c_weights, tokens, enc_length,
                    speaker_id, rng_key, temperature):
            codes, n_frames = magpie_mod.synthesize_codes_program(
                tokens, enc_length, speaker_id, rng_key, temperature,
                m_weights, mc, top_k=top_k, use_pallas_lt=use_pallas_lt,
                use_pallas_decoder=use_pallas_decoder, use_fused=use_fused,
                int8_stream=int8_stream)
            audio = codec_mod.codec_decode(codes.T, c_weights, ccfg,
                                           use_pallas=use_pallas_codec)
            pcm = (jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
                   * 32767.0).astype(jnp.int16)
            return pcm, n_frames

        fn = jax.jit(program)
        engine._fused_audio_cache[key] = fn
    pcm, n_frames = fn(engine.weights, engine.int8_stream, codec.weights,
                       tokens, enc_length, jnp.int32(speaker_id),
                       jax.random.PRNGKey(seed), jnp.float32(temperature))
    n = int(n_frames)
    return np.asarray(pcm[: n * codec.config.hop_length]), n


class CodecEngine:
    """Compiled nano-codec vocoder with frame bucketing."""

    def __init__(self, weights: CodecWeights, config: CodecConfig,
                 compute_dtype=jnp.float32,
                 frame_buckets: Sequence[int] = DEFAULT_FRAME_BUCKETS,
                 use_pallas: bool = None):
        self.config = config
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.weights = (weights if weights.pre_conv_b.dtype == self.compute_dtype
                        else weights.astype(self.compute_dtype))
        self.frame_buckets = tuple(frame_buckets)
        self.use_pallas = use_pallas
        self.uid = next(_ENGINE_UIDS)
        self._decode_cache: Dict[int, object] = {}
        self._decode_batch_cache: Dict[object, object] = {}

    def _decode_fn(self, bucket: int, pcm16: bool = False):
        fn = self._decode_cache.get((bucket, pcm16))
        if fn is None:
            config = self.config
            use_pallas = self.use_pallas

            def program(weights, codes):
                audio = codec_mod.codec_decode(codes, weights, config,
                                               use_pallas=use_pallas)
                if pcm16:
                    # On-device 16-bit PCM (the WAV contract,
                    # magpie-tts.cpp:30-68): halves the device->host audio
                    # transfer, which dominates single-utterance latency on
                    # tunneled links.
                    audio = (jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
                             * 32767.0).astype(jnp.int16)
                return audio

            fn = jax.jit(program)
            self._decode_cache[(bucket, pcm16)] = fn
        return fn

    def decode(self, codes: np.ndarray, pcm16: bool = False) -> np.ndarray:
        """codes: [n_frames, 8] int32 -> waveform [n_frames * hop]:
        float32 in [-1, 1], or int16 PCM when ``pcm16`` (scaled on device)."""
        codes = np.asarray(codes, np.int32)
        n = codes.shape[0]
        if n == 0:
            return np.zeros(0, np.int16 if pcm16 else np.float32)
        bucket = pick_bucket(self.frame_buckets, n)
        padded = np.zeros((bucket, self.config.num_codebooks), np.int32)
        padded[:n] = codes
        audio = self._decode_fn(bucket, pcm16)(self.weights,
                                               jnp.asarray(padded.T))
        out = np.asarray(audio[: n * self.config.hop_length])
        return out if pcm16 else out.astype(np.float32)

    def decode_batch(self, codes_list) -> list:
        """Vocode several utterances in one compiled call (padded to the
        longest bucket). Returns a list of waveforms."""
        if not codes_list:
            return []
        lens = [np.asarray(c).shape[0] for c in codes_list]
        bucket = pick_bucket(self.frame_buckets, max(max(lens), 1))
        B = len(codes_list)
        padded = np.zeros((B, self.config.num_codebooks, bucket), np.int32)
        for i, c in enumerate(codes_list):
            padded[i, :, : lens[i]] = np.asarray(c, np.int32).T
        fn = self._decode_batch_cache.get((B, bucket))
        if fn is None:
            config = self.config
            use_pallas = self.use_pallas
            fn = jax.jit(lambda weights, codes: jax.vmap(
                lambda cc: codec_mod.codec_decode(cc, weights, config,
                                                  use_pallas=use_pallas))(codes))
            self._decode_batch_cache[(B, bucket)] = fn
        audio = np.asarray(fn(self.weights, jnp.asarray(padded)))
        hop = self.config.hop_length
        return [audio[i, : lens[i] * hop].astype(np.float32) for i in range(B)]

    def warmup(self, buckets: Sequence[int] = None) -> None:
        """Pre-compile the decode program for the given (default: all) buckets.

        Serving deployments call this once at startup so no request pays a
        vocoder compile (tens of seconds cold on TPU)."""
        for bucket in (buckets or self.frame_buckets):
            codes = jnp.zeros((self.config.num_codebooks, bucket), jnp.int32)
            jax.block_until_ready(self._decode_fn(bucket)(self.weights, codes))

    def decode_with_context(self, codes: np.ndarray, n_context: int) -> np.ndarray:
        """Decode [context; new] frames, return only the new frames' samples.

        Because the vocoder is fully causal with a bounded left receptive field,
        priming with enough context makes chunked output bit-identical to a full
        decode (used by streaming).
        """
        audio = self.decode(codes)
        return audio[n_context * self.config.hop_length:]
