"""Batched multi-utterance serving over a device mesh.

Throughput path the reference cannot express (it is structurally batch-1,
SURVEY §2.5): B utterances decode in lockstep — the whole batched AR loop is one
``lax.while_loop`` that runs until every sequence hits EOS or the step budget.
The batch axis shards over the mesh's ``data`` axis via ``shard_map``; weights
replicate (tensor parallelism is retired — rationale in ``parallel/mesh.py``
and docs/DESIGN.md "Parallelism").
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import MagpieConfig
from ..io.magpie_weights import MagpieWeights
from ..models import magpie as magpie_mod
from . import mesh as mesh_mod


def batched_synthesize_program(tokens: jnp.ndarray, enc_lengths: jnp.ndarray,
                               speaker_ids: jnp.ndarray, keys: jnp.ndarray,
                               temperature: jnp.ndarray,
                               weights: MagpieWeights, config: MagpieConfig,
                               top_k: int,
                               use_pallas_decoder=None):
    """tokens: [B, T]; enc_lengths, speaker_ids: [B]; keys: [B, 2].

    Lockstep batched loop (models.magpie.synthesize_codes_batched_program):
    cache/code writes stay dynamic_update_slice (a naive vmap of the
    single-utterance loop turns them into scatters, ~6x slower per step).
    """
    return magpie_mod.synthesize_codes_batched_program(
        tokens, enc_lengths, speaker_ids, keys, temperature, weights, config,
        top_k=top_k, use_pallas_decoder=use_pallas_decoder)


class BatchedMagpieEngine:
    """Fixed-batch compiled serving engine (single- or multi-chip)."""

    def __init__(self, weights: MagpieWeights, config: MagpieConfig,
                 batch_size: int, mesh: Optional[Mesh] = None,
                 compute_dtype=jnp.float32,
                 token_buckets: Sequence[int] = (32, 64, 128, 256),
                 split_token_id: int = 93):
        self.config = config
        self.batch_size = batch_size
        self.mesh = mesh
        self.token_buckets = tuple(token_buckets)
        self.split_token_id = split_token_id
        dtype = jnp.dtype(compute_dtype)
        from ..io.magpie_weights import materialize_weights

        weights = materialize_weights(weights, dtype)  # q8-native -> dense
        weights = weights if weights.text_emb.dtype == dtype else weights.astype(dtype)
        if mesh is not None and mesh.devices.size > 1:
            self.weights = mesh_mod.shard_weights(weights, mesh, config)
        else:
            self.weights = weights
        self._cache = {}

    def _fn(self, bucket: int, top_k: int):
        key = (bucket, top_k)
        fn = self._cache.get(key)
        if fn is None:
            config = self.config

            def program(weights, tokens, enc_lengths, speaker_ids, keys,
                        temperature):
                return batched_synthesize_program(
                    tokens, enc_lengths, speaker_ids, keys, temperature,
                    weights, config, top_k)

            if self.mesh is not None and self.mesh.devices.size > 1:
                # Data parallelism: shard_map over the data axis — every chip
                # runs the whole (pallas-accelerated) program on its local
                # batch slice; no collectives needed, and each shard's
                # while_loop terminates on ITS OWN streams' EOS. (Tensor
                # parallelism is retired — parallel/mesh.py docstring.)
                from jax.sharding import PartitionSpec as P
                from jax import shard_map

                d = P(mesh_mod.DATA_AXIS)
                fn = jax.jit(shard_map(
                    program, mesh=self.mesh,
                    in_specs=(P(), d, d, d, d, P()),
                    out_specs=(d, d), check_vma=False))
            else:
                fn = jax.jit(program)
            self._cache[key] = fn
        return fn

    def synthesize_batch_audio(self, token_id_lists, codec_engine, **kwargs):
        """Batched codes + batched vocoding. Returns list of waveforms."""
        codes_list = self.synthesize_batch(token_id_lists, **kwargs)
        return codec_engine.decode_batch(codes_list)

    def synthesize_batch(self, token_id_lists, *, speaker_ids=None,
                         temperature: float = 0.7, top_k: int = 80,
                         seed: int = 0):
        """Synthesize up to ``batch_size`` utterances in lockstep.

        Inputs longer than the largest token bucket are split at word
        boundaries (same rule as ``MagpieEngine.synthesize_codes``); the
        chunks join the lockstep batch as extra rows — in waves of
        ``batch_size`` if they overflow it — and each request's code streams
        are re-concatenated. Arbitrary lengths synthesize, never a shape
        error. Returns list of np.ndarray codes [n_frames_i, 8].
        """
        B = self.batch_size
        assert len(token_id_lists) <= B
        from ..runtime.engine import split_to_buckets

        c = self.config
        per_request = [split_to_buckets(ids, self.token_buckets,
                                        self.split_token_id,
                                        c.text_bos_id, c.text_eos_id)
                       for ids in token_id_lists]
        if speaker_ids is None:
            speaker_ids = np.zeros((len(token_id_lists),), np.int32)
        else:
            speaker_ids = np.asarray(speaker_ids, np.int32)

        if all(len(ch) == 1 for ch in per_request):
            # Fast path, bit-identical to the pre-chunking behavior
            # (keys fold in the slot index).
            keys = jax.vmap(lambda i: jax.random.fold_in(
                jax.random.PRNGKey(seed), i))(jnp.arange(B))
            return self._dispatch_wave([ch[0] for ch in per_request],
                                       speaker_ids, keys, temperature, top_k)

        # Chunked: flatten (request, chunk) work items, run in waves of <=B.
        work = [(r, k, chunk) for r, chunks in enumerate(per_request)
                for k, chunk in enumerate(chunks)]
        results = [[None] * len(ch) for ch in per_request]
        base = jax.random.PRNGKey(seed)
        for w0 in range(0, len(work), B):
            wave = work[w0: w0 + B]
            keys = jnp.stack([
                jax.random.fold_in(jax.random.fold_in(base, r), k)
                for r, k, _ in wave])
            spk = np.asarray([speaker_ids[r] for r, _, _ in wave], np.int32)
            parts = self._dispatch_wave([ch for _, _, ch in wave], spk, keys,
                                        temperature, top_k)
            for (r, k, _), codes in zip(wave, parts):
                results[r][k] = codes
        return [np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
                for parts in results]

    def _dispatch_wave(self, chunk_lists, speaker_ids, keys, temperature,
                       top_k):
        """One compiled lockstep call over <=B token chunks (each <= the
        largest bucket). Returns per-chunk trimmed code arrays."""
        B = self.batch_size
        from ..runtime.engine import pick_bucket
        bucket = pick_bucket(self.token_buckets,
                             max(len(ch) for ch in chunk_lists))

        tokens = np.zeros((B, bucket), np.int32)
        enc_lengths = np.ones((B,), np.int32)
        spk = np.zeros((B,), np.int32)
        for i, ids in enumerate(chunk_lists):
            tokens[i, : len(ids)] = ids
            enc_lengths[i] = len(ids)
            spk[i] = speaker_ids[i]
        if keys.shape[0] < B:
            pad = jnp.zeros((B - keys.shape[0], keys.shape[1]), keys.dtype)
            keys = jnp.concatenate([keys, pad], axis=0)

        codes, n_frames = self._fn(bucket, top_k)(
            self.weights, jnp.asarray(tokens), jnp.asarray(enc_lengths),
            jnp.asarray(spk), keys, jnp.float32(temperature))
        codes = np.asarray(codes)
        n_frames = np.asarray(n_frames)
        return [codes[i, : n_frames[i]] for i in range(len(chunk_lists))]
