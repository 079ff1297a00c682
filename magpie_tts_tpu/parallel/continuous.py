"""Continuous batching: requests join and leave a RUNNING batch.

The lockstep engine (serving.py) starts all utterances together and finishes
when the longest one does. Production serving needs iteration-level admission:
a finished slot should immediately take the next queued request. This engine
runs the decode loop in fixed-size SEGMENTS (``segment_frames`` per jit call);
between segments the host retires finished slots and admits queued requests
(one fused prefill+admit call per admission).

The TPU-shaped trick is the **ring cache with a global write pointer**: every
slot writes its new K/V row at the SAME physical row ``ring_p`` (one
dynamic_update_slice over the whole batch — a per-slot write index would lower
to a scatter, ~6x slower per step). What differs per slot is *logical*
position (for the learned position embedding) and a per-slot validity mask
over cache rows (for attention), both cheap vectors. An admitted request's
context+BOS rows are rolled into place ending at ``ring_p - 1``. Correctness
bound: a slot may live at most ``max_seq - (context_frames + 2)`` steps, which
the 357M config satisfies by construction (111 + 500 + margin = max_seq).

No counterpart exists in the reference (it is structurally batch-1,
SURVEY.md section 2.5).
"""

from __future__ import annotations

import dataclasses
import os
from collections import deque
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MagpieConfig
from ..io.magpie_weights import MagpieWeights
from ..models import decoder as decoder_mod
from ..models import local_transformer as lt_mod
from ..models import magpie as magpie_mod
from ..ops import sampling
from ..runtime.engine import pick_bucket


@dataclasses.dataclass
class _Request:
    req_id: int
    token_ids: List[int]
    speaker_id: int
    seed: int


class ContinuousBatchingEngine:
    """Slot-based serving engine: submit() requests, pump step(), collect codes."""

    def __init__(self, weights: MagpieWeights, config: MagpieConfig,
                 n_slots: int = 8, compute_dtype=jnp.float32,
                 token_buckets: Sequence[int] = (32, 64, 128),
                 segment_frames: int = 32):
        self.config = config
        self.n_slots = n_slots
        self.segment_frames = segment_frames
        self.token_buckets = tuple(token_buckets)
        dtype = jnp.dtype(compute_dtype)
        from ..io.magpie_weights import materialize_weights

        # Q8-native block pytrees dequantize eagerly here: this engine builds
        # its own step programs around dense weights (the per-frame Q8 stream
        # is a MagpieEngine surface).
        weights = materialize_weights(weights, dtype)
        self.weights = (weights if weights.text_emb.dtype == dtype
                        else weights.astype(dtype))
        self.dtype = dtype

        B, L = n_slots, config.dec_layers
        S, D = config.max_seq, config.d_model
        E = max(self.token_buckets)
        self._enc_pad = E

        # Device-resident slot state (only touched by the two jitted programs).
        self.k_cache = jnp.zeros((B, L, S, D), dtype)
        self.v_cache = jnp.zeros_like(self.k_cache)
        self.xa_k = jnp.zeros((B, L, E, config.d_xa), dtype)
        self.xa_v = jnp.zeros_like(self.xa_k)
        self.hidden = jnp.zeros((B, D), dtype)
        self.valid = jnp.zeros((B, S), jnp.bool_)
        self.logical_pos = jnp.zeros((B,), jnp.int32)
        self.frame_count = jnp.zeros((B,), jnp.int32)
        self.enc_lengths = jnp.ones((B,), jnp.int32)
        self.keys = jax.vmap(jax.random.PRNGKey)(jnp.zeros((B,), jnp.uint32))
        self.ring_p = int(config.context_frames + 1)   # host-side scalar

        # Host-side bookkeeping (no device traffic).
        self.active = np.zeros((B,), bool)
        self._done_host = np.zeros((B,), bool)
        self._counts_host = np.zeros((B,), np.int64)
        self._queue: deque[_Request] = deque()
        self._slot_req: List[Optional[int]] = [None] * n_slots
        self._partial: Dict[int, List[np.ndarray]] = {}
        self._finished: Dict[int, np.ndarray] = {}
        self._next_id = 0
        # Over-long requests are split into child requests (word-boundary
        # chunks); the parent id is reported once every child finished.
        self._groups: Dict[int, List[int]] = {}
        self._group_parent: Dict[int, int] = {}
        # Inter-word space token for chunk splitting (serve passes the
        # tokenizer's actual id).
        self.split_token_id = 93

        self._admit_cache: Dict[int, object] = {}
        self._segment_cache: Dict[int, object] = {}

    # ---- compiled programs -------------------------------------------------

    def _admit_fn(self, bucket: int, m: int):
        """One fused call admitting M requests: vmapped prefill + M slot
        placements. Each admission dispatch costs ~25 ms on a tunneled TPU,
        so bursts admit in power-of-two groups instead of one call per slot.
        """
        fn = self._admit_cache.get((bucket, m))
        if fn is None:
            config = self.config
            n_rows = config.context_frames + 1
            S = config.max_seq
            E = self._enc_pad

            def program(weights, k_cache, v_cache, xa_k, xa_v, hidden, valid,
                        enc_lengths, logical_pos, frame_count, keys,
                        tokens, enc_length, speaker_id, slots, ring_p,
                        new_keys):
                # tokens [M, bucket]; enc_length/speaker_id/slots [M];
                # new_keys [M, 2]. Prefill all M at once, place one by one.
                xak_b, xav_b, st_b = jax.vmap(
                    lambda t, el, sp: magpie_mod.prepare(
                        t, el, sp, weights, config)
                )(tokens, enc_length, speaker_id)
                pad = E - xak_b.shape[2]
                xak_b = jnp.pad(xak_b, ((0, 0), (0, 0), (0, pad), (0, 0)))
                xav_b = jnp.pad(xav_b, ((0, 0), (0, 0), (0, pad), (0, 0)))

                # Place prefilled rows so they END at ring row ring_p - 1.
                shift = (ring_p - n_rows) % S

                for i in range(m):
                    slot = slots[i]
                    k_rows = st_b.k_cache[i, :, :n_rows]
                    v_rows = st_b.v_cache[i, :, :n_rows]
                    full = jnp.zeros((k_rows.shape[0], S, k_rows.shape[2]),
                                     k_cache.dtype)
                    kf = jnp.roll(jax.lax.dynamic_update_slice(
                        full, k_rows.astype(k_cache.dtype), (0, 0, 0)),
                        shift, axis=1)
                    vf = jnp.roll(jax.lax.dynamic_update_slice(
                        full, v_rows.astype(v_cache.dtype), (0, 0, 0)),
                        shift, axis=1)
                    vmask = jnp.roll(jnp.arange(S) < n_rows, shift)

                    k_cache = jax.lax.dynamic_update_slice(
                        k_cache, kf[None], (slot, 0, 0, 0))
                    v_cache = jax.lax.dynamic_update_slice(
                        v_cache, vf[None], (slot, 0, 0, 0))
                    xa_k = jax.lax.dynamic_update_slice(
                        xa_k, xak_b[i][None].astype(xa_k.dtype),
                        (slot, 0, 0, 0))
                    xa_v = jax.lax.dynamic_update_slice(
                        xa_v, xav_b[i][None].astype(xa_v.dtype),
                        (slot, 0, 0, 0))
                    hidden = jax.lax.dynamic_update_slice(
                        hidden, st_b.hidden[i][None].astype(hidden.dtype),
                        (slot, 0))
                    valid = jax.lax.dynamic_update_slice(
                        valid, vmask[None], (slot, 0))
                    enc_lengths = jax.lax.dynamic_update_slice(
                        enc_lengths, enc_length[i][None], (slot,))
                    logical_pos = jax.lax.dynamic_update_slice(
                        logical_pos, jnp.int32(n_rows)[None], (slot,))
                    frame_count = jax.lax.dynamic_update_slice(
                        frame_count, jnp.int32(0)[None], (slot,))
                    keys = jax.lax.dynamic_update_slice(
                        keys, new_keys[i][None], (slot, 0))
                return (k_cache, v_cache, xa_k, xa_v, hidden, valid,
                        enc_lengths, logical_pos, frame_count, keys)

            fn = jax.jit(program, donate_argnums=tuple(range(1, 11)))
            self._admit_cache[(bucket, m)] = fn
        return fn

    def _segment_fn(self, top_k: int):
        fn = self._segment_cache.get(top_k)
        if fn is None:
            config = self.config
            K = self.segment_frames
            S = config.max_seq
            static_mask = sampling.forbidden_token_mask(
                config.vocab_per_cb, config.audio_bos_id, config.audio_eos_id)
            dtype = self.dtype

            def program(weights, k_cache, v_cache, xa_k, xa_v, hidden, valid,
                        logical_pos, frame_count, active, done, enc_lengths,
                        keys, ring_p, temperature):

                def sample_one(hidden, key, forbid_eos):
                    return lt_mod.sample_frame_codes(
                        hidden, weights, config, key, temperature, top_k,
                        forbid_eos, static_mask)

                def body(j, carry):
                    (k_cache, v_cache, hidden, valid, logical_pos, frame_count,
                     done, keys, codes_seg) = carry
                    alive = active & ~done
                    r = (ring_p + j) % S

                    forbid = frame_count < config.min_generated_frames
                    split = jax.vmap(jax.random.split, out_axes=1)(keys)
                    keys, subkeys = split[0], split[1]
                    from ..ops.pallas_kernels.lt_sampler_batched import (
                        batched_shapes_ok, sample_frame_codes_batched_pallas)

                    use_fused = (magpie_mod.use_pallas_default(config)
                                 and batched_shapes_ok(self.n_slots)
                                 and not os.environ.get("MAGPIE_NO_FUSED"))
                    if use_fused:
                        # Fused frame kernel: LT sampling + embedding + decoder
                        # in one pallas call; the kernel sets ring row r's
                        # validity to may_continue & ~is_eos per slot (the same
                        # `counts` the XLA bookkeeping below re-derives).
                        from ..ops.pallas_kernels.frame_step_batched import (
                            frame_step_batched_pallas)

                        seeds = sampling.seed_from_key(subkeys)
                        may_continue = alive & (
                            frame_count < config.max_dec_steps)
                        lp = jnp.clip(logical_pos, 0, config.max_pos - 1)
                        posemb = weights.decoder.pos_emb[lp].astype(dtype)
                        (sampled, argmax, hidden, k_cache, v_cache) = \
                            frame_step_batched_pallas(
                                hidden, r, valid, may_continue, posemb,
                                xa_k, xa_v, k_cache, v_cache, weights, config,
                                enc_lengths, seeds, temperature, top_k, forbid)
                        is_eos = jax.vmap(
                            lambda s, a: sampling.frame_has_eos(
                                s, a, config.audio_eos_id))(sampled, argmax)
                        codes_seg = jax.lax.dynamic_update_slice(
                            codes_seg, sampled[None], (j, 0, 0))
                        counts = may_continue & ~is_eos
                        frame_count = frame_count + counts.astype(jnp.int32)
                        done = done | (active & is_eos)
                        valid = jax.lax.dynamic_update_slice(
                            valid, counts[:, None], (0, r))
                        logical_pos = logical_pos + counts.astype(jnp.int32)
                        return (k_cache, v_cache, hidden, valid, logical_pos,
                                frame_count, done, keys, codes_seg)

                    if (magpie_mod.use_pallas_default(config)
                            and batched_shapes_ok(self.n_slots)):
                        seeds = sampling.seed_from_key(subkeys)
                        sampled, argmax = sample_frame_codes_batched_pallas(
                            hidden, weights, config, seeds, temperature, top_k,
                            forbid)
                    else:
                        sampled, argmax = jax.vmap(sample_one)(
                            hidden, subkeys, forbid)
                    is_eos = jax.vmap(lambda s, a: sampling.frame_has_eos(
                        s, a, config.audio_eos_id))(sampled, argmax)
                    codes_seg = jax.lax.dynamic_update_slice(
                        codes_seg, sampled[None], (j, 0, 0))
                    counts = alive & ~is_eos & (frame_count < config.max_dec_steps)
                    frame_count = frame_count + counts.astype(jnp.int32)
                    done = done | (active & is_eos)

                    # New K/V row: same physical row r for every slot.
                    valid = jax.lax.dynamic_update_slice(
                        valid, counts[:, None], (0, r))
                    emb = magpie_mod.audio_frame_embedding(
                        sampled, weights, config).astype(dtype)
                    lp = jnp.clip(logical_pos, 0, config.max_pos - 1)

                    if magpie_mod.use_pallas_default(config):
                        from ..ops.pallas_kernels.decoder_step_batched import (
                            decode_step_batched_pallas)

                        x_pe = emb + weights.decoder.pos_emb[lp].astype(dtype)
                        hidden, k_cache, v_cache = decode_step_batched_pallas(
                            x_pe, r, valid, xa_k, xa_v, k_cache, v_cache,
                            weights, config, enc_lengths)
                    else:
                        def step_one(x, pos, vm, xk, xv, kc, vc, el):
                            return decoder_mod.decode_step_masked(
                                x, pos, r, vm, xk, xv, kc, vc, weights, config,
                                enc_length=el)

                        hidden, k_cache, v_cache = jax.vmap(
                            step_one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
                            emb, lp, valid, xa_k, xa_v, k_cache, v_cache,
                            enc_lengths)
                    logical_pos = logical_pos + counts.astype(jnp.int32)
                    return (k_cache, v_cache, hidden, valid, logical_pos,
                            frame_count, done, keys, codes_seg)

                codes_seg = jnp.zeros((K, self.n_slots, config.num_codebooks),
                                      jnp.int32)
                carry = (k_cache, v_cache, hidden, valid, logical_pos,
                         frame_count, done, keys, codes_seg)
                carry = jax.lax.fori_loop(0, K, body, carry)
                return carry

            fn = jax.jit(program, donate_argnums=(1, 2, 5, 6))
            self._segment_cache[top_k] = fn
        return fn

    # ---- public API ---------------------------------------------------------

    def submit(self, token_ids: Sequence[int], *, speaker_id: int = 0,
               seed: int = 0) -> int:
        """Queue one request; returns its id. Requests longer than the
        largest token bucket split into word-boundary child chunks that decode
        (possibly concurrently) in separate slots; the request id is reported
        finished once all chunks are, with their codes concatenated in order.
        """
        from ..runtime.engine import split_to_buckets

        chunks = split_to_buckets(token_ids, self.token_buckets,
                                  self.split_token_id,
                                  self.config.text_bos_id,
                                  self.config.text_eos_id)
        req_id = self._next_id
        self._next_id += 1
        if len(chunks) == 1:
            self._queue.append(_Request(req_id, chunks[0], speaker_id, seed))
            return req_id
        children = []
        for i, chunk in enumerate(chunks):
            child_id = req_id if i == 0 else self._next_id
            if i > 0:
                self._next_id += 1
            children.append(child_id)
            self._group_parent[child_id] = req_id
            self._queue.append(_Request(child_id, chunk, speaker_id, seed + i))
        self._groups[req_id] = children
        return req_id

    @property
    def pending(self) -> int:
        in_flight = sum(1 for r in self._slot_req if r is not None)
        return len(self._queue) + in_flight

    def _admit_pending(self):
        # Collect (slot, request) pairs, group by token bucket, and admit
        # each group in power-of-two batches — one dispatch per batch.
        free = [s for s in range(self.n_slots) if self._slot_req[s] is None]
        pairs = []
        while free and self._queue:
            req = self._queue.popleft()
            pairs.append((free.pop(0), req))
        if not pairs:
            return

        by_bucket: Dict[int, list] = {}
        for slot, req in pairs:
            bucket = pick_bucket(self.token_buckets, len(req.token_ids))
            by_bucket.setdefault(bucket, []).append((slot, req))

        for bucket, group in by_bucket.items():
            while group:
                m = 1
                while m * 2 <= len(group) and m * 2 <= self.n_slots:
                    m *= 2
                chunk, group = group[:m], group[m:]
                tokens = np.zeros((m, bucket), np.int32)
                lens = np.zeros((m,), np.int32)
                spk = np.zeros((m,), np.int32)
                slots = np.zeros((m,), np.int32)
                keys = []
                for i, (slot, req) in enumerate(chunk):
                    tokens[i, : len(req.token_ids)] = req.token_ids
                    lens[i] = len(req.token_ids)
                    spk[i] = req.speaker_id
                    slots[i] = slot
                    keys.append(jax.random.fold_in(
                        jax.random.PRNGKey(req.seed), req.req_id))
                (self.k_cache, self.v_cache, self.xa_k, self.xa_v,
                 self.hidden, self.valid, self.enc_lengths, self.logical_pos,
                 self.frame_count, self.keys) = self._admit_fn(bucket, m)(
                    self.weights, self.k_cache, self.v_cache, self.xa_k,
                    self.xa_v, self.hidden, self.valid, self.enc_lengths,
                    self.logical_pos, self.frame_count, self.keys,
                    jnp.asarray(tokens), jnp.asarray(lens), jnp.asarray(spk),
                    jnp.asarray(slots), jnp.int32(self.ring_p),
                    jnp.stack(keys))
                for slot, req in chunk:
                    self.active[slot] = True
                    self._done_host[slot] = False
                    self._counts_host[slot] = 0
                    self._slot_req[slot] = req.req_id
                    self._partial[req.req_id] = []

    def _retire_finished(self, codes_seg: np.ndarray,
                         counts_before: np.ndarray) -> Dict[int, np.ndarray]:
        finished = {}
        for slot in range(self.n_slots):
            req_id = self._slot_req[slot]
            if req_id is None:
                continue
            new = int(self._counts_host[slot] - counts_before[slot])
            if new > 0:
                self._partial[req_id].append(codes_seg[:new, slot, :])
            hit_cap = self._counts_host[slot] >= self.config.max_dec_steps
            if self._done_host[slot] or hit_cap:
                parts = self._partial.pop(req_id)
                codes = (np.concatenate(parts, axis=0) if parts
                         else np.zeros((0, self.config.num_codebooks), np.int32))
                finished[req_id] = codes
                self._finished[req_id] = codes
                self._slot_req[slot] = None
                self.active[slot] = False
        return self._resolve_groups(finished)

    def _resolve_groups(self, finished: Dict[int, np.ndarray]
                        ) -> Dict[int, np.ndarray]:
        """Map finished chunk-children onto their parent request: the parent
        id surfaces (codes concatenated in chunk order) only once every child
        is done; ungrouped requests pass through unchanged."""
        out: Dict[int, np.ndarray] = {}
        for rid, codes in finished.items():
            parent = self._group_parent.get(rid)
            if parent is None:
                out[rid] = codes
                continue
            children = self._groups[parent]
            if all(c in self._finished for c in children):
                joined = np.concatenate(
                    [self._finished[c] for c in children], axis=0)
                for c in children:
                    if c != parent:
                        self._finished.pop(c, None)
                    self._group_parent.pop(c, None)
                self._groups.pop(parent)
                self._finished[parent] = joined
                out[parent] = joined
        return out

    def step(self, *, temperature: float = 0.7,
             top_k: int = 80) -> Dict[int, np.ndarray]:
        """Admit queued requests, run one segment, retire finished slots.

        Returns {request_id: codes [n_frames, 8]} for requests that finished
        during this segment.
        """
        self._admit_pending()
        if not self.active.any():
            return {}
        counts_before = self._counts_host.copy()
        seg = self._segment_fn(top_k)
        (self.k_cache, self.v_cache, self.hidden, self.valid,
         self.logical_pos, self.frame_count, done_dev, self.keys,
         codes_seg) = seg(
            self.weights, self.k_cache, self.v_cache, self.xa_k, self.xa_v,
            self.hidden, self.valid, self.logical_pos, self.frame_count,
            jnp.asarray(self.active), jnp.asarray(self._done_host),
            self.enc_lengths, self.keys,
            jnp.int32(self.ring_p), jnp.float32(temperature))
        self.ring_p = (self.ring_p + self.segment_frames) % self.config.max_seq
        self._counts_host = np.asarray(self.frame_count).astype(np.int64)
        self._done_host = np.array(done_dev)  # np.array: writable copy
        return self._retire_finished(np.asarray(codes_seg), counts_before)

    def synthesize_all(self, token_lists: Sequence[Sequence[int]], *,
                       temperature: float = 0.7, top_k: int = 80,
                       seed: int = 0) -> List[np.ndarray]:
        """Convenience: submit everything, pump segments until drained."""
        ids = [self.submit(t, seed=seed) for t in token_lists]
        while self.pending:
            self.step(temperature=temperature, top_k=top_k)
        return [self._finished[i] for i in ids]


class MultiChipContinuousServer:
    """Continuous batching composed with the data-parallel mesh: ONE
    ContinuousBatchingEngine per device plus a SHARED host-side admission
    queue (VERDICT r4 item 7).

    Design: the dp axis needs no collectives at decode time — each request
    lives entirely on one chip — so the TPU-shaped composition is N
    independent ring-cache engines (weights replicated via ``device_put``,
    slot state committed per device with ``jax.default_device``) behind one
    scheduler. Admission routes each queued request to the engine with the
    most free capacity; a request whose tokens overflow the buckets still
    chunk-splits inside its engine (children stay on one chip, so their codes
    concatenate without cross-chip traffic). ``step`` pumps every busy engine
    from a thread pool: JAX dispatch is async and thread-safe, so the
    per-engine segment programs overlap on their devices while the host
    threads only block on the small readbacks.

    Scaling rationale (single real chip available; measured table deferred):
    decode segments share NOTHING across chips — no collectives, no sharded
    state, only host-side queue handoff between segments — so aggregate fps
    is the single-chip continuous-engine fps times the chip count to within
    host-dispatch overlap; the 8-virtual-device admission test and the
    multi-chip dryrun pin the correctness of the composition.
    """

    def __init__(self, weights: MagpieWeights, config: MagpieConfig,
                 devices: Optional[Sequence] = None, slots_per_device: int = 8,
                 compute_dtype=jnp.float32,
                 token_buckets: Sequence[int] = (32, 64, 128),
                 segment_frames: int = 32):
        devices = list(devices) if devices is not None else jax.devices()
        self.devices = devices
        self.config = config
        self.engines: List[ContinuousBatchingEngine] = []
        for d in devices:
            with jax.default_device(d):
                w_d = jax.device_put(weights, d)
                self.engines.append(ContinuousBatchingEngine(
                    w_d, config, n_slots=slots_per_device,
                    compute_dtype=compute_dtype, token_buckets=token_buckets,
                    segment_frames=segment_frames))
        self._queue: deque = deque()
        self._next_id = 0
        self._to_global: Dict[tuple, int] = {}
        self._finished: Dict[int, np.ndarray] = {}

    def submit(self, token_ids: Sequence[int], *, speaker_id: int = 0,
               seed: int = 0) -> int:
        gid = self._next_id
        self._next_id += 1
        self._queue.append((gid, list(token_ids), speaker_id, seed))
        return gid

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(e.pending for e in self.engines)

    def _dispatch(self):
        """Shared admission: drain the global queue into the engines with
        free capacity, most-free first (keeps chips evenly loaded)."""
        while self._queue:
            caps = [e.n_slots - e.pending for e in self.engines]
            best = int(np.argmax(caps))
            if caps[best] <= 0:
                return
            gid, toks, spk, seed = self._queue.popleft()
            local = self.engines[best].submit(toks, speaker_id=spk, seed=seed)
            self._to_global[(best, local)] = gid

    def step(self, *, temperature: float = 0.7,
             top_k: int = 80) -> Dict[int, np.ndarray]:
        """Admit from the shared queue, run one segment on EVERY busy engine
        (concurrently), and return {global_request_id: codes} finished this
        segment."""
        from concurrent.futures import ThreadPoolExecutor

        self._dispatch()
        busy = [(i, e) for i, e in enumerate(self.engines) if e.pending]
        if not busy:
            return {}
        with ThreadPoolExecutor(max_workers=len(busy)) as pool:
            futs = [(i, pool.submit(e.step, temperature=temperature,
                                    top_k=top_k)) for i, e in busy]
            out: Dict[int, np.ndarray] = {}
            for i, fut in futs:
                for local, codes in fut.result().items():
                    gid = self._to_global.pop((i, local))
                    self._finished[gid] = codes
                    out[gid] = codes
        return out

    def synthesize_all(self, token_lists: Sequence[Sequence[int]], *,
                       temperature: float = 0.7, top_k: int = 80,
                       seed: int = 0) -> List[np.ndarray]:
        ids = [self.submit(t, seed=seed + i)
               for i, t in enumerate(token_lists)]
        while self.pending:
            self.step(temperature=temperature, top_k=top_k)
        return [self._finished[i] for i in ids]
