"""Device mesh + sharding rules.

The reference is strictly single-device, batch-1 (SURVEY §2.5). The TPU framework
adds two orthogonal axes:

- ``data``: batch parallelism for multi-utterance serving — each chip runs whole
  utterances; throughput scales with chips and per-chip batch.
- ``model``: tensor parallelism over the feed-forward hidden dim and attention
  projections (Megatron-style column/row sharding). XLA's SPMD partitioner
  inserts the psum/all-gather collectives from the NamedSharding annotations;
  they ride ICI inside a pod slice.

All functions degrade gracefully to a 1x1 mesh on a single chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MagpieConfig
from ..io.magpie_weights import (DecoderWeights, EncoderWeights,
                                 LocalTransformerWeights, MagpieWeights)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def magpie_weight_pspecs(config: MagpieConfig) -> MagpieWeights:
    """PartitionSpec pytree for tensor-parallel weights over MODEL_AXIS.

    Megatron layout: FFN proj column-sharded / out row-sharded; fused QKV
    column-sharded with the attention recomposed by the partitioner; XA and
    norms replicated (1 head / tiny).
    """
    r = P()  # replicated
    enc = EncoderWeights(
        pos_emb=r,
        norm_self=r,
        qkv=P(None, None, MODEL_AXIS),
        sa_out=P(None, MODEL_AXIS, None),
        norm_ff=r,
        ff_proj=P(None, None, None, MODEL_AXIS),
        ff_out=P(None, None, MODEL_AXIS, None),
        norm_out=r,
    )
    dec = DecoderWeights(
        pos_emb=r,
        norm_self=r,
        qkv=P(None, None, MODEL_AXIS),
        sa_out=P(None, MODEL_AXIS, None),
        norm_xa_q=r, norm_xa_mem=r,
        xa_q=r, xa_kv=r, xa_out=r,
        norm_ff=r,
        ff_proj=P(None, None, MODEL_AXIS),
        ff_out=P(None, MODEL_AXIS, None),
        norm_out=r,
    )
    lt = LocalTransformerWeights(
        in_proj_w=r, in_proj_b=r, pos_emb=r,
        norm_self=r, qkv=r, sa_out=r, norm_ff=r,
        ff_proj=P(None, MODEL_AXIS),
        ff_out=P(MODEL_AXIS, None),
        out_proj_w=P(None, None, MODEL_AXIS),
        out_proj_b=P(None, MODEL_AXIS),
    )
    return MagpieWeights(
        text_emb=r,
        audio_emb=r,
        baked_context=r,
        encoder=enc,
        decoder=dec,
        final_proj_w=P(None, MODEL_AXIS),
        final_proj_b=P(MODEL_AXIS),
        lt=lt,
    )


def shard_weights(weights: MagpieWeights, mesh: Mesh,
                  config: Optional[MagpieConfig] = None) -> MagpieWeights:
    """Place weights on the mesh with tensor-parallel shardings.

    ``config`` should be the weights' own config; today the pspecs are
    shape-independent so the default is equivalent, but callers must not rely
    on that staying true.
    """
    specs = magpie_weight_pspecs(config if config is not None else MagpieConfig())
    return jax.tree.map(
        lambda w, spec: jax.device_put(w, NamedSharding(mesh, spec)),
        weights, specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
