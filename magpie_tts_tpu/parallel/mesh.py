"""Device mesh + sharding rules.

The reference is strictly single-device, batch-1 (SURVEY §2.5); multi-chip is
new scope here, and its one scaling axis is **data parallelism**: each chip
runs the whole fused-kernel program on its local batch slice — no collectives,
throughput linear in chips.

Tensor parallelism is RETIRED (round 4), not merely unimplemented. It was
built (Megatron column/row `NamedSharding` pspecs over a `model` axis),
correctness-tested, and then measured: the batched Pallas frame kernel is a
manually DMA-pipelined program the SPMD partitioner cannot split, so any
tp>1 mesh had to run the pure-XLA step at 6259 µs/frame-batch vs the
kernel's 1410 (B=32 bf16 slope probe, table in docs/DESIGN.md
"Parallelism") — even a perfect 2-way split loses >2× to one chip running
the kernels. A kernel-preserving tp would need the 12-layer megakernel cut
into per-layer calls with 2 psums per layer, destroying the fusion that
makes the step fast, for a model (357M ≈ 0.7 GB bf16 + caches) that fits a
single v5e chip with >10 GB to spare. ``make_mesh`` therefore raises on
``n_model > 1``; the mesh keeps a size-1 ``model`` axis so axis names stay
stable for future larger-model work.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MagpieConfig
from ..io.magpie_weights import MagpieWeights

DATA_AXIS = "data"
MODEL_AXIS = "model"  # always size 1 — see module docstring


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    if n_model != 1:
        raise ValueError(
            "tensor parallelism is retired for Magpie-357M: the measured "
            "XLA-step tp path costs 4.4x one chip running the fused kernels "
            "and the model fits a single chip with margin (docs/DESIGN.md "
            "'Parallelism'). Scale with n_data (data parallelism).")
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices)
    assert n_data <= len(devices), (
        f"mesh {n_data}x1 needs {n_data} devices, have {len(devices)}")
    grid = np.asarray(devices[:n_data]).reshape(n_data, 1)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def shard_weights(weights: MagpieWeights, mesh: Mesh,
                  config: Optional[MagpieConfig] = None) -> MagpieWeights:
    """Replicate weights across the (data-parallel) mesh.

    Every chip runs whole utterances, so every chip holds the full weights;
    explicit placement here keeps jit from inserting a resharding transfer on
    the first dispatch. ``config`` is accepted for signature stability.
    """
    del config
    sharding = replicated(mesh)
    return jax.tree.map(lambda w: jax.device_put(w, sharding), weights)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
