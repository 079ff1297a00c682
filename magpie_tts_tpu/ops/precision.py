"""Matmul precision policy for the decode paths.

On TPU, DEFAULT matmul precision truncates float32 inputs to bfloat16 on the
MXU; XLA and Mosaic then differ by op order alone, which was measured at
~1e-2 hidden-state drift per utterance between the XLA oracle path and the
Pallas kernels (round-1 STATUS). Requesting HIGHEST runs float32 matmuls at
full precision on both sides, shrinking the gap to f32 rounding level
(~1e-6 relative, measured) so temp=0 codes agree between paths — the
reference's bit-exactness bar (BASELINE.md parity table).

bfloat16 inputs are unaffected by the flag (single-pass MXU either way), so
requesting HIGHEST everywhere costs nothing on the bf16 serving path. The f32
decode path is weight-DMA-bound, not MXU-bound, so the multi-pass f32 matmuls
do not move throughput either.
"""

from __future__ import annotations

import jax

# All magpie model matmuls (XLA paths and Pallas kernels) request this.
DOT_PRECISION = jax.lax.Precision.HIGHEST
