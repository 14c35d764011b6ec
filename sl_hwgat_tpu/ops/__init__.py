"""Compute ops: layout transforms (window/block partition, temporal merging) and
adjacency-masked multi-head attention in three implementations:

- ``oracle``  — direct jnp transcription of the reference semantics (parity tests)
- ``stacked`` — TPU-native dense formulation: (window, head) units stacked into
  128-token supertiles so every matmul is MXU-shaped (128×128×64)
- ``pallas``  — fully fused Pallas kernel over the stacked layout (no HBM
  round-trip for attention scores)
"""

from sl_hwgat_tpu.ops.window import (
    window_partition,
    window_reverse,
    block_partition,
    block_reverse,
    spatial_window_partition,
    spatial_window_reverse,
    temporal_merge,
)
from sl_hwgat_tpu.ops.attention import (
    masked_msa_oracle,
    stacked_window_attention,
    banded_frame_attention,
)

__all__ = [
    "window_partition",
    "window_reverse",
    "block_partition",
    "block_reverse",
    "spatial_window_partition",
    "spatial_window_reverse",
    "temporal_merge",
    "masked_msa_oracle",
    "stacked_window_attention",
    "banded_frame_attention",
]
