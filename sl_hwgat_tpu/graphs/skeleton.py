"""Skeleton topology constants.

Two graphs exist in the reference family:

1. The 16-joint *window* graph used by HWGATE/WGATE. Each of the 4 body-part
   windows re-indexes its joints 0..15 as [head(3) | arm(3) | hand(10)], and all
   four windows share one 25-edge topology (reference
   `hwgat/models/model_params.py:261-369`: the four per-window lists are
   identical).
2. The 29-joint whole-body graph used by GATE/HGATE/STGCN/DecoupledGCN
   (reference `hwgat/models/model_params.py:21-56` et al.).

The window → source-joint composition (which canonical joints land in which
window) lives in the data layout, reference `hwgat/dataTransform.py:426-455`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# 25 undirected edges over the 16 window joints
# [0-2 head | 3-5 arm (shoulder, elbow, wrist→no: shoulder/elbow/wrist) | 6-15 hand].
# Reference: hwgat/models/model_params.py:261-287 (identical for windows 0-3).
WINDOW_EDGES_16: tuple[tuple[int, int], ...] = (
    (0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (5, 6),
    (6, 7), (6, 8), (8, 9), (8, 10), (6, 10), (10, 11), (10, 12), (6, 12),
    (12, 13), (12, 14), (14, 15), (6, 14), (7, 9), (9, 11), (11, 13),
    (13, 15), (7, 15), (7, 11), (7, 13),
)

# 34 undirected edges over the 29 canonical joints (22 body/left-hand edges +
# 12 right-hand edges written with the +10 offset in the reference).
# Reference: hwgat/models/model_params.py:21-56.
BODY29_EDGES: tuple[tuple[int, int], ...] = (
    (2, 0), (1, 0), (0, 3), (0, 4), (3, 5), (4, 6), (5, 7), (6, 8), (7, 9),
    (9, 10), (9, 11), (11, 12), (11, 13), (13, 14), (9, 13), (13, 15), (9, 15),
    (15, 16), (15, 17), (9, 17), (17, 18), (8, 19),
    (19, 27), (19, 20), (19, 21), (19, 23), (19, 25),
    (21, 22), (21, 23), (23, 24), (23, 25), (25, 26), (25, 27), (27, 28),
)

# Which canonical joints (0..28) compose each of the 4 windows.
# Reference: hwgat/dataTransform.py:428-441 (WindowCreate).
_HEAD = [0, 1, 2]
_L_ARM = [3, 5, 7]
_R_ARM = [4, 6, 8]
_L_HAND = list(range(9, 19))
_R_HAND = list(range(19, 29))
WINDOW_JOINTS: tuple[tuple[int, ...], ...] = (
    tuple(_HEAD + _L_ARM + _L_HAND),  # window 0: head + left arm + left hand
    tuple(_HEAD + _R_ARM + _R_HAND),  # window 1: head + right arm + right hand
    tuple(_HEAD + _L_ARM + _R_HAND),  # window 2: head + left arm + right hand
    tuple(_HEAD + _R_ARM + _L_HAND),  # window 3: head + right arm + left hand
)


@dataclass(frozen=True)
class WindowLayout:
    """Compile-time description of the hierarchical window structure.

    ``num_windows`` spatial windows of ``window_size`` joints each; temporal
    patches of ``temporal_patch`` frames are attended to jointly, so one
    attention group holds ``tokens = temporal_patch * window_size`` tokens.
    """

    window_size: int = 16
    num_windows: int = 4
    temporal_patch: int = 2

    @property
    def num_kps(self) -> int:
        return self.window_size * self.num_windows

    @property
    def tokens(self) -> int:
        return self.temporal_patch * self.window_size

    def scatter_index(self) -> np.ndarray:
        """(num_windows, window_size) canonical-joint index per window slot."""
        return np.asarray(WINDOW_JOINTS, dtype=np.int32)


def edges_to_dense(
    edges, num_nodes: int, self_loops: bool = True, dtype=np.float32
) -> np.ndarray:
    """Symmetric {0,1} dense adjacency from an undirected edge list."""
    a = np.eye(num_nodes, dtype=dtype) if self_loops else np.zeros((num_nodes, num_nodes), dtype=dtype)
    for i, j in edges:
        a[i, j] = 1
        a[j, i] = 1
    return a
