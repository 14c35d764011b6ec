"""GATE — plain graph attention over the full F·K token sequence.

Ablation model, reference `hwgat/models/GATE.py:8-216`: 8 blocks at dim 128
attending over all F·29 tokens with an additive spatio-temporal adjacency mask
(`model_params.py:60-73` — NOTE: no self-loops, so the diagonal is masked).
Learned weighted-average pooling over tokens (`GATE.py:181,210`).

TPU mapping: the reference's (F·29)² masked score matrix (5568² at F=192,
~31M entries/head) collapses to the ±1-frame band — a 64× cut in score work
with f32-exact results (`ops/attention.py::banded_frame_attention`).
"""

from __future__ import annotations

import numpy as np
from flax import linen as nn

from sl_hwgat_tpu.graphs.adjacency import additive_mask
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, edges_to_dense
from sl_hwgat_tpu.models.common import (
    DENSE_INIT,
    FeedForward,
    FourierEmbed,
    PositionalEncoding,
    layer_norm,
)
from sl_hwgat_tpu.models.wgate import BandedMSA


class GAttentionBlock(nn.Module):
    """Pre-norm MSA + FFN over flat tokens. ≡ `GATE.py:89-116`."""

    dim: int
    num_heads: int
    band: tuple
    frames: int
    num_kps: int
    drop: float = 0.0
    attn_drop: float = 0.0
    ff_ratio: float = 2.0
    compute_dtype: str = "float32"
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        h = layer_norm("norm1")(x)
        h = BandedMSA(
            dim=self.dim,
            num_heads=self.num_heads,
            band=self.band,
            frames=self.frames,
            tokens_per_frame=self.num_kps,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            compute_dtype=self.compute_dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(h, train=train)
        x = shortcut + h
        x = x + FeedForward(
            hidden=int(self.dim * self.ff_ratio), out=self.dim, drop_rate=self.drop,
            compute_dtype=self.compute_dtype, name="ff",
        )(layer_norm("norm2")(x), train=train)
        return x


class GATE(nn.Module):
    """Flat spatio-temporal graph-attention classifier.
    Input (B, F, K=29, C) → logits. Defaults ≡ ``GATEParams``
    (`model_params.py:5-19`)."""

    kp_dim: int = 2
    num_kps: int = 29
    temporal_dim: int = 192
    num_classes: int = 2002
    embed_dim: int = 128
    pe: bool = True
    depths: int = 8
    num_heads: int = 8
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.0
    ff_ratio: float = 2.0
    compute_dtype: str = "float32"
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        spatial = edges_to_dense(BODY29_EDGES, self.num_kps, self_loops=False)
        eye = np.eye(self.num_kps, dtype=np.float32)
        band_np = np.stack([additive_mask(eye), additive_mask(spatial), additive_mask(eye)])
        band = tuple(map(lambda a: tuple(map(tuple, a)), band_np.tolist()))

        x = FourierEmbed(self.embed_dim, self.kp_dim, name="fourier")(x)
        if self.pe:
            x = PositionalEncoding(
                self.embed_dim, self.temporal_dim, self.drop_rate, name="pos_encoder"
            )(x, train=train)
        b, f, k, d = x.shape
        x = x.reshape(b, f * k, d)
        for i in range(self.depths):
            x = GAttentionBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                band=band,
                frames=f,
                num_kps=k,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                ff_ratio=self.ff_ratio,
                compute_dtype=self.compute_dtype,
                attn_impl=self.attn_impl,
                name=f"layers_{i}",
            )(x, train=train)
        x = layer_norm("norm")(x)
        # Learned weighted average over tokens: Linear(F·K → 1). ≡ `GATE.py:210`.
        x = nn.Dense(1, kernel_init=DENSE_INIT, name="weightedAvg")(x.transpose(0, 2, 1))[..., 0]
        return nn.Dense(self.num_classes, kernel_init=DENSE_INIT, name="head")(x)


def gate_from_dataset(dataset_params: dict, input_dim: int, **overrides) -> GATE:
    kw = dict(
        kp_dim=input_dim,
        num_kps=29,
        temporal_dim=dataset_params["src_len"],
        num_classes=dataset_params["num_class"],
        embed_dim=128,
        pe=True,
        depths=8,
        num_heads=8,
        drop_rate=0.1,
        attn_drop_rate=0.0,
        ff_ratio=2.0,
    )
    kw.update(overrides)
    return GATE(**kw)
