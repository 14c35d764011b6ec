"""HGATE — hierarchical graph attention WITHOUT spatial windows.

Ablation model, reference `hwgat/models/HGATE.py:8-346`: same 3-stage hierarchy
as HWGATE, but each attention group holds the whole 29-joint skeleton over a
temporal patch (TP·K = 58 tokens), masked multiplicatively by the blocked
whole-body adjacency (`model_params.py:461-484`). No train-time pruning.

TPU mapping: 58 tokens pad to 64, two (group, head) units stack into one
128-row supertile (`ops/attention.py`).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from sl_hwgat_tpu.graphs.adjacency import hgate_block_adj
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
from sl_hwgat_tpu.models.common import (
    DENSE_INIT,
    FeedForward,
    FourierEmbed,
    PositionalEncoding,
    layer_norm,
)
from sl_hwgat_tpu.models.hwgate import WindowedMSA, shift_tail_mask
from sl_hwgat_tpu.ops.window import block_partition, block_reverse, temporal_merge


class GraphAttentionBlock(nn.Module):
    """LN → whole-skeleton masked MSA (± temporal roll) → residual → FFN.
    ≡ `HGATE.py:128-212`."""

    dim: int
    num_heads: int
    num_kps: int
    temporal_patch: int
    shift_size: int
    adj: tuple
    drop: float = 0.0
    attn_drop: float = 0.0
    ff_ratio: float = 2.0
    attn_impl: str = "auto"
    attn_dtype: str = "float32"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, f_total, k, d = x.shape
        shortcut = x
        if self.shift_size > 0:
            x = jnp.roll(x, -self.shift_size, axis=1)
        xb = block_partition(x, self.temporal_patch)
        xb = layer_norm("norm1")(xb)
        tail_mask = None
        if self.shift_size > 0:
            tail_mask = tuple(
                map(tuple, shift_tail_mask(self.num_kps, self.temporal_patch, self.shift_size).tolist())
            )
        xb = WindowedMSA(
            dim=self.dim,
            num_heads=self.num_heads,
            adj=self.adj,
            windows_per_frame=1,
            temporal_groups=f_total // self.temporal_patch,
            prune=False,
            tail_shift_mask=tail_mask,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            attn_impl=self.attn_impl,
            attn_dtype=self.attn_dtype,
            compute_dtype=self.compute_dtype,
            name="attn",
        )(xb, train=train)
        x = block_reverse(xb, self.temporal_patch, f_total, k)
        if self.shift_size > 0:
            x = jnp.roll(x, self.shift_size, axis=1)
        x = shortcut + x
        x = x + FeedForward(
            hidden=int(self.dim * self.ff_ratio), out=self.dim, drop_rate=self.drop,
            compute_dtype=self.compute_dtype, name="ff",
        )(layer_norm("norm2")(x), train=train)
        return x


class HGATE(nn.Module):
    """Hierarchical whole-skeleton graph-attention classifier.
    Input (B, F, K=29, C) → logits. Defaults ≡ ``HGATEParams``
    (`model_params.py:405-420`)."""

    kp_dim: int = 2
    num_kps: int = 29
    temporal_dim: int = 192
    num_classes: int = 2002
    embed_dim: int = 128
    temporal_patch: int = 2
    pe: bool = True
    depths: Sequence[int] = (2, 2, 4)
    num_heads: Sequence[int] = (2, 4, 8)
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.0
    ff_ratio: float = 2.0
    attn_impl: str = "auto"
    attn_dtype: str = "float32"
    compute_dtype: str = "float32"
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_layers = len(self.depths)
        adj = tuple(
            map(tuple, hgate_block_adj(BODY29_EDGES, self.num_kps, self.temporal_patch).tolist())
        )
        x = FourierEmbed(self.embed_dim, self.kp_dim, name="fourier")(x)
        if self.pe:
            x = PositionalEncoding(
                self.embed_dim, self.temporal_dim, self.drop_rate, name="pos_encoder"
            )(x, train=train)
        block_cls = (nn.remat(GraphAttentionBlock, static_argnums=(2,))
                     if self.remat else GraphAttentionBlock)
        for i in range(num_layers):
            dim = int(self.embed_dim * 2**i)
            for j in range(self.depths[i]):
                x = block_cls(
                    dim=dim,
                    num_heads=self.num_heads[i],
                    num_kps=self.num_kps,
                    temporal_patch=self.temporal_patch,
                    shift_size=0 if j % 2 == 0 else self.temporal_patch // 2,
                    adj=adj,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    ff_ratio=self.ff_ratio,
                    attn_impl=self.attn_impl,
                    attn_dtype=self.attn_dtype,
                    compute_dtype=self.compute_dtype,
                    name=f"layers_{i}_blocks_{j}",
                )(x, train)
            if i < num_layers - 1:
                x = temporal_merge(x, self.temporal_patch)
        x = layer_norm("norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, kernel_init=DENSE_INIT, name="head")(x)


def hgate_from_dataset(dataset_params: dict, input_dim: int, **overrides) -> HGATE:
    kw = dict(
        kp_dim=input_dim,
        num_kps=29,
        temporal_dim=dataset_params["src_len"],
        num_classes=dataset_params["num_class"],
        embed_dim=128,
        temporal_patch=2,
        pe=True,
        depths=(2, 2, 4),
        num_heads=(2, 4, 8),
        drop_rate=0.1,
        attn_drop_rate=0.0,
        ff_ratio=2.0,
    )
    kw.update(overrides)
    return HGATE(**kw)
