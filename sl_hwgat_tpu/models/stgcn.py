"""ST-GCN baseline — spatial-temporal graph convolutional network.

Reference `hwgat/models/STGCN.py:8-269` (ST-GCN, Yan et al. 2018). Layout here
is channel-last (N, T, V, C) throughout — TPU/XLA's native conv layout — and
the per-partition "SpMM" ``einsum('nkctv,kvw->nctw')`` becomes
``einsum('ntvkc,kvw->ntwc')`` on (K_part, V, V) dense partition stacks from
``graphs.GraphPartition`` (spatial strategy, `STGCN.py:206`).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sl_hwgat_tpu.graphs.partition import GraphPartition
from sl_hwgat_tpu.models.common import FastDropout, TorchBatchNorm


class GraphConv(nn.Module):
    """Pointwise conv to K·C' channels + partition einsum.
    ≡ `STGCN.py:8-69` (t_kernel_size=1)."""

    out_channels: int
    num_partitions: int

    @nn.compact
    def __call__(self, x, a):
        n, t, v, c = x.shape
        k = self.num_partitions
        x = nn.Conv(self.out_channels * k, kernel_size=(1, 1), name="conv")(x)
        x = x.reshape(n, t, v, k, self.out_channels)
        return jnp.einsum("ntvkc,kvw->ntwc", x, a)


class STGCNBlock(nn.Module):
    """graph conv → BN/ReLU/temporal conv/BN/dropout + residual. ≡ `STGCN.py:72-143`."""

    in_channels: int
    out_channels: int
    num_partitions: int
    temporal_kernel: int = 9
    stride: int = 1
    dropout: float = 0.0
    residual: bool = True

    @nn.compact
    def __call__(self, x, a, train: bool = False):
        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = nn.Conv(
                self.out_channels, kernel_size=(1, 1), strides=(self.stride, 1), name="res_conv"
            )(x)
            res = TorchBatchNorm(use_running_average=not train, name="res_bn")(res)

        x = GraphConv(self.out_channels, self.num_partitions, name="gcn")(x, a)
        x = TorchBatchNorm(use_running_average=not train, name="tcn_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.temporal_kernel, 1),
            strides=(self.stride, 1),
            padding=((self.temporal_kernel // 2, self.temporal_kernel // 2), (0, 0)),
            name="tcn_conv",
        )(x)
        x = TorchBatchNorm(use_running_average=not train, name="tcn_bn2")(x)
        x = FastDropout(self.dropout, deterministic=not train)(x)
        return nn.relu(x + res)


class STGCN(nn.Module):
    """10-block ST-GCN classifier. Input (B, T, V=29, C) → logits.
    Defaults ≡ ``STGCNParams`` (`model_params.py:490-538`)."""

    in_channels: int = 2
    num_nodes: int = 29
    center: int = 0
    edges: tuple = ()
    edge_importance_weighting: bool = True
    n_out_features: int = 256
    num_classes: int = 1000
    dropout_ratio: float = 0.05

    # (out_channels, stride) schedule, `STGCN.py:215-228`
    SCHEDULE: Sequence[tuple[int, int]] = (
        (64, 1), (64, 1), (64, 1), (64, 1), (128, 2),
        (128, 1), (128, 1), (256, 2), (256, 1), (256, 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, t, v, c = x.shape
        a_np = GraphPartition(self.num_nodes, self.center, list(self.edges)).A.astype(np.float32)
        a = jnp.asarray(a_np)
        k_part = a_np.shape[0]

        # data_bn over flattened (V·C) features; the reference flattens as
        # (V, C, T).view(N, V*C, T) so feature index = v·C + c, matching a
        # plain (T, V, C) → (T, V·C) reshape. ≡ `STGCN.py:214,256-259`.
        xb = x.reshape(n, t, v * c)
        xb = TorchBatchNorm(use_running_average=not train, name="data_bn")(xb)
        x = xb.reshape(n, t, v, c)

        in_ch = self.in_channels
        schedule = list(self.SCHEDULE[:-1]) + [(self.n_out_features, 1)]
        for idx, (out_ch, stride) in enumerate(schedule):
            if self.edge_importance_weighting:
                imp = self.param(f"edge_importance_{idx}", nn.initializers.ones, a_np.shape)
                a_eff = a * imp
            else:
                a_eff = a
            x = STGCNBlock(
                in_channels=in_ch,
                out_channels=out_ch,
                num_partitions=k_part,
                stride=stride,
                residual=(idx != 0),
                name=f"st_gcn_{idx}",
            )(x, a_eff, train=train)
            in_ch = out_ch

        x = jnp.mean(x, axis=(1, 2))  # global avg pool over (T, V)
        x = FastDropout(self.dropout_ratio, deterministic=not train)(x)
        head_init = nn.initializers.normal(stddev=math.sqrt(2.0 / self.num_classes))
        return nn.Dense(self.num_classes, kernel_init=head_init, name="classifier")(x)


def stgcn_from_dataset(dataset_params: dict, input_dim: int, **overrides) -> STGCN:
    from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES

    kw = dict(
        in_channels=input_dim,
        num_nodes=29,
        center=0,
        edges=BODY29_EDGES,
        edge_importance_weighting=True,
        n_out_features=256,
        num_classes=dataset_params["num_class"],
        dropout_ratio=0.05,
    )
    kw.update(overrides)
    return STGCN(**kw)
